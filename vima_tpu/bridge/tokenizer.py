"""Prompt tokenization with multimodal placeholder tokens.

The reference uses the Rust HF ``tokenizers`` t5-base tokenizer with 43
added placeholder tokens (scripts/example.py:22-75). Tokenization is
host-side and not perf-critical (survey §2.2), so we keep the same
library when a local tokenizer is available and fall back to a
deterministic hash tokenizer for offline CI / fake envs.

Probe order: explicit ``tokenizer_path`` > the vendored package asset
(``vima_tpu/assets/t5-base-tokenizer.json``, written once by
``python -m vima_tpu.bridge.vendor_tokenizer`` on any host with network
or an HF cache — after that every run is fully offline) > the HF cache >
the hub. Real checkpoints refuse the hash fallback (:meth:`require_real`).
"""

from __future__ import annotations

import pathlib
from typing import List, Sequence, Tuple

# Written by ``python -m vima_tpu.bridge.vendor_tokenizer``; probed before
# any network/cache path so checkpoint-driven runs work on zero-egress
# hosts (reference scripts/example.py:29-75 needs the real t5-base vocab).
VENDORED_TOKENIZER = pathlib.Path(__file__).parent.parent / "assets" / "t5-base-tokenizer.json"

# The full placeholder vocabulary (reference scripts/example.py:29-72).
PLACEHOLDERS: Tuple[str, ...] = tuple(
    "{" + name + "}"
    for name in (
        "base_obj", "base_obj_1", "base_obj_2",
        "dragged_obj", "dragged_obj_1", "dragged_obj_2", "dragged_obj_3",
        "dragged_obj_4", "dragged_obj_5",
        "swept_obj", "bounds", "constraint", "scene",
        "demo_blicker_obj_1", "demo_less_blicker_obj_1",
        "demo_blicker_obj_2", "demo_less_blicker_obj_2",
        "demo_blicker_obj_3", "demo_less_blicker_obj_3",
        "start_scene", "end_scene",
        "before_twist_1", "after_twist_1",
        "before_twist_2", "after_twist_2",
        "before_twist_3", "after_twist_3",
        "frame_0", "frame_1", "frame_2", "frame_3", "frame_4", "frame_5", "frame_6",
        "ring", "hanoi_stand",
        "start_scene_1", "end_scene_1",
        "start_scene_2", "end_scene_2",
        "start_scene_3", "end_scene_3",
    )
)


class PromptTokenizer:
    """tokenize(prompt) -> (word_ids, token_types, placeholder_names).

    token_types[i] == 0 consumes the next word id, == 1 the next placeholder
    asset (reference prepare_prompt, example.py:243-371).
    """

    def __init__(
        self,
        tokenizer_path: str | None = None,
        vocab_size: int = 32100,
        offline: bool = False,
    ):
        self._tok = None
        self._vocab_size = vocab_size
        if tokenizer_path is not None:
            self._tok = self._load_hf(tokenizer_path)
        elif VENDORED_TOKENIZER.is_file():
            # The vendored asset is itself offline — ``offline=True`` only
            # means "never touch the network / HF cache", so a present
            # vendored vocab is always preferred over the hash fallback.
            self._tok = self._load_hf(str(VENDORED_TOKENIZER))
        elif not offline:
            # Probe the local HF cache first: on a zero-egress host the
            # network path burns ~40 s of DNS retries before failing, and
            # the cache answer is definitive either way.
            cached = self._from_cache("t5-base")
            if cached is not None:
                self._tok = self._load_hf(cached)
            elif self._hub_reachable():
                try:
                    self._tok = self._load_hf("t5-base")
                except Exception:
                    self._tok = None  # offline: hash fallback

    @staticmethod
    def _hub_reachable(timeout: float = 2.0) -> bool:
        """One fast DNS probe: the hub client otherwise burns ~25 s of
        retries per process on zero-egress hosts before giving up."""
        import socket

        # No setdefaulttimeout: that mutates process-global state and the
        # env loop is multithreaded — a concurrent socket could inherit the
        # probe timeout (or lose a previously configured default).
        try:
            socket.create_connection(("huggingface.co", 443), timeout=timeout).close()
            return True
        except OSError:
            return False

    @staticmethod
    def _from_cache(repo: str):
        try:
            from huggingface_hub import try_to_load_from_cache

            path = try_to_load_from_cache(repo, "tokenizer.json")
            return path if isinstance(path, str) else None
        except Exception:
            return None

    def _load_hf(self, path):
        from tokenizers import AddedToken, Tokenizer

        kwargs = {"single_word": True, "lstrip": False, "rstrip": False, "normalized": True}
        if path.endswith(".json"):
            tok = Tokenizer.from_file(path)
        else:
            tok = Tokenizer.from_pretrained(path)
        tok.add_tokens([AddedToken(p, **kwargs) for p in PLACEHOLDERS])
        return tok

    @property
    def using_fallback(self) -> bool:
        return self._tok is None

    def require_real(self) -> None:
        """Hard-fail when only the hash fallback is available.

        A real checkpoint's frozen word-embedding table is indexed by real
        t5-base ids (reference vima/nn/prompt_encoder/word_embd.py:11-16);
        the hash fallback's ids would silently produce garbage embeddings,
        so checkpoint-driven runs must refuse to proceed without the real
        tokenizer (reference scripts/example.py:29-75)."""
        if self._tok is None:
            raise RuntimeError(
                "the t5-base tokenizer is unavailable (no network / HF cache) "
                "and the offline hash fallback would feed a trained checkpoint "
                "garbage token ids. Pass --tokenizer /path/to/tokenizer.json "
                "(an exported t5-base fast tokenizer) to run a real checkpoint."
            )

    def __call__(self, prompt: str) -> Tuple[List[int], List[int], List[str]]:
        if self._tok is not None:
            enc = self._tok.encode(prompt, add_special_tokens=True)
            ids, tokens = enc.ids, enc.tokens
        else:
            tokens = prompt.replace(".", " .").replace(",", " ,").split()
            ids = [abs(hash(t)) % self._vocab_size for t in tokens]
        word_ids, token_types, names = [], [], []
        for i, tok in enumerate(tokens):
            if tok in PLACEHOLDERS:
                token_types.append(1)
                names.append(tok[1:-1])
            else:
                token_types.append(0)
                word_ids.append(ids[i])
        return word_ids, token_types, names
