"""Vendor the t5-base tokenizer into the package for offline use.

The reference eval harness is inseparable from the real t5-base tokenizer
plus 43 placeholder AddedTokens (reference scripts/example.py:29-75): a
trained checkpoint's frozen word-embedding table is indexed by real
t5-base ids, so the hash fallback cannot serve it. The t5-base vocabulary
is learned sentencepiece data — it cannot be synthesized offline — so this
module exports it ONCE on any host that has network access or a populated
HF cache:

    python -m vima_tpu.bridge.vendor_tokenizer

writes ``vima_tpu/assets/t5-base-tokenizer.json`` (probed automatically by
:class:`vima_tpu.bridge.tokenizer.PromptTokenizer` before any network
path) and ``vima_tpu/assets/t5-golden-ids.json`` — recorded token ids for
a fixture prompt covering words + placeholders, which
``tests/test_bridge.py`` asserts against whenever the asset is present.
After vendoring, ``--ckpt`` runs are fully offline.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys

from vima_tpu.bridge.tokenizer import PLACEHOLDERS, VENDORED_TOKENIZER

# Fixture prompt: real VIMA task phrasing (reference task suite) + two
# placeholders; the golden file stores the full encoding.
GOLDEN_PROMPT = (
    "Put the {dragged_obj} into the {base_obj}. Sweep any {swept_obj} "
    "without exceeding the {bounds}."
)
GOLDEN_PATH = VENDORED_TOKENIZER.parent / "t5-golden-ids.json"


def export(out_path: pathlib.Path = VENDORED_TOKENIZER, repo: str = "t5-base") -> dict:
    """Export the fast tokenizer json (without the AddedTokens — those are
    added at load time exactly like the reference does at
    scripts/example.py:74-75, so the asset stays a vanilla t5-base
    export). Returns a manifest dict."""
    from tokenizers import Tokenizer

    try:
        tok = Tokenizer.from_pretrained(repo)
    except Exception:
        # fall back to the transformers cache (works offline if populated)
        from transformers import AutoTokenizer

        hf = AutoTokenizer.from_pretrained(repo, use_fast=True)
        tok = hf.backend_tokenizer

    out_path.parent.mkdir(parents=True, exist_ok=True)
    tok.save(str(out_path))
    sha = hashlib.sha256(out_path.read_bytes()).hexdigest()

    # golden encoding via the production loader (incl. placeholders)
    from vima_tpu.bridge.tokenizer import PromptTokenizer

    ptok = PromptTokenizer(str(out_path))
    ids, types, names = ptok(GOLDEN_PROMPT)
    manifest = {
        "repo": repo,
        "sha256": sha,
        "prompt": GOLDEN_PROMPT,
        "word_ids": [int(i) for i in ids],
        "token_types": [int(t) for t in types],
        "placeholders": list(names),
        "n_added_tokens": len(PLACEHOLDERS),
    }
    GOLDEN_PATH.write_text(json.dumps(manifest, indent=1))
    return manifest


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=str(VENDORED_TOKENIZER))
    ap.add_argument("--repo", default="t5-base")
    args = ap.parse_args(argv)
    manifest = export(pathlib.Path(args.out), args.repo)
    print(json.dumps({k: manifest[k] for k in ("repo", "sha256")}, indent=1))
    print(f"vendored -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
