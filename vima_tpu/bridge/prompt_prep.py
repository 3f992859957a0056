"""Host-side prompt assembly indices.

The reference interleaves word/object embeddings with a Python loop over
tensors on the device (vima/policy/vima_policy.py:161-240) — a slow,
trace-unfriendly path. TPU-native design: the host computes one gather
index array per episode (cheap numpy), and the device does a single gather
(see policy/rollout.py:encode_prompt). Semantics are identical: token type
0 consumes the next word embedding, token type 1 expands to ``n_objs_max``
object embeddings whose mask comes from the per-view object masks
concatenated in sorted-view order (reference :191-201).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def prompt_gather_indices(
    raw_prompts_token_type: Sequence[Sequence[int]],
    n_words: int,
    obj_masks: Dict[str, np.ndarray] | None,
    n_objs_max: int,
    pad_to: int | None = None,
    n_imgs: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (idx, mask) for the device-side prompt gather.

    idx[b, l] indexes into ``concat([word_embs, img_embs_flat, zero_row])``:
      words occupy [0, n_words); image object q of image i occupies
      n_words + i * n_objs_max + q; padding points at the final zero row.

    obj_masks: per-view (n_imgs, n_objs_view) bool arrays; concatenated over
    ``sorted(views)`` to per-image object masks of length n_objs_max.
    For encoders whose per-image tokens are always valid (Gato patch tokens,
    perceiver queries, single cls token), pass ``None``.

    n_imgs: size of the gather source's image axis when the caller pads the
    flat image array past the number of images the prompts consume (shape
    bucketing — see bridge.env_loop); defaults to the consumed count.
    """
    if obj_masks is not None:
        views = sorted(obj_masks.keys())
        concat_mask = (
            np.concatenate([np.asarray(obj_masks[v], dtype=bool) for v in views], axis=-1)
            if len(views)
            else None
        )
    else:
        concat_mask = None

    lengths = []
    for prompt in raw_prompts_token_type:
        L = sum(1 if t == 0 else n_objs_max for t in prompt)
        lengths.append(L)
    L_max = max(lengths)
    if pad_to is not None:
        if pad_to < L_max:
            raise ValueError(f"pad_to={pad_to} < required prompt length {L_max}")
        L_max = pad_to

    B = len(raw_prompts_token_type)
    # The zero row is the LAST row of the gather source; the caller appends it.
    idx = np.zeros((B, L_max), dtype=np.int32)
    mask = np.zeros((B, L_max), dtype=bool)

    word_ptr, img_ptr = 0, 0
    n_imgs_total = 0
    for prompt in raw_prompts_token_type:
        n_imgs_total += sum(1 for t in prompt if t == 1)
    if n_imgs is None:
        n_imgs = n_imgs_total
    elif n_imgs < n_imgs_total:
        raise ValueError(f"n_imgs={n_imgs} < images consumed by prompts ({n_imgs_total})")
    zero_index = n_words + n_imgs * n_objs_max

    for b, prompt in enumerate(raw_prompts_token_type):
        l = 0
        for t in prompt:
            if t == 0:
                idx[b, l] = word_ptr
                mask[b, l] = True
                word_ptr += 1
                l += 1
            elif t == 1:
                for q in range(n_objs_max):
                    idx[b, l] = n_words + img_ptr * n_objs_max + q
                    mask[b, l] = (
                        bool(concat_mask[img_ptr, q]) if concat_mask is not None else True
                    )
                    l += 1
                img_ptr += 1
            else:
                raise ValueError(f"Invalid prompt token type {t}")
        idx[b, l:] = zero_index
    return idx, mask
