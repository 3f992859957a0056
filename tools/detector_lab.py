#!/usr/bin/env python
"""Detector perf lab: where do the 257 ms go? (round-4 VERDICT item 5)

Times the Mask R-CNN stages in isolation at the released-ckpt geometry
(R50-FPN, 91 classes) on the VIMA canvas, with the two-chain-length
raw-total method (see tools/perf_lab.py docstring).

Experiments: nms, roi, full  (default: all)
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

N1, N2, REPS = 2, 12, 5


def timed(make_fn, args, label, n1=N1, n2=N2, reps=REPS):
    f1, f2 = make_fn(n1), make_fn(n2)
    float(f1(*args))
    float(f2(*args))
    d = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f1(*args))
        t1 = time.perf_counter()
        float(f2(*args))
        t2 = time.perf_counter()
        d.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    p50 = float(np.percentile(d, 50))
    print(f"{label}: {p50:.3f} ms/iter  (p90 {float(np.percentile(d, 90)):.3f})", flush=True)
    return p50


def exp_nms():
    """nms_padded at the two production shapes (RPN and box-stage)."""
    import jax
    import jax.numpy as jnp

    from vima_tpu.nn.maskrcnn import nms_padded

    rng = np.random.default_rng(0)
    # fg passes the model's candidate cap (nms_padded top-k's the scores
    # first; an uncapped 90k-box call would build a 90000^2 IoU matrix)
    for N, topk, cand, label in ((3480, 1000, None, "rpn"), (90000, 100, 4096, "fg")):
        wh = rng.uniform(8, 64, size=(N, 2))
        xy = rng.uniform(0, 448, size=(N, 2))
        boxes = jnp.asarray(
            np.concatenate([xy, xy + wh], axis=1), jnp.float32
        )
        scores = jnp.asarray(rng.uniform(0, 1, size=(N,)), jnp.float32)
        valid = jnp.ones((N,), bool)

        def mk(n):
            @jax.jit
            def f(boxes, scores):
                def body(acc, i):
                    idx, ks, kv = nms_padded(
                        boxes, scores + acc * 1e-9, valid, 0.5, topk,
                        candidates=cand,
                    )
                    return acc + ks.sum(), ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return acc

            return f

        timed(mk, (boxes, scores), f"nms {label} N={N} topk={topk} cand={cand}")


def exp_roi():
    """multiscale_roi_align at box-stage (1000x7) and mask-stage (100x14)."""
    import jax
    import jax.numpy as jnp

    from vima_tpu.nn.maskrcnn import multiscale_roi_align

    rng = np.random.default_rng(1)
    # canvas 256x512 pyramid
    shapes = [(64, 128), (32, 64), (16, 32), (8, 16)]
    strides = [4, 8, 16, 32]
    pyramid = [
        jnp.asarray(rng.normal(size=(h, w, 256)), jnp.float32) for h, w in shapes
    ]
    for P, out, label in ((1000, 7, "box"), (100, 14, "mask")):
        wh = rng.uniform(8, 64, size=(P, 2))
        xy = rng.uniform(0, 200, size=(P, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=1), jnp.float32)

        def mk(n):
            @jax.jit
            def f(boxes, *pyr):
                def body(acc, i):
                    r = multiscale_roi_align(list(pyr), boxes + acc * 1e-9, out, strides)
                    return acc + r.sum(), ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return acc

            return f

        timed(mk, (boxes, *pyramid), f"roi {label} P={P} out={out}")


def exp_full():
    """Full model.apply vs canvas and dtype; plus a backbone-only slice."""
    import jax
    import jax.numpy as jnp

    from vima_tpu.nn.maskrcnn import MaskRCNN, ResNetBody, FPN

    rng = np.random.default_rng(2)
    model = MaskRCNN()
    for ch, cw in ((256, 512), (128, 256)):
        canvas = jnp.asarray(rng.uniform(0, 1, size=(ch, cw, 3)), jnp.float32)
        hw = jnp.asarray([ch, cw], jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), canvas, hw)

        def mk(n):
            @jax.jit
            def f(params, canvas):
                def body(acc, i):
                    out = model.apply(params, canvas + acc * 1e-9, hw)
                    return acc + out["scores"].sum(), ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return acc

            return f

        timed(mk, (params, canvas), f"full apply {ch}x{cw} fp32", n2=6)

    # backbone+fpn slice at 256x512
    body_m = ResNetBody()
    fpn_m = FPN()
    canvas = jnp.asarray(rng.uniform(0, 1, size=(256, 512, 3)), jnp.float32)
    bparams = jax.jit(body_m.init)(jax.random.PRNGKey(0), canvas[None])
    feats = jax.jit(body_m.apply)(bparams, canvas[None])
    fparams = jax.jit(fpn_m.init)(jax.random.PRNGKey(1), feats)

    def mk(n):
        @jax.jit
        def f(bparams, fparams, canvas):
            def body(acc, i):
                feats = body_m.apply(bparams, canvas[None] + acc * 1e-9)
                pyr = fpn_m.apply(fparams, feats)
                return acc + pyr[0].sum(), ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return acc

        return f

    timed(mk, (bparams, fparams, canvas), "backbone+fpn 256x512 fp32")


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".cache" / "jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = sys.argv[1:] or ["all"]
    print(f"device {jax.devices()[0].device_kind}", flush=True)
    for name, fn in {"nms": exp_nms, "roi": exp_roi, "full": exp_full}.items():
        if "all" in which or name in which:
            print(f"--- {name}", flush=True)
            fn()


if __name__ == "__main__":
    main()
