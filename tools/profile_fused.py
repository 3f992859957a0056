"""Stage-level TPU profile of the fused detect->prep->step tick.

Times each stage of bridge/fused_detect's program separately (detector
canvases, mask pasting, object extraction, policy step) at two batch
sizes, with the two-chain-length method from bench.py (raw totals at two
chain lengths cancel the dispatch+RTT constant; carry-dependent inputs
defeat CSE). Run:  python tools/profile_fused.py [--model vima-200m]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def two_chain(make_fn, args, n_short=2, n_long=12, reps=3):
    fs, fl = make_fn(n_short), make_fn(n_long)
    float(fs(*args)), float(fl(*args))
    ts, tl = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fs(*args))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fl(*args))
        tl.append(time.perf_counter() - t0)
    return float((np.median(tl) - np.median(ts)) / (n_long - n_short) * 1e3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vima-200m")
    p.add_argument("--batches", default="8,16")
    cfg = p.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).parent.parent / ".cache" / "jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vima_tpu.bridge.detector import JaxMaskRCNNDetector, _paste_segm_device
    from vima_tpu.bridge.device_prep import extract_objects_device
    from vima_tpu.nn.maskrcnn import MaskRCNN

    H, W = 128, 256
    model = MaskRCNN(
        dtype=jnp.bfloat16, post_nms_top_n=256, detections_per_img=32,
        box_nms_candidates=2048,
    )
    canvas = jnp.zeros((128, 256, 3), jnp.float32)
    hw = jnp.asarray([128, 256], jnp.float32)
    dparams = jax.jit(model.init)(jax.random.PRNGKey(0), canvas, hw)
    det = JaxMaskRCNNDetector(
        model=model, params=dparams, min_size=128, max_size=256, score_threshold=0.0
    )

    rng = np.random.default_rng(0)

    for B in (int(x) for x in cfg.batches.split(",")):
        K = B * 2  # canvases
        frames = jnp.asarray(
            rng.integers(0, 255, size=(B, 2, H, W, 3)), jnp.uint8
        )

        # --- full detector sub-graph (resize+model+paste), chunked lax.map
        from vima_tpu.bridge.fused_detect import FusedDetectStep

        class _P:  # minimal policy stand-in for segm-only build
            views = ("front", "top")

        fs = FusedDetectStep(det, _P(), max_objs=8, views=("front", "top"))
        segm_fn = fs._make_segm_fn(B, 2, H, W)

        def mk_segm(iters):
            @jax.jit
            def f(frames):
                def body(c, i):
                    fr = c ^ i.astype(jnp.uint8)  # input varies per iter (no CSE)
                    s = segm_fn(dparams, fr)
                    return c, s.sum()
                _, ss = jax.lax.scan(body, frames, jnp.arange(iters, dtype=jnp.int32))
                return ss.sum()
            return f

        t_segm = two_chain(mk_segm, (frames,))
        print(f"B={B}: segm_fn (K={K} canvases incl paste): {t_segm:.2f} ms "
              f"({t_segm / K:.2f}/canvas)", flush=True)

        # --- model.apply alone (no paste), vmapped chunk of 8
        cimg = jnp.asarray(rng.random((8, 128, 256, 3)), jnp.float32)

        def mk_model(iters):
            @jax.jit
            def f(c):
                def body(carry, i):
                    x = carry + i.astype(jnp.float32) * 1e-6
                    out = jax.vmap(lambda im: model.apply(dparams, im, hw))(x)
                    return carry, out["scores"].sum()
                _, ss = jax.lax.scan(body, c, jnp.arange(iters, dtype=jnp.int32))
                return ss.sum()
            return f

        t_model = two_chain(mk_model, (cimg,))
        print(f"  model.apply x8 canvases: {t_model:.2f} ms ({t_model / 8:.2f}/canvas)",
              flush=True)

        # --- extraction alone
        segm = jnp.asarray(rng.integers(0, 9, size=(B, 2, H, W)), jnp.int32)
        framesf = frames

        def mk_ext(iters):
            @jax.jit
            def f(frames, segm):
                def body(carry, i):
                    s = segm ^ (i % 3)
                    crops, bbox, mask = jax.vmap(
                        lambda r, s_: extract_objects_device(
                            r, s_, d_budget=32, max_objs=8
                        )
                    )(frames.astype(jnp.float32), s)
                    return carry, crops.sum(dtype=jnp.int32) + bbox.sum()
                _, ss = jax.lax.scan(body, 0, jnp.arange(iters, dtype=jnp.int32))
                return ss.sum()
            return f

        t_ext = two_chain(mk_ext, (framesf, segm))
        print(f"  extraction (B={B}, V=2, D=32): {t_ext:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
