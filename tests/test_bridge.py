"""Host bridge tests: obs preprocessing, native resize, closed-loop eval
with the fake env."""

import numpy as np
import pytest

from vima_tpu.bridge.fake_env import FakeVimaEnv
from vima_tpu.bridge.obs_prep import extract_objects, prepare_obs
from vima_tpu.native.crop_resize import (
    _resize_area_numpy,
    crop_pad_resize_batch,
    native_available,
    resize_inter_area,
)


def test_extract_objects_geometry():
    H, W = 64, 96
    rgb = np.zeros((3, H, W), dtype=np.uint8)
    segm = np.zeros((H, W), dtype=np.uint8)
    # object 1: rect at rows 10..19, cols 20..39
    rgb[:, 10:20, 20:40] = 200
    segm[10:20, 20:40] = 1
    # object 2: single pixel -> skipped (reference example.py:408-411)
    segm[50, 80] = 2
    crops, bboxes, mask = extract_objects(rgb, segm, [1, 2], max_objs=3)
    assert mask.tolist() == [True, False, False]
    xc, yc, h, w = bboxes[0]
    assert (xc, yc) == ((20 + 39) // 2, (10 + 19) // 2)
    assert (h, w) == (9, 19)  # max-min (reference uses exclusive diff)
    assert crops[0].max() > 0 and crops[1].max() == 0


def test_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for sh, sw in [(100, 73), (33, 50), (64, 64), (20, 11), (5, 5)]:
        img = rng.integers(0, 256, size=(sh, sw, 3)).astype(np.uint8)
        ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_AREA).astype(int)
        got_np = _resize_area_numpy(img, 32, 32).astype(int)
        assert np.abs(got_np - ref).max() <= 1, (sh, sw)
        if native_available():
            got_nat = resize_inter_area(img, 32, 32).astype(int)
            assert np.abs(got_nat - ref).max() <= 1, (sh, sw)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_crop_pad_resize_batch():
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, size=(3, 64, 96)).astype(np.uint8)
    boxes = np.asarray([[10, 29, 20, 49], [0, 5, 0, 5]], dtype=np.int32)
    out = crop_pad_resize_batch(frame, boxes, out=32)
    assert out.shape == (2, 3, 32, 32)
    # cross-check slot 0 against the python path
    from vima_tpu.bridge.obs_prep import crop_pad_resize

    ref0 = crop_pad_resize(frame, 10, 29, 20, 49, 32)
    assert np.abs(out[0].astype(int) - ref0.astype(int)).max() <= 1


def test_prepare_obs_shapes():
    env = FakeVimaEnv(n_objects=3, seed=0)
    obs = env.reset()
    prepared = prepare_obs(obs, env.meta_info, max_objs=5)
    for v in ("front", "top"):
        assert prepared["objects"]["cropped_img"][v].shape == (1, 5, 3, 32, 32)
        assert prepared["objects"]["bbox"][v].shape == (1, 5, 4)
        assert prepared["objects"]["mask"][v].shape == (1, 5)
        assert prepared["objects"]["mask"][v].sum() >= 1
    assert prepared["ee"].shape == (1,)


def test_detector_in_the_loop():
    """BASELINE config 3 flow: detector supplies segmentation; obj ids come
    from detections, not simulator meta."""
    from vima_tpu.bridge.detector import OracleSegmDetector

    env = FakeVimaEnv(n_objects=2, seed=3)
    obs = env.reset()
    det = OracleSegmDetector()
    obs["segm"] = det.detect(obs["rgb"], obs)
    prepared = prepare_obs(obs, None, max_objs=4)  # meta=None: ids from segm
    assert prepared["objects"]["mask"]["front"].sum() >= 1

    class FakeDetector:
        def detect(self, rgb, obs):
            # single full-frame "object"
            return {v: np.ones(f.shape[-2:], dtype=np.int32) for v, f in rgb.items()}

    obs2 = env.reset()
    obs2["segm"] = FakeDetector().detect(obs2["rgb"], obs2)
    prepared2 = prepare_obs(obs2, None, max_objs=4)
    assert prepared2["objects"]["mask"]["front"].sum() == 1


def test_closed_loop_no_recompiles_across_prompts():
    """Episodes with different prompts must reuse the compiled executables:
    word/image/prompt-length shapes are bucketed (env_loop buckets), so a
    second run_episode_batch with new prompt text adds ZERO jit cache
    entries (a stray shape costs minutes on the remote-compile service)."""
    from vima_tpu.bridge.env_loop import run_episode_batch
    from vima_tpu.bridge.tokenizer import PromptTokenizer
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import VIMAPolicy, init_params
    from vima_tpu.policy.rollout import encode_prompt, rollout_step_packed

    policy = VIMAPolicy(
        embed_dim=64, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_width=32, vit_layers=1, vit_heads=2, vit_output_dim=32,
        bbox_mlp_hidden_dim=32,
        t5_cfg=T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64),
        vocab_size=64,
    )
    params = init_params(policy)
    tok = PromptTokenizer(tokenizer_path=None, vocab_size=64)
    tok._tok = None

    envs = [FakeVimaEnv(seed=i) for i in range(2)]
    run_episode_batch(policy, params, envs, tokenize_prompt=tok, max_objs=4, capacity=64)
    n_enc, n_step = encode_prompt._cache_size(), rollout_step_packed._cache_size()
    assert n_step >= 1  # the loop really went through the packed step

    # new episode, different prompt text (different word count, same buckets)
    for env in envs:
        env.prompt = "Now please put the {dragged_obj} right into the {base_obj} quickly."
    run_episode_batch(policy, params, envs, tokenize_prompt=tok, max_objs=4, capacity=64)
    assert encode_prompt._cache_size() == n_enc
    assert rollout_step_packed._cache_size() == n_step


@pytest.mark.parametrize("family", ["gato", "gpt", "flamingo"])
def test_closed_loop_families(family):
    """The closed-loop harness drives the raw-RGB baseline families too
    (bridge.adapters): full-frame resize feed, in-stream prompt prefill for
    the decoder-only families. The reference can't run these closed-loop at
    all (its loader only builds the flagship, vima/__init__.py:10)."""
    from vima_tpu.bridge.env_loop import run_episode_batch
    from vima_tpu.bridge.tokenizer import PromptTokenizer
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import (
        VIMAFlamingoPolicy,
        VIMAGatoPolicy,
        VIMAGPTPolicy,
        init_params,
    )

    t5 = T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64)
    common = dict(
        embed_dim=64, img_size=(32, 64), vit_patch_size=16, vit_width=32,
        vit_layers=1, vit_heads=2, t5_cfg=t5, vocab_size=64,
    )
    if family == "gato":
        policy = VIMAGatoPolicy(n_layer=1, n_head=4, **common)
    elif family == "gpt":
        policy = VIMAGPTPolicy(n_layer=1, n_head=4, **common)
    else:
        policy = VIMAFlamingoPolicy(
            dt_n_layers=1, dt_n_heads=4, xattn_n_heads=4,
            perceiver_num_blocks=1, perceiver_num_self_attends_per_block=1,
            perceiver_num_self_attention_heads=4,
            perceiver_num_cross_attention_heads=4, **common,
        )
    params = init_params(policy)
    tok = PromptTokenizer(tokenizer_path=None, vocab_size=64)
    tok._tok = None

    envs = [FakeVimaEnv(seed=i) for i in range(2)]
    results = run_episode_batch(
        policy, params, envs, tokenize_prompt=tok, max_objs=4, capacity=256
    )
    assert len(results) == 2
    for r in results:
        assert r["done"]
        assert r["steps"] >= 1


def test_closed_loop_fake_env():
    """Full closed loop: fake env + tiny random policy + fault tolerance."""
    from vima_tpu.bridge.env_loop import (
        ResetFaultTolerance,
        TimeLimit,
        run_episode_batch,
    )
    from vima_tpu.bridge.tokenizer import PromptTokenizer
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import VIMAPolicy, init_params

    policy = VIMAPolicy(
        embed_dim=64, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_width=32, vit_layers=1, vit_heads=2, vit_output_dim=32,
        bbox_mlp_hidden_dim=32,
        t5_cfg=T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64),
        vocab_size=64,
    )
    params = init_params(policy)
    tok = PromptTokenizer(tokenizer_path=None, vocab_size=64)
    # force the offline fallback in CI regardless of HF cache
    tok._tok = None

    envs = [
        TimeLimit(ResetFaultTolerance(FakeVimaEnv(seed=i, fail_first_resets=i)), 2)
        for i in range(2)
    ]
    # capacity=None: auto-sized to the episode limit (bucketed)
    results = run_episode_batch(policy, params, envs, tokenize_prompt=tok, max_objs=4)
    assert len(results) == 2
    for r in results:
        assert r["done"]
        assert r["steps"] >= 1
        assert r["p50_step_latency_ms"] is not None


def test_vendored_tokenizer_probe(tmp_path, monkeypatch):
    """PromptTokenizer loads the vendored package asset (written by
    python -m vima_tpu.bridge.vendor_tokenizer) before any network path.
    Uses a small real `tokenizers` model built offline, so the full
    json-load + AddedToken plumbing is exercised without the t5 vocab."""
    import vima_tpu.bridge.tokenizer as tok_mod
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ["put", "the", "into", "sweep", "any", "."]
    vocab = {w: i for i, w in enumerate(["<unk>"] + words)}
    t = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    asset = tmp_path / "t5-base-tokenizer.json"
    t.save(str(asset))

    monkeypatch.setattr(tok_mod, "VENDORED_TOKENIZER", asset)
    ptok = tok_mod.PromptTokenizer(tokenizer_path=None)
    assert not ptok.using_fallback
    ptok.require_real()  # must not raise with the vendored asset present
    ids, types, names = ptok("put the {dragged_obj} into the {base_obj} .")
    assert names == ["dragged_obj", "base_obj"]  # brace-stripped asset keys
    assert types.count(1) == 2
    # placeholder AddedTokens got ids past the base vocab
    assert len(ids) == types.count(0)


def test_offline_flag_still_prefers_vendored_asset(tmp_path, monkeypatch):
    """``offline=True`` means "never touch the network / HF cache" — it must
    NOT bypass a present vendored asset and force the hash fallback (a run
    that could have used the real vocab would then refuse at require_real)."""
    import vima_tpu.bridge.tokenizer as tok_mod
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {w: i for i, w in enumerate(["<unk>", "lift", "the", "block"])}
    t = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    asset = tmp_path / "t5-base-tokenizer.json"
    t.save(str(asset))

    monkeypatch.setattr(tok_mod, "VENDORED_TOKENIZER", asset)
    ptok = tok_mod.PromptTokenizer(tokenizer_path=None, offline=True)
    assert not ptok.using_fallback
    ptok.require_real()  # must not raise: the vendored vocab is offline
    # and with no vendored asset, offline=True still means hash fallback
    monkeypatch.setattr(tok_mod, "VENDORED_TOKENIZER", tmp_path / "missing.json")
    ptok2 = tok_mod.PromptTokenizer(tokenizer_path=None, offline=True)
    assert ptok2.using_fallback


def test_golden_t5_ids_if_vendored():
    """When the real t5-base asset is vendored, the production tokenizer
    must reproduce the recorded golden encoding exactly (ids, types and
    placeholder order — reference scripts/example.py:29-75)."""
    import json

    import pytest

    from vima_tpu.bridge.tokenizer import VENDORED_TOKENIZER, PromptTokenizer
    from vima_tpu.bridge.vendor_tokenizer import GOLDEN_PATH

    if not (VENDORED_TOKENIZER.is_file() and GOLDEN_PATH.is_file()):
        pytest.skip("t5-base tokenizer not vendored on this host (zero egress)")
    golden = json.loads(GOLDEN_PATH.read_text())
    ptok = PromptTokenizer(tokenizer_path=None)
    ids, types, names = ptok(golden["prompt"])
    assert [int(i) for i in ids] == golden["word_ids"]
    assert [int(t) for t in types] == golden["token_types"]
    assert list(names) == golden["placeholders"]


def _tiny_vima_policy():
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import VIMAPolicy, init_params

    policy = VIMAPolicy(
        embed_dim=64, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_width=32, vit_layers=1, vit_heads=2, vit_output_dim=32,
        bbox_mlp_hidden_dim=32,
        t5_cfg=T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64),
        vocab_size=64,
    )
    return policy, init_params(policy)


class CrashOnceEnv(FakeVimaEnv):
    """Deterministic env whose step() raises exactly once at ``crash_at``
    (before advancing); reset() reseeds the obs stream so the restarted
    episode is reproducible."""

    def __init__(self, *, crash_at: int, **kw):
        super().__init__(**kw)
        self._crash_at = crash_at
        self._crashed = False

    def reset(self):
        self._rng = np.random.default_rng(self.task.seed)
        return super().reset()

    def step(self, action):
        if not self._crashed and self._steps == self._crash_at:
            self._crashed = True
            raise RuntimeError("synthetic simulator crash")
        return super().step(action)


def test_fault_rejoin_env_finishes_episode():
    """A step() crash re-resets the env and REJOINS it: its cache slots are
    mask-restored to the post-encode snapshot and the restarted episode runs
    to its own terminal, while the healthy env is untouched
    (env_loop docstring's fault-isolation promise, VERDICT r2 weak #7)."""
    from vima_tpu.bridge.env_loop import run_episode_batch
    from vima_tpu.bridge.tokenizer import PromptTokenizer

    policy, params = _tiny_vima_policy()
    tok = PromptTokenizer(tokenizer_path=None, vocab_size=64)
    tok._tok = None

    ms = 3
    envs = [
        CrashOnceEnv(crash_at=1, seed=0, oracle_max_steps=ms, n_objects=3),
        FakeVimaEnv(seed=1, oracle_max_steps=ms, n_objects=3),
    ]
    results = run_episode_batch(
        policy, params, envs, tokenize_prompt=tok, max_objs=4, capacity=128
    )
    crashed, healthy = results
    assert crashed["restarts"] == 1
    assert crashed["done"], "restarted env must finish its (fresh) episode"
    # 1 pre-crash step + a full fresh episode after the re-reset
    assert crashed["steps"] == 1 + ms
    assert healthy["restarts"] == 0 and healthy["done"] and healthy["steps"] == ms


def test_fault_rejoin_decoder_only_keeps_prefill():
    """Decoder-only families prefill the prompt into the causal cache; the
    re-join snapshot must preserve those slots (a blanket slot clear would
    silently drop the prompt)."""
    from vima_tpu.bridge.env_loop import run_episode_batch
    from vima_tpu.bridge.tokenizer import PromptTokenizer
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import VIMAGPTPolicy, init_params

    t5 = T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64)
    policy = VIMAGPTPolicy(
        n_layer=1, n_head=4, embed_dim=64, img_size=(32, 64), vit_patch_size=16,
        vit_width=32, vit_layers=1, vit_heads=2, t5_cfg=t5, vocab_size=64,
    )
    params = init_params(policy)
    tok = PromptTokenizer(tokenizer_path=None, vocab_size=64)
    tok._tok = None

    ms = 3
    envs = [
        CrashOnceEnv(crash_at=1, seed=0, oracle_max_steps=ms, n_objects=3),
        FakeVimaEnv(seed=1, oracle_max_steps=ms, n_objects=3),
    ]
    results = run_episode_batch(
        policy, params, envs, tokenize_prompt=tok, max_objs=4, capacity=256
    )
    assert results[0]["restarts"] == 1 and results[0]["done"]
    assert results[0]["steps"] == 1 + ms


def test_n_streams_param_and_autotune():
    """Explicit n_streams splits the batch into that many pipelined streams;
    n_streams=None auto-tunes from the previous call's measured timings,
    capped by the min-per-stream-batch rule (B=4 < 2*_MIN_STREAM_BATCH ->
    1 stream: narrow streams serialize their fetches on the single-socket
    tunnel, round-4 measurement) and records the choice in the results."""
    from vima_tpu.bridge import env_loop
    from vima_tpu.bridge.env_loop import run_episode_batch
    from vima_tpu.bridge.tokenizer import PromptTokenizer

    policy, params = _tiny_vima_policy()
    tok = PromptTokenizer(tokenizer_path=None, vocab_size=64)
    tok._tok = None

    def make_envs():
        return [FakeVimaEnv(seed=i, oracle_max_steps=3, n_objects=3) for i in range(4)]

    r4 = run_episode_batch(
        policy, params, make_envs(), tokenize_prompt=tok, max_objs=4,
        capacity=128, n_streams=4,
    )
    assert all(r["n_streams"] == 4 for r in r4)
    assert all(r["done"] for r in r4)

    env_loop._STREAM_TUNE.clear()
    r_auto = run_episode_batch(
        policy, params, make_envs(), tokenize_prompt=tok, max_objs=4, capacity=128
    )
    assert all(r["n_streams"] == 1 for r in r_auto)  # min-batch cap at B=4
    # the call recorded tune stats; a second auto call must pick a divisor
    # of B within the stream caps
    key = (id(policy), None, 4)
    assert key in env_loop._STREAM_TUNE
    n = env_loop._auto_streams(key, 4)
    assert n == 1
    # a large batch may split, but never below _MIN_STREAM_BATCH envs per
    # stream or past _MAX_STREAMS (the cap is HARD: divisor snapping only
    # considers divisors within both caps, ties break to fewer streams)
    for B in (16, 32, 64):
        n = env_loop._auto_streams(("nokey", B), B)
        assert 1 <= n <= env_loop._MAX_STREAMS
        assert B // n >= env_loop._MIN_STREAM_BATCH


def test_segm_bboxes_native_matches_numpy():
    """The C segm-bbox pass must produce the numpy pipeline's exact dict
    (integer extrema + counts). Skips only if the lib predates the symbol."""
    import numpy as np
    import pytest

    from vima_tpu.native.crop_resize import segm_bboxes_native

    rng = np.random.default_rng(3)
    segm = rng.integers(0, 11, size=(64, 128)).astype(np.uint8)
    nat = segm_bboxes_native(segm)
    if nat is None:
        pytest.skip("native lib not built with segm_bboxes_i32")
    ys, xs = np.nonzero(segm)
    ids = segm[ys, xs]
    order = np.argsort(ids, kind="stable")
    ids_s, ys_s, xs_s = ids[order], ys[order], xs[order]
    uniq, starts = np.unique(ids_s, return_index=True)
    ref = {
        int(u): (
            int(np.minimum.reduceat(ys_s, starts)[i]),
            int(np.maximum.reduceat(ys_s, starts)[i]),
            int(np.minimum.reduceat(xs_s, starts)[i]),
            int(np.maximum.reduceat(xs_s, starts)[i]),
            int(np.diff(np.append(starts, len(ids_s)))[i]),
        )
        for i, u in enumerate(uniq)
    }
    assert nat == ref
    assert segm_bboxes_native(np.zeros((4, 4), np.uint8)) == {}


def test_closed_loop_batched_detector():
    """A batch-capable detector must be driven through ONE detect_batch
    call per step round (not one detect per env), and the loop must finish
    episodes with detector-derived object ids."""
    from vima_tpu.bridge.env_loop import run_episode_batch
    from vima_tpu.bridge.tokenizer import PromptTokenizer
    from vima_tpu.nn.t5 import T5Config
    from vima_tpu.policy import VIMAPolicy, init_params

    policy = VIMAPolicy(
        embed_dim=64, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        vit_width=32, vit_layers=1, vit_heads=2, vit_output_dim=32,
        bbox_mlp_hidden_dim=32,
        t5_cfg=T5Config(d_model=48, d_ff=96, num_layers=1, num_heads=4, d_kv=12, vocab_size=64),
        vocab_size=64,
    )
    params = init_params(policy)
    tok = PromptTokenizer(tokenizer_path=None, vocab_size=64)
    tok._tok = None

    calls = {"batch": 0, "single": 0, "batch_envs": []}

    class BatchDetector:
        def detect(self, rgb, obs):
            calls["single"] += 1
            return obs["segm"]

        def detect_batch(self, rgb_list, obs_list=None):
            calls["batch"] += 1
            calls["batch_envs"].append(len(rgb_list))
            return [
                {v: np.ones(f.shape[-2:], dtype=np.int32) for v, f in rgb.items()}
                for rgb in rgb_list
            ]

    envs = [FakeVimaEnv(seed=i, oracle_max_steps=3) for i in range(2)]
    results = run_episode_batch(
        policy, params, envs, tokenize_prompt=tok, max_objs=4, capacity=128,
        detector=BatchDetector(), pipeline=False,
    )
    assert all(r["done"] for r in results)
    assert calls["single"] == 0  # never fell back to per-env detection
    assert calls["batch"] >= 2  # initial obs + at least one step round
    assert calls["batch_envs"][0] == 2  # all envs in one call


def test_batched_native_prep_matches_per_env_loop():
    """prepare_objects_frames (one native call for N env-view frames) vs
    the per-frame extract_objects path: masks/bboxes exact, crops within
    the +-1 native-vs-cv2 INTER_AREA rounding. Skips pre-rebuild."""
    from vima_tpu.native.crop_resize import prepare_objects_frames
    from vima_tpu.bridge.obs_prep import extract_objects
    from vima_tpu.bridge.fake_env import FakeVimaEnv

    frames, segms, ids = [], [], []
    for s in range(3):
        env = FakeVimaEnv(seed=s, n_objects=4, img_hw=(64, 128))
        obs = env.reset()
        for v in env.views:
            frames.append(np.asarray(obs["rgb"][v]))
            segms.append(np.asarray(obs["segm"][v]))
            ids.append(list(env.meta_info["obj_id_to_info"].keys()) + [99])
    out = prepare_objects_frames(frames, segms, ids, max_objs=3)
    if out is None:
        pytest.skip("native lib predates prepare_objects_frames_u8")
    crops, bboxes, masks = out
    for i in range(len(frames)):
        ch, bh, mh = extract_objects(frames[i], segms[i], ids[i], max_objs=3)
        np.testing.assert_array_equal(masks[i], mh, err_msg=str(i))
        np.testing.assert_array_equal(bboxes[i], bh, err_msg=str(i))
        assert np.abs(crops[i].astype(int) - ch.astype(int)).max() <= 1, i
