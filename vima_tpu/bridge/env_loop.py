"""Closed-loop evaluation: host envs <-> jitted TPU policy.

Replaces the reference harness loop (scripts/example.py:100-240) with:
  * KV-cached per-step policy calls (no full-sequence recompute);
  * N parallel envs batched into ONE policy step (the reference runs one
    env, one forward per step) — episodes shard naturally over the batch
    (and over a ``dp`` mesh axis when one is provided);
  * ONE bucketed prompt encode for the whole env batch: word/image counts
    and the assembled prompt length are padded to fixed buckets, so new
    episodes with different prompts reuse the compiled executable (the
    reference recompiles nothing because it never compiles; here a stray
    shape costs minutes on the remote-compile service);
  * an N-stream software pipeline: while the device runs one sub-batch's
    policy step, the host steps the other sub-batches' simulators and preps
    their next observations (survey §7 "host/device pipelining"). The
    stream count is a parameter; ``n_streams=None`` auto-tunes it from the
    previous call's measured per-dispatch wall vs device-step time
    (``ceil(period / device_step)``, the count that keeps the device fed
    while each stream waits out the host<->device round trip);
  * done envs stop paying host work (no env.step / obs prep; their batch
    slot replays the last prepared obs to keep device shapes static);
  * per-env fault isolation: an env whose ``step`` raises is re-reset and
    REJOINS the batch — its cache slots are mask-cleared and its positions/
    action state restart at zero (numerically a fresh episode against the
    already-encoded prompt), so one crashing simulator costs one episode
    restart, not the batch. If the reset itself fails, the env is marked
    done-failed and its slot replays (last-resort isolation);
  * reset fault tolerance + time limits matching the reference wrappers
    (example.py:476-496);
  * structured per-episode metrics (JSONL-able dicts) — the reference has
    none (survey §5 "metrics").
"""

from __future__ import annotations

import concurrent.futures
import functools
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vima_tpu.bridge.adapters import get_adapter
from vima_tpu.bridge.obs_prep import stack_obs_batch
from vima_tpu.bridge.prompt_prep import prompt_gather_indices
from vima_tpu.policy.base import (
    N_DISCRETE_ROT_BINS,
    N_DISCRETE_X_BINS,
    N_DISCRETE_Y_BINS,
)
from vima_tpu.policy.rollout import unpack_actions_np

# Shape buckets for the episode-start prompt encode. Word/image counts pad
# the flat gather SOURCE (never attended, indices skip them), and the
# assembled prompt length pads the sequence TAIL (masked, after all real
# tokens) — both are numerics-neutral. The per-asset object capacity is NOT
# bucketed: interior masked slots shift T5's relative positions, so it must
# match the reference's max-objects-across-assets exactly
# (vima/policy/vima_policy.py:168-231).
PROMPT_WORD_BUCKET = 32
PROMPT_IMG_BUCKET = 2
PROMPT_LEN_BUCKET = 32


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# --- stream auto-tuning -----------------------------------------------------
# Keyed by (policy id, total envs): the previous call's measured per-stream
# step period and device-step estimate. A closed-loop env step's critical
# path is irreducibly  device_step + fetch_RTT + host_work  (the action must
# cross the tunnel before the simulator can produce the next obs), so extra
# streams only help until the device is fed: n ~= ceil(period / device_step).
#
# Two HARD caps bound the tuned count (round-4 measurements):
#   * 4 streams — the tunneled link is one socket, so concurrent fetches
#     largely SERIALIZE: 8 batch-1 streams at 8 envs measured 23 env-steps/s
#     (every dispatch paying the full ~25 ms RTT back to back) vs ~180 for
#     the same work in 1-2 streams. Past double/triple/quad buffering, extra
#     streams only add socket + single-core-GIL contention. (4, not 3: the
#     round-4 64-env optimum — 739 env-steps/s — ran 4 streams of 16.)
#   * per-stream batch >= 8 once B allows it — device throughput is
#     strongly sub-linear in batch (B=64 is ~6k env-steps/s, B=1 is ~1.3k),
#     so slicing a big batch into narrow streams wastes the chip.
_STREAM_TUNE: Dict = {}
_MAX_STREAMS = 4
_MIN_STREAM_BATCH = 8


@jax.jit
def _tiny(x):
    return x + 1


def _measure_rtt() -> float:
    """One tiny jitted fetch: the pure host<->device round trip."""
    float(_tiny(jnp.zeros(())))  # compile/settle
    t0 = time.perf_counter()
    float(_tiny(jnp.zeros(())))
    return time.perf_counter() - t0


def _auto_streams(tune_key, B: int) -> int:
    rec = _STREAM_TUNE.get(tune_key)
    if rec is None or rec["device_step"] <= 0:
        target = 2
    else:
        target = int(np.ceil(rec["period"] / rec["device_step"]))
    target = max(1, min(target, _MAX_STREAMS, B, max(1, B // _MIN_STREAM_BATCH)))
    # prefer an equal split (unequal sub-batches compile extra executables);
    # only divisors within the HARD caps are candidates, and ties snap to
    # the SMALLER divisor — the tunneled link serializes concurrent fetches,
    # so when in doubt fewer, wider streams win (see _MAX_STREAMS above)
    divisors = [
        n
        for n in range(1, B + 1)
        if B % n == 0 and n <= _MAX_STREAMS and (n == 1 or B // n >= _MIN_STREAM_BATCH)
    ]
    return min(divisors, key=lambda n: (abs(n - target), n))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _slice_state(state, start: int, size: int):
    """Slice a whole-batch RolloutState into one stream's [start, start+size)
    sub-batch (scalar leaves — write_index — pass through). The episode-start
    prompt encode runs ONCE for the full env batch (one dispatch instead of
    one per stream; round-4 paid ~34 ms wall per 4-env group, ~16 serial
    dispatches at 64 envs) and the streams carve their states out of it."""
    return jax.tree_util.tree_map(
        lambda x: x if x.ndim == 0 else jax.lax.slice_in_dim(x, start, start + size, axis=0),
        state,
    )


@jax.jit
def _reset_slots(state, reset_mask, init_slot_mask, init_pos_count):
    """Per-slot state reset for fault re-join (reset_mask: bool (B,)):
    restores the env's slot-validity mask and position counter to their
    post-prompt-encode snapshot and zeroes its action state. Stale cache
    contents stay, but masked slots contribute exactly 0 probability
    (fp32-min additive bias), so the restarted episode is numerically fresh
    against the already-encoded prompt — including decoder-only families,
    whose prompt prefill slots the snapshot preserves. Compiled only when a
    fault occurs."""
    zeroed_actions = {
        k: jnp.where(reset_mask[:, None], 0, v) for k, v in state.last_action.items()
    }
    return state.replace(
        slot_mask=jnp.where(reset_mask[:, None], init_slot_mask, state.slot_mask),
        pos_count=jnp.where(reset_mask, init_pos_count, state.pos_count),
        has_action=jnp.where(reset_mask, False, state.has_action),
        last_action=zeroed_actions,
    )


class ResetFaultTolerance:
    """Retry reset with seed bumps (reference example.py:476-491)."""

    max_retries = 10

    def __init__(self, env):
        self.env = env

    def reset(self):
        for _ in range(self.max_retries):
            try:
                return self.env.reset()
            except Exception:
                current_seed = getattr(self.env.unwrapped.task, "seed", 0)
                self.env.global_seed = current_seed + 1
        raise RuntimeError(f"Failed to reset environment after {self.max_retries} retries")

    def __getattr__(self, name):
        return getattr(self.env, name)


class TimeLimit:
    """oracle_max_steps + bonus_steps cap (reference example.py:494-496)."""

    def __init__(self, env, bonus_steps: int = 2):
        self.env = env
        self._max = env.task.oracle_max_steps + bonus_steps
        self._elapsed = 0

    def reset(self):
        self._elapsed = 0
        return self.env.reset()

    def step(self, action):
        obs, rew, done, info = self.env.step(action)
        self._elapsed += 1
        if self._elapsed >= self._max:
            done = True
        return obs, rew, done, info

    def __getattr__(self, name):
        return getattr(self.env, name)


def _pad_axis(arr: np.ndarray, axis: int, size: int) -> np.ndarray:
    pad = size - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


def _encode_prompt_group(
    adapter,
    params,
    tokenized: Sequence[tuple],
    capacity: int,
    *,
    n_objs: int,
    n_words_pad: int,
    n_imgs_pad: int,
    lp_pad: int,
):
    """One bucketed, batched prompt encode for a group of envs.

    tokenized: per-env (word_ids int32[], token_types, image_batch, obj_masks)
    from tokenize_prompt + adapter.prep_assets. The flat word/image gather
    sources are concatenated across the group in prompt order (the gather
    index builder consumes them with running pointers) and padded to the
    bucket sizes; for the flagship, per-asset object slots are padded to the
    group-wide ``n_objs`` (reference max-across-assets semantics); the RGB
    families have a fixed per-image token count instead.
    """
    word_flat = np.concatenate([t[0] for t in tokenized]) if tokenized else np.zeros(0, np.int32)
    n_words_real = len(word_flat)
    word_flat = _pad_axis(word_flat.astype(np.int32), 0, n_words_pad)

    types_all = [t[1] for t in tokenized]
    image_cat, obj_masks_cat, n_imgs_eff = adapter.cat_images(tokenized, n_objs, n_imgs_pad)
    tokens_per_img = (
        n_objs * len(adapter.views) if adapter.kind == "objects" else n_objs
    )

    idx, mask = prompt_gather_indices(
        types_all,
        n_words_pad,
        obj_masks_cat,
        tokens_per_img,
        pad_to=lp_pad,
        n_imgs=n_imgs_eff,
    )
    assert n_words_real <= n_words_pad
    gather = {"idx": jnp.asarray(idx), "mask": jnp.asarray(mask)}
    return adapter.encode(
        params,
        jnp.asarray(word_flat),
        jax.tree_util.tree_map(jnp.asarray, image_cat),
        gather,
        capacity,
    )


def _actions_to_env(actions_np: Dict[str, np.ndarray], lo: np.ndarray, hi: np.ndarray):
    """Host-side discrete -> env action conversion in pure numpy (one tiny
    array pass; the jnp versions in policy.base are for jit paths — eager
    device ops here would pay a tunnel round-trip per env per step).
    De-discretize per reference vima_policy.py:301-322, then bound per
    scripts/example.py:199-234."""
    pos_div = np.asarray([N_DISCRETE_X_BINS, N_DISCRETE_Y_BINS], np.float32)
    out = {}
    for p in ("pose0", "pose1"):
        pos = actions_np[f"{p}_position"].astype(np.float32) / pos_div
        rot = actions_np[f"{p}_rotation"].astype(np.float32) / N_DISCRETE_ROT_BINS
        out[f"{p}_position"] = np.clip(pos * (hi - lo) + lo, lo, hi)
        out[f"{p}_rotation"] = np.clip(rot * 2.0 - 1.0, -1.0, 1.0)
    return out


CAPACITY_BUCKET = 128  # auto-sized KV capacities round up to this
MAX_CAPACITY = 512  # the architecture's n_positions cap (xattn_gpt.py:18)


def run_episode_batch(
    policy,
    params,
    envs: Sequence,
    *,
    tokenize_prompt: Callable[[str], tuple],
    max_objs: int = 10,
    capacity: Optional[int] = None,
    max_steps: Optional[int] = None,
    detector=None,
    env_workers: int = 0,
    pipeline: bool = True,
    n_streams: Optional[int] = None,
) -> List[Dict]:
    """Run one episode on each env, batched through one jitted policy.

    Works for all four policy families (the flagship's cropped-object feed
    and the baselines' raw-RGB feed) via ``bridge.adapters.get_adapter``.
    All envs share prompt/object capacity buckets (padded), so repeat calls
    with different prompts hit the compile cache. With ``pipeline`` and
    >=2 envs, the batch is split into ``n_streams`` streams whose policy
    steps and host work (simulator stepping + obs prep) overlap;
    ``n_streams=None`` auto-tunes the count from the previous call's
    measured step period vs device-step time (see ``_auto_streams``).

    tokenize_prompt(prompt) -> (token_ids, token_types, placeholder_names):
      token_types[i]==0 for word i (consuming token_ids in order), ==1 for a
      placeholder (consuming placeholder_names in order).

    Returns one metrics dict per env.
    """
    B = len(envs)
    t_start = time.perf_counter()
    adapter = get_adapter(policy)

    # KV-cache capacity contract (see policy/rollout.py::rollout_step):
    # fail before the expensive prompt encode, not after. (Decoder-only
    # prefill slots are re-checked below once the prompt length is known.)
    # capacity=None auto-sizes to the episode limit, bucketed — VIMA-Bench
    # episodes are short (oracle_max_steps + 2, reference example.py:494-496),
    # so attending over the architecture's full 512-slot cap every step
    # would waste 2-4x cache-attend FLOPs and HBM traffic.
    _limit = max_steps or max(env.task.oracle_max_steps + 2 for env in envs)
    _chunk = 1 + adapter.chunk_obs_tokens(max_objs)
    if capacity is not None and _limit * _chunk > capacity:
        raise ValueError(
            f"episode limit {_limit} x {_chunk}-token chunks exceeds KV "
            f"capacity {capacity}; raise capacity= or lower max_steps/max_objs"
        )

    # --- reset + tokenize + asset prep (host)
    obs_list = [env.reset() for env in envs]
    tokenized = []
    for env in envs:
        ids, types, names = tokenize_prompt(env.prompt)
        image_batch, obj_masks = adapter.prep_assets(env.prompt_assets, names)
        tokenized.append((np.asarray(ids, np.int32), types, image_batch, obj_masks))

    # --- split into streams, then one bucketed encode per stream
    views = adapter.views
    # detector identity is part of the tune key: the fused detector tick
    # has a very different device/host balance than the policy-only tick
    tune_key = (id(policy), id(detector) if detector is not None else None, B)
    if not pipeline or B < 2:
        n_streams = 1
    elif n_streams is None:
        n_streams = _auto_streams(tune_key, B)
    n_streams = max(1, min(int(n_streams), B))
    half = (B + n_streams - 1) // n_streams
    groups = [list(range(i, min(i + half, B))) for i in range(0, B, half)]

    n_objs = adapter.group_img_tokens(tokenized)
    tokens_per_img = n_objs * len(views) if adapter.kind == "objects" else n_objs
    # whole-batch buckets: the prompt encode runs ONCE for all B envs
    n_words_pad = _ceil_to(
        sum(len(t[0]) for t in tokenized) or 1, PROMPT_WORD_BUCKET
    )
    n_imgs_pad = _ceil_to(
        max(sum(adapter.n_imgs(t[2]) for t in tokenized), 1), PROMPT_IMG_BUCKET
    )
    lp_req = max(
        sum(1 if t == 0 else tokens_per_img for t in types) for _, types, _, _ in tokenized
    )
    lp_pad = _ceil_to(max(lp_req, 1), PROMPT_LEN_BUCKET)

    # decoder-only families prefill [prompt | sep] into the same causal cache
    prefill = adapter.prefill_slots(lp_pad)
    need = prefill + _limit * _chunk
    if capacity is None:
        capacity = min(MAX_CAPACITY, _ceil_to(need, CAPACITY_BUCKET))
    if need > capacity:
        raise ValueError(
            f"prompt prefill ({prefill} slots) + episode limit {_limit} x "
            f"{_chunk}-token chunks exceeds KV capacity {capacity}; raise "
            "capacity= or lower max_steps/max_objs"
        )

    # ONE bucketed encode for the whole env batch (one dispatch; round 4
    # encoded per stream — ~16 serial ~34 ms dispatches at 64 envs), then
    # each stream slices its sub-batch state out of it.
    state_all = _encode_prompt_group(
        adapter,
        params,
        tokenized,
        capacity,
        n_objs=n_objs,
        n_words_pad=n_words_pad,
        n_imgs_pad=n_imgs_pad,
        lp_pad=lp_pad,
    )
    streams = []
    for g in groups:
        state = (
            state_all if len(groups) == 1 else _slice_state(state_all, g[0], len(g))
        )
        streams.append(
            {
                "ids": g,
                "state": state,
                "inflight": None,
                "steps": 0,
                # post-encode snapshots for fault re-join (_reset_slots);
                # copies, because the step functions donate the state buffers
                "init_slot_mask": jnp.copy(state.slot_mask),
                "init_pos_count": jnp.copy(state.pos_count),
            }
        )
    del state_all

    results = [
        {"steps": 0, "success": False, "done": False, "restarts": 0, "step_latencies": []}
        for _ in range(B)
    ]
    done = np.zeros(B, dtype=bool)
    rtt = _measure_rtt()
    fetch_dts: List[float] = []  # stream-0 steady-state fetch walls (tuning)
    pool = (
        concurrent.futures.ThreadPoolExecutor(env_workers) if env_workers > 1 else None
    )

    # detector-in-the-loop (BASELINE config 3, flagship only): replace
    # simulator segmentation; object ids come from the detections. Three
    # tiers, best available first:
    #   * FUSED (JaxMaskRCNNDetector.make_fused_step): detector + on-device
    #     crop prep + policy step in ONE dispatch per stream tick — raw
    #     uint8 frames up, packed actions down, zero host crop work;
    #   * batched (detect_batch): one detector jit per step round for all
    #     envs' frames, host crops — two tunnel crossings per tick;
    #   * per-env detect inside prep_obs (host-paste/torch detectors).
    fused_step = None
    if detector is not None and adapter.kind == "objects" and hasattr(
        detector, "make_fused_step"
    ):
        fused_step = detector.make_fused_step(
            policy, max_objs=max_objs, views=views
        )
    batched_det = (
        fused_step is None
        and detector is not None
        and hasattr(detector, "detect_batch")
        and adapter.kind == "objects"
    )

    if fused_step is not None:
        from vima_tpu.bridge.fused_detect import frames_feed

        def _prep(b, obs):
            return frames_feed(obs, views)

    else:

        def _prep(b, obs):
            return adapter.prep_obs(
                obs, envs[b].meta_info, max_objs=max_objs,
                detector=None if batched_det else detector,
            )

    # oracle-segm fast tier: the whole segm->bbox->crop pipeline for a
    # stream's envs x views in ONE native call per tick (the per-env Python
    # loop is GIL-bound and was the 128-env bottleneck — round-4 VERDICT
    # item 6; crops match the per-env path within the +-1 native-vs-cv2
    # INTER_AREA rounding, bboxes/masks exactly)
    from vima_tpu.native.crop_resize import prepare_objects_frames

    batched_host = (
        fused_step is None
        and not batched_det
        and detector is None
        and adapter.kind == "objects"
    )

    def _batch_host_prep(pairs):
        frames, segms, ids = [], [], []
        for b, obs in pairs:
            obj_ids = list(envs[b].meta_info["obj_id_to_info"].keys())
            for v in views:
                frames.append(np.asarray(obs["rgb"][v]))
                segms.append(np.asarray(obs["segm"][v]))
                ids.append(obj_ids)
        out = prepare_objects_frames(frames, segms, ids, max_objs=max_objs)
        if out is None:  # lib/symbol unavailable or hostile geometry
            for b, obs in pairs:
                prepared[b] = _prep(b, obs)
            return
        crops, bboxes, masks = out
        V = len(views)
        for i, (b, obs) in enumerate(pairs):
            objects = {"cropped_img": {}, "bbox": {}, "mask": {}}
            for vi, v in enumerate(views):
                k = i * V + vi
                objects["cropped_img"][v] = crops[k][None]
                objects["bbox"][v] = bboxes[k][None]
                objects["mask"][v] = masks[k][None]
            prepared[b] = {
                "objects": objects,
                "ee": np.asarray([obs["ee"]], dtype=np.int32),
            }

    def _batch_detect_prep(pairs):
        """pairs: [(b, obs)] -> fills prepared[b] with detector-segm obs."""
        segs = detector.detect_batch([obs["rgb"] for _, obs in pairs])
        for (b, obs), seg in zip(pairs, segs):
            obs["segm"] = seg
            # meta=None: object ids come from the detections (adapter's
            # detector flow), not the simulator's ground-truth id universe
            prepared[b] = adapter.prep_obs(obs, None, max_objs=max_objs)

    # deferred (whole-group) prep tier, if any: batched detector or batched
    # native host prep — envs collect into one call per stream tick
    _deferred_prep = (
        _batch_detect_prep if batched_det else (_batch_host_prep if batched_host else None)
    )

    prepared = [None] * B
    if _deferred_prep is not None:
        _deferred_prep([(b, obs_list[b]) for b in range(B)])
    else:
        prepared = [_prep(b, obs_list[b]) for b in range(B)]

    def _dispatch(s):
        """Async policy step for one stream (jax dispatch returns before the
        device finishes; the other stream's host work overlaps)."""
        if fused_step is not None:
            frames = np.stack([prepared[b]["frames"] for b in s["ids"]])
            ee = np.asarray([prepared[b]["ee"] for b in s["ids"]], np.int32)
            actions, s["state"] = fused_step(params, s["state"], frames, ee)
        else:
            batch = stack_obs_batch([prepared[b] for b in s["ids"]])
            actions, s["state"] = adapter.step(
                params, s["state"], jax.tree_util.tree_map(jnp.asarray, batch)
            )
        s["inflight"] = actions

    def _env_task(args):
        """Simulator step + next obs prep for one env (worker pool: PyBullet
        stepping and crop/resize are the host bottleneck and overlap across
        envs and with the device)."""
        i, b, env_action = args
        env = envs[b]
        try:
            obs, _, d, info = env.step(env_action)
        except Exception:
            # per-env fault isolation: re-reset and REJOIN — the env restarts
            # its episode in place (its cache slots are mask-cleared by
            # _complete via reset_slots). ResetFaultTolerance (if wrapped)
            # retries the reset itself.
            try:
                obs = env.reset()
            except Exception:
                # last resort: reset won't come back either — mark failed,
                # keep the batch alive
                return b, obs_list[b], True, {"success": False}, None, False
            return (
                b, obs, False, {},
                None if _deferred_prep is not None else _prep(b, obs), True,
            )
        prep = None if (d or _deferred_prep is not None) else _prep(b, obs)
        return b, obs, d, info, prep, False

    def _complete(s):
        """Fetch the stream's packed actions (ONE D2H transfer — blocks on
        its device step), then the host tail: env stepping + obs prep."""
        t0 = time.perf_counter()
        actions_np = unpack_actions_np(s["inflight"])
        dt = time.perf_counter() - t0
        s["inflight"] = None

        tasks = []
        for i, b in enumerate(s["ids"]):
            if done[b]:
                continue
            bounds = envs[b].meta_info["action_bounds"]
            env_action = _actions_to_env(
                {k: v[i] for k, v in actions_np.items()},
                np.asarray(bounds["low"], np.float32),
                np.asarray(bounds["high"], np.float32),
            )
            tasks.append((i, b, env_action))
        stepped = (
            list(pool.map(_env_task, tasks))
            if pool is not None and len(tasks) > 1
            else [_env_task(t) for t in tasks]
        )
        restarted = []
        pending = []  # deferred-prep envs awaiting the whole-group call
        for b, obs, d, info, prep, was_restart in stepped:
            results[b]["step_latencies"].append(dt)
            obs_list[b] = obs
            if was_restart:
                results[b]["restarts"] += 1
                restarted.append(b)
                if prep is None and not done[b]:
                    pending.append((b, obs))
                else:
                    prepared[b] = prep
                continue  # the crashed step advanced nothing
            results[b]["steps"] += 1
            if d:
                done[b] = True
                results[b]["done"] = True
                results[b]["success"] = bool(info.get("success", False))
            elif prep is None:
                pending.append((b, obs))
            else:
                prepared[b] = prep
        if pending:
            _deferred_prep(pending)
        if restarted:
            reset_mask = jnp.asarray(
                np.isin(np.asarray(s["ids"]), restarted), bool
            )
            s["state"] = _reset_slots(
                s["state"], reset_mask, s["init_slot_mask"], s["init_pos_count"]
            )
        s["steps"] += 1
        if s is streams[0] and s["steps"] > 2:
            fetch_dts.append(dt)

    # Stream step budget: the episode limit, extended to whatever the KV
    # capacity actually holds (the bucketed capacity usually has slack) so a
    # fault-restarted env can finish its fresh episode. Every env still stops
    # at its own TimeLimit/terminal; this only caps cache writes.
    stream_budget = max(_limit, (capacity - prefill) // _chunk)

    def _drive(s):
        """Complete/redispatch loop for one stream. Each stream runs on its
        own thread: the action fetch costs a full host<->device round trip
        (~30 ms on the tunneled TPU), and with the streams on one thread
        those fetches serialize — threading overlaps stream A's fetch + host
        tail with stream B's, on top of the device overlap. Streams own
        disjoint env slots, so all shared indexing is race-free; JAX
        dispatch/fetch are thread-safe."""
        while s["inflight"] is not None:
            _complete(s)
            if s["steps"] < stream_budget and not all(done[b] for b in s["ids"]):
                _dispatch(s)

    try:
        for s in streams:
            _dispatch(s)
        if len(streams) > 1:
            with concurrent.futures.ThreadPoolExecutor(len(streams)) as drivers:
                for f in [drivers.submit(_drive, s) for s in streams]:
                    f.result()
        else:
            _drive(streams[0])
    finally:
        if pool is not None:
            pool.shutdown()

    wall = time.perf_counter() - t_start
    # record tuning stats for the next auto-tuned call: per-stream step
    # period and a device-step estimate (min steady-state fetch wall minus
    # the tunnel RTT — a fetch always rides behind its own dispatch's device
    # execution, so min(dt) - rtt lower-bounds the device step).
    steps0 = streams[0]["steps"]
    if fetch_dts:
        _STREAM_TUNE[tune_key] = {
            "period": wall / steps0,
            "device_step": max(float(np.min(fetch_dts)) - rtt, 2e-3),
            "rtt": rtt,
            "n_streams": n_streams,
        }
    dispatches = sum(s["steps"] for s in streams)
    for b in range(B):
        lat = results[b].pop("step_latencies")
        results[b]["p50_step_latency_ms"] = float(np.percentile(lat, 50) * 1e3) if lat else None
        results[b]["wall_time_s"] = wall
        results[b]["n_streams"] = n_streams
        results[b]["dispatches"] = dispatches
    return results
