"""Sharded, memory-mapped trajectory storage for at-scale BC training.

The reference's released models were trained on 650K oracle trajectories
(reference model-card.md:27) in an unreleased harness; our npz-per-episode
format (``train.data``) is fine for recording and tests but cannot feed
that scale — 650K small files means 650K opens + decompressions per epoch
on the data host.

TPU-native design: **pack once, mmap forever**. ``pack_shards`` converts
episodes to fully-uniform training samples (fixed step/object/word/asset
buckets — the same padding the jitted loss needs anyway, see
``TrajectoryDataset`` ``word_len``/``max_assets``) and writes them
row-stacked as one raw ``.npy`` per field per shard. Reading a batch is a
fancy-index over ``np.load(mmap_mode="r")`` arrays: zero parse cost, the
OS page cache does the caching, and a one-thread lookahead warms the next
shard's pages while the accelerator consumes the current one. Batches
cross shard boundaries (a remainder buffer carries rows over), so no data
is dropped within an epoch regardless of shard size.

Layout:
  <root>/meta.json                    sample schema + bucket geometry
  <root>/shard_00000/<field>.npy      field arrays, leading dim = episodes
  (nested dict fields flatten with "__": objects/bbox/front ->
   objects__bbox__front.npy)

CLI:  python -m vima_tpu.train.shards <episode_dir> <out_dir> \
          --max-steps 8 --max-objs 8 --prompt-len 64 --word-len 32 \
          --max-assets 4 [--episodes-per-shard 512] [--obs-mode rgb ...]

``vima_tpu.train.train`` auto-detects a packed root (meta.json present)
and streams it with ``ShardedTrajectoryDataset``.
"""

from __future__ import annotations

import json
import pathlib
import threading
from typing import Dict, Iterator, List

import numpy as np

SEP = "__"


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{SEP}{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def pack_shards(
    episode_dir,
    out_dir,
    *,
    max_steps: int,
    max_objs: int,
    prompt_len: int,
    word_len: int,
    max_assets: int,
    episodes_per_shard: int = 512,
    obs_mode: str = "objects",
    img_hw: tuple | None = None,
    tokens_per_img: int | None = None,
) -> Dict:
    """Pack a directory of episode npz files into the sharded format.

    Returns the written meta dict. Bucket sizes (``word_len``,
    ``max_assets``) must cover every episode — packing fails loudly on the
    first overflow rather than truncating data.
    """
    from vima_tpu.train.data import TrajectoryDataset, load_episode

    ds = TrajectoryDataset(
        episode_dir,
        max_steps=max_steps,
        max_objs=max_objs,
        prompt_len=prompt_len,
        word_len=word_len,
        max_assets=max_assets,
        obs_mode=obs_mode,
        img_hw=img_hw,
        tokens_per_img=tokens_per_img,
    )
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    n_per_shard: List[int] = []
    fields = None
    shard_rows: List[Dict[str, np.ndarray]] = []

    def flush():
        nonlocal fields
        if not shard_rows:
            return
        si = len(n_per_shard)
        shard_dir = out / f"shard_{si:05d}"
        shard_dir.mkdir(exist_ok=True)
        try:
            stacked = {
                k: np.stack([r[k] for r in shard_rows]) for k in shard_rows[0]
            }
        except ValueError as e:
            raise ValueError(
                "episodes disagree on a non-bucketed shape (most likely the "
                "per-asset object capacity, which follows each episode's "
                "max-across-assets — reference vima_policy.py:168-231 — and "
                "is deliberately NOT padded globally: interior masked slots "
                "would shift T5 relative positions). Re-record with a "
                f"uniform max_objs, or pack per-capacity subsets. ({e})"
            ) from e
        if fields is None:
            fields = {
                k: {"dtype": str(v.dtype), "shape": list(v.shape[1:])}
                for k, v in stacked.items()
            }
        for k, v in stacked.items():
            np.save(shard_dir / f"{k}.npy", v)
        n_per_shard.append(len(shard_rows))
        shard_rows.clear()

    for path in ds.paths:
        sample = ds._episode_to_sample(load_episode(path))
        shard_rows.append(_flatten(sample))
        if len(shard_rows) >= episodes_per_shard:
            flush()
    flush()

    meta = {
        "version": 1,
        "n_per_shard": n_per_shard,
        "fields": fields,
        "sample_meta": {
            "max_steps": max_steps,
            "max_objs": max_objs,
            "prompt_len": prompt_len,
            "word_len": word_len,
            "max_assets": max_assets,
            "obs_mode": obs_mode,
            "img_hw": list(img_hw) if img_hw else None,
            "tokens_per_img": tokens_per_img,
        },
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=1))
    return meta


def is_packed_root(root) -> bool:
    return (pathlib.Path(root) / "meta.json").exists()


class ShardedTrajectoryDataset:
    """Stream batches from a packed root (see module docstring).

    Same ``batches(batch_size, epochs=, shuffle=)`` surface as
    ``TrajectoryDataset``; rows are shuffled at two levels per epoch
    (shard order, then rows within each shard) — at 512+ episodes per
    shard this is the standard local-shuffle approximation to a global
    permutation, with O(one shard) resident memory.
    """

    def __init__(self, root, *, seed: int = 0, validate_against: Dict | None = None):
        self.root = pathlib.Path(root)
        meta_path = self.root / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(
                f"{self.root} is not a packed dataset (no meta.json); pack it "
                "with python -m vima_tpu.train.shards"
            )
        self.meta = json.loads(meta_path.read_text())
        self.sample_meta = self.meta["sample_meta"]
        self.n_per_shard = list(self.meta["n_per_shard"])
        self.shard_dirs = [
            self.root / f"shard_{i:05d}" for i in range(len(self.n_per_shard))
        ]
        self._rng = np.random.default_rng(seed)
        if validate_against:
            for k, v in validate_against.items():
                have = self.sample_meta.get(k)
                have = tuple(have) if isinstance(have, list) else have
                want = tuple(v) if isinstance(v, (list, tuple)) else v
                if have != want:
                    raise ValueError(
                        f"packed dataset {k}={have!r} does not match the "
                        f"policy's requirement {want!r} — repack"
                    )

    def __len__(self):
        return int(sum(self.n_per_shard))

    def _open(self, shard_dir) -> Dict[str, np.ndarray]:
        return {
            k: np.load(shard_dir / f"{k}.npy", mmap_mode="r")
            for k in self.meta["fields"]
        }

    @staticmethod
    def _warm(shard_dir, fields):
        """Touch the next shard's bytes so its pages are cached before the
        consumer arrives (plain reads; the OS page cache is the buffer)."""
        try:
            for k in fields:
                with open(shard_dir / f"{k}.npy", "rb", buffering=0) as f:
                    while f.read(1 << 22):
                        pass
        except OSError:
            pass  # best-effort

    def batches(
        self, batch_size: int, *, epochs: int = 1, shuffle: bool = True
    ) -> Iterator[Dict]:
        """Yield dict-of-arrays batches with leading dim ``batch_size``.
        Remainder rows carry across shard boundaries; only the final
        partial batch of an epoch is dropped (static shapes for jit)."""
        fields = list(self.meta["fields"])
        for _ in range(epochs):
            shard_order = (
                self._rng.permutation(len(self.shard_dirs))
                if shuffle
                else np.arange(len(self.shard_dirs))
            )
            carry: Dict[str, np.ndarray] | None = None
            warmer = None
            for oi, si in enumerate(shard_order):
                if oi + 1 < len(shard_order):
                    nxt = self.shard_dirs[shard_order[oi + 1]]
                    warmer = threading.Thread(
                        target=self._warm, args=(nxt, fields), daemon=True
                    )
                    warmer.start()
                arrs = self._open(self.shard_dirs[si])
                n = self.n_per_shard[si]
                rows = self._rng.permutation(n) if shuffle else np.arange(n)
                if carry is not None:
                    take = batch_size - next(iter(carry.values())).shape[0]
                    head, rows = rows[:take], rows[take:]
                    merged = {
                        k: np.concatenate([carry[k], np.asarray(arrs[k][head])])
                        for k in fields
                    }
                    if merged[fields[0]].shape[0] == batch_size:
                        carry = None
                        yield _unflatten(merged)
                    else:  # shard smaller than the remaining need
                        carry = merged
                        continue
                i = 0
                while i + batch_size <= len(rows):
                    sel = np.sort(rows[i : i + batch_size])
                    yield _unflatten({k: np.asarray(arrs[k][sel]) for k in fields})
                    i += batch_size
                if i < len(rows):
                    sel = np.sort(rows[i:])
                    carry = {k: np.asarray(arrs[k][sel]) for k in fields}
                if warmer is not None:
                    warmer.join(timeout=0.0)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("episode_dir")
    p.add_argument("out_dir")
    p.add_argument("--max-steps", type=int, required=True)
    p.add_argument("--max-objs", type=int, required=True)
    p.add_argument("--prompt-len", type=int, required=True)
    p.add_argument("--word-len", type=int, required=True)
    p.add_argument("--max-assets", type=int, required=True)
    p.add_argument("--episodes-per-shard", type=int, default=512)
    p.add_argument("--obs-mode", choices=("objects", "rgb"), default="objects")
    p.add_argument("--img-hw", type=int, nargs=2, default=None)
    p.add_argument("--tokens-per-img", type=int, default=None)
    cfg = p.parse_args(argv)
    meta = pack_shards(
        cfg.episode_dir,
        cfg.out_dir,
        max_steps=cfg.max_steps,
        max_objs=cfg.max_objs,
        prompt_len=cfg.prompt_len,
        word_len=cfg.word_len,
        max_assets=cfg.max_assets,
        episodes_per_shard=cfg.episodes_per_shard,
        obs_mode=cfg.obs_mode,
        img_hw=tuple(cfg.img_hw) if cfg.img_hw else None,
        tokens_per_img=cfg.tokens_per_img,
    )
    n = sum(meta["n_per_shard"])
    print(f"packed {n} episodes into {len(meta['n_per_shard'])} shards at {cfg.out_dir}")


if __name__ == "__main__":
    main()
