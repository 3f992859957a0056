"""CLI smoke tests (eval example + recorder) — subprocess-free, CPU."""

import json
import sys

import numpy as np
import pytest


def test_example_cli_fake_env(capsys):
    from vima_tpu.eval import example

    example.main(["--fake-env", "--num-envs", "2", "--episodes", "1", "--max-objs", "4"])
    out = capsys.readouterr().out.strip().splitlines()
    records = [json.loads(line) for line in out]
    summary = records[-1]["summary"]
    assert summary["episodes"] == 2
    assert 0.0 <= summary["success_rate"] <= 1.0
    per_episode = records[:-1]
    assert all(r["done"] for r in per_episode)


def test_record_cli(tmp_path, capsys):
    from vima_tpu.eval import record
    from vima_tpu.train.data import TrajectoryDataset

    record.main(["--out", str(tmp_path), "--episodes", "2", "--fake-env", "--max-objs", "4"])
    ds = TrajectoryDataset(tmp_path, max_steps=6, max_objs=4, prompt_len=32)
    batch = next(ds.batches(2))
    assert batch["ee"].shape[0] == 2
