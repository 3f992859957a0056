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


def test_example_cli_all_partitions_sweep(capsys):
    from vima_tpu.eval import example

    example.main(
        ["--fake-env", "--all-partitions", "--num-envs", "1", "--episodes", "1",
         "--max-objs", "4"]
    )
    out = capsys.readouterr().out.strip().splitlines()
    result = json.loads(out[-1])
    # the 4-level protocol: every partition present, every fake task run
    assert sorted(result["levels"].keys()) == sorted(example.ALL_PARTITIONS)
    for part, tasks in result["sweep"].items():
        assert set(tasks) == set(example._FAKE_TASKS[part])
        for t in tasks.values():
            assert t["episodes"] == 1
            assert 0.0 <= t["success_rate"] <= 1.0
    assert 0.0 <= result["mean_success_rate"] <= 1.0
    assert result["episodes_total"] == sum(len(v) for v in example._FAKE_TASKS.values())


def test_parity_cli(tmp_path, capsys):
    pytest.importorskip("torch")
    from tests.reference_loader import reference_available

    if not reference_available():
        pytest.skip("PyTorch reference not available")
    import torch

    from vima_tpu.eval import parity
    from vima_tpu.eval.reference_compat import build_reference_vima_policy

    ref, cfg, _ = build_reference_vima_policy(
        embed_dim=256, xf_n_layers=1, sattn_n_heads=4, xattn_n_heads=4,
        t5_num_layers=1, t5_d_ff=64, vocab_size=50,
    )
    sd = {f"policy.{k}": v for k, v in ref.state_dict().items()}
    ckpt = tmp_path / "tiny_ref.ckpt"
    torch.save({"cfg": cfg, "state_dict": sd}, ckpt)

    parity.main(["--ckpt", str(ckpt), "--episodes", "1", "--steps", "2", "--max-objs", "3"])
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])["summary"]
    assert summary["parity"] is True
    assert summary["total_mismatches"] == 0


def test_record_cli(tmp_path, capsys):
    from vima_tpu.eval import record
    from vima_tpu.train.data import TrajectoryDataset

    record.main(["--out", str(tmp_path), "--episodes", "2", "--fake-env", "--max-objs", "4"])
    ds = TrajectoryDataset(tmp_path, max_steps=6, max_objs=4, prompt_len=32)
    batch = next(ds.batches(2))
    assert batch["ee"].shape[0] == 2
