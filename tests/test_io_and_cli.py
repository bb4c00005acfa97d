"""ResultStore resume semantics + end-to-end sweep/validate/report CLI."""

import dataclasses
import json
import os

import numpy as np
import pytest

from mpc_mmd_tpu.utils.io_store import ResultStore
from mpc_mmd_tpu.utils.observability import MetricLogger, phase_timer


def test_store_roundtrip(tmp_path):
    store = ResultStore(str(tmp_path / "s"), meta={"mode": "cvar"})
    store.write_chunk(0, a=np.arange(5), b=np.ones((5, 2)))
    store.write_chunk(2, a=np.arange(3), b=np.zeros((3, 2)))
    assert store.done_chunks() == [0, 2]
    assert store.is_done(0) and not store.is_done(1)
    out = store.read_chunk(2)
    np.testing.assert_array_equal(out["a"], np.arange(3))
    cat = store.concatenated()
    assert cat["a"].shape == (8,)


def test_store_resume(tmp_path):
    root = str(tmp_path / "s")
    ResultStore(root, meta={"x": 1}).write_chunk(0, a=np.ones(2))
    # reopen: manifest survives, chunk 0 done
    store2 = ResultStore(root, meta={"x": 1})
    assert store2.is_done(0)
    with pytest.raises(ValueError):
        ResultStore(root, meta={"x": 2})


def test_metric_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricLogger(path)
    with phase_timer(logger, "work", tag=1):
        pass
    logger.log("solve", cost=np.float32(1.5))
    recs = [json.loads(line) for line in open(path)]
    assert recs[0]["event"] == "phase" and recs[0]["phase"] == "work"
    assert recs[1]["cost"] == pytest.approx(1.5)


def test_sweep_validate_report_end_to_end(tmp_path, monkeypatch):
    """Tiny full pipeline: sweep -> validate -> boxplot + trajectory figure."""
    import mpc_mmd_tpu.cli.sweep as sweep_cli
    import mpc_mmd_tpu.cli.validate as validate_cli
    import mpc_mmd_tpu.cli.report as report_cli
    import mpc_mmd_tpu.config as config_mod

    # shrink the solver for test speed
    orig_static = config_mod.static_workload

    def tiny_static(**kw):
        cfg = orig_static(**kw)
        return cfg.replace(cem=dataclasses.replace(cfg.cem, maxiter_cem=2))

    monkeypatch.setattr(sweep_cli, "static_workload", tiny_static)
    monkeypatch.setattr(validate_cli, "static_workload", tiny_static)

    out = str(tmp_path / "data")
    store = sweep_cli.run_sweep(
        workload="static", mode="cvar", noise="gaussian", noise_level=0.1,
        num_reduced=3, num_obs=2, num_prime=15, num_configs=4,
        out_root=out, chunk=2)
    n_acc = sum(len(a["cx"]) for _, a in store.iter_chunks())
    assert n_acc >= 1, "no accepted solves in tiny sweep"

    # resume: re-running skips all chunks (count of chunk files unchanged)
    store2 = sweep_cli.run_sweep(
        workload="static", mode="cvar", noise="gaussian", noise_level=0.1,
        num_reduced=3, num_obs=2, num_prime=15, num_configs=4,
        out_root=out, chunk=2)
    assert store2.done_chunks() == store.done_chunks()

    stats_dir = os.path.join(store.root, "stats")
    stats = validate_cli.validate_store(store.root, n_mc=50,
                                        out_root=stats_dir)
    assert stats["n_solves"] == n_acc
    assert 0.0 <= stats["coll_pct_mean"] <= 100.0
    fig1 = report_cli.boxplot([stats_dir], ["cvar"], 50,
                              str(tmp_path / "box.png"))
    assert os.path.exists(fig1)
    fig2 = report_cli.trajectories(store.root, str(tmp_path / "traj.png"),
                                   n_mc=20, n_solves=1)
    assert os.path.exists(fig2)
    gif = report_cli.animate(store.root, str(tmp_path / "traj.gif"), n_mc=10)
    assert os.path.exists(gif)
