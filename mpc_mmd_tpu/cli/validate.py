"""Monte-Carlo validation of a sweep's accepted solves.

Replaces ``synthetic_static_obs/validation.py`` / dynamic variant: reads a
ResultStore written by the sweep CLI, re-rolls n_mc noisy rollouts per solve
on device, and writes collision/lane statistics to a stats store.  The
reference's config-intersection step (validation.py:284-304, so that mmd and
cvar are compared on the same scenarios) becomes an explicit seed/obstacle
join here.

Usage:
    python -m mpc_mmd_tpu.cli.validate --data ./data/static/... --n_mc 1000
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import dynamic_workload, static_workload
from ..qp import build_workspace
from ..utils.io_store import ResultStore
from ..validate import make_validator


def validate_store(data_root: str, n_mc: int = 1000, seed: int = 0,
                   out_root: str | None = None) -> dict:
    store = ResultStore(data_root)
    meta = store.meta
    make = static_workload if meta.get("workload", "static") == "static" \
        else dynamic_workload
    cfg = make(num_reduced=meta["num_reduced"], num_obs=meta["num_obs"],
               noise=meta["noise"], noise_level=meta["noise_level"],
               num_prime=meta["num_prime"], mode=meta["mode"])
    ws = build_workspace(cfg)
    validator = make_validator(cfg, ws, n_mc=n_mc)

    arrays = store.concatenated()
    if len(arrays.get("cx", ())) == 0:
        return {"n_solves": 0}

    stats = validator(jnp.asarray(arrays["cx"]), jnp.asarray(arrays["cy"]),
                      jnp.asarray(arrays["init_state"][0]),
                      jnp.asarray(arrays["x_obs_traj"]),
                      jnp.asarray(arrays["y_obs_traj"]),
                      jax.random.PRNGKey(seed))

    coll = np.asarray(stats.coll_count)
    lane = np.asarray(stats.lane_count)
    frac = np.asarray(stats.coll_fraction)
    out = {
        "n_solves": int(len(coll)),
        "n_mc": n_mc,
        "coll_count": coll.tolist(),
        "lane_count": lane.tolist(),
        "coll_fraction": frac.tolist(),
        "coll_pct_mean": float(np.mean(coll) / n_mc * 100.0),
        "coll_pct_p50": float(np.percentile(coll, 50) / n_mc * 100.0),
        "coll_pct_p95": float(np.percentile(coll, 95) / n_mc * 100.0),
    }
    out_root = out_root or data_root.replace("/data/", "/stats/")
    if out_root == data_root:
        out_root = os.path.join(data_root, "stats")
    os.makedirs(out_root, exist_ok=True)
    np.savez(os.path.join(out_root, "validation.npz"),
             coll_count=coll, lane_count=lane, coll_fraction=frac,
             seeds=arrays.get("seeds", np.zeros(0)))
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump({k: v for k, v in out.items()
                   if not isinstance(v, list)}, f, indent=1)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--n_mc", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    out = validate_store(args.data, args.n_mc, args.seed, args.out)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, list)}, indent=1))


if __name__ == "__main__":
    main()
