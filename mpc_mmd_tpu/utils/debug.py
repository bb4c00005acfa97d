"""Debug / reliability subsystem.

The reference has no sanitizers or failure handling (SURVEY.md §5).  JAX's
functional purity makes data races structurally impossible inside jitted
code; what remains worth guarding is numerical health (NaNs from the beta
noise model's Beta(0,0) hazard, diverging QPs) and multi-host liveness.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True):
    """Enable jax_debug_nans (and disable jit caching pitfalls) for a scope."""
    prev = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", nan_checks)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, context: str = "") -> None:
    """Host-side finite check over a pytree of arrays (use at stage
    boundaries in debug runs)."""
    leaves = jax.tree_util.tree_leaves(tree)
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            bad = np.size(arr) - int(np.sum(np.isfinite(arr)))
            raise FloatingPointError(
                f"non-finite values ({bad}/{arr.size}) in leaf {i}"
                f"{' of ' + context if context else ''}")


def check_determinism(fn, *args, repeats: int = 2) -> bool:
    """Bitwise-reproducibility check: run fn repeatedly, compare outputs."""
    ref = jax.tree_util.tree_map(np.asarray, fn(*args))
    for _ in range(repeats - 1):
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
        ok = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: np.array_equal(a, b), ref, out))
        if not ok:
            return False
    return True


def hosts_alive(timeout_s: float = 30.0) -> bool:
    """Multi-host heartbeat: a tiny psum across all processes, with a
    host-side watchdog.  Returns False if the collective does not complete
    within the timeout (a peer host is likely dead) — the caller can then
    checkpoint + abort instead of hanging forever (SURVEY.md §5 failure row).
    """
    result = {}

    def probe():
        try:
            n = jax.process_count()
            x = jnp.ones(())
            devs = jax.local_devices()
            y = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
                jnp.ones(len(devs)))
            result["ok"] = bool(np.asarray(y)[0] >= len(devs)) and n >= 1
        except Exception:
            result["ok"] = False

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(result.get("ok", False))
