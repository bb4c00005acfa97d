"""Persistent XLA compilation cache setup.

The flagship mmd_opt solve program cold-compiles in minutes on TPU (the
20-iteration outer scan nests a 20-iteration inner CEM vmapped over 100
candidates).  A persistent on-disk cache makes every process after the first
hit a warm executable (~seconds), which is what lets short-lived entry points
(bench.py, __graft_entry__.py, CLI sweeps) start fast.

The reference has no counterpart (it keeps one long-lived Python process per
sweep, synthetic_static_obs/main_mpc.py:106); a TPU-native framework with
many short CLI entry points needs this to be first-class.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory.

    Call BEFORE the first jit compilation.  ``MPC_MMD_JAX_CACHE`` overrides
    the default (<repo>/.jax_cache); set it to ``0`` to disable.
    Returns the cache directory in use ("" if disabled).
    """
    import jax

    env = os.environ.get("MPC_MMD_JAX_CACHE")
    if env == "0":
        return ""
    # TPU-only: XLA:CPU serializes AOT results keyed loosely enough that an
    # entry compiled under one host's CPU feature set can be loaded on
    # another (observed: +prefer-no-scatter mismatch warnings, potential
    # SIGILL).  CPU compiles here are seconds anyway; the cache exists to
    # amortize the minutes-long TPU cold compile.
    try:
        if jax.default_backend() != "tpu":
            return ""
    except Exception:
        return ""
    cache_dir = path or env or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program (defaults skip compiles <1s / small executables —
    # we want the whole pipeline warm, including tiny helper programs).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
