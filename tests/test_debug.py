"""Debug/reliability utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_mmd_tpu.utils.debug import (assert_finite, check_determinism,
                                     debug_mode, hosts_alive)


def test_assert_finite():
    assert_finite({"a": jnp.ones(3), "b": jnp.zeros((2, 2))})
    with pytest.raises(FloatingPointError):
        assert_finite(jnp.asarray([1.0, np.nan]))


def test_check_determinism():
    import jax
    f = jax.jit(lambda x: jnp.sin(x) * 2)
    assert check_determinism(f, jnp.arange(8.0))

    counter = {"n": 0}

    def impure(x):
        counter["n"] += 1
        return np.asarray(x) + counter["n"]

    assert not check_determinism(impure, jnp.arange(4.0))


def test_debug_mode_nan_guard():
    import jax

    @jax.jit
    def bad(x):
        return jnp.log(x)

    with debug_mode(nan_checks=True):
        with pytest.raises(FloatingPointError):
            bad(jnp.asarray([-1.0])).block_until_ready()
    # guard restored after the scope
    assert not jax.config.jax_debug_nans


def test_hosts_alive_single_process():
    assert hosts_alive(timeout_s=60.0)
