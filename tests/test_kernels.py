"""Kernel/MMD math vs numpy oracles and the reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpc_mmd_tpu.kernels import (gaussian_kernel, laplace_kernel, mmd_vs_zero,
                                 pairwise_l1, pairwise_l2sq)


def test_pairwise_l1_oracle(rng):
    A = rng.normal(0, 1, (5, 7))
    B = rng.normal(0, 1, (6, 7))
    D = np.asarray(pairwise_l1(jnp.asarray(A), jnp.asarray(B)))
    for i in range(5):
        for j in range(6):
            assert D[i, j] == pytest.approx(np.abs(A[i] - B[j]).sum(), rel=1e-6)


def test_pairwise_l2sq_oracle(rng):
    A = rng.normal(0, 1, (5, 7))
    D = np.asarray(pairwise_l2sq(jnp.asarray(A), jnp.asarray(A)))
    for i in range(5):
        for j in range(5):
            # matmul expansion in f32: cancellation-limited accuracy
            assert D[i, j] == pytest.approx(((A[i] - A[j]) ** 2).sum(),
                                            rel=1e-3, abs=1e-3)


def test_kernels_basic(rng):
    d1 = jnp.asarray(np.abs(rng.normal(0, 1, (4, 4))))
    np.testing.assert_allclose(np.asarray(laplace_kernel(d1, 2.0)),
                               np.exp(-np.asarray(d1) / 2.0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gaussian_kernel(d1, 2.0)),
                               np.exp(-np.asarray(d1) / 8.0), atol=1e-6)


def test_mmd_vs_zero_oracle(rng):
    """mmd = ker_wt*(b' Kaa b - 2 b' Kab b_unif) with zero target samples."""
    k = 8
    beta = rng.normal(0, 1, k)
    cost = np.abs(rng.normal(0, 1, k))
    sigma, ker_wt = 1.7, 1000.0
    Kaa = np.exp(-np.abs(cost[:, None] - cost[None, :]) / sigma)
    Kab = np.exp(-np.abs(cost[:, None] - np.zeros(k)[None, :]) / sigma)
    b_unif = np.full(k, 1.0 / k)
    expected = ker_wt * (beta @ Kaa @ beta - 2 * beta @ Kab @ b_unif)
    got = float(mmd_vs_zero(jnp.asarray(beta), jnp.asarray(cost), sigma, ker_wt))
    assert got == pytest.approx(expected, rel=1e-5)


def test_mmd_vs_zero_matches_reference():
    import sys
    sys.path.insert(0, "/root/reference/synthetic_static_obs")
    try:
        from kernel_computation import kernel_matrix
    except ImportError:
        pytest.skip("reference not available")
    num_reduced = 6
    km = kernel_matrix(num_reduced, 1000.0, jnp.eye(11))
    rng = np.random.default_rng(3)
    beta = jnp.asarray(rng.normal(0, 1, num_reduced), jnp.float32)
    cost = jnp.asarray(np.abs(rng.normal(0, 1, num_reduced)), jnp.float32)
    ref = float(km.compute_mmd(beta, cost, 1.7)[0])
    got = float(mmd_vs_zero(beta, cost, 1.7, 1000.0))
    assert got == pytest.approx(ref, rel=1e-4, abs=1e-4)


def test_blockwise_mmd_matches_dense(rng):
    from mpc_mmd_tpu.kernels import blockwise_mmd_vs_zero
    n = 3000
    beta = jnp.asarray(rng.dirichlet(np.ones(n)), jnp.float32)
    cost = jnp.asarray(np.abs(rng.normal(0, 1, n)), jnp.float32)
    dense = float(mmd_vs_zero(beta, cost, 2.0, 1000.0))
    tiled = float(blockwise_mmd_vs_zero(beta, cost, 2.0, 1000.0, block=512))
    assert tiled == pytest.approx(dense, rel=1e-4, abs=1e-3)
    # non-divisible block size exercises the zero-weight padding
    tiled2 = float(blockwise_mmd_vs_zero(beta, cost, 2.0, 1000.0, block=1024))
    assert tiled2 == pytest.approx(dense, rel=1e-4, abs=1e-3)


def test_mmd_batched_sigma(rng):
    """Vector sigma broadcasting over a leading batch axis."""
    beta = jnp.asarray(rng.normal(0, 1, (3, 5)))
    cost = jnp.asarray(np.abs(rng.normal(0, 1, (3, 5))))
    sigma = jnp.asarray([0.5, 1.0, 2.0])
    out = mmd_vs_zero(beta, cost, sigma, 10.0)
    assert out.shape == (3,)
    for i in range(3):
        single = float(mmd_vs_zero(beta[i], cost[i], float(sigma[i]), 10.0))
        assert float(out[i]) == pytest.approx(single, rel=1e-6)


def test_blockwise_mmd_batched_matches_dense(rng):
    """Batched (..., N) inputs with per-batch sigma: the row-block scan
    vmaps over flattened leading dims and matches mmd_vs_zero exactly."""
    from mpc_mmd_tpu.kernels import blockwise_mmd_vs_zero
    B, n = (2, 3), 700
    beta = jnp.asarray(rng.normal(0, 1, B + (n,)), jnp.float32)
    cost = jnp.asarray(np.abs(rng.normal(0, 1, B + (n,))), jnp.float32)
    sig = jnp.asarray(1.0 + rng.random(B), jnp.float32)
    dense = mmd_vs_zero(beta, cost, sig, 1000.0)
    tiled = blockwise_mmd_vs_zero(beta, cost, sig, 1000.0, block=256)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense),
                               rtol=1e-4, atol=1e-3)
    # scalar sigma over the same batch
    tiled_s = blockwise_mmd_vs_zero(beta, cost, 2.0, 1000.0, block=256)
    dense_s = mmd_vs_zero(beta, cost, 2.0, 1000.0)
    np.testing.assert_allclose(np.asarray(tiled_s), np.asarray(dense_s),
                               rtol=1e-4, atol=1e-3)
    with pytest.raises(ValueError):
        blockwise_mmd_vs_zero(beta, cost[..., :-1], 2.0, 1000.0)
    # 1-D samples under a BATCH of bandwidths (mmd_vs_zero broadcasts to
    # (S,); the blockwise path must match, not fall into the scalar scan)
    b1 = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    c1 = jnp.asarray(np.abs(rng.normal(0, 1, n)), jnp.float32)
    sig_b = jnp.asarray([0.7, 1.3, 2.9], jnp.float32)
    dense_b = mmd_vs_zero(b1, c1, sig_b, 1000.0)
    tiled_b = blockwise_mmd_vs_zero(b1, c1, sig_b, 1000.0, block=256)
    assert tiled_b.shape == (3,)
    np.testing.assert_allclose(np.asarray(tiled_b), np.asarray(dense_b),
                               rtol=1e-4, atol=1e-3)


def test_matern52_oracle(rng):
    """Matern-5/2 (L1 radius, the reference's commented form,
    kernel_computation.py:41-53) against a float64 numpy oracle."""
    from mpc_mmd_tpu.kernels import matern52_kernel
    A = rng.normal(0, 1, (6, 5))
    d1 = np.abs(A[:, None, :] - A[None, :, :]).sum(-1)
    d2 = ((A[:, None, :] - A[None, :, :]) ** 2).sum(-1)
    sigma = 1.3
    r1 = np.sqrt(5.0) * d1 / sigma
    expected = (1.0 + r1 + 5.0 * d2 / (3.0 * sigma ** 2)) * np.exp(-r1)
    got = np.asarray(matern52_kernel(jnp.asarray(d1), jnp.asarray(d2), sigma))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    # unit diagonal, symmetric, bounded by 1 (kernel sanity)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-6)
    assert np.all(got <= 1.0 + 1e-6)


def test_kernel_of_dispatch(rng):
    from mpc_mmd_tpu.kernels import kernel_of, matern52_kernel
    d1 = jnp.asarray(np.abs(rng.normal(0, 1, (4, 4))))
    d2 = d1 * d1
    np.testing.assert_array_equal(np.asarray(kernel_of("laplace", 2.0, d1)),
                                  np.asarray(laplace_kernel(d1, 2.0)))
    np.testing.assert_array_equal(
        np.asarray(kernel_of("gaussian", 2.0, None, d2)),
        np.asarray(gaussian_kernel(d2, 2.0)))
    np.testing.assert_array_equal(
        np.asarray(kernel_of("matern52", 2.0, d1, d2)),
        np.asarray(matern52_kernel(d1, d2, 2.0)))
    with pytest.raises(ValueError):
        kernel_of("rbf", 2.0, d1, d2)


@pytest.mark.parametrize("kind", ["gaussian", "matern52"])
def test_mmd_vs_zero_kernel_variants_oracle(rng, kind):
    """mmd_vs_zero under the selectable kernels (scalar samples: L2^2 is
    the squared L1 distance) against a float64 numpy oracle."""
    k = 8
    beta = rng.normal(0, 1, k)
    cost = np.abs(rng.normal(0, 1, k))
    sigma, ker_wt = 1.7, 1000.0
    d_aa = np.abs(cost[:, None] - cost[None, :])
    d_ab = np.abs(cost)

    def K(d):
        if kind == "gaussian":
            return np.exp(-d * d / (2 * sigma ** 2))
        r1 = np.sqrt(5.0) * d / sigma
        return (1 + r1 + 5 * d * d / (3 * sigma ** 2)) * np.exp(-r1)

    # cross term: every K_ab column equals k(c_i, 0) and b_unif sums to 1
    expected = ker_wt * (beta @ K(d_aa) @ beta
                         - 2 * np.sum(beta * K(d_ab)))
    got = float(mmd_vs_zero(jnp.asarray(beta), jnp.asarray(cost), sigma,
                            ker_wt, kind=kind))
    assert got == pytest.approx(expected, rel=2e-5, abs=1e-3)
