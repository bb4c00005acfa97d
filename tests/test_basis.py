"""Bernstein basis vs the reference's hardcoded order-10 closed forms."""

import numpy as np
import pytest

from mpc_mmd_tpu.basis import bernstein_basis, segment_slices, uniform_basis


def _reference_order10(tmin, tmax, t):
    """Independent oracle: the closed forms from
    synthetic_static_obs/bernstein_coeff_order10_arbitinterval.py:13-103,
    re-derived here via numpy polynomial differentiation."""
    from scipy.special import binom
    length = tmax - tmin
    s = ((t - tmin) / length).reshape(-1)
    n = 10
    P = np.stack([binom(n, k) * (1 - s) ** (n - k) * s ** k
                  for k in range(n + 1)], axis=1)
    # derivative via symbolic polynomial coefficients
    Pd = np.zeros_like(P)
    Pdd = np.zeros_like(P)
    for k in range(n + 1):
        # B_{k,n}(s) = C(n,k) s^k (1-s)^(n-k): expand into power basis
        coeffs = np.zeros(n + 1)
        for j in range(n - k + 1):
            coeffs[k + j] += binom(n, k) * binom(n - k, j) * (-1) ** j
        d1 = np.polynomial.polynomial.polyder(coeffs)
        d2 = np.polynomial.polynomial.polyder(coeffs, 2)
        Pd[:, k] = np.polynomial.polynomial.polyval(s, d1)
        Pdd[:, k] = np.polynomial.polynomial.polyval(s, d2)
    return P, Pd / length, Pdd / length ** 2


def test_matches_closed_form():
    t = np.linspace(0.0, 15.0, 100)
    b = bernstein_basis(10, 0.0, 15.0, t)
    P, Pd, Pdd = _reference_order10(0.0, 15.0, t)
    np.testing.assert_allclose(b.P, P, atol=1e-10)
    np.testing.assert_allclose(b.Pdot, Pd, atol=1e-8)
    np.testing.assert_allclose(b.Pddot, Pdd, atol=1e-6)


def test_matches_reference_module():
    """Direct comparison against the actual reference implementation."""
    import sys
    sys.path.insert(0, "/root/reference/synthetic_static_obs")
    try:
        import bernstein_coeff_order10_arbitinterval as ref
    except ImportError:
        pytest.skip("reference not available")
    t = np.linspace(0.0, 15.0, 100).reshape(-1, 1)
    P_r, Pd_r, Pdd_r = ref.bernstein_coeff_order10_new(10, t[0], t[-1], t)
    b = bernstein_basis(10, float(t[0, 0]), float(t[-1, 0]), t)
    np.testing.assert_allclose(b.P, P_r, atol=1e-10)
    np.testing.assert_allclose(b.Pdot, Pd_r, atol=1e-8)
    np.testing.assert_allclose(b.Pddot, Pdd_r, atol=1e-6)


def test_partition_of_unity_and_endpoints():
    b = uniform_basis(10, 15.0, 100)
    np.testing.assert_allclose(b.P.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(b.Pdot.sum(axis=1), 0.0, atol=1e-9)
    # endpoint interpolation
    assert b.P[0, 0] == pytest.approx(1.0)
    assert b.P[-1, -1] == pytest.approx(1.0)


def test_derivative_consistency_finite_difference():
    t = np.linspace(0.0, 15.0, 2001)
    b = bernstein_basis(10, 0.0, 15.0, t)
    dt = t[1] - t[0]
    fd = np.gradient(b.P, dt, axis=0)
    np.testing.assert_allclose(fd[5:-5], b.Pdot[5:-5], atol=5e-3)


def test_segment_slices():
    sl = segment_slices(100, 4)
    assert [s.start for s in sl] == [0, 25, 50, 75]
    with pytest.raises(ValueError):
        segment_slices(100, 3)
