"""Closed-loop receding-horizon MPC against a synthetic plant.

Replaces the reference's CARLA harness (``carla/main_carla.py`` +
``carla/carla_simulation.py``) with a self-contained simulator: the plant is
the same bicycle kinematics the planner models (the honest equivalent of
CARLA's vehicle physics for this scope), obstacles are static or
constant-velocity vehicles along a curved route, and every piece of the
reference MPC loop is reproduced:

* 300 m waypoint window -> shift to ego frame -> AM path smoothing ->
  path parameters (main_carla.py:345-366);
* obstacle perception with front-half-plane filter and pad/sort-to-num_obs
  (main_carla.py:74-150);
* obstacles to Frenet + constant-velocity prediction (main_carla.py:369-375);
* Frenet CEM solve with receding-horizon mean_param warm start
  (main_carla.py:378-382);
* control = mean of the first ``num_mean_update`` steps of (v, steer), with
  actuation noise injected on the applied control itself, numpy-seeded
  exactly like the reference (main_carla.py:408-436,
  np.random.seed(3*ii+5*i+23));
* collision detection aborts the episode (collision sensor equivalent,
  main_carla.py:201-205).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .config import ProblemConfig
from .dynamics import constant_velocity_obstacles
from .frenet import (FrenetFrame, build_smoother, fit_path_spline,
                     global_to_frenet_obstacle, path_parameters, smooth_path,
                     waypoint_window)
from .solver_frenet import FrenetSolver


def make_route(kind: str = "curved", length: float = 1000.0,
               n_points: int = 25000):
    """A global route: straight, curved (gentle S-bends), or circuit."""
    s = np.linspace(0.0, length, n_points)
    if kind == "straight":
        x, y = s, np.zeros_like(s)
    elif kind == "curved":
        x = s
        y = 20.0 * np.sin(2 * np.pi * s / 400.0)
    elif kind == "circuit":
        r = length / (2 * np.pi)
        x = r * np.sin(s / r)
        y = r * (1.0 - np.cos(s / r))
    else:
        raise ValueError(kind)
    return x, y


@dataclass
class EpisodeResult:
    collided: bool
    steps: int
    distance: float
    min_obstacle_margin: float
    ego_trace: np.ndarray            # (steps, 5) [x, y, v, psi, steer]
    solve_times: List[float] = field(default_factory=list)
    # (steps, num_world_obs, 2) obstacle xy per step — drives the
    # birdview-style episode animation (the CARLA HUD/camera overlay
    # equivalent, carla_simulation.py:251-309; see cli/closedloop
    # --animate)
    obs_trace: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 0, 2)))


class SyntheticPlant:
    """Bicycle-kinematics world with constant-velocity obstacle vehicles."""

    def __init__(self, cfg: ProblemConfig, route_xy, obstacles_s_l,
                 obstacle_speed: float = 0.0, v0: float = 5.0):
        self.cfg = cfg
        self.dt = cfg.horizon.dt
        self.L = cfg.vehicle.wheel_base
        self.spline = fit_path_spline(*route_xy)
        # place obstacles at (arc, lateral) positions along the route
        obs = []
        for s_pos, l_pos in obstacles_s_l:
            xr = float(self.spline.cs_x(s_pos))
            yr = float(self.spline.cs_y(s_pos))
            phi = float(self.spline.cs_phi(s_pos))
            nx, ny = -np.sin(phi), np.cos(phi)
            tx, ty = np.cos(phi), np.sin(phi)
            obs.append((xr + l_pos * nx, yr + l_pos * ny,
                        obstacle_speed * tx, obstacle_speed * ty, phi))
        self.obstacles = np.asarray(obs) if obs else np.zeros((0, 5))
        phi0 = float(self.spline.cs_phi(0.0))
        self.state = np.array([float(self.spline.cs_x(0.0)),
                               float(self.spline.cs_y(0.0)),
                               v0, phi0, 0.0])  # x, y, v, psi, psidot
        self.vdot = 0.0

    def step(self, acc: float, steer: float):
        x, y, v, psi, _ = self.state
        v_next = max(v + acc * self.dt, 0.0)
        psidot = v_next * np.tan(steer) / self.L
        psi_next = psi + psidot * self.dt
        x_next = x + v_next * np.cos(psi_next) * self.dt
        y_next = y + v_next * np.sin(psi_next) * self.dt
        self.vdot = (v_next - v) / self.dt
        self.state = np.array([x_next, y_next, v_next, psi_next, psidot])
        # advance obstacles
        if len(self.obstacles):
            self.obstacles[:, 0] += self.obstacles[:, 2] * self.dt
            self.obstacles[:, 1] += self.obstacles[:, 3] * self.dt

    def obstacle_margin(self) -> float:
        """min over obstacles of the ellipse margin (<= 0 means collision)."""
        if not len(self.obstacles):
            return np.inf
        dx = self.state[0] - self.obstacles[:, 0]
        dy = self.state[1] - self.obstacles[:, 1]
        m = (dx ** 2 / self.cfg.obstacles.a_obs ** 2
             + dy ** 2 / self.cfg.obstacles.b_obs ** 2) - 1.0
        return float(np.min(m))


class PIDActuator:
    """Throttle/brake actuation mapping (carla/main_carla.py:25-71,
    carla_simulation.py:89 PID(0.05, 0, 0.05)).

    The reference never feeds the MPC acceleration to the vehicle directly:
    a PID on the (smoothed) measured acceleration drives a pedal integrator
    ``throttle1``; the pedal maps to throttle/brake around the
    rolling+aerodynamic resistance borders, and the vehicle realizes the
    pedal's acceleration.  This class reproduces that actuation lag for the
    SyntheticPlant (flat road: pitch term = 0); ``step`` returns the
    realized acceleration command for the plant.
    """

    def __init__(self, dt: float, mass: float = 1845.0, kp: float = 0.05,
                 ki: float = 0.0, kd: float = 0.05):
        self.dt, self.mass = dt, mass
        self.kp, self.ki, self.kd = kp, ki, kd
        self.throttle1 = 0.0
        self.prev_vel = 0.0
        self.prev_acc = 0.0
        self._integral = 0.0
        self._last_input = 0.0

    def _pid(self, setpoint: float, inp: float) -> float:
        err = setpoint - inp
        self._integral += self.ki * err * self.dt
        # derivative on measurement (simple-pid semantics)
        d_input = (inp - self._last_input) / self.dt
        self._last_input = inp
        return self.kp * err + self._integral - self.kd * d_input

    def step(self, target_acc: float, vel: float) -> float:
        # resistance borders (main_carla.py:37-40; flat road)
        lower = -(0.01 * 9.81 * self.mass
                  + 0.5 * 0.3 * 2.37 * 1.184 * vel ** 2) / self.mass
        upper = lower - 500.0 / self.mass

        acc = (vel - self.prev_vel) / self.dt
        if acc > 10.0:                       # spike guard (main_carla.py:45-49)
            control = self._pid(target_acc, 0.0)
        else:
            self.prev_acc = (self.prev_acc * 4.0 + acc) / 5.0
            control = self._pid(target_acc, self.prev_acc)
        self.throttle1 = float(np.clip(self.throttle1 + control, -4.0, 4.0))

        if self.throttle1 > lower:
            throttle = min((self.throttle1 - lower) / 4.0, 1.0)
            realized = lower + 4.0 * throttle
        elif self.throttle1 > upper:
            realized = lower                  # coasting: resistance only
        else:
            brake = min((upper - self.throttle1) / 4.0, 1.0)
            realized = upper - 4.0 * brake
        self.prev_vel = vel
        return realized


def perceive_obstacles(cfg: ProblemConfig, plant: SyntheticPlant,
                       ego_xy, ego_psi) -> np.ndarray:
    """Front-half-plane filter + sort by distance + pad to num_obs.

    Ref: carla/main_carla.py:74-150 (perception returns exactly num_obs rows,
    padding with a far-away dummy obstacle when fewer are visible).
    """
    n = cfg.obstacles.num_obs
    dummy = np.array([ego_xy[0] + 500.0, ego_xy[1] + 500.0, 0.0, 0.0, 0.0])
    if not len(plant.obstacles):
        return np.tile(dummy, (n, 1))
    rel = plant.obstacles[:, :2] - np.asarray(ego_xy)[None, :]
    heading = np.array([np.cos(ego_psi), np.sin(ego_psi)])
    ahead = rel @ heading > -5.0
    vis = plant.obstacles[ahead]
    if not len(vis):
        return np.tile(dummy, (n, 1))
    d = np.linalg.norm(vis[:, :2] - np.asarray(ego_xy)[None, :], axis=1)
    vis = vis[np.argsort(d)][:n]
    if len(vis) < n:
        vis = np.vstack([vis] + [dummy[None, :]] * (n - len(vis)))
    return vis


def run_episode(cfg: ProblemConfig, route_kind: str = "curved",
                obstacles_s_l=((60.0, 0.0), (140.0, 1.5)),
                v_des: float = 15.0, max_steps: int = 400,
                goal_arc: float = 300.0, seed: int = 0,
                noise_on_control: bool = True,
                solver: Optional[FrenetSolver] = None,
                actuation: str = "direct") -> EpisodeResult:
    """Run one closed-loop episode; returns collision/progress metrics.

    actuation: "direct" feeds the MPC acceleration straight to the plant;
    "pid" routes it through the reference's PID + throttle/brake pedal
    mapping (PIDActuator), reproducing the CARLA actuation lag.
    """
    import time as _time

    solver = solver or FrenetSolver(cfg)
    plant = SyntheticPlant(cfg, make_route(route_kind),
                           obstacles_s_l)
    smoother = build_smoother(cfg.frenet.num_path)

    mean = jnp.asarray([v_des] * 4 + [0.0] * 4)
    cov = jnp.asarray(np.diag([20.0] * 4 + [100.0] * 4), jnp.float32)
    nmu = cfg.frenet.num_mean_update
    # max(nmu-1, 1): num_mean_update == 1 would otherwise make the
    # velocity->acceleration conversion below divide by zero
    t_target = max(nmu - 1, 1) * cfg.horizon.dt
    if actuation not in ("direct", "pid"):
        raise ValueError(f"actuation must be 'direct' or 'pid', got "
                         f"{actuation!r}")
    actuator = PIDActuator(cfg.horizon.dt) if actuation == "pid" else None
    if actuator is not None:
        actuator.prev_vel = float(plant.state[2])

    trace = []
    obs_trace = []
    times = []
    collided = False
    min_margin = np.inf
    goal_xy = np.array([float(plant.spline.cs_x(goal_arc)),
                        float(plant.spline.cs_y(goal_arc))])

    i = 0
    for i in range(max_steps):
        x_e, y_e, v_e, psi_e, psidot_e = plant.state
        if np.linalg.norm(plant.state[:2] - goal_xy) < 7.0:
            break

        # --- perception + local path (ego-shifted) -------------------------
        x_wp, y_wp, _ = waypoint_window(plant.spline, x_e, y_e,
                                        cfg.frenet.lookahead,
                                        cfg.frenet.num_path)
        x_wp_s = jnp.asarray(x_wp - x_e, jnp.float32)
        y_wp_s = jnp.asarray(y_wp - y_e, jnp.float32)
        x_sm, y_sm = smooth_path(smoother, x_wp_s, y_wp_s,
                                 cfg.frenet.smooth_threshold)
        frame = path_parameters(x_sm, y_sm)

        obs = perceive_obstacles(cfg, plant, (x_e, y_e), psi_e)
        obs_shift = obs.copy()
        obs_shift[:, 0] -= x_e
        obs_shift[:, 1] -= y_e
        conv = [global_to_frenet_obstacle(
            frame, *[jnp.float32(v) for v in row[:5]]) for row in obs_shift]
        s_o = jnp.stack([c[0] for c in conv])
        l_o = jnp.stack([c[1] for c in conv])
        vs_o = jnp.stack([c[2] for c in conv])
        vl_o = jnp.stack([c[3] for c in conv])
        psi_o = jnp.stack([c[4] for c in conv])
        tot_time = jnp.asarray(np.linspace(0, cfg.horizon.t_fin,
                                           cfg.horizon.num), jnp.float32)
        xt_o, yt_o, _ = constant_velocity_obstacles(s_o, l_o, vs_o, vl_o,
                                                    psi_o, tot_time)

        # --- solve (ego-frame global state: position 0, heading psi) -------
        init_global = jnp.asarray([0.0, 0.0, v_e, plant.vdot, psi_e,
                                   psidot_e], jnp.float32)
        t0 = _time.perf_counter()
        r = solver.solve(i, init_global, mean, cov, xt_o, yt_o, v_des, frame)
        r.cx.block_until_ready()
        times.append(_time.perf_counter() - t0)
        mean = r.mean_param  # receding-horizon warm start

        # --- control application with actuation noise ----------------------
        v_ctrl = float(jnp.mean(r.v_best[:nmu]))
        steer_ctrl = float(np.clip(float(jnp.mean(r.steering_best[:nmu])),
                                   -cfg.vehicle.steer_max,
                                   cfg.vehicle.steer_max))
        a_ctrl = (v_ctrl - v_e) / t_target

        if noise_on_control:
            np.random.seed(3 * seed + 5 * i + 23)
            if cfg.noise.kind == "gaussian":
                eps = float(np.random.normal(0, 1))
                a_ctrl = a_ctrl + cfg.noise.level * abs(a_ctrl) * eps
                steer_ctrl = steer_ctrl + cfg.noise.level * abs(steer_ctrl) * eps
            else:
                b1 = float(np.random.beta(cfg.noise.beta_a * abs(a_ctrl) + 1e-6,
                                          cfg.noise.beta_b * abs(a_ctrl) + 1e-6))
                a_ctrl = a_ctrl + cfg.noise.level * (2 * b1 - 1)
                b2 = float(np.random.beta(
                    cfg.noise.beta_a * abs(steer_ctrl) + 1e-6,
                    cfg.noise.beta_b * abs(steer_ctrl) + 1e-6))
                steer_ctrl = steer_ctrl + cfg.noise.level * (2 * b2 - 1)
            a_ctrl = a_ctrl + cfg.noise.acc_const * float(np.random.normal(0, 1))
            steer_ctrl = steer_ctrl + cfg.noise.steer_const * float(
                np.random.normal(0, 1))

        if actuator is not None:
            a_ctrl = actuator.step(a_ctrl, v_e)
        plant.step(a_ctrl, steer_ctrl)
        trace.append([*plant.state[:4], steer_ctrl])
        obs_trace.append(plant.obstacles[:, :2].copy()
                         if len(plant.obstacles) else np.zeros((0, 2)))

        margin = plant.obstacle_margin()
        min_margin = min(min_margin, margin)
        if margin <= 0.0:
            collided = True
            break

    distance = float(np.linalg.norm(plant.state[:2]
                                    - np.array(make_route(route_kind))[:, 0]))
    return EpisodeResult(collided=collided, steps=i + 1, distance=distance,
                         min_obstacle_margin=float(min_margin),
                         ego_trace=np.asarray(trace), solve_times=times,
                         obs_trace=(np.stack(obs_trace) if obs_trace
                                    else np.zeros((0, 0, 2))))
