"""Plain-Python/NumPy step-by-step env twin — the golden oracle for
dynamics fidelity (SURVEY.md §4 unit/env: "lax.scan env == step-by-step
Python env on identical action sequences").  Written independently of the
JAX implementation, with explicit Python control flow.
"""

from __future__ import annotations

import math

import numpy as np


class PyPointMassEnv:
    def __init__(self, dt=0.1, max_speed=2.0, max_accel=4.0, bounds_lo=0.0,
                 bounds_hi=1.0, goal_radius=0.05):
        self.dt = dt
        self.max_speed = max_speed
        self.max_accel = max_accel
        self.bounds_lo = bounds_lo
        self.bounds_hi = bounds_hi
        self.goal_radius = goal_radius

    def reset(self, scene):
        self.start = np.asarray(scene["start"], np.float32)
        self.goal = np.asarray(scene["goal"], np.float32)
        self.obstacles = [np.asarray(o, np.float32) for o in scene.get("obstacles", [])]
        self.pos = self.start.copy()
        self.vel = np.zeros(2, np.float32)
        self.t = 0
        self.done = False
        self.collided = False
        return self.pos.copy()

    def step(self, action):
        if self.done:
            return self.pos.copy()
        a = np.clip(np.asarray(action, np.float32), -self.max_accel, self.max_accel)
        vel = self.vel + a * self.dt
        speed = math.sqrt(float(vel[0] ** 2 + vel[1] ** 2))
        if speed > self.max_speed:
            vel = vel * np.float32(self.max_speed / max(speed, 1e-12))
        raw = self.pos + vel * self.dt
        pos = np.clip(raw, self.bounds_lo, self.bounds_hi)
        for i in range(2):
            if pos[i] != raw[i]:
                vel[i] = 0.0
        for o in self.obstacles:
            # segment (old pos -> new pos) vs disc, matching the env's
            # swept-collision semantics
            a, d, c = self.pos, pos - self.pos, o[:2]
            len2 = float(np.dot(d, d))
            t = 0.0 if len2 < 1e-12 else float(np.dot(c - a, d)) / len2
            t = min(max(t, 0.0), 1.0)
            closest = a + np.float32(t) * d
            if float(np.sum((c - closest) ** 2)) < float(o[2] ** 2):
                self.collided = True
        dist = math.sqrt(float(np.sum((pos - self.goal) ** 2)))
        if dist < self.goal_radius:
            self.done = True
        self.pos, self.vel = pos, vel
        self.t += 1
        return self.pos.copy()


class PyReacherEnv:
    """Step-by-step two-link-arm twin (mirrors envs/reacher.py, written
    with explicit Python control flow and plain NumPy)."""

    def __init__(self, dt=0.1, l1=0.4, l2=0.4, base=(0.5, 0.5),
                 max_accel=40.0, max_qd=4.0, goal_radius=0.05):
        self.dt = dt
        self.l1 = l1
        self.l2 = l2
        self.base = np.asarray(base, np.float32)
        self.max_accel = max_accel
        self.max_qd = max_qd
        self.goal_radius = goal_radius

    def _fk(self, q):
        elbow = self.base + np.float32(self.l1) * np.asarray(
            [math.cos(q[0]), math.sin(q[0])], np.float32)
        ee = elbow + np.float32(self.l2) * np.asarray(
            [math.cos(q[0] + q[1]), math.sin(q[0] + q[1])], np.float32)
        return elbow, ee

    def _segment_hits(self, p0, p1):
        for o in self.obstacles:
            d, c = p1 - p0, o[:2]
            len2 = float(np.dot(d, d))
            t = 0.0 if len2 < 1e-12 else float(np.dot(c - p0, d)) / len2
            t = min(max(t, 0.0), 1.0)
            closest = p0 + np.float32(t) * d
            if float(np.sum((c - closest) ** 2)) < float(o[2] ** 2):
                return True
        return False

    def reset(self, scene):
        self.start = np.asarray(scene["start"], np.float32)
        self.goal = np.asarray(scene["goal"], np.float32)
        self.obstacles = [np.asarray(o, np.float32)
                          for o in scene.get("obstacles", [])]
        # two-link IK, elbow-up branch (matches reacher.inverse_kinematics)
        rel = self.start - self.base
        c2 = (float(np.dot(rel, rel)) - self.l1**2 - self.l2**2) / (
            2.0 * self.l1 * self.l2)
        c2 = min(max(c2, -1.0), 1.0 - 1e-7)
        q2 = math.acos(c2)
        q1 = math.atan2(float(rel[1]), float(rel[0])) - math.atan2(
            self.l2 * math.sin(q2), self.l1 + self.l2 * c2)
        self.q = np.asarray([q1, q2], np.float32)
        self.qd = np.zeros(2, np.float32)
        _, self.pos = self._fk(self.q)
        self.t = 0
        self.done = False
        self.collided = False
        return self.pos.copy()

    def step(self, action):
        if self.done:
            return self.pos.copy()
        a = np.clip(np.asarray(action, np.float32),
                    -self.max_accel, self.max_accel)
        qd = np.clip(self.qd + a * np.float32(self.dt),
                     -self.max_qd, self.max_qd).astype(np.float32)
        q = (self.q + qd * np.float32(self.dt)).astype(np.float32)
        elbow, ee = self._fk(q)
        if (self._segment_hits(self.pos, ee)
                or self._segment_hits(self.base, elbow)
                or self._segment_hits(elbow, ee)):
            self.collided = True
        if math.sqrt(float(np.sum((ee - self.goal) ** 2))) < self.goal_radius:
            self.done = True
        self.q, self.qd, self.pos = q, qd, ee
        self.t += 1
        return self.pos.copy()


class PyArm3Env:
    """Step-by-step three-link-arm twin (mirrors envs/arm3.py, written
    with explicit Python control flow and plain NumPy)."""

    def __init__(self, dt=0.1, l1=0.4, l2=0.2, l3=0.2, base=(0.5, 0.5),
                 max_accel=40.0, max_qd=4.0, goal_radius=0.05):
        self.dt = dt
        self.l1 = l1
        self.l2 = l2
        self.l3 = l3
        self.base = np.asarray(base, np.float32)
        self.max_accel = max_accel
        self.max_qd = max_qd
        self.goal_radius = goal_radius

    def _fk(self, q):
        a1, a2, a3 = q[0], q[0] + q[1], q[0] + q[1] + q[2]
        j1 = self.base + np.float32(self.l1) * np.asarray(
            [math.cos(a1), math.sin(a1)], np.float32)
        j2 = j1 + np.float32(self.l2) * np.asarray(
            [math.cos(a2), math.sin(a2)], np.float32)
        ee = j2 + np.float32(self.l3) * np.asarray(
            [math.cos(a3), math.sin(a3)], np.float32)
        return j1, j2, ee

    def _segment_hits(self, p0, p1):
        for o in self.obstacles:
            d, c = p1 - p0, o[:2]
            len2 = float(np.dot(d, d))
            t = 0.0 if len2 < 1e-12 else float(np.dot(c - p0, d)) / len2
            t = min(max(t, 0.0), 1.0)
            closest = p0 + np.float32(t) * d
            if float(np.sum((c - closest) ** 2)) < float(o[2] ** 2):
                return True
        return False

    def reset(self, scene):
        self.start = np.asarray(scene["start"], np.float32)
        self.goal = np.asarray(scene["goal"], np.float32)
        self.obstacles = [np.asarray(o, np.float32)
                          for o in scene.get("obstacles", [])]
        # q3 = 0 + two-link IK over the virtual links (l1, l2+l3),
        # elbow-up branch (matches arm3.inverse_kinematics)
        lv = self.l2 + self.l3
        rel = self.start - self.base
        c2 = (float(np.dot(rel, rel)) - self.l1**2 - lv**2) / (
            2.0 * self.l1 * lv)
        c2 = min(max(c2, -1.0), 1.0 - 1e-7)
        q2 = math.acos(c2)
        q1 = math.atan2(float(rel[1]), float(rel[0])) - math.atan2(
            lv * math.sin(q2), self.l1 + lv * c2)
        self.q = np.asarray([q1, q2, 0.0], np.float32)
        self.qd = np.zeros(3, np.float32)
        _, _, self.pos = self._fk(self.q)
        self.t = 0
        self.done = False
        self.collided = False
        return self.pos.copy()

    def step(self, action):
        if self.done:
            return self.pos.copy()
        a = np.clip(np.asarray(action, np.float32),
                    -self.max_accel, self.max_accel)
        qd = np.clip(self.qd + a * np.float32(self.dt),
                     -self.max_qd, self.max_qd).astype(np.float32)
        q = (self.q + qd * np.float32(self.dt)).astype(np.float32)
        j1, j2, ee = self._fk(q)
        if (self._segment_hits(self.pos, ee)
                or self._segment_hits(self.base, j1)
                or self._segment_hits(j1, j2)
                or self._segment_hits(j2, ee)):
            self.collided = True
        if math.sqrt(float(np.sum((ee - self.goal) ** 2))) < self.goal_radius:
            self.done = True
        self.q, self.qd, self.pos = q, qd, ee
        self.t += 1
        return self.pos.copy()


class PyUnicycleEnv:
    """Step-by-step unicycle twin (mirrors envs/unicycle.py, written with
    explicit Python control flow)."""

    def __init__(self, dt=0.1, max_speed=1.5, max_accel=4.0, max_steer=4.0,
                 bounds_lo=0.0, bounds_hi=1.0, goal_radius=0.05):
        self.dt = dt
        self.max_speed = max_speed
        self.max_accel = max_accel
        self.max_steer = max_steer
        self.bounds_lo = bounds_lo
        self.bounds_hi = bounds_hi
        self.goal_radius = goal_radius

    def reset(self, scene):
        self.start = np.asarray(scene["start"], np.float32)
        self.goal = np.asarray(scene["goal"], np.float32)
        self.obstacles = [np.asarray(o, np.float32)
                          for o in scene.get("obstacles", [])]
        self.pos = self.start.copy()
        d = self.goal - self.start
        self.heading = math.atan2(float(d[1]), float(d[0]))
        self.speed = 0.0
        self.t = 0
        self.done = False
        self.collided = False
        return self.pos.copy()

    def step(self, action):
        if self.done:
            return self.pos.copy()
        a = min(max(float(action[0]), -self.max_accel), self.max_accel)
        w = min(max(float(action[1]), -self.max_steer), self.max_steer)
        # float32 accumulation to track the JAX env bit-closely
        heading = np.float32(self.heading + np.float32(w * self.dt))
        speed = np.float32(
            min(max(self.speed + np.float32(a * self.dt), 0.0),
                self.max_speed))
        raw = self.pos + speed * np.asarray(
            [math.cos(heading), math.sin(heading)],
            np.float32) * np.float32(self.dt)
        pos = np.clip(raw, self.bounds_lo, self.bounds_hi)
        if not np.array_equal(pos, raw):
            speed = 0.0
        for o in self.obstacles:
            p0, d, c = self.pos, pos - self.pos, o[:2]
            len2 = float(np.dot(d, d))
            t = 0.0 if len2 < 1e-12 else float(np.dot(c - p0, d)) / len2
            t = min(max(t, 0.0), 1.0)
            closest = p0 + np.float32(t) * d
            if float(np.sum((c - closest) ** 2)) < float(o[2] ** 2):
                self.collided = True
        dist = math.sqrt(float(np.sum((pos - self.goal) ** 2)))
        if dist < self.goal_radius:
            self.done = True
        self.pos, self.heading, self.speed = pos, heading, speed
        self.t += 1
        return self.pos.copy()


class PyQuadrotorEnv:
    """Step-by-step planar-quadrotor twin (mirrors envs/quadrotor.py,
    written with explicit Python control flow)."""

    def __init__(self, dt=0.1, mass=1.0, inertia=0.005, arm=0.1,
                 gravity=0.5, max_thrust=1.5, max_speed=2.0, max_omega=8.0,
                 bounds_lo=0.0, bounds_hi=1.0, goal_radius=0.05):
        self.dt = dt
        self.mass = mass
        self.inertia = inertia
        self.arm = arm
        self.gravity = gravity
        self.max_thrust = max_thrust
        self.max_speed = max_speed
        self.max_omega = max_omega
        self.bounds_lo = bounds_lo
        self.bounds_hi = bounds_hi
        self.goal_radius = goal_radius

    def reset(self, scene):
        self.start = np.asarray(scene["start"], np.float32)
        self.goal = np.asarray(scene["goal"], np.float32)
        self.obstacles = [np.asarray(o, np.float32)
                          for o in scene.get("obstacles", [])]
        self.pos = self.start.copy()
        self.vel = np.zeros(2, np.float32)
        self.theta = 0.0
        self.omega = 0.0
        self.t = 0
        self.done = False
        self.collided = False
        return self.pos.copy()

    def step(self, action):
        if self.done:
            return self.pos.copy()
        u1 = min(max(float(action[0]), 0.0), self.max_thrust)
        u2 = min(max(float(action[1]), 0.0), self.max_thrust)
        torque = np.float32((u2 - u1) * self.arm)
        omega = np.float32(
            min(max(self.omega + np.float32(torque / self.inertia * self.dt),
                    -self.max_omega), self.max_omega))
        theta = np.float32(self.theta + np.float32(omega * self.dt))
        thrust = np.float32(u1 + u2)
        up = np.asarray([-math.sin(theta), math.cos(theta)], np.float32)
        acc = (thrust / np.float32(self.mass) * up
               + np.asarray([0.0, -self.gravity], np.float32))
        vel = np.clip(self.vel + acc * np.float32(self.dt),
                      -self.max_speed, self.max_speed).astype(np.float32)
        raw = self.pos + vel * np.float32(self.dt)
        pos = np.clip(raw, self.bounds_lo, self.bounds_hi)
        for i in range(2):  # per-component absorbing walls
            if pos[i] != raw[i]:
                vel[i] = 0.0
        for o in self.obstacles:
            p0, d, c = self.pos, pos - self.pos, o[:2]
            len2 = float(np.dot(d, d))
            t = 0.0 if len2 < 1e-12 else float(np.dot(c - p0, d)) / len2
            t = min(max(t, 0.0), 1.0)
            closest = p0 + np.float32(t) * d
            if float(np.sum((c - closest) ** 2)) < float(o[2] ** 2):
                self.collided = True
        dist = math.sqrt(float(np.sum((pos - self.goal) ** 2)))
        if dist < self.goal_radius:
            self.done = True
        self.pos, self.vel = pos, vel
        self.theta, self.omega = theta, omega
        self.t += 1
        return self.pos.copy()
