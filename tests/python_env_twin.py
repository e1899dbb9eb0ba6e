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
