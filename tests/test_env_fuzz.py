"""Randomized cross-family env fuzz: every dynamics family must match
its independent NumPy twin on random parameters, random scenes, and
random action sequences (SURVEY.md §4's hypothesis-style strategy,
applied to the env layer the way test_ndiv_fuzz.py applies it to the
kernel).  The fixed golden tests pin three seeds per family; this sweep
draws params too, so parameter-dependent branches (clip limits, radii,
wall absorption) get coverage the goldens cannot give."""

import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.envs.pointmass import reset as pm_reset, step as pm_step
from ndivplanning_tpu.envs.quadrotor import (
    QuadrotorParams,
    reset as qd_reset,
    step as qd_step,
)
from ndivplanning_tpu.envs.reacher import (
    ReacherParams,
    reset as re_reset,
    step as re_step,
)
from ndivplanning_tpu.envs.arm3 import (
    Arm3Params,
    reset as a3_reset,
    step as a3_step,
)
from ndivplanning_tpu.envs.types import EnvParams, Scene
from ndivplanning_tpu.envs.unicycle import (
    UnicycleParams,
    reset as un_reset,
    step as un_step,
)
from tests.python_env_twin import (
    PyArm3Env,
    PyPointMassEnv,
    PyQuadrotorEnv,
    PyReacherEnv,
    PyUnicycleEnv,
)

N_CASES = 8
N_STEPS = 30


def _random_scene(rng):
    n_obs = int(rng.integers(0, 4))
    return {
        "start": rng.uniform(0.05, 0.95, 2).astype(np.float32).tolist(),
        "goal": rng.uniform(0.05, 0.95, 2).astype(np.float32).tolist(),
        "obstacles": [
            [float(rng.uniform(0.1, 0.9)), float(rng.uniform(0.1, 0.9)),
             float(rng.uniform(0.04, 0.15))]
            for _ in range(n_obs)
        ],
    }


def _drive(jax_reset, jax_step, make_params, twin, scene_dict, actions,
           kwargs, atol):
    scene = Scene.create(scene_dict["start"], scene_dict["goal"],
                         scene_dict["obstacles"])
    params = make_params(**kwargs)
    s = jax_reset(params, scene)
    twin.reset(scene_dict)
    for i, a in enumerate(actions):
        s, _ = jax_step(params, scene, s, jnp.asarray(a))
        py_pos = twin.step(a)
        np.testing.assert_allclose(
            np.asarray(s.pos), py_pos, rtol=1e-5, atol=atol,
            err_msg=f"step {i} kwargs={kwargs}")
    assert bool(s.done > 0.5) == twin.done, kwargs
    assert bool(s.collided > 0.5) == twin.collided, kwargs


@pytest.mark.parametrize("case", range(N_CASES))
def test_pointmass_random_params_match_twin(case):
    rng = np.random.default_rng(1000 + case)
    kwargs = dict(dt=float(rng.uniform(0.02, 0.2)),
                  max_speed=float(rng.uniform(0.5, 3.0)),
                  max_accel=float(rng.uniform(1.0, 8.0)),
                  goal_radius=float(rng.uniform(0.02, 0.1)))
    actions = rng.normal(scale=6.0, size=(N_STEPS, 2)).astype(np.float32)
    _drive(pm_reset, pm_step, EnvParams.create, PyPointMassEnv(**kwargs),
           _random_scene(rng), actions, kwargs, atol=2e-5)


@pytest.mark.parametrize("case", range(N_CASES))
def test_unicycle_random_params_match_twin(case):
    rng = np.random.default_rng(2000 + case)
    kwargs = dict(dt=float(rng.uniform(0.02, 0.2)),
                  max_speed=float(rng.uniform(0.5, 3.0)),
                  max_accel=float(rng.uniform(1.0, 8.0)),
                  max_steer=float(rng.uniform(1.0, 8.0)),
                  goal_radius=float(rng.uniform(0.02, 0.1)))
    actions = rng.normal(scale=5.0, size=(N_STEPS, 2)).astype(np.float32)
    _drive(un_reset, un_step, UnicycleParams.create, PyUnicycleEnv(**kwargs),
           _random_scene(rng), actions, kwargs, atol=2e-5)


@pytest.mark.parametrize("case", range(N_CASES))
def test_reacher_random_params_match_twin(case):
    rng = np.random.default_rng(3000 + case)
    # Link lengths keep l1+l2 >= the corner distance (sqrt(.5) ~ .707)
    # so every sampled start stays reachable, matching the family's
    # unit-box coverage contract.
    l1 = float(rng.uniform(0.35, 0.45))
    kwargs = dict(dt=float(rng.uniform(0.02, 0.2)), l1=l1,
                  l2=float(rng.uniform(0.75 - l1 + 0.05, 0.45)),
                  max_accel=float(rng.uniform(10.0, 60.0)),
                  max_qd=float(rng.uniform(2.0, 6.0)),
                  goal_radius=float(rng.uniform(0.02, 0.1)))
    actions = rng.normal(scale=25.0, size=(N_STEPS, 2)).astype(np.float32)
    _drive(re_reset, re_step, ReacherParams.create, PyReacherEnv(**kwargs),
           _random_scene(rng), actions, kwargs, atol=5e-5)


@pytest.mark.parametrize("case", range(N_CASES))
def test_arm3_random_params_match_twin(case):
    rng = np.random.default_rng(5000 + case)
    # Total reach l1+l2+l3 covers the corner distance (sqrt(.5) ~ .707);
    # splits keep the virtual two-link (l1, l2+l3) away from its own
    # degenerate annulus so every sampled start stays IK-reachable.
    l1 = float(rng.uniform(0.35, 0.45))
    rest = float(rng.uniform(0.75 - l1 + 0.05, 0.45))
    split = float(rng.uniform(0.35, 0.65))
    kwargs = dict(dt=float(rng.uniform(0.02, 0.2)), l1=l1,
                  l2=rest * split, l3=rest * (1.0 - split),
                  max_accel=float(rng.uniform(10.0, 60.0)),
                  max_qd=float(rng.uniform(2.0, 6.0)),
                  goal_radius=float(rng.uniform(0.02, 0.1)))
    actions = rng.normal(scale=25.0, size=(N_STEPS, 3)).astype(np.float32)
    _drive(a3_reset, a3_step, Arm3Params.create, PyArm3Env(**kwargs),
           _random_scene(rng), actions, kwargs, atol=5e-5)


@pytest.mark.parametrize("case", range(N_CASES))
def test_quadrotor_random_params_match_twin(case):
    rng = np.random.default_rng(4000 + case)
    kwargs = dict(dt=float(rng.uniform(0.02, 0.2)),
                  inertia=float(rng.uniform(0.002, 0.02)),
                  arm=float(rng.uniform(0.05, 0.2)),
                  gravity=float(rng.uniform(0.2, 1.5)),
                  max_thrust=float(rng.uniform(0.8, 3.0)),
                  max_speed=float(rng.uniform(0.5, 3.0)),
                  max_omega=float(rng.uniform(2.0, 12.0)),
                  goal_radius=float(rng.uniform(0.02, 0.1)))
    # Thrusts around hover with spread past both clip rails.
    hover = kwargs["gravity"] / 2.0
    actions = (hover + rng.normal(scale=1.0, size=(N_STEPS, 2))).astype(
        np.float32)
    _drive(qd_reset, qd_step, QuadrotorParams.create,
           PyQuadrotorEnv(**kwargs), _random_scene(rng), actions, kwargs,
           atol=2e-5)
