"""Distributed-logic tests on the virtual 8-CPU-device mesh (SURVEY §4:
"DP on v5p-8 == single-chip run with same global batch (up to reduction
order); diversity-sample sharding == unsharded")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference
from ndivplanning_tpu.parallel.mesh import make_mesh
from ndivplanning_tpu.parallel.sharded_step import (
    make_sharded_train_step,
    ndiv_loss_sharded,
    shard_state,
)
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.train.step import train_step_fused
from ndivplanning_tpu.utils.config import get_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _cfg(dp=1, div=1, **kw):
    d = dict(batch_size=16, k=8, g_hidden=(32,), d_hidden=(32,),
             cond_embed_dim=8, dp_shards=dp, div_shards=div)
    d.update(kw)
    return get_config("pod_dp", **d)


@pytest.mark.parametrize("dp,div", [(8, 1), (4, 2), (2, 4)])
def test_sharded_ndiv_matches_reference(dp, div):
    mesh = make_mesh(dp=dp, div=div)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(16, 8, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(16, 8, 64)).astype(np.float32))
    want = float(ndiv_loss_reference(z, x, 0.8))
    got = float(ndiv_loss_sharded(z, x, 0.8, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("dp,div", [(8, 1), (4, 2), (2, 4)])
def test_sharded_ndiv_pallas_matches_reference(dp, div):
    # The production multi-chip path: fused kernel on shard-local blocks
    # (VERDICT round-1 missing #2) — values AND gradients vs reference.
    mesh = make_mesh(dp=dp, div=div)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(16, 8, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(16, 8, 64)).astype(np.float32))

    want = float(ndiv_loss_reference(z, x, 0.8))
    got = float(ndiv_loss_sharded(z, x, 0.8, mesh, impl="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    g_want = jax.grad(lambda a, b: ndiv_loss_reference(a, b, 0.8),
                      argnums=(0, 1))(z, x)
    g_got = jax.grad(
        lambda a, b: ndiv_loss_sharded(a, b, 0.8, mesh, impl="pallas"),
        argnums=(0, 1),
    )(z, x)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_ndiv_pallas_ragged_batch():
    # b_local=2 conditions over div=4 shards: chunk padding path.
    mesh = make_mesh(dp=2, div=4)
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(6, 8, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(6, 8, 16)).astype(np.float32))
    want = float(ndiv_loss_reference(z, x, 0.8))
    got = float(ndiv_loss_sharded(z, x, 0.8, mesh, impl="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("dp,div", [(4, 2)])
def test_sharded_step_pallas_ndiv_matches_single_device(dp, div):
    # Full sharded train step with the fused-kernel NDiv sub-region
    # forced on (interpret mode on CPU) vs the single-device step.
    cfg_multi = _cfg(dp=dp, div=div, ndiv_impl="pallas")
    cfg_single = _cfg(dp=1, div=1, ndiv_impl="pallas")

    s1 = create_train_state(cfg_single)
    for _ in range(2):
        s1, m1 = train_step_fused(cfg_single, s1)

    step_fn, mesh = make_sharded_train_step(cfg_multi)
    s2 = shard_state(create_train_state(cfg_multi), mesh)
    for _ in range(2):
        s2, m2 = step_fn(s2)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k][-1]), rtol=1e-3,
                                   atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


@pytest.mark.parametrize("dp,div", [(4, 2), (8, 1)])
def test_sharded_step_matches_single_device(dp, div):
    cfg_multi = _cfg(dp=dp, div=div)
    cfg_single = _cfg(dp=1, div=1)

    # Single-device run.
    s1 = create_train_state(cfg_single)
    for _ in range(3):
        s1, m1 = train_step_fused(cfg_single, s1)

    # Sharded run: same config hash except mesh fields (the math uses
    # only batch/k/model fields, so the programs are identical).
    step_fn, mesh = make_sharded_train_step(cfg_multi)
    s2 = shard_state(create_train_state(cfg_multi), mesh)
    for _ in range(3):
        s2, m2 = step_fn(s2)

    # Parity up to reduction order (f32 tolerance).
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k][-1]), rtol=1e-3,
                                   atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


def test_sharded_step_is_self_deterministic():
    cfg = _cfg(dp=4, div=2)
    step_fn, mesh = make_sharded_train_step(cfg)

    def curve():
        s = shard_state(create_train_state(cfg), mesh)
        out = []
        for _ in range(3):
            s, m = step_fn(s)
            out.append(float(m["g_ndiv"][-1]))
        return out

    np.testing.assert_array_equal(np.asarray(curve()), np.asarray(curve()))


def test_pod_dp_preset_runs_shrunk():
    # The BASELINE.json:11 topology (8-way) at test scale.
    cfg = _cfg(dp=8, div=1, batch_size=32, k=4)
    step_fn, mesh = make_sharded_train_step(cfg)
    s = shard_state(create_train_state(cfg), mesh)
    s, m = step_fn(s)
    assert int(s.step) == 1
    for name, v in m.items():
        assert np.all(np.isfinite(np.asarray(v))), name


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    # Checkpoint/restore of a mesh-sharded TrainState (pod resume path).
    from ndivplanning_tpu.utils import checkpoint as ckpt

    cfg = _cfg(dp=4, div=2)
    step_fn, mesh = make_sharded_train_step(cfg)
    s = shard_state(create_train_state(cfg), mesh)
    s, _ = step_fn(s)
    ckpt.save_checkpoint(str(tmp_path), s)

    template = shard_state(create_train_state(cfg), mesh)
    restored = ckpt.restore_latest(str(tmp_path), template)
    assert restored is not None and int(restored.step) == 1
    # Restored run continues identically to the uninterrupted one.
    s_cont, m_cont = step_fn(restored)
    s2 = shard_state(create_train_state(cfg), mesh)
    s2, _ = step_fn(s2)
    s2, m2 = step_fn(s2)
    np.testing.assert_allclose(float(m_cont["g_ndiv"][-1]),
                               float(m2["g_ndiv"][-1]), rtol=1e-5)


def test_plan_batch_shards_over_dp():
    # Scene-batched planning under an explicit dp sharding: the program
    # compiles and executes with the scene axis distributed.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ndivplanning_tpu.data.scenes import random_scene_batch
    from ndivplanning_tpu.planning.planner import plan_batch

    cfg = get_config("pod_dp", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, n_candidates=16,
                     conditioning="startgoal")
    state = create_train_state(cfg)
    mesh = make_mesh(dp=8, div=1)
    scenes = random_scene_batch(jax.random.PRNGKey(0), 8)
    conditions = jnp.concatenate([scenes.start, scenes.goal], axis=-1)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)

    sharding = NamedSharding(mesh, P("dp"))
    scenes = jax.device_put(scenes, sharding)
    conditions = jax.device_put(conditions, sharding)
    keys = jax.device_put(keys, sharding)
    result = plan_batch(cfg, state, scenes, conditions, keys,
                        n_candidates=16, n_diverse=4)
    assert result.best_traj.shape == (8, cfg.horizon, cfg.state_dim)
    assert np.all(np.isfinite(np.asarray(result.best_score)))


@pytest.mark.parametrize("dp,div,n", [(8, 1, 64), (4, 2, 64), (8, 1, 100)])
def test_sharded_plan_matches_unsharded(dp, div, n):
    # Candidate-axis sharding for the latency path: same program with
    # constraints, so the sharded single-scene plan must reproduce the
    # unsharded plan() bit-for-bit-ish (1-ulp XLA program drift allowed).
    # n=100 exercises GSPMD's uneven-shard padding (100 % 8 != 0).
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.parallel.sharded_plan import make_sharded_plan
    from ndivplanning_tpu.planning.planner import plan

    cfg = get_config("pod_dp", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8,
                     conditioning="startgoal", dp_shards=dp, div_shards=div)
    state = create_train_state(cfg)
    mesh = make_mesh(dp=dp, div=div)
    state_r = shard_state(state, mesh)
    scene = random_scene(jax.random.PRNGKey(0))
    condition = jnp.concatenate([scene.start, scene.goal], axis=-1)
    key = jax.random.PRNGKey(1)

    plan_fn, _ = make_sharded_plan(cfg, mesh, n_candidates=n, n_diverse=4)
    got = plan_fn(state_r, scene, condition, key)
    want = plan(cfg, state, scene, condition, key, n_candidates=n,
                n_diverse=4)

    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.best_traj),
                               np.asarray(want.best_traj), rtol=1e-5,
                               atol=1e-6)
    assert int(got.diverse_idx[0]) == int(want.diverse_idx[0])
    assert float(got.best_score) == pytest.approx(float(want.best_score),
                                                  rel=1e-5)
    if n % 8 == 0:
        # Output layout contract: the candidate set stays sharded.
        assert got.taus.sharding.is_equivalent_to(
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
                ("dp", "div"))), got.taus.ndim)


def test_sharded_cem_matches_unsharded():
    # The constraint hook changes layout, not values: sharded CEM must
    # reproduce plan_cem's refinement trajectory (same PRNG draws).
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.parallel.sharded_plan import make_sharded_cem
    from ndivplanning_tpu.planning.cem import plan_cem

    cfg = get_config("pod_dp", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8,
                     conditioning="startgoal", dp_shards=4, div_shards=2,
                     n_candidates=64, cem_iters=3)
    state = create_train_state(cfg)
    mesh = make_mesh(dp=4, div=2)
    state_r = shard_state(state, mesh)
    scene = random_scene(jax.random.PRNGKey(0))
    condition = jnp.concatenate([scene.start, scene.goal], axis=-1)
    key = jax.random.PRNGKey(1)

    cem_fn, _ = make_sharded_cem(cfg, mesh, n_candidates=16, n_diverse=4)
    got, got_curve = cem_fn(state_r, scene, condition, key)
    want, want_curve = plan_cem(cfg, state, scene, condition, key,
                                n_candidates=16, n_diverse=4)

    np.testing.assert_allclose(np.asarray(got_curve),
                               np.asarray(want_curve), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.best_traj),
                               np.asarray(want.best_traj), rtol=1e-5,
                               atol=1e-6)
    assert float(got.best_score) == pytest.approx(float(want.best_score),
                                                  rel=1e-5)


def test_sharded_grad_matches_unsharded():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.parallel.sharded_plan import make_sharded_grad
    from ndivplanning_tpu.planning.grad_refine import plan_grad

    cfg = get_config("pod_dp", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8,
                     conditioning="startgoal", dp_shards=4, div_shards=2,
                     grad_refine_steps=4)
    state = create_train_state(cfg)
    mesh = make_mesh(dp=4, div=2)
    state_r = shard_state(state, mesh)
    scene = random_scene(jax.random.PRNGKey(0))
    condition = jnp.concatenate([scene.start, scene.goal], axis=-1)
    key = jax.random.PRNGKey(1)

    grad_fn, _ = make_sharded_grad(cfg, mesh, n_candidates=16, n_diverse=4)
    got, got_curve = grad_fn(state_r, scene, condition, key)
    want, want_curve = plan_grad(cfg, state, scene, condition, key,
                                 n_candidates=16, n_diverse=4)

    np.testing.assert_allclose(np.asarray(got_curve),
                               np.asarray(want_curve), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.best_traj),
                               np.asarray(want.best_traj), rtol=1e-4,
                               atol=1e-5)
    assert float(got.best_score) == pytest.approx(float(want.best_score),
                                                  rel=1e-4)


def test_sharded_ilqr_matches_unsharded():
    # Round-4 planner family: the warm-start axis pinned over the mesh
    # must reproduce plan_ilqr's refinement exactly (same PRNG draws,
    # same Riccati iterations — layout only).
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.parallel.sharded_plan import make_sharded_ilqr
    from ndivplanning_tpu.planning.ilqr import plan_ilqr

    cfg = get_config("pod_dp", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8,
                     conditioning="startgoal", dp_shards=4, div_shards=2,
                     ilqr_iters=2)
    state = create_train_state(cfg)
    mesh = make_mesh(dp=4, div=2)
    state_r = shard_state(state, mesh)
    scene = random_scene(jax.random.PRNGKey(0))
    condition = jnp.concatenate([scene.start, scene.goal], axis=-1)
    key = jax.random.PRNGKey(1)

    ilqr_fn, _ = make_sharded_ilqr(cfg, mesh, n_candidates=8, n_diverse=4)
    got, got_curve = ilqr_fn(state_r, scene, condition, key)
    want, want_curve = plan_ilqr(cfg, state, scene, condition, key,
                                 n_candidates=8, n_diverse=4)

    np.testing.assert_allclose(np.asarray(got_curve),
                               np.asarray(want_curve), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.best_traj),
                               np.asarray(want.best_traj), rtol=1e-4,
                               atol=1e-5)
    assert float(got.best_score) == pytest.approx(float(want.best_score),
                                                  rel=1e-4)


def test_sharded_cem_trajopt_matches_unsharded():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.parallel.sharded_plan import (
        make_sharded_cem_trajopt,
    )
    from ndivplanning_tpu.planning.trajopt import plan_cem_trajopt

    cfg = get_config("pod_dp", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8,
                     conditioning="startgoal", dp_shards=4, div_shards=2,
                     n_candidates=16, cem_iters=2, trajopt_steps=4)
    state = create_train_state(cfg)
    mesh = make_mesh(dp=4, div=2)
    state_r = shard_state(state, mesh)
    scene = random_scene(jax.random.PRNGKey(0))
    condition = jnp.concatenate([scene.start, scene.goal], axis=-1)
    key = jax.random.PRNGKey(1)

    hy_fn, _ = make_sharded_cem_trajopt(cfg, mesh, n_diverse=4)
    got, got_curve = hy_fn(state_r, scene, condition, key)
    want, want_curve = plan_cem_trajopt(cfg, state, scene, condition, key,
                                        n_diverse=4)

    np.testing.assert_allclose(np.asarray(got_curve),
                               np.asarray(want_curve), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.best_traj),
                               np.asarray(want.best_traj), rtol=1e-4,
                               atol=1e-5)
    assert float(got.best_score) == pytest.approx(float(want.best_score),
                                                  rel=1e-4)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(dp=64, div=2)
