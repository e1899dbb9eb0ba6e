"""Fused train step tests: it runs, learns signal flows, alternation
semantics hold (SURVEY.md §3.1, §7 hard-parts #3)."""

import jax
import numpy as np
import pytest

from ndivplanning_tpu.data.tasks import make_task
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.train.step import train_step, train_step_fused
from ndivplanning_tpu.utils.config import get_config


def _small(preset, **kw):
    defaults = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
                    cond_embed_dim=8, image_size=16)
    defaults.update(kw)
    return get_config(preset, **defaults)


@pytest.mark.parametrize("preset", ["pointmass2d", "goalcond", "imagecond"])
def test_train_step_runs_and_updates(preset):
    cfg = _small(preset)
    state = create_train_state(cfg)
    g0 = jax.tree.leaves(state.g_params)[0].copy()
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(42), cfg.batch_size)
    state, metrics = train_step(cfg, state, batch)
    assert int(state.step) == 1
    for name, v in metrics.items():
        assert np.isfinite(float(v)), f"{name} not finite"
    g1 = jax.tree.leaves(state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1)), "G params frozen"


def test_fused_step_runs():
    cfg = _small("pointmass2d")
    state = create_train_state(cfg)
    state, metrics = train_step_fused(cfg, state)
    state, metrics = train_step_fused(cfg, state)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["g_ndiv"]))


def test_ndiv_decreases_when_weighted():
    # With a large ndiv weight and no adversarial pressure to fight,
    # 30 steps should reduce the ndiv term from its start value.
    cfg = _small("pointmass2d", ndiv_weight=10.0)
    state = create_train_state(cfg)
    first = last = None
    for _ in range(30):
        state, metrics = train_step_fused(cfg, state)
        if first is None:
            first = float(metrics["g_ndiv"])
        last = float(metrics["g_ndiv"])
    assert last <= first + 1e-3, (first, last)


def test_rng_advances_every_step():
    cfg = _small("pointmass2d")
    state = create_train_state(cfg)
    r0 = np.asarray(jax.random.key_data(state.rng)).copy()
    state, _ = train_step_fused(cfg, state)
    r1 = np.asarray(jax.random.key_data(state.rng))
    assert not np.array_equal(r0, r1)


def test_no_nans_over_many_steps():
    cfg = _small("goalcond")
    state = create_train_state(cfg)
    for _ in range(20):
        state, metrics = train_step_fused(cfg, state)
    for name, v in metrics.items():
        assert np.isfinite(float(v)), name
    for leaf in jax.tree.leaves(state.g_params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize("gan_loss", ["bce", "lsgan", "hinge"])
def test_gan_loss_variants(gan_loss):
    cfg = _small("pointmass2d", gan_loss=gan_loss)
    state = create_train_state(cfg)
    state, metrics = train_step_fused(cfg, state)
    assert np.isfinite(float(metrics["d_loss"]))


def test_feature_matching_loss():
    """feature_matching_weight adds the Salimans-style first-moment term
    to the G objective and the metrics stream."""
    import jax

    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_step_fused

    cfg = get_config("imagecond", batch_size=4, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, image_size=16,
                     feature_matching_weight=1.0)
    state = create_train_state(cfg)
    state, m = train_step_fused(cfg, state)
    assert "g_fm" in m
    assert np.isfinite(float(m["g_fm"])) and float(m["g_fm"]) >= 0.0
    # The term participates in g_total.
    assert abs(float(m["g_total"])
               - (float(m["g_adv"]) + cfg.ndiv_weight * float(m["g_ndiv"])
                  + float(m["g_fm"]))) < 1e-4

    # Disabled => no g_fm key, baseline objective unchanged.
    cfg0 = cfg.replace(feature_matching_weight=0.0)
    state0 = create_train_state(cfg0)
    state0, m0 = train_step_fused(cfg0, state0)
    assert "g_fm" not in m0


def test_encoder_features_capacity_knob():
    from ndivplanning_tpu.train.state import create_train_state, param_count

    cfg_s = get_config("imagecond", batch_size=4, k=4, image_size=16)
    cfg_l = cfg_s.replace(encoder_features=(32, 64, 128))
    n_s = param_count(create_train_state(cfg_s).g_params)
    n_l = param_count(create_train_state(cfg_l).g_params)
    assert n_l > n_s


def test_g_ema_tracks_and_drives_eval():
    """g_ema_decay > 0: EMA params trail the live params and are what
    eval/planning consume (gen_params)."""
    import jax

    from ndivplanning_tpu.train.state import (
        create_train_state,
        gen_params,
    )
    from ndivplanning_tpu.train.step import train_step_fused

    cfg = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, g_ema_decay=0.9)
    state = create_train_state(cfg)
    p0 = jax.tree.leaves(state.g_params)[0].copy()
    for _ in range(3):
        state, _ = train_step_fused(cfg, state)
    live = jax.tree.leaves(state.g_params)[0]
    ema = jax.tree.leaves(state.g_ema_params)[0]
    # EMA moved off init but lags the live params.
    assert not np.allclose(np.asarray(ema), np.asarray(p0))
    assert not np.allclose(np.asarray(ema), np.asarray(live))
    assert np.linalg.norm(np.asarray(ema) - np.asarray(p0)) < \
        np.linalg.norm(np.asarray(live) - np.asarray(p0))
    assert gen_params(cfg, state) is state.g_ema_params

    # decay == 0: EMA degenerates to the live params, eval uses live.
    cfg0 = cfg.replace(g_ema_decay=0.0)
    s0 = create_train_state(cfg0)
    s0, _ = train_step_fused(cfg0, s0)
    for a, b in zip(jax.tree.leaves(s0.g_params),
                    jax.tree.leaves(s0.g_ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert gen_params(cfg0, s0) is s0.g_params


def test_r1_penalty_matches_manual_computation():
    """r1_weight > 0 adds (w/2)*E_real[||dD/dtau||^2] to the D objective:
    the d_r1 metric equals the hand-computed penalty at the PRE-update D
    params, and d_loss shifts by exactly 0.5*w*r1 vs the unpenalised
    config (identical seed => identical params/latents)."""
    import jax.numpy as jnp

    from ndivplanning_tpu.train.state import build_models

    w = 3.0
    cfg = _small("goalcond", r1_weight=w)
    cfg0 = cfg.replace(r1_weight=0.0)
    state = create_train_state(cfg)
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(7), cfg.batch_size)

    # Manual penalty at the pre-update D params, BEFORE the donated step
    # invalidates the state's buffers.
    _, disc = build_models(cfg)
    d_params0 = state.d_params

    def real_score(traj):
        return jnp.sum(disc.apply(d_params0, batch.conditions, traj))

    g = jax.grad(real_score)(batch.real_traj)
    manual = float(jnp.mean(jnp.sum(jnp.square(g), axis=(1, 2))))

    _, m = train_step(cfg, state, batch)
    assert "d_r1" in m and np.isfinite(float(m["d_r1"]))
    assert float(m["d_r1"]) >= 0.0
    np.testing.assert_allclose(float(m["d_r1"]), manual, rtol=1e-4)

    # Same seed, penalty off: d_loss differs by exactly the R1 term.
    state0 = create_train_state(cfg0)
    _, m0 = train_step(cfg0, state0, batch)
    assert "d_r1" not in m0
    np.testing.assert_allclose(
        float(m["d_loss"]), float(m0["d_loss"]) + 0.5 * w * manual,
        rtol=1e-4)


def test_instance_noise_anneals_inside_the_program():
    """instance_noise_sigma reports the annealed sigma (a traced
    function of state.step — same compiled program at every step), hits
    exactly 0 past the anneal horizon, and is absent when disabled."""
    import jax.numpy as jnp

    cfg = _small("goalcond", instance_noise_sigma=0.1,
                 instance_noise_anneal=100)
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(3), cfg.batch_size)

    state = create_train_state(cfg)
    _, m = train_step(cfg, state, batch)
    assert np.isclose(float(m["d_noise_sigma"]), 0.1)  # step 0: full sigma

    mid = create_train_state(cfg).replace(step=jnp.asarray(50, jnp.int32))
    _, m_mid = train_step(cfg, mid, batch)
    assert np.isclose(float(m_mid["d_noise_sigma"]), 0.05)  # halfway

    done = create_train_state(cfg).replace(
        step=jnp.asarray(200, jnp.int32))
    _, m_done = train_step(cfg, done, batch)
    assert float(m_done["d_noise_sigma"]) == 0.0  # clipped past horizon

    for v in m.values():
        assert np.isfinite(float(v))

    # Noise is actually APPLIED, not just reported: at the same seed and
    # batch, D's loss differs from the noiseless run (a regression that
    # computes sigma but feeds D the clean trajectories would match).
    _, m0 = train_step(cfg.replace(instance_noise_sigma=0.0),
                       create_train_state(cfg), batch)
    assert "d_noise_sigma" not in m0
    assert abs(float(m["d_loss"]) - float(m0["d_loss"])) > 1e-6


def test_remat_matches_plain_step():
    """cfg.remat (jax.checkpoint on the in-loss model forwards) must not
    change the math — same params and metrics after a step, to float
    tolerance (recompute reassociates; CPU is typically bitwise)."""
    import jax
    import numpy as np

    from ndivplanning_tpu.data.tasks import make_task

    base = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
                cond_embed_dim=8, r1_weight=0.1,
                feature_matching_weight=1.0)
    cfg_a = get_config("goalcond", **base)
    cfg_b = get_config("goalcond", remat=True, **base)
    batch = make_task(cfg_a).sample(jax.random.PRNGKey(3),
                                    cfg_a.batch_size)
    sa, ma = train_step(cfg_a, create_train_state(cfg_a), batch)
    sb, mb = train_step(cfg_b, create_train_state(cfg_b), batch)
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    for a, b in zip(jax.tree.leaves(sa.g_params),
                    jax.tree.leaves(sb.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(sa.d_params),
                    jax.tree.leaves(sb.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
