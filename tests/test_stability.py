"""Training stability across seeds and loss variants (SURVEY.md §4
integration level: "trains N steps without NaN, losses in sane ranges")."""

import numpy as np
import pytest

from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.train.step import train_chunk
from ndivplanning_tpu.utils.config import get_config


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_seeds_train_stably(seed):
    cfg = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, seed=seed)
    state = create_train_state(cfg)
    state, metrics = train_chunk(cfg, state, 30)
    for name, v in metrics.items():
        arr = np.asarray(v)
        assert np.all(np.isfinite(arr)), f"seed {seed}: {name} went non-finite"
    # BCE D loss should hover in a sane band, not collapse to 0 or blow up.
    d = np.asarray(metrics["d_loss"])
    assert 0.01 < d[-1] < 10.0, d[-1]


def test_high_lr_still_finite_short_run():
    # An aggressive LR shouldn't NaN within a short window (numerics are
    # guarded: stable softplus losses, zero-safe NDiv).
    cfg = get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, g_lr=1e-1, d_lr=1e-1)
    state = create_train_state(cfg)
    state, metrics = train_chunk(cfg, state, 20)
    for name, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), name


# ------------------------- round-3 stabilisers (default-off knobs) ----


def _tiny(preset="imagecond", **kw):
    defaults = dict(batch_size=4, k=4, g_hidden=(16,), d_hidden=(16,),
                    cond_embed_dim=8, image_size=16, encoder_features=(4,),
                    workdir="")
    defaults.update(kw)
    return get_config(preset, **defaults)


def test_diffaug_trains_and_is_consistent():
    """shift/cutout DiffAugment: the step runs, losses stay finite, and
    the world-translation keeps the (condition, trajectory) pair
    consistent (checked directly on _diffaug)."""
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.train.step import _diffaug

    cfg = _tiny(diffaug="shift,cutout")
    state = create_train_state(cfg)
    state, metrics = train_chunk(cfg, state, 3)
    assert np.all(np.isfinite(np.asarray(metrics["g_total"])))

    # Pair consistency: a trajectory pinned to the start marker stays on
    # the (shifted) start marker.  Use startgoal conditioning where the
    # condition is the raw [start, goal] vector.
    cfg_sg = _tiny("goalcond", diffaug="shift")
    conds = jnp.asarray([[0.3, 0.3, 0.8, 0.8]] * 4, jnp.float32)
    traj = jnp.tile(conds[:, None, :2], (1, cfg_sg.horizon, 1))  # sit at start
    c_aug, t_aug = _diffaug(cfg_sg, jax.random.PRNGKey(0), conds, traj)
    np.testing.assert_allclose(np.asarray(t_aug[:, 0]),
                               np.asarray(c_aug[:, :2]), atol=1e-6)
    # Offsets are bounded by the config knob.
    delta = np.asarray(c_aug - conds)
    assert np.abs(delta).max() <= cfg_sg.diffaug_shift + 1e-6


def test_diffaug_image_shift_moves_pixels():
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.train.step import _shift_images

    img = jnp.zeros((1, 8, 8, 1)).at[0, 4, 4, 0].set(1.0)
    out = _shift_images(img, jnp.asarray([[2, -1]], jnp.int32), max_px=3)
    assert float(out[0, 3, 6, 0]) == 1.0  # +2 px in x, -1 px in y
    assert float(np.asarray(out).sum()) == 1.0  # zero pad, no wraparound


def test_spectral_norm_bounds_discriminator():
    """With d_spectral_norm every D dense layer has unit top singular
    value, so D's logit Lipschitz constant is bounded; training runs."""
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.models.mlp import SNDense

    # Unit-sigma check on the layer itself.
    layer = SNDense(8)
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))
    w_raw = params["params"]["kernel"]
    # Reconstruct the normalised kernel the forward uses.
    y = layer.apply(params, jnp.eye(16))
    w_sn = np.asarray(y - layer.apply(params, jnp.zeros((16, 16))))
    sigma = np.linalg.svd(w_sn, compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=5e-2)  # power-iter approx
    assert not np.allclose(np.asarray(w_raw), w_sn)

    cfg = _tiny("goalcond", d_spectral_norm=True)
    state = create_train_state(cfg)
    state, metrics = train_chunk(cfg, state, 3)
    assert np.all(np.isfinite(np.asarray(metrics["g_total"])))


def test_topk_g_update_trains():
    cfg = _tiny("goalcond", topk_g_fraction=0.5)
    state = create_train_state(cfg)
    state, metrics = train_chunk(cfg, state, 3)
    assert np.all(np.isfinite(np.asarray(metrics["g_total"])))


def test_stabilisers_off_keep_default_program_rng():
    """The three knobs default OFF and must not perturb the default
    config's RNG stream or losses (bitwise determinism contract)."""
    cfg = _tiny("goalcond")
    s1 = create_train_state(cfg)
    _, m1 = train_chunk(cfg, s1, 3)
    cfg2 = _tiny("goalcond", diffaug="", topk_g_fraction=0.0,
                 d_spectral_norm=False, lecam_weight=0.0)
    s2 = create_train_state(cfg2)
    _, m2 = train_chunk(cfg2, s2, 3)
    np.testing.assert_array_equal(np.asarray(m1["g_total"]),
                                  np.asarray(m2["g_total"]))


def test_div_floor_penalises_uniform_collapse():
    """The absolute diversity floor (round-3): NDiv's row-normalisation
    is scale-invariant, so uniform shrinkage of all samples keeps
    g_ndiv ~ 0 — the floor hinge must fire exactly there, and stay zero
    for a diverse generator."""
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference
    from ndivplanning_tpu.ops.pairwise import pairwise_l2
    from ndivplanning_tpu.train.loop import run_steps
    from ndivplanning_tpu.train.state import create_train_state

    # Scale-invariance of NDiv itself (the reason the floor exists):
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (4, 4, 2))
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, 8))
    a = float(ndiv_loss_reference(z, x, 0.8))
    b = float(ndiv_loss_reference(z, 1e-3 * x, 0.8))  # collapsed 1000x
    assert abs(a - b) < 1e-5  # NDiv cannot see uniform shrinkage

    # The training metric fires on a collapsed G and not on init:
    cfg = _tiny(div_floor=0.3, div_floor_weight=1.0)
    state = create_train_state(cfg)
    state, metrics = run_steps(cfg, state, 2)
    assert "g_divfloor" in metrics
    assert float(metrics["g_divfloor"]) >= 0.0
    assert np.isfinite(float(metrics["g_total"]))

    # Direct check of the hinge: diverse samples pay nothing, collapsed
    # samples pay (floor - mpd).
    def mpd(t):
        pd = pairwise_l2(t.reshape(2, 4, -1))
        off = ~jnp.eye(4, dtype=bool)
        return float(jnp.sum(jnp.where(off, pd, 0.0)) / (2 * 4 * 3))

    spread = jax.random.normal(key, (2, 4, 16))
    assert mpd(spread) > 0.3          # healthy: hinge inactive
    assert mpd(1e-4 * spread) < 0.3   # collapsed: hinge active


def test_lecam_anchors_and_tracker_update():
    """LeCam regularization (config.py lecam_weight): at step 0 the
    bias-corrected anchors are zero, so the penalty is exactly
    mean(real_logits^2) + mean(fake_logits^2); after the step the
    trackers hold (1-decay) * the batch mean logits (EMA from zero).
    Hand-recomputed against the step's own RNG/forward path."""
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.data.tasks import make_task
    from ndivplanning_tpu.train.state import build_models
    from ndivplanning_tpu.train.step import train_step

    cfg = _tiny("goalcond", lecam_weight=0.1, lecam_decay=0.9)
    state = create_train_state(cfg)
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(42), cfg.batch_size)

    # Replicate the step's D view BEFORE calling the donating step:
    # rng -> (rng, k_z), z ~ N, fakes from the pre-update G.
    gen, disc = build_models(cfg)
    _, k_z = jax.random.split(state.rng)
    z = jax.random.normal(k_z, (cfg.batch_size, cfg.k, cfg.latent_dim),
                          jnp.float32)
    tau_fake = gen.apply(state.g_params, batch.conditions, z)
    real_logits = disc.apply(state.d_params, batch.conditions,
                             batch.real_traj)
    fake_logits = disc.apply(state.d_params, batch.conditions, tau_fake)
    expected_pen = float(jnp.mean(jnp.square(real_logits))
                         + jnp.mean(jnp.square(fake_logits)))
    mean_real = float(jnp.mean(real_logits))
    mean_fake = float(jnp.mean(fake_logits))

    new_state, metrics = train_step(cfg, state, batch)
    np.testing.assert_allclose(float(metrics["d_lecam"]), expected_pen,
                               rtol=1e-5)
    np.testing.assert_allclose(float(new_state.lecam_ema["real"]),
                               (1 - 0.9) * mean_real, rtol=1e-5)
    np.testing.assert_allclose(float(new_state.lecam_ema["fake"]),
                               (1 - 0.9) * mean_fake, rtol=1e-5)


def test_lecam_trains_stably_and_chunk_carries_trackers():
    cfg = _tiny(lecam_weight=0.3)
    state = create_train_state(cfg)
    state, metrics = train_chunk(cfg, state, 5)
    assert np.all(np.isfinite(np.asarray(metrics["d_lecam"])))
    assert np.all(np.isfinite(np.asarray(metrics["g_total"])))
    # Trackers moved off the zero init and stayed finite.
    assert float(np.abs(np.asarray(state.lecam_ema["real"]))) > 0
    assert np.isfinite(float(state.lecam_ema["fake"]))


def test_lecam_bounds_the_real_fake_gap_when_d_overpowers():
    """Mechanistic check of WHY LeCam exists: in a D-overpowered regime
    (d_lr 50x g_lr — the late-soak failure mode in fast-forward), the
    real-fake logit gap D opens must be strongly bounded by the
    regulariser.  Measured on CPU (3 seeds): control gap 3.2/6.8/10.2 vs
    LeCam-0.3 gap 0.42/0.04/0.00."""
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.data.tasks import make_task
    from ndivplanning_tpu.train.state import build_models

    def gap(lecam_w):
        cfg = get_config("goalcond", batch_size=16, k=4, g_hidden=(32,),
                         d_hidden=(64, 64), cond_embed_dim=8, steps=10000,
                         d_lr=5e-3, g_lr=1e-4, lecam_weight=lecam_w,
                         seed=0)
        state = create_train_state(cfg)
        state, _ = train_chunk(cfg, state, 800)
        gen, disc = build_models(cfg)
        batch = make_task(cfg).sample(jax.random.PRNGKey(999), 64)
        z = jax.random.normal(jax.random.PRNGKey(1000),
                              (64, cfg.k, cfg.latent_dim))
        fake = gen.apply(state.g_params, batch.conditions, z)
        rl = disc.apply(state.d_params, batch.conditions, batch.real_traj)
        fl = disc.apply(state.d_params, batch.conditions, fake)
        return float(jnp.mean(rl) - jnp.mean(fl))

    control, lecam = gap(0.0), gap(0.3)
    assert control > 1.0          # the pathology actually manifests
    assert lecam < 0.5 * control  # and the regulariser bounds it


# ------------------------- round-4: ADA adaptive augmentation ---------


def test_ada_requires_diffaug():
    """ada_target without a transform set is a config error, raised at
    trace time with an actionable message."""
    cfg = _tiny("goalcond", diffaug="", ada_target=0.6)
    state = create_train_state(cfg)
    with pytest.raises(ValueError, match="diffaug"):
        train_chunk(cfg, state, 1)


def test_ada_p_zero_is_identity():
    """_diffaug with apply_p=0 must be an exact identity on both the
    trajectory and the condition (the controller's cold start changes
    nothing) — for shift on startgoal AND shift+cutout on image."""
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.train.step import _diffaug

    cfg = _tiny("goalcond", diffaug="shift")
    key = jax.random.PRNGKey(3)
    conds = jax.random.normal(key, (4, 4))
    traj = jax.random.normal(key, (4, 8, 2))
    c0, t0 = _diffaug(cfg, key, conds, traj, apply_p=jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(conds))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(traj))

    cfg_im = _tiny(diffaug="shift,cutout")
    img = jax.random.uniform(key, (4, 16, 16, 1))
    c1, t1 = _diffaug(cfg_im, key, img, traj, apply_p=jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(traj))


def test_ada_controller_moves_p_and_logs_metrics():
    """With ADA on, the controller state updates in-program: p moves by
    +-ada_step per step within [0, ada_p_max], the ada_p metric is
    emitted, and d_rt (always-on heuristic) stays in [-1, 1]."""
    cfg = _tiny("goalcond", diffaug="shift", ada_target=0.05,
                ada_step=0.01, ada_p_max=0.5)
    state = create_train_state(cfg)
    n = 20
    state, metrics = train_chunk(cfg, state, n)
    rt = np.asarray(metrics["d_rt"])
    assert rt.shape == (n,)
    assert np.all(rt >= -1.0) and np.all(rt <= 1.0)
    p_hist = np.asarray(metrics["ada_p"])
    assert np.all(p_hist >= 0.0) and np.all(p_hist <= cfg.ada_p_max + 1e-7)
    # Per-step movement is exactly one controller increment (or a clip).
    steps = np.diff(np.concatenate([[0.0], p_hist]))
    assert np.all(np.abs(steps) <= cfg.ada_step + 1e-7)
    # The carried state matches the last logged value.
    assert float(state.ada["p"]) == pytest.approx(float(p_hist[-1]))
    assert np.isfinite(float(state.ada["r"]))


def test_ada_off_keeps_rt_logged_and_p_frozen():
    """The heuristic is measured by every run; p stays at the zero init
    when the knob is off (and no ada_p metric is emitted)."""
    cfg = _tiny("goalcond", diffaug="shift")
    state = create_train_state(cfg)
    state, metrics = train_chunk(cfg, state, 3)
    assert "d_rt" in metrics and "ada_p" not in metrics
    assert float(state.ada["p"]) == 0.0
    assert np.isfinite(float(state.ada["r"]))


# ------------------------- round-4: D warm-restart --------------------


def test_d_reset_fires_on_boundary_only():
    """d_reset_every=N: D's params jump to a fresh draw exactly at step
    multiples of N (Adam chain included), G's params evolve smoothly
    throughout, and the knob off keeps D's trajectory unchanged."""
    import jax

    from ndivplanning_tpu.train.state import create_train_state as mk

    cfg = _tiny("goalcond", d_reset_every=5)
    state = mk(cfg)
    # train_chunk donates its input state — snapshot what the test
    # compares before each call (donated buffers are deleted).
    snap = lambda tree: jax.tree.map(lambda x: np.asarray(x), tree)
    d0 = snap(state.d_params)
    # Steps 1..4: no reset — D params move by small Adam updates.
    s4, _ = train_chunk(cfg, state, 4)
    d4 = snap(s4.d_params)
    # Step 5: reset fires inside this chunk.
    s5, _ = train_chunk(cfg, s4, 1)

    def l2(a, b):
        return float(sum(
            np.sum((np.asarray(x) - np.asarray(y)) ** 2)
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))) ** 0.5)

    # The reset jump dwarfs 4 steps of Adam drift (lr ~1e-3-scale).
    drift = l2(d4, d0)
    jump = l2(s5.d_params, d4)
    assert jump > 3 * drift, (drift, jump)
    # Adam moments were re-initialised: the chain's count went to 0 at
    # the reset (then stays in lockstep with later steps).
    counts = [np.asarray(x) for x in jax.tree.leaves(s5.d_opt_state)
              if np.asarray(x).dtype == np.int32]
    assert any(int(c) == 0 for c in counts), counts
    # G is untouched by the mechanism (it trained normally).
    assert int(s5.step) == 5
    state2, m = train_chunk(cfg, s5, 3)
    assert np.all(np.isfinite(np.asarray(m["g_total"])))


def test_d_reset_start_gates_early_boundaries():
    """d_reset_start=S: boundary steps below S leave D's trajectory on
    its smooth Adam path; the first boundary at/after S fires the jump.
    S=0 must keep the original always-on predicate (covered by the
    boundary test above via identical tiny-config RNG streams)."""
    import jax

    from ndivplanning_tpu.train.state import create_train_state as mk

    snap = lambda tree: jax.tree.map(lambda x: np.asarray(x), tree)

    def l2(a, b):
        return float(sum(
            np.sum((np.asarray(x) - np.asarray(y)) ** 2)
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))) ** 0.5)

    cfg = _tiny("goalcond", d_reset_every=5, d_reset_start=10)
    state = mk(cfg)
    d0 = snap(state.d_params)
    # Steps 1..5: boundary at 5 is BELOW the start gate — no reset.
    s5, _ = train_chunk(cfg, state, 5)
    d5 = snap(s5.d_params)
    drift = l2(d5, d0)
    # Steps 6..10: boundary at 10 meets the gate — reset fires.
    s10, _ = train_chunk(cfg, s5, 5)
    jump = l2(s10.d_params, d5)
    assert jump > 3 * drift, (drift, jump)
    counts = [np.asarray(x) for x in jax.tree.leaves(s10.d_opt_state)
              if np.asarray(x).dtype == np.int32]
    assert any(int(c) == 0 for c in counts), counts


def test_d_reset_off_matches_default_stream():
    """d_reset_every=0 (default) must be bitwise-identical to a config
    that never had the field exercised — the split-only-when-enabled
    RNG discipline."""
    cfg = _tiny("goalcond")
    s_a, m_a = train_chunk(cfg, create_train_state(cfg), 3)
    cfg_b = _tiny("goalcond", d_reset_every=0)
    s_b, m_b = train_chunk(cfg_b, create_train_state(cfg_b), 3)
    np.testing.assert_array_equal(np.asarray(m_a["g_total"]),
                                  np.asarray(m_b["g_total"]))


def test_ada_gates_all_three_diffaug_passes(monkeypatch):
    """Regression (round-4 soak bug): under ADA the real-for-D,
    fake-for-D AND fake-for-G augmentation passes must all carry the
    controller's probability — the first soak left the G pass ungated
    and collapsed diversity in 3/3 seeds while p sat at ~0."""
    import jax

    import ndivplanning_tpu.train.step as step_mod
    from ndivplanning_tpu.data.tasks import make_task

    cfg = _tiny("goalcond", diffaug="shift", ada_target=0.6)
    state = create_train_state(cfg)
    batch = make_task(cfg).sample(jax.random.PRNGKey(0), cfg.batch_size)

    seen = []
    real_diffaug = step_mod._diffaug

    def spy(cfg_, key, conditions, traj, apply_p=None):
        seen.append(apply_p is not None)
        return real_diffaug(cfg_, key, conditions, traj, apply_p=apply_p)

    monkeypatch.setattr(step_mod, "_diffaug", spy)
    step_mod.train_step_impl(cfg, state, batch)
    assert len(seen) == 3 and all(seen), seen


def test_ada_rt_centered_for_lsgan():
    """The r_t overfitting heuristic centers at each loss variant's
    decision boundary (ADVICE r4): lsgan's {0,1}-regression scores sit
    near 0 at init, so sign(score - 0.5) reads ~-1 where the uncentered
    sign(score) would read ~0/+1 and saturate an ADA controller at
    p_max.  bce keeps the 0 boundary (stream-identical to round 4)."""
    cfg = _tiny("goalcond", gan_loss="lsgan")
    state = create_train_state(cfg)
    _, metrics = train_chunk(cfg, state, 4)
    rt = np.asarray(metrics["d_rt"])
    # Untrained lsgan D outputs are near 0 < 0.5 for essentially every
    # sample: the centered statistic starts pinned low, leaving the
    # full [-1, 1] range to report real-confidence growth.
    assert np.all(rt <= -0.5)
