"""The fused NDiv-GAN train step (SURVEY.md §2 C8, §3.1).

The reference's eager per-batch loop (D forward/backward/step, then G
forward/backward/step) becomes ONE jitted pure function: alternating-
update semantics are preserved inside the single compiled program —
``stop_gradient`` detaches the fake batch for the D update, and the G
update runs against the *already-updated* D params (SURVEY.md §7
hard-parts #3).  ``donate_argnums`` recycles the state buffers in place.

Host<->device boundary: exactly one call per step; with
:func:`train_step_fused` even the batch sampling is traced into the
program, so steady-state training never touches the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndivplanning_tpu.data.tasks import Batch, make_task
from ndivplanning_tpu.ops.gan_losses import get_gan_losses
from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference
from ndivplanning_tpu.ops.pairwise import pairwise_l2
from ndivplanning_tpu.train.state import (
    TrainState,
    build_models,
    build_optimizers,
    lr_schedule,
)
from ndivplanning_tpu.utils.config import Config


def _ndiv(cfg: Config, z: jnp.ndarray, traj: jnp.ndarray,
          mesh=None) -> jnp.ndarray:
    """NDiv loss on [B, k, ...] latents/trajectories per the config impl.

    Dispatch (cfg.ndiv_impl: "auto" | "pallas" | "jnp"):

    - "jnp": pure-jnp reference everywhere; on multi-device meshes XLA's
      SPMD partitioner shards it like any other op.
    - single-device: fused Pallas kernel on TPU, jnp elsewhere (the
      kernel's interpret mode is correct on CPU but slow).
    - multi-device with ``mesh``: the shard_map fused path — GSPMD cannot
      partition an opaque ``pallas_call``, but ``ndiv_loss_sharded(...,
      impl="pallas")`` runs the kernel on shard-local blocks with
      explicit all_gather/psum (SURVEY.md §5).  Engaged by default on
      TPU; ``impl="pallas"`` forces it on any backend.
    - multi-device without a mesh handle: jnp fallback under GSPMD.
    """
    b, k = z.shape[:2]
    x = traj.reshape(b, k, -1)
    if cfg.ndiv_impl == "jnp":
        return ndiv_loss_reference(z, x, cfg.ndiv_alpha)
    if mesh is not None and (
        cfg.ndiv_impl == "pallas" or jax.default_backend() == "tpu"
    ):
        # The mesh handle is authoritative, INCLUDING a 1x1 mesh: the
        # production multi-chip program (all_gather + kernel + psum
        # inside shard_map) then has identical structure on one chip and
        # on N — which is what lets a single real TPU chip compile-prove
        # the deployment path (benchmarks/sharded_tpu_bench.py; the
        # collectives over size-1 axes fold away in XLA).
        from ndivplanning_tpu.parallel.sharded_step import (
            ndiv_loss_sharded,
        )

        return ndiv_loss_sharded(z, x, cfg.ndiv_alpha, mesh,
                                 impl="pallas")
    if cfg.dp_shards * cfg.div_shards > 1:
        return ndiv_loss_reference(z, x, cfg.ndiv_alpha)
    from ndivplanning_tpu.ops import ndiv_pallas

    if cfg.ndiv_impl == "pallas" or jax.default_backend() == "tpu":
        return ndiv_pallas.ndiv_loss_fused(z, x, cfg.ndiv_alpha)
    return ndiv_loss_reference(z, x, cfg.ndiv_alpha)


def _shift_images(images: jnp.ndarray, px: jnp.ndarray,
                  max_px: int) -> jnp.ndarray:
    """Per-sample zero-padded pixel shift of ``[B, S, S, C]`` images.
    ``px [B, 2]`` int32 (dx, dy) pixel offsets, |px| <= max_px
    (``max_px`` kept for signature stability; the gather form doesn't
    need the bound).

    Formulated as two ``take_along_axis`` gathers with a validity mask —
    NOT pad + vmapped ``dynamic_slice``: that formulation, scanned 5000
    iterations inside the fused imagecond train chunk, reliably crashed
    the TPU worker with a kernel fault (libtpu bug — 1000-iteration
    chunks of the identical step body ran fine, as did cutout-only;
    bisection in BASELINE.md round 3).  The two formulations are
    bitwise-identical in values and gradients.
    """
    s = images.shape[1]
    grid = jnp.arange(s)
    # Image row 0 is y=0 and [iy, ix] maps to world x=(ix+.5)/S
    # (data/scenes.py rasterize_scene), so +dx shifts content right:
    # I'(iy, ix) = I(iy - dy, ix - dx).
    src_y = grid[None, :] - px[:, 1][:, None]  # [B, S]
    src_x = grid[None, :] - px[:, 0][:, None]
    valid = (src_y >= 0) & (src_y < s)
    valid_x = (src_x >= 0) & (src_x < s)
    cy = jnp.clip(src_y, 0, s - 1)
    cx = jnp.clip(src_x, 0, s - 1)
    rows = jnp.take_along_axis(images, cy[:, :, None, None], axis=1)
    out = jnp.take_along_axis(rows, cx[:, None, :, None], axis=2)
    mask = (valid[:, :, None] & valid_x[:, None, :])[..., None]
    return jnp.where(mask, out, jnp.zeros((), images.dtype))


def _cutout_images(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Zero one random (S/2)^2 square per image (DiffAugment cutout)."""
    b, s = images.shape[0], images.shape[1]
    c = s // 2
    pos = jax.random.randint(key, (b, 2), 0, s - c + 1)
    grid = jnp.arange(s)

    def one(img, p):
        in_x = (grid >= p[0]) & (grid < p[0] + c)
        in_y = (grid >= p[1]) & (grid < p[1] + c)
        hole = in_y[:, None] & in_x[None, :]
        return img * (1.0 - hole[..., None].astype(img.dtype))

    return jax.vmap(one)(images, pos)


def _diffaug(cfg: Config, key: jax.Array, conditions: jnp.ndarray,
             traj: jnp.ndarray, apply_p=None):
    """DiffAugment (config.py ``diffaug``): augment one (condition,
    trajectory) pair-batch D is about to see.  ``traj`` is ``[B, H, S]``
    or ``[B, k, H, S]``; per-sample draws are per CONDITION (all k fakes
    of one condition share its offset, keeping the pair consistent).
    Differentiable: gradients flow through ``traj + delta`` to G.

    ``apply_p`` (traced scalar, ADA mode): each condition row is
    augmented with this probability — a zeroed shift delta and an
    un-blended cutout are exact identities, so the gated program is the
    un-gated one with per-sample masks, no recompiles as p moves.
    ``None`` (fixed-strength DiffAugment) keeps the exact RNG stream of
    existing configs.
    """
    kinds = frozenset(cfg.diffaug.split(","))
    b = traj.shape[0]
    apply = None
    if apply_p is not None:
        key, k_m = jax.random.split(key)
        apply = jax.random.bernoulli(k_m, apply_p, (b,)).astype(jnp.float32)
    if "shift" in kinds:
        key, k_s = jax.random.split(key)
        delta = jax.random.uniform(
            k_s, (b, 2), minval=-cfg.diffaug_shift,
            maxval=cfg.diffaug_shift)
        if apply is not None:
            delta = delta * apply[:, None]
        lead = (b,) + (1,) * (traj.ndim - 2)
        traj = traj + delta.reshape(*lead, 2)
        if cfg.conditioning == "image":
            size = conditions.shape[1]
            max_px = max(int(cfg.diffaug_shift * size) + 1, 1)
            px = jnp.clip(jnp.round(delta * size).astype(jnp.int32),
                          -max_px, max_px)
            conditions = _shift_images(conditions, px, max_px)
        elif cfg.conditioning == "startgoal":
            conditions = conditions + jnp.tile(delta, (1, 2))
    if "cutout" in kinds and cfg.conditioning == "image":
        key, k_c = jax.random.split(key)
        cut = _cutout_images(k_c, conditions)
        if apply is not None:
            sel = apply[:, None, None, None] > 0.5
            conditions = jnp.where(sel, cut, conditions)
        else:
            conditions = cut
    return conditions, traj


def train_step_impl(cfg: Config, state: TrainState, batch: Batch,
                    z_sharding=None, mesh=None):
    """One G+D+NDiv update.  Pure; jit/shard_map-able.

    ``z_sharding``: optional ``jax.sharding.Sharding`` constraining the
    ``[B, k, zdim]`` latent draws — the diversity-sample-sharding hook
    (k over the ``div`` mesh axis, SURVEY.md §2 parallelism table); the
    generated trajectories inherit it through the generator.

    ``mesh``: the device mesh, when running multi-chip — enables the
    shard_map fused-kernel NDiv sub-region (see :func:`_ndiv`).

    Returns (new_state, metrics) with metrics a dict of f32 scalars.
    """
    gen, disc = build_models(cfg)
    g_tx, d_tx = build_optimizers(cfg)
    d_loss_fn_of, g_loss_fn_of = get_gan_losses(cfg.gan_loss)

    # Rematerialisation (config.py remat): checkpoint the model forwards
    # used INSIDE the differentiated losses, so their activations are
    # recomputed in the backward instead of held in HBM.  Wrapping here
    # (not in the modules) keeps the policy per-step and the inference
    # paths (eval/plan/serve) untouched.
    def _maybe_ckpt(f):
        return jax.checkpoint(f) if cfg.remat else f

    gen_fwd = _maybe_ckpt(lambda p, c, zz: gen.apply(p, c, zz))
    disc_fwd = _maybe_ckpt(lambda p, c, t: disc.apply(p, c, t))
    disc_fwd_feats = _maybe_ckpt(
        lambda p, c, t: disc.apply(p, c, t, return_features=True))

    rng, k_z = jax.random.split(state.rng)
    b = batch.real_traj.shape[0]
    z = jax.random.normal(k_z, (b, cfg.k, cfg.latent_dim), jnp.float32)
    if z_sharding is not None:
        z = jax.lax.with_sharding_constraint(z, z_sharding)

    # Fake batch for the D update (detached — SURVEY.md §3.1).
    tau_fake = gen.apply(state.g_params, batch.conditions, z)
    tau_fake_sg = jax.lax.stop_gradient(tau_fake)

    # Instance noise on everything D sees (config.py): annealed sigma is
    # a TRACED function of state.step — no recompile per step.
    in_sigma = cfg.instance_noise_sigma
    if in_sigma > 0:
        rng, k_nr, k_nf, k_ng = jax.random.split(rng, 4)
        sigma = jnp.asarray(in_sigma, jnp.float32)
        if cfg.instance_noise_anneal > 0:
            sigma = sigma * jnp.clip(
                1.0 - state.step.astype(jnp.float32)
                / cfg.instance_noise_anneal, 0.0, 1.0)
        real_for_d = batch.real_traj + sigma * jax.random.normal(
            k_nr, batch.real_traj.shape, jnp.float32)
        fake_for_d = tau_fake_sg + sigma * jax.random.normal(
            k_nf, tau_fake_sg.shape, jnp.float32)

        def noise_g(tau):
            return tau + sigma * jax.random.normal(k_ng, tau.shape,
                                                   jnp.float32)
    else:
        sigma = jnp.asarray(0.0, jnp.float32)
        real_for_d, fake_for_d = batch.real_traj, tau_fake_sg
        noise_g = lambda tau: tau

    # DiffAugment: independent per-pass draws (the paper's T), split only
    # when enabled so default configs keep their exact RNG streams.
    # ADA (config.py ada_target): the same transforms, applied per
    # sample with the CONTROLLER's probability instead of always.
    ada_on = cfg.ada_target > 0
    if ada_on and not cfg.diffaug:
        raise ValueError("ada_target > 0 needs a diffaug transform set "
                         "(e.g. --set diffaug=shift) — ADA modulates the "
                         "APPLICATION PROBABILITY of those transforms")
    ada_p = state.ada["p"] if ada_on else None
    if cfg.diffaug:
        rng, k_ar, k_af, k_ag = jax.random.split(rng, 4)
        cond_real_d, real_for_d = _diffaug(cfg, k_ar, batch.conditions,
                                           real_for_d, apply_p=ada_p)
        cond_fake_d, fake_for_d = _diffaug(cfg, k_af, batch.conditions,
                                           fake_for_d, apply_p=ada_p)
    else:
        cond_real_d = cond_fake_d = batch.conditions
        k_ag = None

    # ---------------- D update ----------------
    r1_w = cfg.r1_weight
    lc_w = cfg.lecam_weight
    if lc_w > 0:
        # Bias-corrected anchors (Adam-style): after n tracker updates
        # the EMA's weight mass is (1 - decay^n), so dividing by it makes
        # the cold-start anchor the first batches' mean instead of the
        # zero init.  state.step == n (one tracker update per step).
        n = state.step.astype(jnp.float32)
        corr = 1.0 - jnp.power(jnp.asarray(cfg.lecam_decay, jnp.float32),
                               n)
        anchor_real = jnp.where(
            state.step > 0, state.lecam_ema["real"] / jnp.maximum(
                corr, jnp.finfo(jnp.float32).tiny), 0.0)
        anchor_fake = jnp.where(
            state.step > 0, state.lecam_ema["fake"] / jnp.maximum(
                corr, jnp.finfo(jnp.float32).tiny), 0.0)

    def d_loss(d_params):
        real_logits = disc_fwd(d_params, cond_real_d, real_for_d)
        fake_logits = disc_fwd(d_params, cond_fake_d, fake_for_d)
        loss = d_loss_fn_of(real_logits, fake_logits)
        # The ADA overfitting heuristic r_t = E[sign(D(real) - center)],
        # logged by EVERY run (metric "d_rt"): the round-4 measurement of
        # whether the heuristic moves at all in the infinite-synthetic-
        # data regime (here it tracks D-overpowers-G sharpening, not
        # memorisation).  The center is the loss variant's decision
        # boundary: 0 for logit-style outputs (bce/hinge), 0.5 for
        # lsgan's {0,1}-regression scores — uncentered lsgan scores sit
        # almost entirely positive, which would saturate r_t at +1 and
        # pin an ADA controller at p_max regardless of overfitting
        # (ADVICE r4).
        rt_center = 0.5 if cfg.gan_loss == "lsgan" else 0.0
        aux = {"rt": jnp.mean(jnp.sign(
            real_logits.astype(jnp.float32) - rt_center))}
        if lc_w > 0:
            # LeCam (config.py lecam_weight): pin each class' logits to
            # the OTHER class' historical mean — the real-fake gap D can
            # open is bounded by how far it pushes both terms, which is
            # what diverges in the late-soak collapse.  Anchors are
            # state trackers: constants w.r.t. d_params.
            lecam = (jnp.mean(jnp.square(real_logits - anchor_fake))
                     + jnp.mean(jnp.square(fake_logits - anchor_real)))
            loss = loss + lc_w * lecam
            aux["lecam"] = lecam
            aux["mean_real"] = jnp.mean(real_logits)
            aux["mean_fake"] = jnp.mean(fake_logits)
        if r1_w > 0:
            # R1 penalty: squared grad norm of D's real-sample logits wrt
            # the trajectory input, averaged over the batch.  The inner
            # jax.grad nests under the outer value_and_grad (grad-of-grad
            # in the same compiled program).
            def real_score(traj):
                return jnp.sum(
                    disc_fwd(d_params, cond_real_d, traj))

            # Penalise at the (possibly noised) points D actually sees.
            g_traj = jax.grad(real_score)(real_for_d)  # [B, H, S]
            r1 = jnp.mean(jnp.sum(
                jnp.square(g_traj.astype(jnp.float32)), axis=(1, 2)))
            loss = loss + 0.5 * r1_w * r1
        else:
            r1 = jnp.asarray(0.0, jnp.float32)
        aux["r1"] = r1
        return loss, aux

    (d_loss_val, d_aux), d_grads = jax.value_and_grad(
        d_loss, has_aux=True)(state.d_params)
    d_r1 = d_aux["r1"]
    d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                         state.d_params)
    d_params = jax.tree.map(lambda p, u: p + u, state.d_params, d_updates)

    if cfg.d_reset_every > 0:
        # D warm-restart (config.py d_reset_every): on boundary steps,
        # replace D's params AND Adam chain with a fresh draw — G keeps
        # its momentum; D must re-learn to discriminate the CURRENT
        # generator instead of exploiting its accumulated sharpness.
        # Branchless (tree-wide where on the step predicate): the init
        # is a handful of RNG normals per step, far below the grads
        # just computed, and the program shape stays uniform.  The key
        # comes off the step's rng thread (split only when the knob is
        # on — default configs keep their exact RNG streams).
        rng, k_dr = jax.random.split(rng)
        new_step = state.step + 1
        # d_reset_start gates restarts to the late regime (config.py):
        # max(start, 1) keeps the default start=0 bitwise-identical to
        # the pre-knob predicate (new_step > 0).
        reset_now = jnp.logical_and(
            new_step % cfg.d_reset_every == 0,
            new_step >= max(cfg.d_reset_start, 1))
        fresh_d = disc.init(k_dr, batch.conditions, batch.real_traj)
        fresh_opt = d_tx.init(fresh_d)
        d_params = jax.tree.map(
            lambda f, cur: jnp.where(reset_now, f, cur),
            fresh_d, d_params)
        d_opt_state = jax.tree.map(
            lambda f, cur: jnp.where(reset_now, f, cur),
            fresh_opt, d_opt_state)

    if lc_w > 0:
        # Tracker update: one EMA step per train step on the batch means
        # D just saw (at the pre-update params — the same view the loss
        # used).  stop_gradient is implicit: d_aux left the grad trace.
        lc_d = cfg.lecam_decay
        lecam_ema = {
            "real": lc_d * state.lecam_ema["real"]
            + (1.0 - lc_d) * d_aux["mean_real"],
            "fake": lc_d * state.lecam_ema["fake"]
            + (1.0 - lc_d) * d_aux["mean_fake"],
        }
    else:
        lecam_ema = state.lecam_ema

    # ADA controller update (config.py ada_target).  The r_t EMA is
    # tracked by EVERY run (it feeds the always-logged "d_rt" metric and
    # keeps the TrainState schema uniform); the probability p only moves
    # when the knob is on.  Same bias-correction scheme as the LeCam
    # anchors: after n tracker updates the EMA's mass is 1 - decay^n.
    a_d = cfg.ada_decay
    ada_r = a_d * state.ada["r"] + (1.0 - a_d) * d_aux["rt"]
    n1 = state.step.astype(jnp.float32) + 1.0
    a_corr = 1.0 - jnp.power(jnp.asarray(a_d, jnp.float32), n1)
    r_hat = ada_r / jnp.maximum(a_corr, jnp.finfo(jnp.float32).tiny)
    if ada_on:
        # Karras et al. 2020 feedback rule: ramp p up while D is too
        # confident on real data (r above target), decay it otherwise.
        ada_p_new = jnp.clip(
            state.ada["p"] + jnp.sign(r_hat - cfg.ada_target)
            * cfg.ada_step, 0.0, cfg.ada_p_max)
    else:
        ada_p_new = state.ada["p"]
    ada = {"r": ada_r, "p": ada_p_new}

    # ---------------- G update (against updated D) ----------------
    fm_w = cfg.feature_matching_weight

    def g_loss(g_params):
        tau = gen_fwd(g_params, batch.conditions, z)
        # Same instance-noise treatment in the G update: gradients flow
        # through the additive noise to tau unchanged.
        tau_d = noise_g(tau)
        # DiffAugment in the G pass too — the crux of the method: G's
        # gradients arrive THROUGH the augmented D view.  Under ADA the
        # G pass carries the SAME application probability as D's passes:
        # the round-4 soak with this pass left ungated collapsed
        # diversity in 3/3 seeds while p sat at ~0 — G was being graded
        # through augmented views D never trained on (BASELINE.md r4 ADA
        # study, the bug-invalidated first soak).
        if cfg.diffaug:
            cond_g, tau_d = _diffaug(cfg, k_ag, batch.conditions, tau_d,
                                     apply_p=ada_p)
        else:
            cond_g = batch.conditions
        if fm_w > 0:
            fake_logits, fake_feats = disc_fwd_feats(
                d_params, cond_g, tau_d)
            _, real_feats = disc_fwd_feats(
                d_params, cond_real_d, real_for_d)
            # Match first moments of D's last hidden features between
            # the real batch and the B*k fakes (Salimans et al. 2016).
            fake_mean = jnp.mean(
                fake_feats.reshape(-1, fake_feats.shape[-1]), axis=0)
            real_mean = jnp.mean(real_feats, axis=0)
            fm = jnp.mean(jnp.square(real_mean - fake_mean))
        else:
            fake_logits = disc_fwd(d_params, cond_g, tau_d)
            fm = jnp.asarray(0.0, jnp.float32)
        if cfg.topk_g_fraction > 0:
            # Top-k G update (Sinha et al. 2020): adversarial gradients
            # only through the fakes D scores most real.  lax.top_k is a
            # gather, so the discarded fakes get exactly zero adv
            # gradient (they still receive NDiv gradients below).
            flat = fake_logits.reshape(-1)
            n_keep = max(int(round(cfg.topk_g_fraction * flat.shape[0])),
                         1)
            adv = g_loss_fn_of(jax.lax.top_k(flat, n_keep)[0])
        else:
            adv = g_loss_fn_of(fake_logits)
        ndiv = _ndiv(cfg, z, tau, mesh=mesh)
        if cfg.div_floor > 0:
            # Hinge on the ABSOLUTE mean pairwise distance (the eval
            # statistic): NDiv's row-normalisation cannot see uniform
            # diversity shrinkage (config.py div_floor).  Computed in
            # GSPMD context, so sharded-k configs are globally correct.
            flat = tau.reshape(tau.shape[0], cfg.k, -1)
            pd = pairwise_l2(flat)
            off = ~jnp.eye(cfg.k, dtype=bool)
            mpd = jnp.sum(jnp.where(off, pd, 0.0)) / (
                flat.shape[0] * cfg.k * (cfg.k - 1))
            dfloor = jax.nn.relu(cfg.div_floor - mpd)
        else:
            dfloor = jnp.asarray(0.0, jnp.float32)
        total = (adv + cfg.ndiv_weight * ndiv + fm_w * fm
                 + cfg.div_floor_weight * dfloor)
        return total, (adv, ndiv, fm, dfloor)

    (g_total, (g_adv, g_ndiv, g_fm, g_dfloor)), g_grads = jax.value_and_grad(
        g_loss, has_aux=True
    )(state.g_params)
    g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                         state.g_params)
    g_params = jax.tree.map(lambda p, u: p + u, state.g_params, g_updates)

    # EMA of G (decay 0 reduces to a copy, so the program shape is
    # uniform across configs; eval/planning read gen_params()).
    d_ema = cfg.g_ema_decay
    g_ema_params = jax.tree.map(
        lambda e, p: d_ema * e + (1.0 - d_ema) * p,
        state.g_ema_params, g_params)

    new_state = TrainState(
        step=state.step + 1,
        rng=rng,
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_opt_state,
        d_opt_state=d_opt_state,
        g_ema_params=g_ema_params,
        lecam_ema=lecam_ema,
        ada=ada,
    )
    metrics = {
        "d_loss": d_loss_val,
        "g_adv": g_adv,
        "g_ndiv": g_ndiv,
        "g_total": g_total,
        # The ADA overfitting heuristic, logged unconditionally: the
        # round-4 question "does r_t move at all in the infinite-
        # synthetic-data regime" is answered by every soak's JSONL.
        # d_rt is the single-batch point sample (swings -1..1 late in
        # the r4 control soak); d_rt_ema is the bias-corrected tracker
        # the controller actually reads — the smooth curve to analyse.
        "d_rt": d_aux["rt"],
        "d_rt_ema": r_hat,
    }
    if ada_on:
        metrics["ada_p"] = ada_p_new
    if fm_w > 0:
        metrics["g_fm"] = g_fm
    if cfg.div_floor > 0:
        metrics["g_divfloor"] = g_dfloor
    if r1_w > 0:
        metrics["d_r1"] = d_r1
    if lc_w > 0:
        metrics["d_lecam"] = d_aux["lecam"]
    if in_sigma > 0:
        metrics["d_noise_sigma"] = sigma
    g_sched = lr_schedule(cfg, cfg.g_lr)
    if callable(g_sched):
        # One update per step, so the schedule position == state.step.
        metrics["g_lr"] = jnp.asarray(g_sched(state.step), jnp.float32)
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def train_step(cfg: Config, state: TrainState, batch: Batch):
    """Jitted train step on an externally-sampled batch (SURVEY.md §3.1)."""
    return train_step_impl(cfg, state, batch)


def _fused_body(cfg: Config, state: TrainState):
    """Sample-on-device + one update: the scan body shared by the single
    fused step and the chunked multi-step program."""
    task = make_task(cfg)
    rng, k_batch = jax.random.split(state.rng)
    batch = task.sample(k_batch, cfg.batch_size)
    state = state.replace(rng=rng)
    return train_step_impl(cfg, state, batch)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def train_step_fused(cfg: Config, state: TrainState):
    """Train step with the on-device task sampler fused in: the whole
    sample -> G/D update pipeline is one compiled program, zero host I/O."""
    return _fused_body(cfg, state)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"),
                   donate_argnums=(1,))
def train_chunk(cfg: Config, state: TrainState, n_steps: int):
    """``n_steps`` fused train steps in ONE compiled program via
    ``lax.scan`` — the dispatch-latency killer for small per-step work
    (the reference's models are KB-MB scale, so a single step is far
    cheaper than a host->device dispatch; scanning amortises it to zero).

    Numerically equivalent to ``n_steps`` sequential
    :func:`train_step_fused` calls, and bitwise self-consistent
    run-to-run; cross-program parity with the unscanned step is at float
    tolerance only, since XLA may reassociate fusions differently in the
    two programs (the per-fixed-topology caveat of SURVEY.md §7
    hard-parts #1).  Returns (state, metrics), metrics stacked [n_steps].
    """

    def body(s, _):
        s, metrics = _fused_body(cfg, s)
        return s, metrics

    return jax.lax.scan(body, state, None, length=n_steps)
