"""Typed, frozen, hashable configs + the five reference workload presets.

SURVEY.md §2 C12 / §5 config system: one preset per BASELINE.json:7-11
workload, CLI overrides, hashable so configs can key jit caches.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    """All hyperparameters for one NDiv-GAN workload.

    Frozen + tuple-valued fields => hashable => usable as a jit static
    argument (SURVEY.md §5).
    """

    # Identity
    name: str = "pointmass2d"
    seed: int = 0

    # Task / conditioning
    conditioning: str = "none"  # none | startgoal | image
    # Environment family for rollouts/planning/eval (envs/registry.py):
    # "pointmass" (double integrator) | "unicycle" (Dubins-style pose +
    # forward speed, actions = accel + steering rate) | "reacher"
    # (two-link arm, joint-space state, IK reset, J^T waypoint control)
    # | "quadrotor" (planar thrust-vectored, underactuated with gravity,
    # actions = two rotor thrusts, cascaded waypoint control) | "arm3"
    # (three-link redundant arm — the first family with action_dim = 3;
    # G still emits 2-D workspace waypoints, only the action path widens).
    env: str = "pointmass"
    image_size: int = 32
    horizon: int = 32
    state_dim: int = 2

    # Diversity sampling
    batch_size: int = 64  # global batch of conditions
    k: int = 8  # diversity samples per condition
    latent_dim: int = 2

    # Models
    # Generator family: "mlp" (the reference's shape; default, the
    # trained/recorded family) or "transformer" (waypoint tokens +
    # pre-LN self-attention, models/transformer.py).  Changing it
    # changes the g_params schema — use a fresh workdir.
    g_arch: str = "mlp"  # mlp | transformer
    g_hidden: Tuple[int, ...] = (256, 256)
    # Transformer-family hyperparameters (ignored by g_arch="mlp").
    g_tf_dim: int = 128
    g_tf_layers: int = 2
    g_tf_heads: int = 4
    d_hidden: Tuple[int, ...] = (256, 256)
    cond_embed_dim: int = 64
    encoder_features: Tuple[int, ...] = (16, 32, 64)  # conv channels
    generator_output: str = "linear"  # linear | sigmoid
    # Compute dtype for the dense/conv stacks (params stay f32; NDiv and
    # env math stay f32 regardless).  "bf16" rides the MXU natively.
    compute_dtype: str = "f32"  # f32 | bf16

    # Losses
    gan_loss: str = "bce"  # bce | lsgan | hinge
    ndiv_alpha: float = 0.8
    ndiv_weight: float = 1.0
    ndiv_impl: str = "auto"  # auto | pallas | jnp
    # Feature-matching G loss (Salimans et al. 2016): ||E[D_feat(real)] -
    # E[D_feat(fake)]||^2 added to the G objective.  0 disables.
    feature_matching_weight: float = 0.0
    # R1 gradient penalty on the discriminator (Mescheder et al. 2018,
    # "Which Training Methods for GANs do actually Converge?"):
    # (r1_weight / 2) * E_real[ || dD(c, tau)/dtau ||^2 ], computed on
    # the real batch inside the fused step (grad-of-grad under one jit).
    # The standard late-training stabiliser for the D-overpowers-G
    # collapse mode (imagecond soaks show g_ndiv -> 0 past ~45k steps,
    # BASELINE.md round 2).  0 disables.
    r1_weight: float = 0.0
    # Instance noise (Sønderby et al. 2017; Arjovsky & Bottou 2017):
    # Gaussian noise of stddev ``instance_noise_sigma`` added to EVERY
    # trajectory the discriminator sees (real and fake, both updates),
    # linearly annealed to zero over ``instance_noise_anneal`` steps
    # (0 = constant sigma).  Keeps the real/fake supports overlapping so
    # D cannot sharpen into the late-soak overpowering collapse.
    # 0 disables (the default path's RNG stream and determinism claims
    # are untouched).
    instance_noise_sigma: float = 0.0
    instance_noise_anneal: int = 0
    # DiffAugment-style differentiable augmentation (Zhao et al. 2020)
    # on EVERY (condition, trajectory) pair D sees — real and fake, both
    # updates, gradients flowing through to G.  Comma-list of:
    #   "shift"  — per-sample world translation of the pair (trajectory
    #              += delta; image conditions shifted by the matching
    #              pixel offset with zero pad; start/goal conditions
    #              += delta), delta ~ U(+-diffaug_shift).  The task is
    #              translation-equivariant, so the pair stays consistent.
    #   "cutout" — zero a random (image_size/2)^2 square of the image
    #              condition (image conditioning only).
    # "" disables (default: the RNG stream and program of existing
    # configs are untouched).
    diffaug: str = ""
    diffaug_shift: float = 0.125
    # ADA-style ADAPTIVE augmentation (Karras et al. 2020): the
    # ``diffaug`` transform set applied with per-sample probability p,
    # where p is driven by the overfitting heuristic
    # r_t = E[sign(D(real_logits))] — when D grows too confident on real
    # data (r_ema above ``ada_target``) p ramps up, when it falls below,
    # p decays.  The feedback remedy for exactly the measured
    # fixed-strength-DiffAugment failure (peak then collapse,
    # BASELINE.md round 3).  Requires ``diffaug`` non-empty; controller
    # state (r EMA + p) lives in TrainState.ada.  ``ada_target=0``
    # disables (fixed-strength DiffAugment behaviour unchanged).
    # NOTE this regime has INFINITE synthetic data — r_t here measures
    # D-overpowers-G sharpening, not memorisation; the heuristic's
    # movement is itself a round-4 measurement (``d_rt`` is logged by
    # every run).
    ada_target: float = 0.0
    ada_step: float = 0.002  # p increment per train step
    ada_decay: float = 0.99  # r_t EMA decay
    ada_p_max: float = 0.8  # augmentation probability ceiling
    # D warm-restart (Re-GAN-style): every N steps, re-initialise the
    # discriminator's params AND its Adam chain from a fresh draw while
    # G keeps training — the other principled remedy (besides ADA) for
    # the measured late-soak dynamic where D's accumulated sharpness
    # overpowers G.  The reset is IN-PROGRAM (branchless where on the
    # step counter), so scanned chunks keep zero host I/O; note it also
    # rewinds D's LR-schedule position (the Adam count is part of the
    # chain) — that restart-to-peak-LR is the intended semantics.
    # 0 disables (default; no RNG-stream change for existing configs).
    d_reset_every: int = 0
    # Late-start gate for d_reset_every: restarts fire only at steps >=
    # this threshold.  Motivation is the round-4 measurement pair —
    # always-on restarts are the ONE avenue that holds late diversity
    # (late mean pairwise dist 0.65-0.72, 3/3 seeds) but cap the peak at
    # 0.517 vs half-LR's 0.747, while half-LR posts its peak EARLY
    # (typically <60k) and then collapses.  Starting the restarts after
    # the peak window aims to keep the half-LR peak AND the restart
    # regime's late health.  0 = restarts active from the first
    # boundary (round-4 soak behaviour unchanged).
    d_reset_start: int = 0
    # Diversity disqualifier for best-checkpoint tracking: an eval
    # candidate whose eval_mean_pairwise_dist sits below this floor
    # cannot become <workdir>/best even if the tracked metric improved
    # (a success win bought by collapsing multimodality is not a win —
    # the expert-iteration fine-tune measured success up / diversity
    # 0.56 -> 0.04).  0 disables; train/distill.py sets it from the
    # pre-iteration diversity automatically.
    best_min_diversity: float = 0.0
    # Top-k generator update (Sinha et al. 2020): G's adversarial loss
    # backprops only through the topk_g_fraction of its B*k fakes that D
    # scores most real (the "easiest" fakes teach G nothing; the most
    #-rejected ones dominate gradients and destabilise).  0 disables.
    topk_g_fraction: float = 0.0
    # Spectral normalisation of the discriminator's dense layers (Miyato
    # et al. 2018): weight / sigma_max via stateless power iteration
    # (models/mlp.py::SNDense) — Lipschitz-bounds D so it cannot sharpen
    # into the late-soak D-overpowers-G collapse.  Changes D's param
    # tree schema (fresh workdir needed).
    d_spectral_norm: bool = False
    # Absolute diversity floor (round-3 finding): NDiv normalises
    # pairwise distances per condition, so it is SCALE-INVARIANT — a
    # generator that shrinks all its samples toward one trajectory
    # uniformly keeps g_ndiv ~ 0 while diversity collapses (measured:
    # the SN+DiffAugment combo reaches 0.92 success with mean pairwise
    # distance 0.07, BASELINE.md).  ``div_floor > 0`` adds
    # div_floor_weight * relu(div_floor - mean_pairwise_dist(fakes))
    # to the G objective — a hinge on the ABSOLUTE mean pairwise L2
    # (same statistic eval reports), active only below the floor so a
    # healthy generator pays nothing.  0 disables.
    div_floor: float = 0.0
    div_floor_weight: float = 1.0
    # LeCam regularization (Tseng et al. 2021): anchor D's real/fake
    # logits to EMA trackers of the OPPOSITE class' mean logit,
    # d_loss += lecam_weight * (E_real[(D - ema_fake)^2]
    #                           + E_fake[(D - ema_real)^2]).
    # Bounds the real-fake prediction gap D can open, which is exactly
    # the late-soak failure mode (D overpowers G past ~70k, BASELINE.md)
    # — and unlike spectral norm it constrains the FUNCTION gap, not the
    # per-layer Lipschitz constant, so it caps less capacity.  Trackers
    # live in TrainState.lecam_ema (bias-corrected by step, so the
    # cold-start anchor is the first batches' mean, not 0).  0 disables.
    lecam_weight: float = 0.0
    lecam_decay: float = 0.99
    # Rematerialisation (jax.checkpoint) of the G/D forward passes inside
    # the differentiated losses: activations are recomputed in the
    # backward instead of stored, trading ~1/3 more FLOPs for a large cut
    # in peak HBM.  Irrelevant at the contract model sizes (KB-MB, HBM
    # headroom everywhere); the lever exists for scaled configs like the
    # 4096-wide MFU workload (benchmarks/mfu_scaled_bench.py) where
    # activations x batch 8192 approach the 16 GB v5e HBM.  Gradient
    # parity with the non-remat step is test-pinned.
    remat: bool = False

    # Optimization
    g_lr: float = 1e-3
    d_lr: float = 1e-3
    adam_b1: float = 0.5  # GAN-standard beta1
    adam_b2: float = 0.999
    # Learning-rate schedule over ``steps`` (applies to both G and D,
    # each scaled from its own peak LR above): "constant" | "cosine" |
    # "linear".  ``warmup_steps`` linearly ramps 0 -> peak first;
    # decaying schedules land on ``lr_final_ratio * peak`` at ``steps``.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_final_ratio: float = 0.0
    # Exponential moving average of the generator weights (the standard
    # GAN stabiliser): eval/planning use the EMA params when > 0.  GAN
    # quality oscillates hard over training (measured 0.06-0.73 success
    # swings on imagecond, benchmarks/convergence_fixed_results.json);
    # the EMA generator smooths that out.  0 disables.
    g_ema_decay: float = 0.0
    steps: int = 10_000

    # Planning / eval
    rollout_mode: str = "waypoints"  # waypoints | actions
    n_candidates: int = 1000
    # CEM latent refinement (planning/cem.py): iterations for
    # ``plan --refine cem`` and ``plan_cem``'s default budget split
    # (population = n_candidates / (cem_iters + 1) — the final
    # selection population counts too, so total rollouts match the
    # one-shot planner's).
    cem_iters: int = 5
    # Gradient latent refinement (planning/grad_refine.py): Adam steps
    # on the soft differentiable objective for ``plan --refine grad``.
    grad_refine_steps: int = 12
    # Direct trajectory optimisation (planning/trajopt.py): Adam budget
    # for ``plan --refine trajopt``.  Defaults are the measured-best
    # suite-scale setting on the shipped serving checkpoint (60 steps /
    # lr 0.05: mean best score 0.042 at reach 1.000 vs 0.076 at the
    # 12-step grad budget — BASELINE.md r3j); tau lives in world/action
    # units, hence the larger lr than latent grad refinement's 0.1 on
    # z~N(0,1) is not comparable.
    trajopt_steps: int = 60
    trajopt_lr: float = 0.05
    # iLQR refinement (planning/ilqr.py): Riccati-sweep iterations for
    # ``plan --refine ilqr`` — the second-order mode for the
    # underactuated regime where first-order trajopt is a measured
    # negative (BASELINE.md r3j quadrotor).  36 (not 12) per the round-4
    # budget sweep: 62x36 scores 0.5372 vs 12-iter's 0.5567 at ~equal
    # wall, beating every other open-loop mode on the quadrotor
    # (BASELINE.md round 4, ilqr_results_i36.json).
    ilqr_iters: int = 36
    eval_every: int = 500
    # Periodic eval runs on a frozen suite of this many scenes (step-to-
    # step comparable); the best checkpoint by ``track_best_metric`` is
    # kept under <workdir>/best ("" disables tracking).  GAN quality
    # oscillates hard over training, so the best checkpoint routinely
    # beats the last one (BASELINE.md round 2).
    eval_suite_scenes: int = 128
    track_best_metric: str = "eval_success_rate"

    # Parallelism (SURVEY.md §2 parallelism table)
    dp_shards: int = 1  # data-parallel mesh axis
    div_shards: int = 1  # diversity-sample-sharding mesh axis

    # Bookkeeping
    log_every: int = 50
    checkpoint_every: int = 1000
    workdir: str = "/tmp/ndivplanning_tpu"

    @property
    def traj_dim(self) -> int:
        return self.horizon * self.state_dim

    def replace(self, **kw) -> "Config":
        # Coerce list-valued overrides for tuple-typed fields (JSON
        # round-trips and ad-hoc callers hand lists): a list leaf makes
        # the frozen Config unhashable, which breaks its use as a jit
        # static argument far from the call site.
        for name, value in kw.items():
            if isinstance(value, list):
                kw[name] = tuple(value)
        return dataclasses.replace(self, **kw)


# The five reference workloads, BASELINE.json:7-11.
PRESETS = {
    # 1. "2D point-mass NDiv-GAN: MLP G/D, latent dim 2, batch 64, k=8"
    "pointmass2d": Config(
        name="pointmass2d", conditioning="none", batch_size=64, k=8,
        latent_dim=2,
    ),
    # 2. "Goal-conditioned trajectory NDiv-GAN: start/goal MLP conditioning,
    #     batch 256, horizon 32"
    # EMA generator on by default for the conditioned presets: the
    # recipe sweep (benchmarks/imagecond_sweep_results_12000.json) found
    # EMA the only intervention beating control outside GAN seed noise
    # (0.33 vs 0.20 mean success at 12k), and the EMA eval curve is
    # near-monotone where the raw one saws 0.06-0.73 (BASELINE.md r2).
    "goalcond": Config(
        name="goalcond", conditioning="startgoal", batch_size=256, k=8,
        latent_dim=2, horizon=32, generator_output="sigmoid",
        g_ema_decay=0.999,
    ),
    # 3. "Image-conditioned generator: conv encoder + trajectory decoder
    #     head, batch 512"
    "imagecond": Config(
        name="imagecond", conditioning="image", batch_size=512, k=8,
        latent_dim=2, generator_output="sigmoid", g_ema_decay=0.999,
    ),
    # 4. "Sim-in-the-loop planning: vmapped env rollouts scoring 1k
    #     candidate trajectories per step" — an eval-centric preset.
    "planning": Config(
        name="planning", conditioning="image", batch_size=64, k=8,
        latent_dim=2, n_candidates=1000, generator_output="sigmoid",
        g_ema_decay=0.999,
    ),
    # 5. "Pod-scale data-parallel NDiv-GAN: v5p-8 mesh, global batch 8k,
    #     k=32 diversity samples" — bf16 compute by default: the
    #     throughput config rides the MXU's native dtype (1.42x measured,
    #     quality-comparable; BASELINE.md).
    "pod_dp": Config(
        name="pod_dp", conditioning="startgoal", batch_size=8192, k=32,
        latent_dim=2, dp_shards=8, generator_output="sigmoid",
        compute_dtype="bf16", g_ema_decay=0.999,
    ),
}


def get_config(preset: str, **overrides) -> Config:
    """Fetch a preset by name with field overrides.

    The default workdir is namespaced per preset
    (``/tmp/ndivplanning_tpu/<preset>``): with a SHARED default dir, two
    presets with identical TrainState schemas (e.g. goalcond then
    pod_dp, both run without --workdir) would silently cross-restore
    each other's checkpoints and overwrite each other's config.json."""
    try:
        cfg = PRESETS[preset]
    except KeyError:
        raise ValueError(
            f"unknown preset {preset!r}; choose from {sorted(PRESETS)}"
        ) from None
    if "workdir" not in overrides and cfg.workdir == Config.workdir:
        overrides = {**overrides,
                     "workdir": os.path.join(cfg.workdir, preset)}
    return cfg.replace(**overrides) if overrides else cfg


def config_from_dict(d: dict) -> Config:
    """Rebuild a Config from its JSON dict (tuples arrive as lists)."""
    fields = {f.name: f for f in dataclasses.fields(Config)}
    kw = {}
    for name, value in d.items():
        if name not in fields:
            continue  # forward compatibility: ignore unknown fields
        if isinstance(value, list):
            value = tuple(value)
        kw[name] = value
    return Config(**kw)


def _config_path(workdir: str) -> str:
    import os

    return os.path.join(workdir, "config.json")


def save_config(cfg: Config, workdir: str) -> None:
    """Record the run's full config as ``<workdir>/config.json`` so
    eval/plan/serve can rebuild the exact TrainState schema (optimizer
    structure included) without the user retyping every flag."""
    import json
    import os

    os.makedirs(workdir, exist_ok=True)
    with open(_config_path(workdir), "w", encoding="utf-8") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1, sort_keys=True)


def load_config(workdir: str) -> Config | None:
    """The config recorded by a train run in ``workdir``, or None."""
    import json
    import os

    path = _config_path(workdir)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return config_from_dict(json.load(f))
