"""Train state: params, optimizer states, PRNG key, step counter.

SURVEY.md §3.4: the PRNG key lives *inside* the state and every consumer
splits from it explicitly — the bitwise-reproducibility discipline.  The
whole state is one pytree so ``donate_argnums`` can recycle its buffers
each step and orbax can checkpoint/restore it losslessly (SURVEY.md §5).
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from ndivplanning_tpu.models.conditioning import (
    ConditionEncoder,
    condition_input_example,
)
from ndivplanning_tpu.models.mlp import Discriminator, Generator
from ndivplanning_tpu.utils.config import Config

_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16}


def _compute_dtype(cfg: Config):
    try:
        return _DTYPES[cfg.compute_dtype]
    except KeyError:
        raise ValueError(
            f"unknown compute_dtype {cfg.compute_dtype!r}; "
            f"choose from {sorted(_DTYPES)}"
        ) from None


class ConditionedGenerator(nn.Module):
    """G = own condition encoder + MLP trunk + trajectory head (C1+C3).

    G and D deliberately do NOT share the encoder: a shared encoder would
    let D's update drag G's representation around mid-step.
    """

    cfg: Config

    @nn.compact
    def __call__(self, conditions: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        dtype = _compute_dtype(self.cfg)
        cond_embed = ConditionEncoder(
            mode=self.cfg.conditioning, embed_dim=self.cfg.cond_embed_dim,
            encoder_features=self.cfg.encoder_features, dtype=dtype,
        )(conditions)
        if self.cfg.g_arch == "transformer":
            from ndivplanning_tpu.models.transformer import (
                TrajectoryTransformer,
            )

            return TrajectoryTransformer(
                horizon=self.cfg.horizon,
                state_dim=self.cfg.state_dim,
                dim=self.cfg.g_tf_dim,
                layers=self.cfg.g_tf_layers,
                heads=self.cfg.g_tf_heads,
                output=self.cfg.generator_output,
                dtype=dtype,
            )(cond_embed, z)
        if self.cfg.g_arch != "mlp":
            raise ValueError(f"unknown g_arch {self.cfg.g_arch!r}; "
                             "choose from ['mlp', 'transformer']")
        return Generator(
            horizon=self.cfg.horizon,
            state_dim=self.cfg.state_dim,
            hidden=self.cfg.g_hidden,
            output=self.cfg.generator_output,
            dtype=dtype,
        )(cond_embed, z)


class ConditionedDiscriminator(nn.Module):
    """D = own condition encoder + MLP scorer (C2+C3)."""

    cfg: Config

    @nn.compact
    def __call__(self, conditions: jnp.ndarray, traj: jnp.ndarray,
                 return_features: bool = False):
        dtype = _compute_dtype(self.cfg)
        cond_embed = ConditionEncoder(
            mode=self.cfg.conditioning, embed_dim=self.cfg.cond_embed_dim,
            encoder_features=self.cfg.encoder_features, dtype=dtype,
        )(conditions)
        return Discriminator(hidden=self.cfg.d_hidden, dtype=dtype,
                             spectral_norm=self.cfg.d_spectral_norm)(
            cond_embed, traj, return_features=return_features)


@flax.struct.dataclass
class TrainState:
    """Everything a training run is: restoring this pytree resumes the
    exact bitwise loss curve (SURVEY.md §5 checkpoint/resume)."""

    step: jnp.ndarray  # int32 scalar
    rng: jax.Array  # PRNG key, split every step
    g_params: dict
    d_params: dict
    g_opt_state: optax.OptState
    d_opt_state: optax.OptState
    # EMA of g_params (cfg.g_ema_decay > 0); equals g_params otherwise.
    g_ema_params: dict
    # LeCam anchor trackers (config.py lecam_weight): EMAs of D's mean
    # real/fake logits, bias-corrected at read time by `step` like Adam
    # moments.  Carried (as zeros) even when the knob is off so the
    # TrainState schema is uniform; pre-lecam checkpoints migrate via
    # utils/checkpoint.py::_restore_legacy.
    lecam_ema: dict
    # ADA controller state (config.py ada_target): the overfitting-
    # heuristic EMA ``r`` and the augmentation probability ``p``.
    # Carried (as zeros) when the knob is off, same uniform-schema
    # discipline as lecam_ema; pre-ada checkpoints migrate via
    # utils/checkpoint.py::_restore_legacy.
    ada: dict


def fresh_lecam_ema() -> dict:
    """Zero-initialised LeCam logit trackers (config.py lecam_weight).

    The single source of the tracker schema: used by
    :func:`create_train_state` AND the legacy-checkpoint migration
    (utils/checkpoint.py), so a schema change cannot desync them.
    """
    return {"real": jnp.zeros((), jnp.float32),
            "fake": jnp.zeros((), jnp.float32)}


def fresh_ada() -> dict:
    """Zero-initialised ADA controller state (config.py ada_target):
    ``r`` (bias-corrected r_t EMA, like the LeCam anchors) and ``p``
    (augmentation probability — ADA starts augmentation off and ramps
    on demand).  Single source of the schema for create_train_state AND
    the legacy-checkpoint migration."""
    return {"r": jnp.zeros((), jnp.float32),
            "p": jnp.zeros((), jnp.float32)}


def gen_params(cfg: Config, state: TrainState):
    """The generator params eval/planning should use: the EMA weights
    when the config tracks them, the live weights otherwise.

    Best checkpoints where the RAW generator out-scored the EMA one are
    saved with the raw weights in the EMA slot (train/loop.py
    ``_best_candidates``), so this accessor always yields the weights
    that won the frozen-suite eval."""
    return state.g_ema_params if cfg.g_ema_decay > 0 else state.g_params


def build_models(cfg: Config):
    """(generator, discriminator) modules for a config."""
    return ConditionedGenerator(cfg), ConditionedDiscriminator(cfg)


def lr_schedule(cfg: Config, peak: float):
    """The LR schedule for one optimizer chain: a plain float for the
    default constant/no-warmup case (keeps the optimizer state schema —
    and therefore old checkpoints — unchanged), an optax schedule
    callable otherwise.  Decay horizon is ``cfg.steps``; a resumed run
    restores the schedule position via the checkpointed Adam count."""
    if cfg.lr_schedule == "constant" and cfg.warmup_steps == 0:
        return peak
    decay_steps = max(cfg.steps - cfg.warmup_steps, 1)
    end = peak * cfg.lr_final_ratio
    if cfg.lr_schedule == "constant":
        main = optax.constant_schedule(peak)
    elif cfg.lr_schedule == "cosine":
        main = optax.cosine_decay_schedule(peak, decay_steps,
                                           alpha=cfg.lr_final_ratio)
    elif cfg.lr_schedule == "linear":
        main = optax.linear_schedule(peak, end, decay_steps)
    else:
        raise ValueError(
            f"unknown lr_schedule {cfg.lr_schedule!r}; "
            "choose from ['constant', 'cosine', 'linear']")
    if cfg.warmup_steps == 0:
        return main
    warmup = optax.linear_schedule(0.0, peak, cfg.warmup_steps)
    return optax.join_schedules([warmup, main], [cfg.warmup_steps])


def build_optimizers(cfg: Config):
    """Separate Adam chains for G and D (SURVEY.md §2 C11), each riding
    the config's LR schedule from its own peak LR."""
    g_tx = optax.adam(lr_schedule(cfg, cfg.g_lr),
                      b1=cfg.adam_b1, b2=cfg.adam_b2)
    d_tx = optax.adam(lr_schedule(cfg, cfg.d_lr),
                      b1=cfg.adam_b1, b2=cfg.adam_b2)
    return g_tx, d_tx


def create_train_state(cfg: Config, seed: int | None = None) -> TrainState:
    """Initialise params/optimizers from the config's seed (SURVEY §3.4)."""
    seed = cfg.seed if seed is None else seed
    root = jax.random.PRNGKey(seed)
    k_g, k_d, k_run = jax.random.split(root, 3)

    gen, disc = build_models(cfg)
    cond_ex = condition_input_example(cfg.conditioning, batch=2,
                                      image_size=cfg.image_size)
    z_ex = jnp.zeros((2, cfg.k, cfg.latent_dim), jnp.float32)
    traj_ex = jnp.zeros((2, cfg.horizon, cfg.state_dim), jnp.float32)

    g_params = gen.init(k_g, cond_ex, z_ex)
    d_params = disc.init(k_d, cond_ex, traj_ex)

    g_tx, d_tx = build_optimizers(cfg)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        rng=k_run,
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        # Distinct buffers, not an alias: the fused step donates the
        # whole state, and XLA rejects donating one buffer twice.
        g_ema_params=jax.tree.map(jnp.copy, g_params),
        lecam_ema=fresh_lecam_ema(),
        ada=fresh_ada(),
    )


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
