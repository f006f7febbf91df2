"""Train state: one explicit pytree owning everything a step mutates.

The reference keeps this state scattered across nn.Module buffers, optimizer
objects and Python ints ([R trainer.py], SURVEY.md §2.10/§2.14); here it is a
single pytree so the whole training step is a pure function
`(state, batch, key) -> (state, metrics)` — jit-able, donate-able,
checkpoint-able (the checkpoint IS the state, SURVEY §5.4: params, EMA, opt
states, step, SN u vectors, BN running stats).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.models import discriminator, generator
from dvdgan_tpu.ops import spectral_norm as sn


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyper-parameters of the alternating hinge-loss loop (SURVEY §2.10):
    Adam β=(0, 0.999), lr 1e-4 (G) / 5e-4 (D), d_steps D updates per G
    update, EMA decay 0.9999 on G for sampling/eval."""
    lr_g: float = 1e-4
    lr_d: float = 5e-4
    beta1: float = 0.0
    beta2: float = 0.999
    d_steps: int = 2
    ema_decay: float = 0.9999
    ema_start: int = 1000     # steps before EMA starts averaging
    batch_size: int = 4
    # micro-batches per optimizer update (train/step.py docstring: D-phase
    # updates stay exactly full-batch; G recomputes per micro-batch with
    # per-micro BN stats). Needed for preset 4's global batch 512.
    grad_accum: int = 1
    # D-phase fake generation: "pooled" = ONE G forward for all d_steps
    # batches (CBN stats pool across them — faster, the framework
    # default); "per_step" = one forward per D step (the reference's
    # per-batch stats). A/B'd on-chip — see train/step.py docstring.
    fake_gen: str = "pooled"
    # emit global gradient-norm scalars (g_grad_norm / d_grad_norm) in the
    # step metrics — the standard GAN-health telemetry (exploding D grads,
    # vanishing G grads). Static: adds nothing to the compiled step when
    # off.
    log_grad_norms: bool = False


def g_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(tc.lr_g, b1=tc.beta1, b2=tc.beta2)


def d_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(tc.lr_d, b1=tc.beta1, b2=tc.beta2)


def create(key: jax.Array, g_cfg: GConfig, ds_cfg: DSConfig,
           dt_cfg: DTConfig, tc: TrainConfig) -> dict[str, Any]:
    """Build the full initial train state pytree."""
    kg, kds, kdt, ksn_g, ksn_ds, ksn_dt = jax.random.split(key, 6)

    g_params, g_stats = generator.init(kg, g_cfg)
    ds_params = discriminator.ds_init(kds, ds_cfg)
    dt_params = discriminator.dt_init(kdt, dt_cfg)

    state = {
        "step": jnp.zeros((), jnp.int32),
        "g": {
            "params": g_params,
            "stats": g_stats,
            "sn_u": sn.sn_init(ksn_g, g_params),
            "opt": g_optimizer(tc).init(g_params),
        },
        "ds": {
            "params": ds_params,
            "sn_u": sn.sn_init(ksn_ds, ds_params),
            "opt": d_optimizer(tc).init(ds_params),
        },
        "dt": {
            "params": dt_params,
            "sn_u": sn.sn_init(ksn_dt, dt_params),
            "opt": d_optimizer(tc).init(dt_params),
        },
        # materialized copy (not an alias): params and their EMA must be
        # distinct buffers or jit donation sees the same buffer twice
        "g_ema": jax.tree.map(jnp.copy, g_params),
    }
    return state


def ema_update(ema, params, decay, step, start):
    """EMA with copy-through warmup: before `start` steps the EMA tracks the
    raw params exactly (BigGAN convention); after, classic exponential decay.
    `decay_t` is computed under jit from the step counter."""
    use_decay = (step >= start).astype(jnp.float32)
    d = decay * use_decay
    return jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, params)
