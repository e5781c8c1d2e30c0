"""Train-state pytree: everything needed to deterministically resume a run
lives in ONE pytree (SURVEY.md §6 "Checkpoint / resume": step counter, PRNG
key, EMA, both optimizer states)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
from locate_tpu.config import Config
from locate_tpu.models.gan import GAN
from locate_tpu.objectives.ema import ema_init
from locate_tpu.objectives.optim import make_optimizers


@flax.struct.dataclass
class TrainState:
    step: jax.Array                 # int32 scalar
    rng: jax.Array                  # PRNG key consumed by the train step
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    ema_params: Any                 # EMA shadow of g_params in
                                    # train.ema_dtype (or None)
    ada_p: Any = None               # scalar augmentation probability
                                    # (None when augmentation disabled —
                                    # keeps the pytree unchanged)
    pl_mean: Any = None             # path-length running mean (None when
                                    # train.pl_gamma == 0)
    lecam: Any = None               # LeCam logit-mean EMAs
                                    # [ema_real, ema_fake] (None when
                                    # train.lecam_gamma == 0)


def create_train_state(cfg: Config, gan: GAN, key: jax.Array) -> TrainState:
    k_init, k_train = jax.random.split(key)
    params = gan.init(k_init)
    g_opt, d_opt = make_optimizers(cfg.train)
    ema = (
        ema_init(params["generator"], jnp.dtype(cfg.train.ema_dtype))
        if cfg.train.ema_decay > 0
        else None
    )
    aug_on = cfg.train.augment_p > 0.0 or cfg.train.ada_target > 0.0
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        rng=k_train,
        g_params=params["generator"],
        d_params=params["discriminator"],
        g_opt_state=g_opt.init(params["generator"]),
        d_opt_state=d_opt.init(params["discriminator"]),
        ema_params=ema,
        ada_p=(
            jnp.asarray(cfg.train.augment_p, jnp.float32) if aug_on else None
        ),
        pl_mean=(
            jnp.zeros((), jnp.float32) if cfg.train.pl_gamma > 0.0 else None
        ),
        lecam=(
            # EMAs start at 0 (official-code convention); they re-warm
            # within ~1/(1-decay) steps, also the enable-on-resume fill.
            jnp.zeros((2,), jnp.float32)
            if cfg.train.lecam_gamma > 0.0 else None
        ),
    )
