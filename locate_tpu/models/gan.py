"""GAN model-pair constructor: one generator + one discriminator per run
(SURVEY.md §1). This is the "model constructors" piece of the reference's
public API surface (BASELINE: "model constructors, block factories, ...")."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from locate_tpu.config import Config, ModelConfig
from locate_tpu.models.discriminator import Discriminator, build_discriminator
from locate_tpu.models.generator import Generator, build_generator


@dataclasses.dataclass(frozen=True)
class GAN:
    config: ModelConfig
    generator: Generator
    discriminator: Discriminator
    compute_dtype: Any

    def init(self, key: jax.Array) -> Dict[str, Any]:
        kg, kd = jax.random.split(key)
        return {
            "generator": self.generator.init(kg),
            "discriminator": self.discriminator.init(kd),
        }

    def sample_latents(
        self, key: jax.Array, n: int, truncation: float = 0.0
    ) -> jax.Array:
        """z ~ N(0, I) in the compute dtype (SURVEY.md §4.1).

        `truncation` > 0 applies the truncation trick (BigGAN-style
        quality/diversity knob): z is drawn from N(0, I) truncated to
        [-truncation, truncation]."""
        shape = (n, self.config.latent_dim)
        if truncation > 0.0:
            z = jax.random.truncated_normal(
                key, -truncation, truncation, shape, jnp.float32
            )
        else:
            z = jax.random.normal(key, shape, jnp.float32)
        return z.astype(self.compute_dtype)

    def sample_labels(self, key: jax.Array, n: int):
        if not self.config.num_classes:
            return None
        return jax.random.randint(key, (n,), 0, self.config.num_classes)


def build_gan(cfg: Config) -> GAN:
    compute_dtype = jnp.dtype(cfg.train.compute_dtype)
    model_cfg = cfg.model
    if cfg.use_pallas and not model_cfg.use_pallas:
        model_cfg = dataclasses.replace(model_cfg, use_pallas=True)
    return GAN(
        config=model_cfg,
        generator=build_generator(model_cfg, compute_dtype),
        discriminator=build_discriminator(model_cfg, compute_dtype),
        compute_dtype=compute_dtype,
    )
