"""locate-tpu: a TPU-native image-generation (GAN) framework with the
capabilities of ClashLuke/LocAtE, built JAX/XLA/Pallas-first.

Public API surface mirrors the reference contract (BASELINE.json
north_star): model constructors, block factories, train-loop entry points,
sampling/checkpointing.
"""

import jax as _jax

# Partitionable threefry lets XLA shard jax.random sampling across a mesh
# instead of replicate-and-slice. It changes the values drawn for a given
# key, so it must be set ONCE at a consistent point — package import —
# rather than as a side effect of building a mesh (otherwise the same
# PRNGKey would yield different samples depending on call order).
_jax.config.update("jax_threefry_partitionable", True)

from locate_tpu.config import (
    AttentionConfig,
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    ParallelConfig,
    StyleConfig,
    TrainConfig,
    get_config,
    PRESETS,
)
from locate_tpu.models.gan import GAN, build_gan
from locate_tpu.models.generator import Generator, build_generator
from locate_tpu.models.style_generator import (
    apply_truncated,
    build_style_generator,
    w_average,
)
from locate_tpu.models.discriminator import Discriminator, build_discriminator
from locate_tpu.nn.blocks import (
    conv_block,
    discriminator_stage,
    from_rgb,
    generator_stage,
    to_rgb,
)
from locate_tpu.ops.attention import locate_attention
from locate_tpu.ops.self_attention import self_attention
from locate_tpu.objectives.losses import (
    d_nonsat_loss,
    d_ragan_loss,
    d_rpgan_loss,
    g_nonsat_loss,
    g_ragan_loss,
    g_rpgan_loss,
    get_losses,
    gradient_penalty,
    path_lengths,
    r1_penalty,
)
from locate_tpu.objectives.ema import ema_init, ema_update
from locate_tpu.ops.norm import minibatch_stddev
from locate_tpu.ops.spectral import spectral_normalize, spectral_sigma
from locate_tpu.io.projection import project
from locate_tpu.train.state import TrainState, create_train_state
from locate_tpu.train.step import make_train_step
from locate_tpu.train.loop import train
from locate_tpu.io.checkpoint import CheckpointManager
from locate_tpu.io.export import export_generator, load_generator
from locate_tpu.io.fid import (
    evaluate_generator,
    frechet_distance,
    inception_score,
    kid,
    prdc,
)
from locate_tpu.io.swd import sliced_wasserstein, swd, swd_generator
from locate_tpu.io.sampling import (
    generate_samples,
    interpolation_grid,
    save_image_grid,
    slerp,
)
from locate_tpu.parallel.mesh import make_mesh
from locate_tpu.parallel.sharding import make_step_for

__version__ = "0.1.0"

__all__ = [
    "AttentionConfig", "Config", "DataConfig", "ModelConfig", "OptimConfig",
    "ParallelConfig", "StyleConfig", "TrainConfig", "get_config", "PRESETS",
    "GAN", "build_gan", "Generator", "build_generator",
    "build_style_generator", "apply_truncated", "w_average",
    "Discriminator", "build_discriminator",
    "conv_block", "generator_stage", "discriminator_stage", "to_rgb", "from_rgb",
    "locate_attention", "self_attention",
    "d_nonsat_loss", "g_nonsat_loss", "d_ragan_loss", "g_ragan_loss",
    "d_rpgan_loss", "g_rpgan_loss",
    "get_losses", "r1_penalty", "gradient_penalty",
    "path_lengths", "spectral_normalize", "spectral_sigma", "project",
    "minibatch_stddev",
    "ema_init", "ema_update",
    "TrainState", "create_train_state", "make_train_step", "train",
    "CheckpointManager", "generate_samples", "save_image_grid",
    "export_generator", "load_generator",
    "evaluate_generator", "frechet_distance", "kid", "prdc",
    "sliced_wasserstein", "swd", "swd_generator",
    "inception_score",
    "interpolation_grid", "slerp", "make_mesh", "make_step_for",
]
