"""Remat tests: stage rematerialization must not change numerics (only the
backward-pass memory/FLOPs trade)."""

import dataclasses

import numpy as np
import jax

from locate_tpu.models.gan import build_gan
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def test_remat_identical_trajectory(tiny_config):
    def run(remat):
        cfg = dataclasses.replace(
            tiny_config,
            model=dataclasses.replace(tiny_config.model, remat=remat),
        )
        gan = build_gan(cfg)
        state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, gan))
        batch = {
            "image": jax.random.uniform(
                jax.random.PRNGKey(1),
                (cfg.train.global_batch, 16, 16, 3),
                minval=-1.0,
                maxval=1.0,
            ),
            "label": jax.numpy.zeros((cfg.train.global_batch,), jax.numpy.int32),
        }
        out = []
        for _ in range(2):
            state, m = step(state, batch)
            out.append({k: float(v) for k, v in m.items()})
        return out

    plain, remat = run(False), run(True)
    for a, b in zip(plain, remat):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)
