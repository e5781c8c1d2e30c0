"""Real-chip bf16 smoke of the round-3 regularizer additions: spectral
norm + WGAN-GP + path-length reg + use_pallas, all in ONE jitted step
(the stress combination for the XLA-twin / grad-of-grad machinery).
Usage: python scripts/smoke_regs.py [batch steps]"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from locate_tpu.config import get_config  # noqa: E402
from locate_tpu.models.gan import build_gan  # noqa: E402
from locate_tpu.train.state import create_train_state  # noqa: E402
from locate_tpu.train.step import make_train_step  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print("backend:", jax.devices()[0].device_kind, flush=True)
    cfg = get_config("cifar10_32", {
        "train.global_batch": str(batch),
        "train.compute_dtype": "bfloat16",
        "use_pallas": "true",
        "train.r1_gamma": "0.0",
        "train.pl_gamma": "2.0", "train.pl_interval": "2",
        "train.gp_gamma": "1.0",
        "model.spectral_norm": "true",
    })
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    rng = np.random.default_rng(0)
    b = {"image": rng.integers(0, 256, (batch, 32, 32, 3), dtype=np.uint8),
         "label": np.zeros((batch,), np.int32)}
    t0 = time.time()
    for i in range(steps):
        state, m = step(state, b)
        vals = {k: float(v) for k, v in m.items()}
        print(i, "+%.0fs" % (time.time() - t0),
              {k: round(v, 4) for k, v in sorted(vals.items())}, flush=True)
        assert all(np.isfinite(v) for v in vals.values()), vals
    print("pl_mean:", float(state.pl_mean))
    print("OK")


if __name__ == "__main__":
    main()
