"""Non-saturating GAN losses (SURVEY.md §1, BASELINE: "non-saturating GAN
forward-backward step"):

    L_G = mean softplus(-D(G(z)))
    L_D = mean softplus(-D(real)) + mean softplus(D(fake))

plus an optional lazy R1 gradient penalty on the discriminator (a standard
stability term; off by default since the reference's use is unconfirmed —
SURVEY.md §3 "Losses": "possibly a gradient/stability penalty").

All losses are computed in fp32 regardless of the network compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def g_nonsat_loss(fake_logits: jax.Array) -> jax.Array:
    """Generator non-saturating loss: -log sigmoid(D(fake))."""
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


def d_nonsat_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Discriminator loss: -log sigmoid(D(real)) - log(1 - sigmoid(D(fake)))."""
    real = jnp.mean(jax.nn.softplus(-real_logits.astype(jnp.float32)))
    fake = jnp.mean(jax.nn.softplus(fake_logits.astype(jnp.float32)))
    return real + fake


def g_hinge_loss(fake_logits: jax.Array) -> jax.Array:
    """Generator hinge loss: -E[D(fake)] (the geometric-GAN form used by
    SAGAN/BigGAN; offered as a config option alongside the reference's
    non-saturating loss)."""
    return -jnp.mean(fake_logits.astype(jnp.float32))


def d_hinge_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Discriminator hinge loss: E[relu(1 - D(real))] + E[relu(1 + D(fake))]."""
    real = jnp.mean(jax.nn.relu(1.0 - real_logits.astype(jnp.float32)))
    fake = jnp.mean(jax.nn.relu(1.0 + fake_logits.astype(jnp.float32)))
    return real + fake


def g_wgan_loss(fake_logits: jax.Array) -> jax.Array:
    """Wasserstein generator loss: -E[D(fake)] (same form as hinge's G)."""
    return -jnp.mean(fake_logits.astype(jnp.float32))


def d_wgan_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Wasserstein critic loss: E[D(fake)] - E[D(real)] (arXiv 1701.07875).
    Needs a Lipschitz control to be meaningful — pair with the R1 penalty
    (`train.r1_gamma`, a zero-centered gradient penalty: arXiv 1801.04406
    shows it serves the same role as WGAN-GP's one-centered one) and/or
    `train.logit_penalty` to keep the critic's scale anchored."""
    return jnp.mean(fake_logits.astype(jnp.float32)) - jnp.mean(
        real_logits.astype(jnp.float32)
    )


def g_lsgan_loss(fake_logits: jax.Array) -> jax.Array:
    """Least-squares generator loss 0.5*E[(D(fake)-1)^2] (LSGAN, arXiv
    1611.04076 eq. 9 with the 0-1 coding scheme)."""
    f = fake_logits.astype(jnp.float32)
    return 0.5 * jnp.mean((f - 1.0) ** 2)


def d_lsgan_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Least-squares discriminator loss (LSGAN, arXiv 1611.04076 eq. 9):
    0.5*E[(D(real)-1)^2] + 0.5*E[D(fake)^2]. Penalizes confident logits on
    BOTH sides (unlike nonsat's saturating tails), which is its stability
    mechanism — no Lipschitz control needed."""
    r = real_logits.astype(jnp.float32)
    f = fake_logits.astype(jnp.float32)
    return 0.5 * jnp.mean((r - 1.0) ** 2) + 0.5 * jnp.mean(f**2)


def g_ragan_loss(fake_logits: jax.Array, real_logits: jax.Array,
                 mean_fn=jnp.mean) -> jax.Array:
    """Relativistic average GAN generator loss (RaGAN, arXiv 1807.00734
    §4.2): the generator pushes D(fake) above the AVERAGE real logit AND
    D(real) below the average fake logit,

        E[softplus(-(D(fake) - E[D(real)]))] + E[softplus(D(real) - E[D(fake)])]

    `mean_fn` computes the batch-mean logits E[.]; under shard_map the
    train step passes a pmean'd mean so the averages are GLOBAL-batch
    statistics (the loss couples samples through them — per-replica means
    would change the objective with the mesh)."""
    f = fake_logits.astype(jnp.float32)
    r = real_logits.astype(jnp.float32)
    mr, mf = mean_fn(r), mean_fn(f)
    return jnp.mean(jax.nn.softplus(-(f - mr))) + jnp.mean(
        jax.nn.softplus(r - mf)
    )


def d_ragan_loss(real_logits: jax.Array, fake_logits: jax.Array,
                 mean_fn=jnp.mean) -> jax.Array:
    """Relativistic average GAN discriminator loss (arXiv 1807.00734 §4.2):
    D rates reals above the average fake and fakes below the average real:

        E[softplus(-(D(real) - E[D(fake)]))] + E[softplus(D(fake) - E[D(real)])]
    """
    r = real_logits.astype(jnp.float32)
    f = fake_logits.astype(jnp.float32)
    mr, mf = mean_fn(r), mean_fn(f)
    return jnp.mean(jax.nn.softplus(-(r - mf))) + jnp.mean(
        jax.nn.softplus(f - mr)
    )


def g_rahinge_loss(fake_logits: jax.Array, real_logits: jax.Array,
                   mean_fn=jnp.mean) -> jax.Array:
    """Relativistic average hinge generator loss (RaHingeGAN, arXiv
    1807.00734 table 2 — the pairing used by e.g. ESRGAN):
    E[relu(1 - (D(fake) - E[D(real)]))] + E[relu(1 + (D(real) - E[D(fake)]))].
    """
    f = fake_logits.astype(jnp.float32)
    r = real_logits.astype(jnp.float32)
    mr, mf = mean_fn(r), mean_fn(f)
    return jnp.mean(jax.nn.relu(1.0 - (f - mr))) + jnp.mean(
        jax.nn.relu(1.0 + (r - mf))
    )


def d_rahinge_loss(real_logits: jax.Array, fake_logits: jax.Array,
                   mean_fn=jnp.mean) -> jax.Array:
    """Relativistic average hinge discriminator loss (arXiv 1807.00734
    table 2): E[relu(1 - (D(real) - E[D(fake)]))] +
    E[relu(1 + (D(fake) - E[D(real)]))]."""
    r = real_logits.astype(jnp.float32)
    f = fake_logits.astype(jnp.float32)
    mr, mf = mean_fn(r), mean_fn(f)
    return jnp.mean(jax.nn.relu(1.0 - (r - mf))) + jnp.mean(
        jax.nn.relu(1.0 + (f - mr))
    )


def g_rpgan_loss(fake_logits: jax.Array, real_logits: jax.Array,
                 mean_fn=jnp.mean) -> jax.Array:
    """Relativistic pairing generator loss (RSGAN, arXiv 1807.00734 §3;
    the "RpGAN" objective R3GAN builds its modern baseline on, arXiv
    2501.05441 §2.1): each fake is rated against ITS paired real sample,

        E_i[ softplus(-(D(fake_i) - D(real_i))) ]

    Per-PAIR decomposable — unlike ragan/rahinge there is no batch-mean
    coupling, so `mean_fn` is unused (kept for the relativistic-family
    call signature); DP backends agree as long as real row i and latent
    row i land on the same replica, which the global-draw + local-slice
    latent discipline guarantees (train/step.py)."""
    del mean_fn
    f = fake_logits.astype(jnp.float32).reshape(-1)
    r = real_logits.astype(jnp.float32).reshape(-1)
    return jnp.mean(jax.nn.softplus(-(f - r)))


def d_rpgan_loss(real_logits: jax.Array, fake_logits: jax.Array,
                 mean_fn=jnp.mean) -> jax.Array:
    """Relativistic pairing discriminator loss (RSGAN / RpGAN):

        E_i[ softplus(-(D(real_i) - D(fake_i))) ]

    R3GAN (arXiv 2501.05441 §2.2) shows this objective + zero-centered
    gradient penalties on BOTH reals and fakes (train.r1_gamma +
    train.r2_gamma) is locally convergent where the classic pair is not —
    the full recipe here is `train.loss=rpgan r1_gamma=g r2_gamma=g`."""
    del mean_fn
    r = real_logits.astype(jnp.float32).reshape(-1)
    f = fake_logits.astype(jnp.float32).reshape(-1)
    return jnp.mean(jax.nn.softplus(-(r - f)))


# Non-weight >=2-D leaves excluded from orthogonal regularization, by
# pytree key name: the style generator's learned const input (4,4,C) and
# the class-embedding tables. BigGAN's recipe (arXiv 1809.11096 §3 and the
# official BigGAN-PyTorch `ortho` helper) regularizes weight MATRICES only
# and explicitly blacklists the shared embedding — pulling an embedding
# table or a learned input toward column-orthogonality is a different
# (unwanted) prior.
ORTHO_EXCLUDE = frozenset({"const", "class_embed"})


def orthogonal_penalty(params) -> jax.Array:
    """BigGAN orthogonal regularization (arXiv 1809.11096 §3, the
    off-diagonal form): sum over every weight leaf with ndim >= 2 of
    ||W^T W o (1 - I)||_F^2, conv kernels flattened to
    [fan_in, fan_out] (= HWI x O for this repo's HWIO layout). Biases,
    gains, and other <2-D leaves are skipped, as are non-weight leaves
    whose pytree key is in ORTHO_EXCLUDE (learned const inputs,
    class-embedding tables — BigGAN blacklists its shared embedding).
    fp32. The caller scales by ortho_gamma (paper: 1e-4) and adds to the
    G loss."""
    tot = jnp.zeros((), jnp.float32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if leaf.ndim < 2:
            continue
        if any(getattr(k, "key", None) in ORTHO_EXCLUDE for k in path):
            continue
        w = leaf.reshape(-1, leaf.shape[-1]).astype(jnp.float32)
        gram = w.T @ w
        gram = gram - jnp.diag(jnp.diagonal(gram))
        tot = tot + jnp.sum(gram**2)
    return tot


def lecam_penalty(real_logits: jax.Array, fake_logits: jax.Array,
                  ema_real: jax.Array, ema_fake: jax.Array) -> jax.Array:
    """LeCam regularization term (arXiv 2104.03310):

        E[ relu(D(real) - ema_fake)^2 ] + E[ relu(ema_real - D(fake))^2 ]

    where `ema_real` / `ema_fake` are exponential moving averages of the
    batch-mean real/fake logits (held in `TrainState.lecam`, updated each
    optimizer step OUTSIDE this function with stop-gradient semantics —
    the trackers come from state, so no gradient flows into them here).
    Two deliberate deviations from the official lecam-gan code: (a) the
    penalty reads the PREVIOUS step's trackers (one-step lag — the update
    lands after the D loss, keeping the loss a pure function of state and
    the trackers finite-gated), and (b) warmup is a plain EMA from a zero
    init rather than the official simple-average ramp; both vanish within
    ~1/(1-decay) steps and neither changes the fixed point.
    Pulling D's real scores down toward where it recently put fakes (and
    vice versa) bounds the WGAN-style logit gap, which the paper links to
    minimizing a LeCam divergence — the standard limited-data stabilizer
    alongside ADA/bCR. fp32; added to the D loss only."""
    r = real_logits.astype(jnp.float32).reshape(-1)
    f = fake_logits.astype(jnp.float32).reshape(-1)
    return (jnp.mean(jax.nn.relu(r - ema_fake) ** 2)
            + jnp.mean(jax.nn.relu(ema_real - f) ** 2))


# Families whose G loss needs the real logits (and a global-mean hook):
# both loss fns take (logits..., mean_fn=jnp.mean).
RELATIVISTIC = frozenset({"ragan", "rahinge", "rpgan"})
# Families whose G loss decomposes into independent per-sample terms
# (required by top-k training, TrainConfig.topk_fraction).
PER_SAMPLE_G = frozenset({"nonsat", "hinge", "wgan", "lsgan"})


def get_losses(kind: str):
    """(g_loss_fn, d_loss_fn) for a configured loss family. Relativistic
    families (RELATIVISTIC) have the extended signatures
    g(fake_logits, real_logits, mean_fn) / d(real, fake, mean_fn)."""
    if kind == "nonsat":
        return g_nonsat_loss, d_nonsat_loss
    if kind == "hinge":
        return g_hinge_loss, d_hinge_loss
    if kind == "wgan":
        return g_wgan_loss, d_wgan_loss
    if kind == "lsgan":
        return g_lsgan_loss, d_lsgan_loss
    if kind == "ragan":
        return g_ragan_loss, d_ragan_loss
    if kind == "rahinge":
        return g_rahinge_loss, d_rahinge_loss
    if kind == "rpgan":
        return g_rpgan_loss, d_rpgan_loss
    raise ValueError(f"unknown GAN loss {kind!r}")


def g_per_sample(kind: str):
    """Per-sample generator loss (N,)->(N,) for the per-sample-decomposable
    families — the form top-k training (arXiv 2002.06224) masks. The mean
    of the returned vector equals the family's scalar G loss."""
    if kind == "nonsat":
        return lambda f: jax.nn.softplus(-f.astype(jnp.float32))
    if kind in ("hinge", "wgan"):
        return lambda f: -f.astype(jnp.float32)
    if kind == "lsgan":
        return lambda f: 0.5 * (f.astype(jnp.float32) - 1.0) ** 2
    raise ValueError(
        f"loss {kind!r} has no per-sample generator decomposition "
        "(relativistic losses couple samples through batch means)"
    )


def r1_penalty(d_apply, d_params, real_images: jax.Array, labels=None) -> jax.Array:
    """R1 = 0.5 * E[ ||grad_x D(x)||^2 ] on real images (fp32)."""

    def score(x):
        return jnp.sum(d_apply(d_params, x, labels))

    grads = jax.grad(score)(real_images.astype(jnp.float32))
    return 0.5 * jnp.mean(jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2, 3)))


def path_lengths(g_apply, g_params, z: jax.Array, labels, key: jax.Array
                 ) -> jax.Array:
    """Per-sample path lengths ||J_z^T y||_2 for the path-length
    regularizer (StyleGAN2, arXiv 1912.04958 §B): y is image-shaped
    N(0, I/(H*W)) noise, J the generator Jacobian at z. One jax.vjp —
    no materialized Jacobian; differentiating the result w.r.t. g_params
    is the grad-of-grad the train step pays only on pl_interval steps."""
    imgs, vjp_fn = jax.vjp(
        lambda zz: g_apply(g_params, zz, labels).astype(jnp.float32),
        z.astype(jnp.float32),
    )
    n, h, w, _ = imgs.shape
    y = jax.random.normal(key, imgs.shape, jnp.float32) / jnp.sqrt(
        jnp.asarray(h * w, jnp.float32)
    )
    (jt_y,) = vjp_fn(y)
    return jnp.sqrt(jnp.sum(jt_y.astype(jnp.float32) ** 2, axis=-1) + 1e-12)


def gradient_penalty(
    d_apply, d_params, real: jax.Array, fake: jax.Array, eps: jax.Array,
    labels=None,
) -> jax.Array:
    """WGAN-GP (arXiv 1704.00028): one-centered gradient penalty at random
    interpolates x_hat = eps*real + (1-eps)*fake,

        E[ (||grad_x D(x_hat)||_2 - 1)^2 ]          (fp32)

    `eps` is (N, 1, 1, 1) uniform in [0, 1] (drawn by the caller so the
    train step controls replica consistency). For conditional models the
    interpolates are scored under the REAL labels (the standard cGAN-GP
    convention; real/fake label streams differ, and the penalty only
    needs *a* valid conditioning per row)."""
    x_hat = (
        eps * real.astype(jnp.float32)
        + (1.0 - eps) * fake.astype(jnp.float32)
    )

    def score(x):
        return jnp.sum(d_apply(d_params, x, labels))

    grads = jax.grad(score)(x_hat)
    norms = jnp.sqrt(
        jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2, 3)) + 1e-12
    )
    return jnp.mean((norms - 1.0) ** 2)
