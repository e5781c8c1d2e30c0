"""The fully-jitted GAN train step.

The reference ran eager D-step then G-step with implicit syncs
(SURVEY.md §4.1). Here the ENTIRE D-step + G-step (+ EMA) is ONE compiled
function (BASELINE: "full non-saturating GAN forward-backward step
jit-compiled end to end"): XLA sees both forward-backward graphs at once,
fuses elementwise work into the convs, and overlaps the host batch feed
with device compute. `.detach()` becomes `stop_gradient` on the fake batch
for the D pass (SURVEY.md §8 "Hard parts" #3).

Two step flavors (TrainConfig.fused_step):

* alternating (default; reference behavior, BASELINE "alternating-step
  optimizer updates"):
    1. D update on (real, stop_gradient(G(z_d)))
    2. G update through the *updated* D on G(z_g)
    3. EMA update of G params

* fused simultaneous (FusedProp-style; PAPERS.md arXiv 2004.03335): one
  latent batch, one fake forward; D- and G-gradients both taken at the
  CURRENT params, applied simultaneously. The two loss graphs share the
  G(z) and D(fake) forwards verbatim, so XLA CSE computes them once —
  ~1.3-1.5x faster per step at slightly different training dynamics.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from locate_tpu.config import Config
from locate_tpu.models.gan import GAN
from locate_tpu.objectives.ema import ema_update
from locate_tpu.objectives.losses import (
    RELATIVISTIC,
    g_per_sample,
    get_losses,
    gradient_penalty,
    lecam_penalty,
    orthogonal_penalty,
    path_lengths,
    r1_penalty,
)
from locate_tpu.objectives.optim import (
    guard_stats,
    make_optimizers,
    safe_global_norm,
)
from locate_tpu.train.state import TrainState

Batch = Dict[str, jax.Array]
Metrics = Dict[str, jax.Array]


def make_train_step(
    cfg: Config, gan: GAN, axis_name: Optional[str] = None,
    axis_size: int = 1,
    constrain_batch: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Metrics]]:
    """Build the (unjitted) train step. If `axis_name` is set the step is
    meant to run under `shard_map` over that mesh axis (of static size
    `axis_size`) and psum-reduces gradients/metrics across it
    (SURVEY.md §3.3); under GSPMD jit (the default path) leave it None.

    `constrain_batch` (GSPMD path only) pins the sharding of tensors the
    step *samples* (latents, fake labels) to the batch sharding. Without
    it the SPMD partitioner is free to keep the in-graph `random.normal`
    and the whole generator forward replicated — which both wastes
    devices AND, on a mesh with a model axis, miscompiles the
    discriminator's conv filter gradients (measured: d-grads off by 75%
    with bit-identical forwards; see tests/test_parallel.py
    test_tensor_parallel_per_step_equality, the regression gate)."""
    g_opt, d_opt = make_optimizers(cfg.train)
    g_loss_of, d_loss_of = get_losses(cfg.train.loss)
    tcfg = cfg.train
    relativistic = tcfg.loss in RELATIVISTIC
    per_sample_of = (
        g_per_sample(tcfg.loss) if tcfg.topk_fraction < 1.0 else None
    )
    # Style-family training-time stochasticity (models/style_generator.py):
    # mixing draws (second latent + crossover) follow the latent
    # global-draw + local-slice discipline (mesh-invariant); random-noise
    # draws follow ADA's replica-folded keys (GSPMD DP == single-device;
    # shard_map documented divergence, like the aug draws).
    scfg = gan.config.style
    style_mixing = gan.config.arch == "style" and scfg.mixing_prob > 0.0
    g_rng_noise = gan.config.arch == "style" and scfg.noise == "random"
    conditional = gan.config.num_classes > 0
    # Discriminator augmentation (ADA, ops/augment.py): D only ever sees
    # aug(x); the G step backprops through the augmentation of its fakes.
    # Structurally disabled (no extra ops, no ada_p leaf) when both knobs
    # are zero. Aug keys derive from fold_in(rng, tag) so enabling
    # augmentation never changes the latent streams; under shard_map the
    # axis index is folded in so each replica augments its own rows
    # independently (mesh-invariance vs the global program is NOT
    # preserved for the augmentation draws, unlike latents).
    aug_on = tcfg.augment_p > 0.0 or tcfg.ada_target > 0.0
    bcr_on = tcfg.bcr_gamma > 0.0
    if aug_on or bcr_on:
        from locate_tpu.ops.augment import augment_pipeline
    bcr_ops = tuple(s.strip() for s in tcfg.bcr_ops.split(",") if s.strip())
    ada_ops = tuple(
        s.strip() for s in tcfg.augment_ops.split(",") if s.strip()
    )

    def aug_keys(rng, count):
        ka = jax.random.fold_in(rng, 0x41444121)
        if axis_name is not None:
            ka = jax.random.fold_in(ka, jax.lax.axis_index(axis_name))
        return jax.random.split(ka, count)

    def bcr_key(rng):
        # bCR's augmentation draws: ADA's key discipline (replica-folded
        # under shard_map) on a disjoint stream.
        return aug_keys(jax.random.fold_in(rng, 0x424352), 1)[0]

    # R1/GP are grad-of-grad; the Pallas attention's custom_vjp is first-
    # order only, so the penalties run through an XLA-path discriminator
    # twin (identical params pytree — use_pallas changes apply, not init).
    any_gp = (tcfg.r1_gamma > 0.0 or tcfg.gp_gamma > 0.0
              or tcfg.r2_gamma > 0.0)
    d_apply_r1 = gan.discriminator.apply
    if any_gp and gan.config.use_pallas:
        import dataclasses as _dc

        from locate_tpu.models.discriminator import build_discriminator

        d_apply_r1 = build_discriminator(
            _dc.replace(gan.config, use_pallas=False), gan.compute_dtype
        ).apply
    # Path-length reg differentiates THROUGH G's vjp (second order), so it
    # needs the same XLA-twin treatment on the Pallas path.
    g_apply_pl = gan.generator.apply
    if tcfg.pl_gamma > 0.0 and gan.config.use_pallas:
        import dataclasses as _dc2

        from locate_tpu.models.generator import build_generator

        g_apply_pl = build_generator(
            _dc2.replace(gan.config, use_pallas=False), gan.compute_dtype
        ).apply
    if any_gp and tcfg.r1_remat:
        # Rematerialize the penalty's D forward: differentiating the R1
        # gradient w.r.t. params (grad-of-grad) otherwise keeps every
        # jvp/transpose intermediate live in f32 — measured OOM at
        # 128^2 x batch 128 on a 16 GB chip. The recompute costs extra
        # FLOPs only on the 1-in-r1_interval steps where R1 fires.
        d_apply_r1 = jax.checkpoint(d_apply_r1)

    def pmean(tree):
        if axis_name is None:
            return tree
        return jax.lax.pmean(tree, axis_name)

    def gmean(x):
        """Global-batch mean of a per-sample vector: under shard_map the
        local mean is pmean'd (all replicas hold equal local counts), under
        GSPMD jnp.mean already sees the global batch. Differentiable —
        cross-replica gradient terms flow back through pmean's transpose
        (psum), so losses built on these means stay mesh-invariant."""
        return pmean(jnp.mean(x.astype(jnp.float32)))

    def g_adv(fake_logits, real_logits_fn=None):
        """Adversarial G term for the configured family. Relativistic
        losses (ragan/rahinge) call `real_logits_fn()` for D(real) under
        the same d_params the fake logits used. Top-k training (arXiv
        2002.06224, tcfg.topk_fraction < 1) averages the per-sample loss
        only over the GLOBAL-batch top-k fake logits — the threshold comes
        from the full batch in every backend (all_gather of N scalars
        under shard_map), so single-device == GSPMD == shard_map; ties at
        the threshold are included and the mean renormalized by the true
        mask count in all backends alike."""
        if relativistic:
            return g_loss_of(fake_logits, real_logits_fn(), gmean)
        if per_sample_of is None:
            return g_loss_of(fake_logits)
        per = per_sample_of(fake_logits)
        fl = fake_logits.astype(jnp.float32).reshape(-1)
        if axis_name is None:
            k = max(1, int(round(fl.shape[0] * tcfg.topk_fraction)))
            thresh = jax.lax.top_k(fl, k)[0][-1]
            mask = (fl >= thresh).astype(jnp.float32)
            return jnp.sum(per.reshape(-1) * mask) / jnp.sum(mask)
        glob = jax.lax.all_gather(fl, axis_name).reshape(-1)
        k = max(1, int(round(glob.shape[0] * tcfg.topk_fraction)))
        thresh = jax.lax.top_k(glob, k)[0][-1]
        mask = (fl >= thresh).astype(jnp.float32)
        denom = jax.lax.psum(jnp.sum(mask), axis_name)
        # axis_size * local_sum / global_count: the later grad/metric pmean
        # over replicas turns this into exactly the global masked mean.
        return axis_size * jnp.sum(per.reshape(-1) * mask) / denom

    # Latent/label sampling under shard_map: every replica draws the SAME
    # global batch (the key is replicated) and slices its own rows, making
    # the shard_map trajectory bit-equivalent to the GSPMD global program
    # (up to psum reduction order) — the same z stream regardless of mesh.
    # The draw is O(global_batch x latent_dim), trivially cheap next to a
    # conv forward.
    def _draw_mix_cut(key, m):
        # per-sample crossover: with prob mixing_prob a uniform layer in
        # [1, num_ws-1]; otherwise num_ws (= every layer from z1, no mix)
        ku, kl = jax.random.split(key)
        mix = jax.random.uniform(ku, (m,)) < scfg.mixing_prob
        layer = jax.random.randint(kl, (m,), 1, gan.generator.num_ws)
        return jnp.where(mix, layer, gan.generator.num_ws).astype(jnp.int32)

    if axis_name is None:
        _cb = constrain_batch or (lambda x: x)

        def sample_latents(key, n):
            return _cb(gan.sample_latents(key, n))

        def sample_labels(key, n):
            lab = gan.sample_labels(key, n)
            return None if lab is None else _cb(lab)

        def sample_gp_eps(key, n):
            return _cb(jax.random.uniform(key, (n, 1, 1, 1), jnp.float32))

        def sample_mix_cut(key, n):
            return _cb(_draw_mix_cut(key, n))
    else:

        def _local_rows(arr, n_local):
            i = jax.lax.axis_index(axis_name)
            return jax.lax.dynamic_slice_in_dim(arr, i * n_local, n_local, 0)

        def sample_latents(key, n):
            return _local_rows(gan.sample_latents(key, n * axis_size), n)

        def sample_labels(key, n):
            lab = gan.sample_labels(key, n * axis_size)
            return None if lab is None else _local_rows(lab, n)

        def sample_gp_eps(key, n):
            # same global-draw + local-slice discipline as latents, so the
            # shard_map trajectory matches the GSPMD global program
            eps = jax.random.uniform(
                key, (n * axis_size, 1, 1, 1), jnp.float32
            )
            return _local_rows(eps, n)

        def sample_mix_cut(key, n):
            return _local_rows(_draw_mix_cut(key, n * axis_size), n)

    def g_apply_train(g_params, z, labels, key):
        """TRAINING-time generator forward: style mixing and/or random
        noise injection for the style family when configured; the plain
        apply otherwise (and always for the locate family). `key` is the
        forward's latent key — mixing/noise streams fold off it, so
        share_latents / the fused flavor's shared-forward CSE still hold
        (same key -> identical HLO)."""
        if not (style_mixing or g_rng_noise):
            return gan.generator.apply(g_params, z, labels)
        kw = {}
        if g_rng_noise:
            kn = jax.random.fold_in(key, 0x4E5A31)
            if axis_name is not None:
                kn = jax.random.fold_in(kn, jax.lax.axis_index(axis_name))
            kw["noise_rng"] = kn
        if style_mixing:
            n = z.shape[0]
            z2 = sample_latents(jax.random.fold_in(key, 0x4D5832), n)
            cut = sample_mix_cut(jax.random.fold_in(key, 0x4D5833), n)
            return gan.generator.apply_mixed(g_params, z, z2, cut, labels,
                                             **kw)
        return gan.generator.apply(g_params, z, labels, **kw)

    lecam_on = tcfg.lecam_gamma > 0.0

    def d_loss_with_aux(d_params, real, labels, fake, fake_labels, step,
                        k_gp=None, k_bcr=None, lecam=None):
        real_logits = gan.discriminator.apply(d_params, real, labels)
        fake_logits = gan.discriminator.apply(d_params, fake, fake_labels)
        if relativistic:
            loss = d_loss_of(real_logits, fake_logits, gmean)
        else:
            loss = d_loss_of(real_logits, fake_logits)
        aux = {
            "real_logits": jnp.mean(real_logits),
            "fake_logits": jnp.mean(fake_logits),
        }
        if tcfg.ada_target > 0.0:
            # ADA overfitting heuristic r_t = E[sign(D(real))] (the
            # portion of (augmented) reals D classifies as real)
            aux["ada_r"] = jnp.mean(jnp.sign(real_logits))
        if bcr_on:
            # Balanced consistency regularization (arXiv 2002.04724 §3):
            # D must score x and T(x) alike, for reals AND fakes. The
            # un-augmented logits are the main loss's tensors (free); the
            # two extra D forwards are the feature's cost. D-only — the
            # G step never differentiates through this term (its `fake`
            # is already stop_gradient'd on this path).
            kr, kf = jax.random.split(k_bcr)
            rl_t = gan.discriminator.apply(
                d_params, augment_pipeline(kr, real, tcfg.bcr_p, bcr_ops),
                labels,
            )
            fl_t = gan.discriminator.apply(
                d_params, augment_pipeline(kf, fake, tcfg.bcr_p, bcr_ops),
                fake_labels,
            )
            bcr = jnp.mean(
                (real_logits.astype(jnp.float32) - rl_t.astype(jnp.float32))
                ** 2
            ) + jnp.mean(
                (fake_logits.astype(jnp.float32) - fl_t.astype(jnp.float32))
                ** 2
            )
            aux["bcr"] = bcr
            loss = loss + tcfg.bcr_gamma * bcr
        if lecam_on:
            # LeCam reg (arXiv 2104.03310): penalize real logits above the
            # fake-mean EMA tracker and fake logits below the real-mean
            # one. Trackers come from TrainState (no grad path; updated in
            # `finish` from the pmean'd logit means, so they stay replica-
            # identical and the penalty is mesh-invariant).
            lc = lecam_penalty(real_logits, fake_logits, lecam[0], lecam[1])
            aux["lecam"] = lc
            loss = loss + tcfg.lecam_gamma * lc
        if tcfg.logit_penalty > 0.0:
            # drift penalty (ProGAN §A.1): bounds |D(real)| so the game
            # can't saturate into softplus's flat region
            drift = tcfg.logit_penalty * jnp.mean(
                jnp.square(real_logits.astype(jnp.float32))
            )
            aux["drift"] = drift
            loss = loss + drift
        if tcfg.r1_gamma > 0.0:
            # Lazy R1: every r1_interval steps, scaled to keep the expected
            # strength (StyleGAN-style lazy regularization).
            def with_r1(_):
                # Optional batch-subset estimator (r1_batch_fraction):
                # rows are i.i.d. (the pipeline shuffles), so the leading
                # slice is an unbiased sample of E[||grad_x D||^2] at a
                # fraction of the grad-of-grad cost.
                nr = real.shape[0]
                k = max(1, int(round(nr * tcfg.r1_batch_fraction)))
                r_sub = real[:k] if k < nr else real
                l_sub = (labels[:k] if (labels is not None and k < nr)
                         else labels)
                pen = r1_penalty(d_apply_r1, d_params, r_sub, l_sub)
                return pen * (tcfg.r1_gamma * tcfg.r1_interval)

            if tcfg.r1_interval == 1:
                # fires every step: the cond is pure overhead, skip it
                pen = with_r1(None)
            else:
                pen = jax.lax.cond(
                    step % tcfg.r1_interval == 0,
                    with_r1,
                    lambda _: jnp.zeros((), jnp.float32),
                    operand=None,
                )
            aux["r1"] = pen
            loss = loss + pen
        if tcfg.r2_gamma > 0.0:
            # R2 (R3GAN, arXiv 2501.05441 §2.2): R1's zero-centered
            # penalty at the FAKE samples, on the same lazy schedule (the
            # paper fires the pair together) and through the same
            # XLA-twin/remat d_apply_r1. `fake` is D's actual input
            # (augmented under ADA, matching the R1-on-augmented-real
            # convention above) and already stop_gradient'd by the caller,
            # so the penalty shapes D only — G never feels it.
            def with_r2(_):
                nf = fake.shape[0]
                k2 = max(1, int(round(nf * tcfg.r1_batch_fraction)))
                f_sub = fake[:k2] if k2 < nf else fake
                fl_sub = (fake_labels[:k2]
                          if (fake_labels is not None and k2 < nf)
                          else fake_labels)
                pen2 = r1_penalty(d_apply_r1, d_params, f_sub, fl_sub)
                return pen2 * (tcfg.r2_gamma * tcfg.r1_interval)

            if tcfg.r1_interval == 1:
                pen2 = with_r2(None)
            else:
                pen2 = jax.lax.cond(
                    step % tcfg.r1_interval == 0,
                    with_r2,
                    lambda _: jnp.zeros((), jnp.float32),
                    operand=None,
                )
            aux["r2"] = pen2
            loss = loss + pen2
        if tcfg.gp_gamma > 0.0:
            # WGAN-GP at random interpolates, every step (classic recipe;
            # arXiv 1704.00028). Shares R1's XLA-twin/remat machinery
            # (grad-of-grad); interpolates score under the real labels.
            eps = sample_gp_eps(k_gp, real.shape[0])
            gp = gradient_penalty(d_apply_r1, d_params, real, fake, eps,
                                  labels)
            aux["gp"] = gp
            loss = loss + tcfg.gp_gamma * gp
        return loss, aux

    def g_reg(g_params, z, fake_labels, step, rng, pl_mean):
        """Parameter/Jacobian regularizers for the G loss: BigGAN
        orthogonal regularization (ortho_gamma, every step) and lazy
        path-length regularization (StyleGAN2
        §B). Returns (term, aux). The penalty mean((len - b)^2) is
        decomposed as m2 - 2*b*m1 + b^2 so the cross-replica pmean of the
        mean length happens OUTSIDE the lax.cond (collectives inside cond
        branches break shard_map's replication checks). The baseline b is
        the UPDATED running mean (stop_gradient, as in the reference
        implementations); replica-identical because it is built from the
        pmean'd mean length."""
        ortho = jnp.zeros((), jnp.float32)
        o_aux = {}
        if tcfg.ortho_gamma > 0.0:
            # Orthogonal regularization (BigGAN §3; objectives/losses.py).
            # Params are replicated, so the term and its grads are
            # replica-identical — mesh-invariant with no collective.
            tot = orthogonal_penalty(g_params)
            ortho = tcfg.ortho_gamma * tot
            o_aux = {"ortho": tot}
        if tcfg.pl_gamma <= 0.0:
            return ortho, o_aux
        k_pl = jax.random.fold_in(rng, 0x504C3132)

        def fire(_):
            lengths = path_lengths(g_apply_pl, g_params, z, fake_labels, k_pl)
            return (jnp.mean(lengths), jnp.mean(lengths**2),
                    jnp.ones((), jnp.float32))

        def skip(_):
            return (jnp.zeros((), jnp.float32),) * 3

        if tcfg.pl_interval == 1:
            m1, m2, fired = fire(None)
        else:
            m1, m2, fired = jax.lax.cond(
                step % tcfg.pl_interval == 0, fire, skip, operand=None
            )
        m1g = pmean(m1)
        base = jnp.where(
            fired > 0,
            jax.lax.stop_gradient(
                pl_mean + tcfg.pl_decay * (m1g - pl_mean)
            ),
            pl_mean,
        )
        pen = m2 - 2.0 * base * m1 + base * base * fired
        term = pen * (tcfg.pl_gamma * tcfg.pl_interval)
        return term + ortho, {"pl": term, "pl_len": m1g, "pl_mean": base,
                               **o_aux}

    def fm_term(d_params_used, fake, fake_labels, real, labels):
        """Feature-matching loss for G (arXiv 1606.03498 §3.1):
        ||E[feats(real)] - E[feats(fake)]||^2 over D's pooled pre-head
        features. The fake-side forward is HLO-identical to the main G
        loss's D(fake) so XLA CSE computes it once; the real side costs
        one extra D forward on FM-enabled runs only. Means are pmean'd
        (global-batch statistics); the term is scaled by axis_size under
        shard_map because the loss is NONLINEAR in the pmean'd means —
        per-replica grads each see only a 1/axis_size slice of dM/dtheta
        and the later grad-pmean divides by axis_size again (the per-
        sample-decomposable main loss doesn't have this problem)."""
        if tcfg.feature_matching <= 0.0:
            return jnp.zeros((), jnp.float32), {}
        _, f_fake = gan.discriminator.apply(
            d_params_used, fake, fake_labels, return_features=True
        )
        _, f_real = gan.discriminator.apply(
            d_params_used, real, labels, return_features=True
        )
        m_fake = pmean(jnp.mean(f_fake.astype(jnp.float32), axis=0))
        m_real = jax.lax.stop_gradient(
            pmean(jnp.mean(f_real.astype(jnp.float32), axis=0))
        )
        fm = jnp.mean((m_real - m_fake) ** 2)
        return fm * (tcfg.feature_matching * axis_size), {"fm": fm}

    def d_update(state, d_grads):
        d_grads = pmean(d_grads)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state, state.d_params)
        return optax.apply_updates(state.d_params, d_updates), d_opt_state, d_grads

    def _guard_metrics(metrics, d_opt_state, g_opt_state):
        """Update-guard counters (optim.guard_stats: non-finite streak +
        grad-norm-limit count/streak) as d_/g_-prefixed metrics. The
        guard's own norm reading is dropped — d/g_grad_norm already
        report the same overflow-proof norm."""
        for prefix, s in (("d_", d_opt_state), ("g_", g_opt_state)):
            for k, v in guard_stats(s, tcfg).items():
                if k != "grad_norm_guard":
                    metrics[prefix + k] = v

    def finish(state, new_rng, k_ema, d_loss, d_aux, d_grads, d_params,
               d_opt_state, g_loss, g_grads, n_local, g_aux=None,
               d_grad_norm=None):
        """Shared tail of all step flavors: G update, EMA, ADA controller,
        metrics, state. `d_grad_norm` overrides the norm-of-d_grads metric
        (the multi-critic path reports the mean per-update norm instead of
        materializing all d_steps gradient trees)."""
        g_grads = pmean(g_grads)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        ema_params = state.ema_params
        if ema_params is not None:
            sr_key = k_ema if tcfg.ema_dtype == "bfloat16" else None
            decay = tcfg.ema_decay
            if tcfg.ema_rampup > 0.0:
                # StyleGAN2-ADA ema_rampup in per-step-decay terms: the
                # half-life ramps as min(target, step * rampup), so the
                # shadow starts AT the live params (decay ~0) and glides
                # to ema_decay. A pure function of state.step — resume
                # continuity and scan (steps_per_call) need no plumbing.
                hl_target = math.log(0.5) / math.log(tcfg.ema_decay)
                hl = jnp.minimum(
                    hl_target,
                    (state.step.astype(jnp.float32) + 1.0) * tcfg.ema_rampup,
                )
                decay = jnp.exp2(-1.0 / hl)
            new_ema = ema_update(ema_params, g_params, decay, sr_key)
            if tcfg.grad_accum > 1:
                # EMA moves only on optimizer emits (MultiSteps leaves
                # params unchanged on accumulation micro-steps; updating
                # EMA anyway would shrink its horizon by grad_accum x).
                emitted = g_opt_state.mini_step == 0
                ema_params = jax.tree.map(
                    lambda e, v: jnp.where(emitted, v, e), ema_params, new_ema
                )
            else:
                ema_params = new_ema
        ada_p = state.ada_p
        if tcfg.ada_target > 0.0:
            # replicate-safe: r is pmean'd before the p update so the
            # (replicated) ada_p stays bitwise identical across replicas
            r = pmean(d_aux["ada_r"])
            step_images = n_local * axis_size
            ada_p = jnp.clip(
                ada_p
                + jnp.sign(r - tcfg.ada_target)
                * (step_images / (tcfg.ada_speed_kimg * 1000.0)),
                0.0,
                1.0,
            )
        pl_mean = state.pl_mean
        if g_aux and "pl_mean" in g_aux:
            pl_mean = g_aux["pl_mean"]  # replica-identical (see g_reg)
        lecam = state.lecam
        if lecam_on:
            # EMA trackers of the batch-mean logits (official-code form,
            # decay applied every optimizer step). pmean'd BEFORE the
            # update so the replicated trackers stay bitwise identical
            # across replicas; under the multi-critic flavor d_aux is the
            # mean over all d_steps critic batches (one tracker update
            # per optimizer step — documented coarsening).
            m = pmean(jnp.stack([d_aux["real_logits"],
                                 d_aux["fake_logits"]]).astype(jnp.float32))
            # Gate on finiteness, mirroring apply_if_finite's protection
            # of the params: one NaN/Inf logit batch must not permanently
            # poison the trackers (and through them every later D loss).
            new_lecam = (tcfg.lecam_decay * lecam
                         + (1.0 - tcfg.lecam_decay) * m)
            lecam = jnp.where(jnp.isfinite(m).all(), new_lecam, lecam)
        metrics = {
            **(g_aux or {}),
            "d_loss": d_loss,
            "g_loss": g_loss,
            # Overflow-proof norms (safe_global_norm): the r4 run's
            # optax.global_norm metrics overflowed to inf on exploded-
            # but-finite grads, making "metric overflowed" look like
            # "update skipped" in metrics.jsonl.
            "d_grad_norm": (safe_global_norm(d_grads)
                            if d_grad_norm is None else d_grad_norm),
            "g_grad_norm": safe_global_norm(g_grads),
            **d_aux,
        }
        if aug_on:
            metrics["augment_p"] = ada_p
        _guard_metrics(metrics, d_opt_state, g_opt_state)
        metrics = pmean(metrics)
        new_state = TrainState(
            step=state.step + 1,
            rng=new_rng,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            ema_params=ema_params,
            ada_p=ada_p,
            pl_mean=pl_mean,
            lecam=lecam,
        )
        return new_state, metrics

    def prepare(state, batch):
        real = batch["image"]
        if real.dtype == jnp.uint8:
            # Batches cross host->device as uint8 (4x less transfer);
            # normalize to [-1, 1] on-device where it fuses for free.
            real = real.astype(jnp.float32) / 127.5 - 1.0
        real = real.astype(gan.compute_dtype)
        labels = batch.get("label") if conditional else None
        # rng is replicated; latents stay mesh-invariant because sampling
        # draws the global batch and slices local rows (see above).
        new_rng = jax.random.split(state.rng, 1)[0]
        return real, labels, state.rng, new_rng

    # ---- alternating step (reference semantics) ------------------------

    def alternating_step(state: TrainState, batch: Batch):
        real, labels, rng, new_rng = prepare(state, batch)
        n = real.shape[0]
        k_ema, k_zd, k_zg, k_ld, k_lg = jax.random.split(rng, 5)
        if tcfg.share_latents:
            # z_g == z_d: the G-step forward becomes identical HLO to the
            # D-step fake forward and XLA CSE computes it once.
            k_zg, k_lg = k_zd, k_ld

        z_d = sample_latents(k_zd, n)
        fake_labels_d = sample_labels(k_ld, n)
        fake_d = jax.lax.stop_gradient(
            g_apply_train(state.g_params, z_d, fake_labels_d, k_zd)
        )
        if aug_on:
            ka_r, ka_f, ka_g = aug_keys(rng, 3)
            real_in = augment_pipeline(ka_r, real, state.ada_p, ada_ops)
            fake_d_in = augment_pipeline(ka_f, fake_d, state.ada_p, ada_ops)
        else:
            real_in, fake_d_in = real, fake_d

        k_gp = jax.random.fold_in(rng, 0x47504750)

        def d_loss_fn(d_params):
            # R1/GP (inside d_loss_with_aux) also run on the augmented
            # real — D's actual input — matching the ADA paper.
            return d_loss_with_aux(
                d_params, real_in, labels, fake_d_in, fake_labels_d,
                state.step, k_gp, bcr_key(rng), state.lecam
            )

        (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        d_params, d_opt_state, d_grads = d_update(state, d_grads)

        z_g = sample_latents(k_zg, n)
        fake_labels_g = sample_labels(k_lg, n)

        def g_loss_fn(g_params):
            # through the *updated* D: alternating semantics
            fake = g_apply_train(g_params, z_g, fake_labels_g, k_zg)
            if aug_on:  # gradient flows through the augmentation
                fake = augment_pipeline(ka_g, fake, state.ada_p, ada_ops)
            loss = g_adv(
                gan.discriminator.apply(d_params, fake, fake_labels_g),
                # relativistic only: D(real) under the UPDATED d_params —
                # a genuine extra forward on this flavor (the D step's
                # real forward used the pre-update params).
                lambda: gan.discriminator.apply(d_params, real_in, labels),
            )
            reg, g_aux = g_reg(g_params, z_g, fake_labels_g, state.step,
                               rng, state.pl_mean)
            fm, fm_aux = fm_term(d_params, fake, fake_labels_g, real_in,
                                 labels)
            return loss + reg + fm, {**g_aux, **fm_aux}

        (g_loss, g_aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        return finish(state, new_rng, k_ema, d_loss, d_aux, d_grads, d_params,
                      d_opt_state, g_loss, g_grads, n, g_aux)

    # ---- alternating step with a critic ratio (WGAN n_critic) -----------

    def multi_critic_step(state: TrainState, batch: Batch):
        """tcfg.d_steps > 1: batch leaves carry a leading [d_steps] axis —
        one FRESH real batch (and fresh latents) per critic update, the
        classic n_critic data accounting (arXiv 1701.07875 Algorithm 1) —
        scanned on-device; then one G update through the updated D. A
        separate code path so d_steps=1 keeps its exact RNG stream
        (trajectory compatibility with every pinned test)."""
        real, labels, rng, new_rng = prepare(state, batch)  # (c, n, ...)
        c = tcfg.d_steps
        n = real.shape[1]
        k_ema, k_zg, k_lg = jax.random.split(rng, 3)

        def critic(carry, xs):
            d_params, d_opt_state = carry
            real_i, i = xs["real"], xs["i"]
            labels_i = xs.get("label")
            ri = jax.random.fold_in(rng, i)  # per-critic-step key family
            kz = jax.random.fold_in(ri, 1)
            z = sample_latents(kz, n)
            flab = sample_labels(jax.random.fold_in(ri, 2), n)
            fake = jax.lax.stop_gradient(
                g_apply_train(state.g_params, z, flab, kz)
            )
            if aug_on:
                ka_r, ka_f, _ = aug_keys(ri, 3)
                real_in = augment_pipeline(ka_r, real_i, state.ada_p, ada_ops)
                fake_in = augment_pipeline(ka_f, fake, state.ada_p, ada_ops)
            else:
                real_in, fake_in = real_i, fake
            k_gp = jax.random.fold_in(ri, 0x47504750)

            def d_loss_fn(p):
                return d_loss_with_aux(p, real_in, labels_i, fake_in, flab,
                                       state.step, k_gp, bcr_key(ri),
                                       state.lecam)

            (d_loss, d_aux), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(d_params)
            d_grads = pmean(d_grads)
            upd, d_opt_state = d_opt.update(d_grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, upd)
            return ((d_params, d_opt_state),
                    (d_loss, d_aux, safe_global_norm(d_grads)))

        xs = {"real": real, "i": jnp.arange(c)}
        if labels is not None:
            xs["label"] = labels
        (d_params, d_opt_state), (d_losses, d_auxs, d_norms) = jax.lax.scan(
            critic, (state.d_params, state.d_opt_state), xs
        )
        # per-critic-step scalars -> means (the logged value describes the
        # whole optimizer step; ada_r's mean is the controller estimate
        # over ALL real images D saw this step)
        d_loss = jnp.mean(d_losses)
        d_aux = jax.tree.map(jnp.mean, d_auxs)

        z_g = sample_latents(k_zg, n)
        fake_labels_g = sample_labels(k_lg, n)
        if aug_on:
            ka_g = aug_keys(rng, 3)[2]  # distinct from every critic family
        # FM's / the relativistic G loss's real side: the LAST critic
        # batch, under the augmentation D actually saw (recomputed outside
        # the scan — elementwise-cheap)
        real_fm, labels_fm = real[-1], (labels[-1] if labels is not None
                                        else None)
        if aug_on and (tcfg.feature_matching > 0.0 or relativistic):
            ka_r_last = aug_keys(jax.random.fold_in(rng, c - 1), 3)[0]
            real_fm = augment_pipeline(ka_r_last, real_fm, state.ada_p, ada_ops)

        def g_loss_fn(g_params):
            fake = g_apply_train(g_params, z_g, fake_labels_g, k_zg)
            if aug_on:
                fake = augment_pipeline(ka_g, fake, state.ada_p, ada_ops)
            loss = g_adv(
                gan.discriminator.apply(d_params, fake, fake_labels_g),
                lambda: gan.discriminator.apply(d_params, real_fm, labels_fm),
            )
            reg, g_aux = g_reg(g_params, z_g, fake_labels_g, state.step,
                               rng, state.pl_mean)
            fm, fm_aux = fm_term(d_params, fake, fake_labels_g, real_fm,
                                 labels_fm)
            return loss + reg + fm, {**g_aux, **fm_aux}

        (g_loss, g_aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        return finish(state, new_rng, k_ema, d_loss, d_aux, None, d_params,
                      d_opt_state, g_loss, g_grads, n * c, g_aux,
                      d_grad_norm=jnp.mean(d_norms))

    # ---- fused simultaneous step (FusedProp-style) ----------------------

    def fused_step(state: TrainState, batch: Batch):
        real, labels, rng, new_rng = prepare(state, batch)
        n = real.shape[0]
        k_ema, k_z, k_l = jax.random.split(rng, 3)
        z = sample_latents(k_z, n)
        fake_labels = sample_labels(k_l, n)
        if aug_on:
            ka_r, ka_f = aug_keys(rng, 2)
            real_in = augment_pipeline(ka_r, real, state.ada_p, ada_ops)
        else:
            real_in = real

        def maybe_aug_fake(fake):
            # shared draw between the D and G losses: the augmented fake
            # forward stays identical HLO in both, preserving the CSE that
            # makes the fused step fast
            return augment_pipeline(ka_f, fake, state.ada_p, ada_ops) if aug_on else fake

        k_gp = jax.random.fold_in(rng, 0x47504750)

        def d_loss_fn(d_params):
            fake = jax.lax.stop_gradient(
                maybe_aug_fake(
                    g_apply_train(state.g_params, z, fake_labels, k_z)
                )
            )
            return d_loss_with_aux(d_params, real_in, labels, fake,
                                   fake_labels, state.step, k_gp,
                                   bcr_key(rng), state.lecam)

        def g_loss_fn(g_params):
            fake = maybe_aug_fake(
                g_apply_train(g_params, z, fake_labels, k_z)
            )
            # current (pre-update) D: simultaneous gradients; the forward
            # here is identical HLO to the one in d_loss_fn -> XLA CSE
            # computes G(z) and D(fake) once for both losses (and, for
            # relativistic losses, D(real) too — CSE-free on this flavor).
            loss = g_adv(
                gan.discriminator.apply(state.d_params, fake, fake_labels),
                lambda: gan.discriminator.apply(state.d_params, real_in,
                                                labels),
            )
            reg, g_aux = g_reg(g_params, z, fake_labels, state.step,
                               rng, state.pl_mean)
            fm, fm_aux = fm_term(state.d_params, fake, fake_labels,
                                 real_in, labels)
            return loss + reg + fm, {**g_aux, **fm_aux}

        (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        (g_loss, g_aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        d_params, d_opt_state, d_grads = d_update(state, d_grads)
        return finish(state, new_rng, k_ema, d_loss, d_aux, d_grads, d_params,
                      d_opt_state, g_loss, g_grads, n, g_aux)

    if tcfg.fused_step:
        return fused_step
    return multi_critic_step if tcfg.d_steps > 1 else alternating_step


# Metric keys whose per-window reduction is "last step", not "mean":
# running state (the non-finite skip streak, the ADA controller's p) —
# the value AT the end of the window is the current state the abort
# check / logs need, and for augment_p it must equal state.ada_p.
_LAST_METRICS = ("d_nonfinite_streak", "g_nonfinite_streak",
                 "d_grad_limit_count", "g_grad_limit_count",
                 "d_grad_limit_streak", "g_grad_limit_streak",
                 "augment_p", "pl_mean")


def make_multi_step(
    step_fn: Callable[[TrainState, Batch], Tuple[TrainState, Metrics]],
    steps_per_call: int,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Metrics]]:
    """Scan `step_fn` over `steps_per_call` stacked batches in ONE compiled
    call (TrainConfig.steps_per_call): batch leaves carry a leading [k]
    axis; per-step metrics are reduced on-device (mean, except streak
    counters which report the last step). The returned state has advanced
    k optimizer steps — trajectory-identical to k sequential calls (the
    scan body IS the single step), pinned by
    tests/test_step_variants.py::test_multi_step_matches_sequential."""
    if steps_per_call <= 1:
        return step_fn

    def multi(state: TrainState, batches: Batch):
        new_state, ms = jax.lax.scan(step_fn, state, batches,
                                     length=steps_per_call)
        metrics = {
            k: (v[-1] if k in _LAST_METRICS else jnp.mean(v))
            for k, v in ms.items()
        }
        return new_state, metrics

    return multi
