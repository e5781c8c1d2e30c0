"""Configuration system for locate-tpu.

The reference (ClashLuke/LocAtE) kept hyperparameters as module-level
constants edited in place (SURVEY.md §3 "Config", provenance RECALL-med; the
reference mount at /root/reference was empty at build time, see SURVEY.md §0).
We instead use frozen dataclasses with named presets for the five BASELINE
configs (/root/repo/BASELINE.json:6-12) and simple ``key=value`` CLI
overrides, so that a later diff against the real reference is a config
change, not a rewrite (SURVEY.md §8 "Hard parts" #5).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple


def _replace(obj, **kw):
    return dataclasses.replace(obj, **kw)


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    """Location-based (positional) attention block hyperparameters.

    The mechanism (SURVEY.md §1): attention weights are derived from spatial
    position and per-location features rather than O(N^2) token-token
    similarity — a linear-cost spatial gating that modulates conv feature
    maps. All parameterization choices are reconstructions and therefore
    config-driven.
    """

    # Attention family: "locate" (the reference's linear-cost location-based
    # gate — ops/attention.py) or "self" (full O(N^2) spatial self-attention,
    # SAGAN arXiv 1805.08318 — ops/self_attention.py; flash Pallas kernel
    # under use_pallas). The sa_* / heads fields apply to "self" only;
    # mode/per_channel/pos_features/bottleneck/residual to "locate" only.
    kind: str = "locate"
    # Gate normalization: "softmax" normalizes the gate over all H*W
    # locations (scaled by H*W so the identity gate is all-ones);
    # "sigmoid" is an unnormalized per-location gate.
    mode: str = "softmax"
    # Per-channel gate (N,H,W,C) vs a single spatial map (N,H,W,1).
    per_channel: bool = True
    # Number of sinusoidal coordinate-embedding channels appended to the
    # features before computing the gate (must be even; 0 disables).
    pos_features: int = 8
    # Channel reduction factor for the two-layer gate MLP (1x1 convs).
    bottleneck: int = 4
    # If true the block computes x * (1 + gate_centered) residually so an
    # all-zero gate MLP is the identity at init.
    residual: bool = True
    # Upper bound on the gate value (0 = unbounded, the DEFAULT). The
    # mean-1 softmax gate ranges [0, H*W]; unbounded, a saturated softmax
    # concentrates the whole feature map into a few locations (the r4
    # quality run's collapse: near-constant features whose GroupNorm
    # backward amplifies by rsqrt(eps)~316 PER LAYER, compounding to
    # >=1e19 grad norms — docs/QUALITY_r5.md post-mortem). The clamp
    # keeps identity-at-init (gate=1) and bounds both forward
    # concentration and backward amplification at gate_max per attention
    # layer. Applied in the XLA gate and both Pallas kernel paths
    # (oracle-matched incl. the clamp's subgradient; tests/test_gate_max).
    # Default OFF for checkpoint compatibility: a checkpoint whose
    # learned gates exceed the bound samples/evals differently under a
    # clamp, so turning it on is a per-preset/per-run decision (every
    # shipped preset opts in at 16.0 for new runs — docs/GUIDE.md
    # "Checkpoint compatibility").
    gate_max: float = 0.0
    # --- kind="self" only (SAGAN self-attention) ---
    # Attention heads (q/k/v dims split per head, transformer-style).
    heads: int = 1
    # Channel reduction for q/k (SAGAN: C/8) and v (SAGAN v2: C/2).
    sa_qk_bottleneck: int = 8
    sa_v_bottleneck: int = 2
    # 1/sqrt(d_head) score scaling (modern default); False restores the
    # SAGAN paper's unscaled dot products.
    sa_scale: bool = True

    def __post_init__(self):
        if self.kind not in ("locate", "self"):
            raise ValueError(
                f"attention.kind must be 'locate' or 'self', got {self.kind!r}"
            )
        if self.heads < 1:
            raise ValueError(f"attention.heads must be >= 1, got {self.heads}")
        if self.sa_qk_bottleneck < 1 or self.sa_v_bottleneck < 1:
            raise ValueError("attention sa_*_bottleneck must be >= 1")


@dataclasses.dataclass(frozen=True)
class StyleConfig:
    """Style-based generator family (`model.arch="style"`; StyleGAN2
    arXiv 1912.04958 §2): mapping network z -> w plus weight-(de)modulated
    synthesis convolutions. Beyond-reference capability — the reference's
    family is the plain stack (`arch="locate"`)."""

    # Intermediate latent (w) dimensionality; 0 -> model.latent_dim.
    w_dim: int = 0
    # Mapping-network depth (dense + leaky_relu layers).
    mapping_layers: int = 4
    # Equalized-LR multiplier for the mapping network (StyleGAN2 trains the
    # mapping 100x slower than synthesis; 0.01 is the paper value).
    mapping_lr_mul: float = 0.01
    # Demodulate styled conv weights (the paper's replacement for AdaIN's
    # instance norm). Disable for a pure modulation ablation.
    demodulate: bool = True
    # Style mixing regularization (StyleGAN arXiv 1812.04948 §3.1): with
    # this probability per sample, TRAINING forwards use two independent
    # latents — synthesis layers below a uniformly-drawn crossover take
    # w(z1), the rest w(z2) — so adjacent styles stay independently
    # usable. Train-step-only (sampling/eval/export keep the single-w
    # apply); the second latent and crossover follow the latent
    # global-draw discipline, so DP == single-device holds with mixing
    # on. 0 disables; the papers use 0.9.
    mixing_prob: float = 0.0
    # Per-layer noise injection after each synthesis conv (StyleGAN
    # §3.2, StyleGAN2 §B): "none" (default — apply stays a pure function
    # of (params, z, labels)), "const" (one fixed per-layer noise plane —
    # deterministic texture carrier), "random" (fresh noise each TRAINING
    # forward; plain apply — sampling/eval — falls back to the const
    # plane, StyleGAN's noise_mode="const" convention). Non-"none" adds a
    # learned per-conv `noise_strength` scalar, init 0, so the enabled
    # model starts exactly at the disabled one. Random draws are
    # replica-local under shard_map (like ADA's); GSPMD keeps DP ==
    # single-device.
    noise: str = "none"

    def __post_init__(self):
        if self.mapping_layers < 1:
            raise ValueError("style.mapping_layers must be >= 1")
        if self.mapping_lr_mul <= 0.0:
            raise ValueError("style.mapping_lr_mul must be > 0")
        if not 0.0 <= self.mixing_prob <= 1.0:
            raise ValueError(
                f"style.mixing_prob must be in [0, 1], got {self.mixing_prob}"
            )
        if self.noise not in ("none", "const", "random"):
            raise ValueError(
                f"style.noise must be none/const/random, got {self.noise!r}"
            )


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Generator/discriminator architecture (SURVEY.md §2 L2-L3)."""

    # Generator family: "locate" (the reference's conv+attention stack,
    # SURVEY.md §4.2) or "style" (mapping network + modulated convs,
    # models/style_generator.py). The discriminator is shared.
    arch: str = "locate"
    style: "StyleConfig" = dataclasses.field(default_factory=lambda: StyleConfig())
    resolution: int = 32
    img_channels: int = 3
    latent_dim: int = 128
    # Channels at the lowest (4x4) resolution; halves per upsampling stage
    # by `channel_factor`, clipped to [min_channels, max_channels].
    base_channels: int = 256
    max_channels: int = 512
    min_channels: int = 64
    channel_factor: float = 2.0
    # Conv blocks per resolution stage (BASELINE config 3: "deeper
    # attention-conv stacks" raises this).
    blocks_per_stage: int = 1
    kernel_size: int = 3
    # Factorized (1xk then kx1) convolutions, the reference's conv style
    # (SURVEY.md §3 "Conv block factory", RECALL-med).
    factorized: bool = True
    norm: str = "group"  # {"group", "pixel", "none"}
    group_norm_groups: int = 8
    act: str = "leaky_relu"  # {"leaky_relu", "relu", "silu", "gelu"}
    leaky_slope: float = 0.2
    attention: AttentionConfig = dataclasses.field(default_factory=AttentionConfig)
    # Which resolution stages get a LocAtE attention block: "all" (BASELINE
    # config 2: "at every stage") or a tuple of stage resolutions.
    attention_stages: Any = "all"
    # Class-conditional GAN (BASELINE config 4). 0 disables conditioning.
    num_classes: int = 0
    class_embed_dim: int = 128
    # Run residual-form attention as the fused Pallas kernel (set from the
    # top-level Config.use_pallas by build_gan).
    use_pallas: bool = False
    # Rematerialize each resolution stage in the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for O(stages) less
    # activation HBM — needed at 512^2 (SURVEY.md §8 M7).
    remat: bool = False
    # Spectral normalization of the DISCRIMINATOR's weights (SN-GAN,
    # arXiv 1802.05957): every weight matrix divided by its largest
    # singular value at apply time. Stateless fresh-start power iteration
    # (ops/spectral.py) — no pytree/optimizer/checkpoint change.
    spectral_norm: bool = False
    sn_iters: int = 9
    # Generator RGB-head topology: "last" (one to-RGB conv after the top
    # stage — the reference's shape, SURVEY.md §4.2) or "skip" (StyleGAN2
    # arXiv 1912.04958 §4.1 "input/output skips" / MSG-GAN: EVERY stage
    # emits a linear RGB contribution through its own [norm+act+1x1]
    # head, summed with the 2x-upsampled running image; one tanh at the
    # end). Skip heads give every resolution a direct gradient path from
    # the image — the paper's replacement for progressive growing. Both
    # families: the locate family uses linear [norm+act+1x1] heads, the
    # style family per-stage STYLED to-RGB convs (1x1 modulated, no
    # demod — StyleGAN2's actual default "skip" config; each stage's
    # to-RGB gets its own w index, so mixing/truncation cover it).
    g_rgb: str = "last"
    # Minibatch standard deviation (ProGAN arXiv 1710.10196 §3): append the
    # per-group batch-diversity statistic to the discriminator's pooled
    # features ahead of the logit head (ops/norm.py:minibatch_stddev).
    # Groups of this many consecutive batch examples; MUST divide the
    # per-replica batch (groups never straddle replicas, keeping
    # shard_map == GSPMD == single-device). 0 disables (default).
    mbstd_group: int = 0

    def __post_init__(self):
        r = self.resolution
        if r < 8 or (r & (r - 1)) != 0:
            raise ValueError(
                f"resolution must be a power of two >= 8, got {r}"
            )
        if self.arch not in ("locate", "style"):
            raise ValueError(
                f"model.arch must be 'locate' or 'style', got {self.arch!r}"
            )
        if self.g_rgb not in ("last", "skip"):
            raise ValueError(
                f"model.g_rgb must be 'last' or 'skip', got {self.g_rgb!r}"
            )

    @property
    def num_stages(self) -> int:
        """Stages from the 4x4 seed up to `resolution` (inclusive count)."""
        return int(math.log2(self.resolution // 4)) + 1

    def stage_resolutions(self) -> Tuple[int, ...]:
        """Resolutions processed by the generator, low to high: 4, 8, ... res."""
        return tuple(4 * 2**i for i in range(self.num_stages))

    def stage_channels(self) -> Tuple[int, ...]:
        """Channel width at each stage resolution, low to high."""
        chans = []
        for i in range(self.num_stages):
            c = self.base_channels / (self.channel_factor**i)
            c = int(max(self.min_channels, min(self.max_channels, c)))
            # Round to a multiple of 8 (full-lane VPU sublane for fp32;
            # large configs use multiples of 128 natively).
            chans.append(max(8, (c // 8) * 8))
        return tuple(chans)

    def attention_at(self, resolution: int) -> bool:
        stages = self.attention_stages
        if isinstance(stages, str):
            if stages == "all":
                return True
            if stages in ("none", ""):
                return False
            # CLI form: comma-separated stage resolutions, e.g. "8,16,32"
            stages = tuple(int(s) for s in stages.split(",") if s)
        if not stages:
            return False
        return resolution in tuple(stages)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Host input pipeline (SURVEY.md §4.5)."""

    # {"synthetic", "folder", "zip", "cifar10", "packed", "tfrecord",
    # "lsun"/"lmdb"}. "tfrecord" reads StyleGAN-convention or TF-slim
    # shards without a TensorFlow import (data/tfrecords.py); "zip" reads
    # StyleGAN2-ADA dataset_tool.py archives in place (images +
    # optional dataset.json labels, no extraction); "lsun" reads LSUN
    # LMDB archives directly (data/lmdb_reader.py, no lmdb package).
    # `pack` any of them once for training-speed input.
    dataset: str = "synthetic"
    path: str = ""
    resolution: int = 32
    img_channels: int = 3
    random_flip: bool = True
    num_classes: int = 0
    # Host-side prefetch depth (double buffering => 2).
    prefetch: int = 2
    shuffle_buffer: int = 4096


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 2e-4
    beta1: float = 0.0
    beta2: float = 0.99
    eps: float = 1e-8
    # Global-norm gradient clip applied before Adam; 0 disables. A blunt
    # stability control next to the targeted ones (R1, logit_penalty,
    # apply_if_finite) — useful for wgan critics and TTUR-style schedules
    # whose grad norms spike (DESIGN.md dynamics tables).
    clip_grad_norm: float = 0.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Objective & loop (SURVEY.md §2 L4/L6)."""

    total_steps: int = 100_000
    global_batch: int = 64
    g_opt: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    d_opt: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    # GAN loss: "nonsat" (reference behavior), "hinge", "wgan"
    # (Wasserstein critic — pair with r1_gamma for the Lipschitz control),
    # "lsgan" (least-squares, arXiv 1611.04076), the relativistic
    # average pairs "ragan" / "rahinge" (arXiv 1807.00734 — D rates reals
    # relative to the batch-average fake and vice versa; the G loss then
    # also needs D(real), one extra D forward per step on the alternating
    # flavor, CSE-free on the fused flavor), or "rpgan" (the relativistic
    # PAIRING loss, RSGAN arXiv 1807.00734 §3 — sample i's fake rated
    # against sample i's real; with r1_gamma + r2_gamma this is R3GAN's
    # provably-convergent modern recipe, arXiv 2501.05441).
    loss: str = "nonsat"
    # Top-k generator training (arXiv 2002.06224): each step the G loss
    # averages only over the `topk_fraction` of fake samples with the
    # HIGHEST critic scores — gradients from the worst fakes (which D
    # rejects hardest) are discarded. Selection is over the GLOBAL batch
    # (identical under GSPMD / shard_map / single device). 1.0 disables;
    # the paper anneals toward 0.5. Per-sample-decomposable losses only
    # (not ragan/rahinge).
    topk_fraction: float = 1.0
    # Fused simultaneous step (FusedProp-style, PAPERS.md: arXiv
    # 2004.03335): share one latent batch and one fake forward between the
    # D and G losses, computing both gradients against the CURRENT params
    # (simultaneous instead of alternating updates). XLA CSE dedupes the
    # shared forwards -> ~1.3-1.5x step speedup; slightly different
    # training dynamics, so off by default (reference parity).
    fused_step: bool = False
    # Reuse the D-step latents for the G-step (z_g = z_d), correlating
    # D/G noise within a step (a common GAN-training choice). NOT a
    # speedup in practice: XLA CSE merges the two G forwards but must
    # then keep the merged activations live into the G backward, which
    # measured ~18% SLOWER at 128^2/batch-128 than recomputing. Off by
    # default (reference parity + speed).
    share_latents: bool = False
    # Critic (discriminator) updates per generator update — the classic
    # WGAN n_critic schedule (arXiv 1701.07875 uses 5). Each critic step
    # consumes its OWN fresh real batch (the loop feeds d_steps batches
    # per optimizer step) and fresh latents; the G step then runs through
    # the d_steps-times-updated D. Alternating flavor only; the jitted
    # step scans the critic updates on-device. 1 = reference behavior.
    d_steps: int = 1
    # Optional LR schedule applied to both optimizers:
    # "constant" | "cosine" | "linear_warmup_cosine".
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    # Gradient accumulation (optax.MultiSteps): the optimizer applies every
    # `grad_accum` micro-steps — large effective batches at 512^2 on few
    # chips without more HBM. 1 disables.
    grad_accum: int = 1
    # EMA generator for sampling (BASELINE config 3). 0 disables.
    ema_decay: float = 0.999
    # EMA shadow storage: "float32" (plain accumulation) or "bfloat16"
    # (stochastically-rounded accumulation — halves the shadow's HBM;
    # deterministic bf16 would stall, see objectives/ema.py).
    ema_dtype: str = "float32"
    # EMA half-life ramp-up (StyleGAN2-ADA's ema_rampup, in our per-step
    # decay terms): when > 0, the effective half-life at step t is
    # min(target_half_life(ema_decay), t * ema_rampup) — the shadow
    # tracks the live generator closely early on (decay ~0 at step 0)
    # instead of averaging in thousands of steps of random init, then
    # glides to the configured decay. ADA uses ratio 0.05: the half-life
    # is at most 5% of training-so-far. 0 = fixed decay from step 0.
    # Purely a function of state.step, so resume continuity is automatic.
    ema_rampup: float = 0.0
    # Lazy R1 gradient penalty on D every `r1_interval` steps; 0 disables.
    r1_gamma: float = 0.0
    r1_interval: int = 16
    # Rematerialize the penalty's D forward (halves grad-of-grad live
    # memory; measured OOM fix at 128^2 b64 on 16 GB). Off only for
    # profiling the remat cost itself (scripts/profile_r1.py).
    r1_remat: bool = True
    # R2 gradient penalty: R1's zero-centered ||grad_x D||^2 penalty
    # evaluated at the FAKE samples (R3GAN, arXiv 2501.05441 §2.2 — the
    # pair R1+R2 makes the rpgan objective locally convergent; R3GAN sets
    # both gammas equal). Shares R1's schedule and machinery entirely:
    # fires on the same lazy r1_interval steps (the papers fire them
    # together), obeys r1_remat and r1_batch_fraction, and runs through
    # the same XLA-twin discriminator on the Pallas path. 0 disables.
    r2_gamma: float = 0.0
    # Compute R1 on this leading fraction of the (shuffled) real batch —
    # an unbiased estimator of E[||grad D||^2] at 1/fraction of the
    # grad-of-grad cost (higher variance; the penalty is a regularizer,
    # not a loss, so variance is cheap). 1.0 = full batch.
    r1_batch_fraction: float = 1.0
    # Keep a separate best-eval checkpoint: when the in-training eval
    # (eval_every > 0) improves on the best rFID seen, snapshot the state
    # to <workdir>/checkpoints_best (keep=1) with the score in best.json
    # (consulted on resume so a restart can't demote the incumbent).
    keep_best: bool = True
    # Feature-matching loss on G (arXiv 1606.03498 §3.1): weight for
    # ||E[feats(real)] - E[feats(fake)]||^2 over the discriminator's
    # pooled pre-head features. A classic anti-mode-collapse auxiliary;
    # 0 disables.
    feature_matching: float = 0.0
    # Path-length regularization on G (StyleGAN2, arXiv 1912.04958 §B):
    # keeps ||J_z^T y|| concentrated around its running mean so latent
    # steps move images by consistent amounts. Lazy (every pl_interval
    # steps, lazy-reg scaled); adds a `pl_mean` scalar to TrainState when
    # enabled. 0 disables; StyleGAN2 uses weight 2.
    pl_gamma: float = 0.0
    pl_interval: int = 4
    pl_decay: float = 0.01
    # WGAN-GP one-centered gradient penalty at random real/fake
    # interpolates (arXiv 1704.00028); fires EVERY step (the classic
    # recipe — use lazy R1 instead when grad-of-grad cost matters).
    # 0 disables; the paper uses 10 with the wgan loss.
    gp_gamma: float = 0.0
    # Balanced consistency regularization (bCR, arXiv 2002.04724 §3):
    # penalize D for scoring an image and an augmented view of it
    # differently — bcr_gamma * (E[(D(x)-D(T(x)))^2] over reals + the same
    # over fakes) added to the D LOSS ONLY. Unlike ADA, G never sees the
    # bCR augmentations (they regularize D's invariances; the adversarial
    # logits stay un-augmented), so the two compose: ADA fights D
    # memorization, bCR shapes D's smoothness. T draws from the same
    # on-device pipeline (ops/augment.py) with per-op probability `bcr_p`
    # over the `bcr_ops` categories (paper: flip+shift, our "geom").
    # Like ADA's draws, T is sampled per-replica under shard_map (GSPMD
    # keeps DP == single-device; documented divergence). 0 disables.
    bcr_gamma: float = 0.0
    bcr_p: float = 0.5
    bcr_ops: str = "geom"
    # LeCam regularization (arXiv 2104.03310): D loss gains
    # lecam_gamma * (E[relu(D(real) - ema_fake)^2]
    #                + E[relu(ema_real - D(fake))^2])
    # where (ema_real, ema_fake) track the batch-mean logits with decay
    # lecam_decay (a `lecam` [2]-vector in TrainState when enabled —
    # None otherwise, so default pytrees are unchanged). Bounds the
    # real/fake logit gap; the third leg of the limited-data stool
    # (ADA fights D memorization, bCR shapes invariances, LeCam caps the
    # divergence D can express). Paper: 0.01-0.3 with decay 0.99.
    lecam_gamma: float = 0.0
    lecam_decay: float = 0.99
    # Orthogonal regularization on G (BigGAN, arXiv 1809.11096 §3, the
    # off-diagonal form): ortho_gamma * sum_W ||W^T W o (1 - I)||_F^2
    # over every G weight with ndim >= 2 (conv kernels flattened to
    # [fan_in, fan_out]; biases/gains/scalars skipped). Nudges filters
    # toward orthogonality without constraining their norms — BigGAN's
    # G-side smoothness term (also what makes orthogonal truncation
    # behave). Fires every step (the term is O(params), cheap next to a
    # conv forward). 0 disables; the paper uses 1e-4.
    ortho_gamma: float = 0.0
    # ProGAN-style drift penalty eps * E[D(real)^2] (arXiv 1710.10196
    # §A.1) — keeps D's logits from running away (the observed
    # long-horizon failure mode: D saturates, G gradients explode).
    # 0 disables; the paper uses 1e-3.
    logit_penalty: float = 0.0
    # --- Discriminator augmentation (StyleGAN2-ADA, arXiv 2006.06676) ---
    # D sees aug(x) for BOTH real and fake (G backprops through it);
    # prevents D memorizing small datasets (ops/augment.py). augment_p is
    # the per-op application probability; 0 with ada_target=0 disables
    # the pipeline structurally (no extra pytree leaf in TrainState).
    augment_p: float = 0.0
    # If > 0, p adapts online: r_t = E[sign(D(real))] (D overfitting
    # heuristic) is driven toward this target (paper uses 0.6) by
    # +-global_batch/(ada_speed_kimg*1000) per step, clipped to [0, 1].
    # augment_p is then the initial p.
    ada_target: float = 0.0
    ada_speed_kimg: int = 500
    # Augmentation categories the ADA pipeline applies (comma-separated;
    # ops/augment.py): "geom" (flip/rot90/integer-translate), "affine"
    # (ADA's general geometric group — iso/aniso scaling, arbitrary
    # rotation, fractional translation via one bilinear warp), "color",
    # "noise" (ADA's additive-Gaussian corruption, half-normal sigma),
    # "cutout". "affine"/"noise" are opt-in (default trajectories
    # unchanged; affine is bilinear, not ADA's anti-aliased resampling).
    augment_ops: str = "geom,color,cutout"
    seed: int = 0
    log_every: int = 100
    sample_every: int = 2000
    checkpoint_every: int = 2000
    keep_checkpoints: int = 3
    # Async orbax saves: the loop keeps stepping while the checkpoint
    # writes in the background (matters at 512^2 state sizes).
    async_checkpoint: bool = False
    # In-training quality eval (rFID/rKID vs the training dataset) every N
    # steps; 0 disables (it pauses training for the eval pass).
    eval_every: int = 0
    eval_samples: int = 1024
    # Also compute sliced Wasserstein distance (io/swd.py, ProGAN §5) at
    # each in-training eval — logged as eval_swd_<res>/eval_swd_avg. A
    # second, weights-free quality signal alongside rFID (different
    # failure sensitivities: SWD reads raw pixel statistics per scale).
    eval_swd: bool = False
    # Numerics: params/opt-state in fp32, compute in bf16 on TPU.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Numerics sanitizer (SURVEY.md §6): wrap both optimizers in
    # optax.apply_if_finite so a non-finite gradient ALWAYS skips the
    # update (params are never poisoned), and the train loop raises once
    # the consecutive-skip streak reaches this value (checked every
    # log_every steps, so keep log_every <= this). 0 disables the wrapper.
    max_nonfinite_skips: int = 0
    # Divergence sanitizer for FINITE blow-ups (the failure mode
    # apply_if_finite is blind to — the r4 flagship run applied
    # 1e12..3e17-norm updates for hours, docs/QUALITY_r5.md post-mortem):
    # updates whose overflow-proof global grad norm exceeds this are
    # SKIPPED (Adam's moments never see the exploded gradient), counted
    # in <net>_grad_limit_count/_streak metrics, warned about at log
    # boundaries, and — when max_nonfinite_skips > 0 — abort the run at
    # the same consecutive-skip threshold as non-finite skips. Distinct
    # from opt.clip_grad_norm (which rescales and still applies). Set
    # ~100x above the run's healthy grad-norm envelope; 0 disables.
    grad_norm_limit: float = 0.0
    # Quality-regression warning (train.keep_best runs): if the best
    # rFID has not improved for this many consecutive evals, the loop
    # prints a "quality regressing since step N" warning at each further
    # eval. Advisory only (GAN metrics are noisy; the best checkpoint is
    # already preserved). 0 disables.
    regress_warn_evals: int = 5
    # TensorBoard scalars/images under <workdir>/tb (lazy TF import).
    tensorboard: bool = False
    # Optimizer steps per host dispatch: the jitted call scans this many
    # train steps over a stacked [k, batch, ...] input before returning to
    # Python — amortizes per-step dispatch latency (the dominant cost at
    # small batch) at the price of k-batch transfer granularity. 1 keeps
    # the reference one-step-per-call shape. gspmd backend only.
    steps_per_call: int = 1

    def __post_init__(self):
        if self.ema_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"ema_dtype must be float32 or bfloat16, got {self.ema_dtype!r}"
            )
        if self.ema_rampup < 0.0:
            raise ValueError(
                f"ema_rampup must be >= 0, got {self.ema_rampup}"
            )
        if self.ema_rampup > 0.0 and not 0.0 < self.ema_decay < 1.0:
            raise ValueError(
                "ema_rampup needs 0 < ema_decay < 1 (a finite target "
                f"half-life), got ema_decay={self.ema_decay}"
            )
        if not 0.0 <= self.augment_p <= 1.0:
            raise ValueError(f"augment_p must be in [0, 1], got {self.augment_p}")
        if not 0.0 <= self.ada_target < 1.0:
            raise ValueError(
                f"ada_target must be in [0, 1), got {self.ada_target}"
            )
        if self.ada_speed_kimg <= 0:
            raise ValueError("ada_speed_kimg must be positive")
        if self.bcr_gamma < 0.0:
            raise ValueError(f"bcr_gamma must be >= 0, got {self.bcr_gamma}")
        if self.ortho_gamma < 0.0:
            raise ValueError(
                f"ortho_gamma must be >= 0, got {self.ortho_gamma}"
            )
        if self.lecam_gamma < 0.0:
            raise ValueError(
                f"lecam_gamma must be >= 0, got {self.lecam_gamma}"
            )
        if not 0.0 <= self.lecam_decay < 1.0:
            raise ValueError(
                f"lecam_decay must be in [0, 1), got {self.lecam_decay}"
            )
        if not 0.0 <= self.bcr_p <= 1.0:
            raise ValueError(f"bcr_p must be in [0, 1], got {self.bcr_p}")
        cats = ("geom", "affine", "color", "noise", "cutout", "")
        for field_name in ("bcr_ops", "augment_ops"):
            bad = [s for s in getattr(self, field_name).split(",")
                   if s.strip() not in cats]
            if bad:
                raise ValueError(
                    f"{field_name} categories {bad} unknown "
                    "(geom/affine/color/cutout)"
                )
        if self.logit_penalty < 0.0:
            raise ValueError(
                f"logit_penalty must be >= 0, got {self.logit_penalty}"
            )
        if not 0.0 < self.r1_batch_fraction <= 1.0:
            raise ValueError(
                f"r1_batch_fraction must be in (0, 1], got "
                f"{self.r1_batch_fraction}"
            )
        if 0 < self.max_nonfinite_skips < self.log_every:
            # the abort check only observes the streak at log boundaries;
            # a larger log_every would let training spin dead for up to
            # log_every - max_nonfinite_skips extra steps
            raise ValueError(
                f"log_every={self.log_every} must be <= "
                f"max_nonfinite_skips={self.max_nonfinite_skips} for the "
                f"non-finite abort to fire on time"
            )
        if self.grad_norm_limit < 0.0:
            raise ValueError(
                f"grad_norm_limit must be >= 0, got {self.grad_norm_limit}"
            )
        if self.regress_warn_evals < 0:
            raise ValueError(
                f"regress_warn_evals must be >= 0, got "
                f"{self.regress_warn_evals}"
            )
        if self.d_steps < 1:
            raise ValueError(f"d_steps must be >= 1, got {self.d_steps}")
        if not 0.0 < self.topk_fraction <= 1.0:
            raise ValueError(
                f"topk_fraction must be in (0, 1], got {self.topk_fraction}"
            )
        if self.r2_gamma < 0.0:
            raise ValueError(f"r2_gamma must be >= 0, got {self.r2_gamma}")
        if self.topk_fraction < 1.0 and self.loss in ("ragan", "rahinge",
                                                      "rpgan"):
            raise ValueError(
                "topk_fraction < 1 needs a G loss of the fake logits "
                f"alone; {self.loss!r} couples each fake to the real batch"
            )
        if self.d_steps > 1 and self.fused_step:
            raise ValueError(
                "d_steps > 1 needs the alternating step (fused_step=True "
                "computes simultaneous gradients — a critic ratio is "
                "meaningless there)"
            )
        k = self.steps_per_call
        if k < 1:
            raise ValueError(f"steps_per_call must be >= 1, got {k}")
        if k > 1:
            for name in ("log_every", "sample_every", "checkpoint_every",
                         "eval_every", "total_steps"):
                v = getattr(self, name)
                if v and v % k:
                    raise ValueError(
                        f"train.{name}={v} must be a multiple of "
                        f"steps_per_call={k} (the loop only observes state "
                        f"every {k} steps)"
                    )


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh & sharding (SURVEY.md §3.2-3.3): DP over ICI with psum grad
    reduction is the required strategy; a `model` axis slot exists for
    tensor-parallel channel sharding."""

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = all available devices on the data axis.
    data_parallel: int = -1
    model_parallel: int = 1
    # Collective realization: "gspmd" (global program, XLA-inferred
    # collectives — default) or "shard_map" (explicit per-replica psum;
    # DP-only).
    backend: str = "gspmd"
    # ZeRO-style state sharding over the `data` axis (gspmd backend only).
    #   0 — params + optimizer state fully replicated over `data` (default)
    #   1 — shard Adam mu/nu and the EMA shadow over `data` (ZeRO-1: the
    #       partitioner turns the grad all-reduce into reduce-scatter +
    #       sharded update + param all-gather)
    #   3 — also shard the params themselves over `data` (FSDP/ZeRO-3:
    #       all-gather at use inside fwd/bwd, nothing replicated)
    # Pure memory/layout change: trajectories are identical to stage 0
    # (pinned by tests/test_parallel.py::test_zero*_matches_replicated).
    zero_stage: int = 0

    def __post_init__(self):
        if self.zero_stage not in (0, 1, 3):
            raise ValueError(
                f"parallel.zero_stage={self.zero_stage}; expected 0, 1, or 3")
        if self.zero_stage > 0 and self.backend != "gspmd":
            raise ValueError(
                "parallel.zero_stage > 0 requires backend='gspmd' (the "
                "shard_map step is written with replicated per-replica "
                "state; ZeRO relies on GSPMD inferring reduce-scatter/"
                "all-gather from the state layout)")


@dataclasses.dataclass(frozen=True)
class Config:
    name: str = "default"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    # Use fused Pallas kernels for the hot blocks (SURVEY.md §8 M6); the
    # pure-XLA composition is always available as fallback & test oracle.
    use_pallas: bool = False
    workdir: str = "runs/default"
    # Persistent XLA compilation-cache directory ("" = off). On the
    # tunneled-TPU deployment every jit signature costs a 30s-to-minutes
    # remote compile; with a cache dir, relaunches (crash resume,
    # periodic eval jobs, the next round's driver) reload the serialized
    # executable instead of recompiling. See utils/compile_cache.py.
    compile_cache: str = ""


# ---------------------------------------------------------------------------
# Presets: the five BASELINE configs (/root/repo/BASELINE.json:6-12).
# ---------------------------------------------------------------------------


def _cifar10_32() -> Config:
    """Config 1: CIFAR-10 32x32 conv+LocAtE-attention GAN (CPU-runnable ref)."""
    return Config(
        name="cifar10_32",
        model=ModelConfig(resolution=32, base_channels=256, max_channels=256,
                          attention=AttentionConfig(gate_max=16.0)),
        data=DataConfig(dataset="cifar10", resolution=32),
        train=TrainConfig(global_batch=64, compute_dtype="float32",
                          r1_gamma=0.1, grad_norm_limit=1e6,
                          max_nonfinite_skips=200),
        workdir="runs/cifar10_32",
    )


def _celeba_64() -> Config:
    """Config 2: CelebA 64x64, location-based attention at every stage."""
    return Config(
        name="celeba_64",
        model=ModelConfig(
            resolution=64, base_channels=512, max_channels=512,
            attention_stages="all", attention=AttentionConfig(gate_max=16.0),
        ),
        data=DataConfig(dataset="folder", resolution=64),
        train=TrainConfig(global_batch=64, r1_gamma=0.1, grad_norm_limit=1e6,
                          max_nonfinite_skips=200),
        workdir="runs/celeba_64",
    )


def _lsun_bedroom_128() -> Config:
    """Config 3: LSUN-bedroom 128x128, deeper attention-conv stacks + EMA.

    This is the primary-metric config (images/sec/chip at 128x128,
    BASELINE.json:2). The training recipe is the round-5 sweep winner,
    validated short-horizon AND long-horizon on the same corpus
    (docs/QUALITY_r5.md §4-5):

    - r1_gamma=1.0 — the r4 default 0.1 was ~100x below the StyleGAN2
      convention at this resolution and collapsed over 25k steps;
      gamma=10 over-regularizes (sweep arm a).
    - gate_max=16 tames the attention-gate/GroupNorm gradient amplifier.
    - grad_norm_limit=1e6 skips finite-but-exploded updates (healthy
      medians here: D ~1, G ~1.6-3e3; the r4 death spiral crossed 1e12
      within ~200 steps of diverging) and aborts on a persistent
      streak.

    Hard-won tuning notes from the r5 50k-corpus attempts (QUALITY_r5
    §5): if the skip-guard fires on a large fraction of R1 firings
    (raw R1-step norms can reach 1e6-1e9 once D sharpens), switch to
    per-net spike CLIPS (opt.clip_grad_norm — keep each level ~30-100x
    that net's healthy median, e.g. D=100/G=1e4, and raise the limit
    to 1e12 since it reads PRE-clip norms) so the corrections land with
    direction preserved. And if D saturates with TINY gradients (smooth
    separation — d_loss ~ 0, R1 blind because input grads at the reals
    vanish, scale-invariant Adam marching at full LR), no gradient
    guard helps; that regime needs a different lever (stronger/earlier
    D regularization, d_lr reduction, or more D capacity pressure).

    For very small corpora (<~10k images) add ADA/LeCam per
    docs/GUIDE.md's limited-data recipe — but note the sweep's finding
    that LeCam's logit pinning stalls ADA's sign-based controller when
    both are on.
    """
    return Config(
        name="lsun_bedroom_128",
        model=ModelConfig(
            resolution=128,
            base_channels=512,
            max_channels=512,
            blocks_per_stage=2,
            attention=AttentionConfig(gate_max=16.0),
        ),
        data=DataConfig(dataset="folder", resolution=128),
        train=TrainConfig(global_batch=64, ema_decay=0.999, r1_gamma=1.0,
                          grad_norm_limit=1e6, max_nonfinite_skips=200),
        workdir="runs/lsun_bedroom_128",
    )


def _ffhq_256() -> Config:
    """Config 4: FFHQ 256x256 class-conditional, data-parallel over ICI (v5p-8)."""
    return Config(
        name="ffhq_256",
        model=ModelConfig(
            resolution=256,
            base_channels=512,
            max_channels=512,
            num_classes=10,
            attention=AttentionConfig(gate_max=16.0),
        ),
        data=DataConfig(dataset="folder", resolution=256, num_classes=10),
        train=TrainConfig(global_batch=128, r1_gamma=0.1, grad_norm_limit=1e6,
                          max_nonfinite_skips=200),
        parallel=ParallelConfig(data_parallel=-1),
        workdir="runs/ffhq_256",
    )


def _ffhq_512() -> Config:
    """Config 5: FFHQ 512x512 with fused attention-conv Pallas blocks (v5p-32)."""
    return Config(
        name="ffhq_512",
        model=ModelConfig(
            resolution=512,
            base_channels=512,
            max_channels=512,
            remat=True,
            attention=AttentionConfig(gate_max=16.0),
        ),
        data=DataConfig(dataset="folder", resolution=512),
        train=TrainConfig(global_batch=256, r1_gamma=0.1, grad_norm_limit=1e6,
                          max_nonfinite_skips=200),
        parallel=ParallelConfig(data_parallel=-1),
        use_pallas=True,
        workdir="runs/ffhq_512",
    )


PRESETS = {
    "cifar10_32": _cifar10_32,
    "celeba_64": _celeba_64,
    "lsun_bedroom_128": _lsun_bedroom_128,
    "ffhq_256": _ffhq_256,
    "ffhq_512": _ffhq_512,
}


def get_config(name: str = "cifar10_32", overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Build a preset config with optional dotted-path overrides.

    >>> get_config("cifar10_32", {"train.global_batch": 32})
    """
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    cfg = PRESETS[name]()
    if overrides:
        # Overrides apply one dataclasses.replace at a time, and each
        # replace re-validates (__post_init__), so an override whose
        # cross-field constraint (e.g. steps_per_call vs the cadences)
        # only holds once ANOTHER override lands can fail mid-sequence.
        # Fixed-point application makes the result order-independent for
        # any acyclic constraint set: retry failed overrides after each
        # pass, raising the last error only when a full pass makes no
        # progress (i.e. the override set is genuinely invalid).
        items = list(overrides.items())
        while items:
            remaining, last_err = [], None
            for key, value in items:
                try:
                    cfg = apply_override(cfg, key, value)
                except ValueError as e:
                    remaining.append((key, value))
                    last_err = e
            if len(remaining) == len(items):
                raise last_err
            items = remaining
    return cfg


def apply_override(cfg: Config, dotted_key: str, value: Any) -> Config:
    """Return a new config with `dotted_key` (e.g. "model.resolution") set."""
    parts = dotted_key.split(".")
    return _set_in(cfg, parts, value)


def _set_in(obj, parts, value):
    field_name = parts[0]
    if not dataclasses.is_dataclass(obj) or field_name not in {
        f.name for f in dataclasses.fields(obj)
    }:
        raise KeyError(f"no config field {field_name!r} on {type(obj).__name__}")
    if len(parts) == 1:
        current = getattr(obj, field_name)
        return _replace(obj, **{field_name: _coerce(value, current)})
    child = getattr(obj, field_name)
    return _replace(obj, **{field_name: _set_in(child, parts[1:], value)})


def _coerce(value: Any, template: Any) -> Any:
    """Coerce a (possibly string) CLI value to the type of the current value."""
    if not isinstance(value, str):
        return value
    if isinstance(template, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(template, int):
        return int(value)
    if isinstance(template, float):
        return float(value)
    if isinstance(template, tuple):
        return tuple(int(v) for v in value.split(",") if v)
    return value


def parse_cli_overrides(argv) -> Dict[str, Any]:
    """Parse ["a.b=1", "c=x"] style args into an override dict."""
    out: Dict[str, Any] = {}
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"override {arg!r} is not key=value")
        key, _, value = arg.partition("=")
        out[key.strip()] = value.strip()
    return out
