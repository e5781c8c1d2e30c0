"""A pure-PyTorch functional twin of the locate-tpu model family.

Test fixture ONLY (SURVEY.md §5 item 1): consumes OUR params pytree and
ModelConfig and recomputes the generator/discriminator forward with torch
ops, so end-to-end outputs/losses/grads can be diffed against the JAX
implementation. Written from this repo's spec — the upstream reference
mount was empty (SURVEY.md §0); this twin doubles as the "PyTorch
reference" stand-in for parity checks until real hardware/FID weights are
available (BASELINE.md "Open items")."""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from locate_tpu.config import ModelConfig
from locate_tpu.ops.attention import _coord_features_np

SQRT_HALF = 0.7071067811865476


def t(x) -> torch.Tensor:
    arr = np.asarray(x, np.float32)
    return torch.from_numpy(arr.copy())


def conv_nhwc(x, w_hwio, b=None, same=True):
    """lax.conv_general_dilated(NHWC, HWIO, SAME) in torch."""
    xt = x.permute(0, 3, 1, 2)
    wt = w_hwio.permute(3, 2, 0, 1)
    if same:
        kh, kw = w_hwio.shape[0], w_hwio.shape[1]
        ph, pw = kh - 1, kw - 1
        xt = F.pad(xt, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    y = F.conv2d(xt, wt, b)
    return y.permute(0, 2, 3, 1)


def apply_conv(params, x, same=True):
    return conv_nhwc(x, params["w"], params.get("b"))


def apply_factorized(params, x):
    return apply_conv(params["col"], apply_conv(params["row"], x))


def group_norm(params, x, groups):
    c = x.shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1
    xt = x.permute(0, 3, 1, 2)
    y = F.group_norm(xt, g, params["scale"], params["bias"], eps=1e-5)
    return y.permute(0, 2, 3, 1)


def act(x, cfg: ModelConfig):
    assert cfg.act == "leaky_relu", "twin implements the default activation"
    return F.leaky_relu(x, cfg.leaky_slope)


def conv_block(params, x, cfg: ModelConfig):
    h = group_norm(params["main"][0], x, cfg.group_norm_groups)
    h = act(h, cfg)
    h = apply_factorized(params["main"][2], h) if cfg.factorized else apply_conv(
        params["main"][2], h
    )
    s = apply_conv(params["skip"], x) if "skip" in params else x
    return (h + s) * SQRT_HALF


def self_attention(params, x, cfg: ModelConfig):
    """Twin of ops/self_attention.py (SAGAN block, attention.kind="self")."""
    from locate_tpu.ops.self_attention import _head_dims

    acfg = cfg.attention
    n, hh, ww, c = x.shape
    t = hh * ww
    dk, dv = _head_dims(c, acfg)
    heads = acfg.heads
    scale = (dk // heads) ** -0.5 if acfg.sa_scale else 1.0

    def proj(p, d):
        return apply_conv(p, x).reshape(n, t, heads, d // heads).permute(0, 2, 1, 3)

    q = proj(params["q"], dk)                       # (n, heads, t, dh)
    k = proj(params["k"], dk)
    v = proj(params["v"], dv)
    att = F.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
    out = (att @ v).permute(0, 2, 1, 3).reshape(n, hh, ww, dv)
    o = conv_nhwc(out, params["o"]["w"], params["o"]["b"])
    return x + params["gamma"] * o


def attention(params, x, cfg: ModelConfig):
    if cfg.attention.kind == "self":
        return self_attention(params, x, cfg)
    acfg = cfg.attention
    n, hh, ww, c = x.shape
    feats = x
    if acfg.pos_features:
        pos = t(_coord_features_np(hh, ww, acfg.pos_features))
        feats = torch.cat([feats, pos.expand(n, hh, ww, acfg.pos_features)], dim=-1)
    hdn = act(apply_conv(params["to_hidden"], feats), cfg)
    logits = apply_conv(params["to_logits"], hdn)
    if acfg.mode == "softmax":
        flat = logits.reshape(n, hh * ww, logits.shape[-1])
        gate = F.softmax(flat, dim=1).reshape(logits.shape)
        if acfg.residual:
            gate = gate * (hh * ww)
    else:
        gate = torch.sigmoid(logits)
        if acfg.residual:
            gate = gate * 2.0
    if acfg.gate_max > 0.0:
        # mirrors locate_gate's where(g > M, M, g): clamp's boundary
        # subgradient is 1 on both sides
        gate = torch.clamp(gate, max=acfg.gate_max)
    return x * gate


def upsample(x):
    xt = x.permute(0, 3, 1, 2)
    return F.interpolate(xt, scale_factor=2, mode="nearest").permute(0, 2, 3, 1)


def downsample(x):
    return F.avg_pool2d(x.permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1)


def _stage_layers(cfg, resolution):
    """Mirror of nn.blocks stage layer ordering."""
    return cfg.attention_at(resolution)


def generator_forward(params, cfg: ModelConfig, z, labels=None):
    chans = cfg.stage_channels()
    resolutions = cfg.stage_resolutions()
    if cfg.num_classes:
        emb = params["class_embed"][labels]
        z = torch.cat([z, emb], dim=-1)
    x = z @ params["seed"]["w"] + params["seed"]["b"]
    x = x.reshape(z.shape[0], 4, 4, chans[0])
    for i, p_stage in enumerate(params["trunk"]):
        li = 0
        if i > 0:
            x = upsample(x)
            li += 1  # upsample layer holds () params
        for _ in range(cfg.blocks_per_stage):
            x = conv_block(p_stage[li], x, cfg)
            li += 1
        if cfg.attention_at(resolutions[i]):
            x = attention(p_stage[li], x, cfg)
    x = group_norm(params["head"][0], x, cfg.group_norm_groups)
    x = act(x, cfg)
    x = torch.tanh(apply_conv(params["head"][2], x))
    return x


def discriminator_forward(params, cfg: ModelConfig, x, labels=None,
                          return_features=False):
    chans = cfg.stage_channels()
    resolutions = cfg.stage_resolutions()
    n_stages = len(chans)
    h = apply_conv(params["stem"], x)
    for si, p_stage in enumerate(params["trunk"]):
        i = n_stages - 1 - si  # stages run high-res -> low-res
        li = 0
        for _ in range(cfg.blocks_per_stage):
            h = conv_block(p_stage[li], h, cfg)
            li += 1
        if cfg.attention_at(resolutions[i]):
            h = attention(p_stage[li], h, cfg)
            li += 1
        if i != 0:
            h = downsample(h)
    trunk_out = h
    h = group_norm(params["neck"][0], h, cfg.group_norm_groups)
    h = act(h, cfg)
    feats = h.mean(dim=(1, 2))
    head_in = feats
    if cfg.mbstd_group:
        n = trunk_out.shape[0]
        g = min(cfg.mbstd_group, n)
        y = trunk_out.reshape(n // g, g, -1)
        sd = torch.sqrt(y.var(dim=1, unbiased=False) + 1e-8)
        mb = sd.mean(dim=1).repeat_interleave(g)[:, None]
        head_in = torch.cat([feats, mb], dim=-1)
    logit = (head_in @ params["head"]["w"] + params["head"]["b"])[:, 0]
    if cfg.num_classes:
        proj = params["class_proj"][labels]
        logit = logit + (proj * feats).sum(dim=-1)
    if return_features:
        return logit, feats
    return logit


def spectral_normalize_torch(tree, v0_fn, n_iters=9, eps=1e-12):
    """Twin of ops/spectral.spectral_normalize: divide every "w" leaf by
    its power-iteration sigma, keeping autograd through W (u, v detached —
    same stop_gradient semantics as the JAX side). `v0_fn(cols)` must
    return the SAME deterministic start vector the JAX side uses (the test
    bridges it from jax.random so this file stays jax-free)."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k == "w" and torch.is_tensor(v) and v.ndim >= 2:
                m = v.reshape(-1, v.shape[-1])
                vec = v0_fn(m.shape[-1])
                vec = vec / vec.norm()
                for _ in range(n_iters):
                    u = m.detach() @ vec
                    u = u / (u.norm() + eps)
                    vec = m.detach().T @ u
                    vec = vec / (vec.norm() + eps)
                u = m.detach() @ vec
                u = u / (u.norm() + eps)
                sigma = u @ (m @ vec)
                out[k] = v / torch.clamp(sigma, min=eps)
            else:
                out[k] = spectral_normalize_torch(v, v0_fn, n_iters, eps)
        return out
    if isinstance(tree, (list, tuple)):
        return [spectral_normalize_torch(v, v0_fn, n_iters, eps) for v in tree]
    return tree


# ---------------------------------------------------------------------------
# style family twin (models/style_generator.py)
# ---------------------------------------------------------------------------


def eq_dense_torch(params, x, lr_mul=1.0):
    in_dim = params["w"].shape[0]
    scale = lr_mul / math.sqrt(in_dim)
    return x @ (params["w"] * scale) + params["b"] * lr_mul


def _act_gain(x, cfg: ModelConfig):
    return act(x, cfg) * math.sqrt(2.0)


def modulated_conv_torch(params, x, wlat, demodulate=True, eps=1e-8):
    """The LITERAL StyleGAN2 formulation (arXiv 1912.04958 eq. 1-3):
    materialize per-sample modulated+demodulated weights and run a grouped
    conv — deliberately DIFFERENT from the JAX side's input-scale /
    output-demod form, so the test pins their mathematical equality."""
    n, hh, ww, cin = x.shape
    kh, kw, _, cout = params["w"].shape
    he = 1.0 / math.sqrt(kh * kw * cin)
    s = eq_dense_torch(params["affine"], wlat)  # (n, cin)
    w = (params["w"] * he).permute(3, 2, 0, 1)  # (cout, cin, kh, kw)
    wt = w[None] * s[:, None, :, None, None]  # per-sample weights
    if demodulate:
        d = torch.rsqrt((wt**2).sum(dim=(2, 3, 4)) + eps)  # (n, cout)
        wt = wt * d[:, :, None, None, None]
    xt = x.permute(0, 3, 1, 2).reshape(1, n * cin, hh, ww)
    ph, pw = kh - 1, kw - 1
    xt = F.pad(xt, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    y = F.conv2d(xt, wt.reshape(n * cout, cin, kh, kw), groups=n)
    y = y.reshape(n, cout, hh, ww).permute(0, 2, 3, 1)
    return y + params["b"]


def style_mapping_torch(params, z, cfg: ModelConfig, labels=None):
    lr_mul = cfg.style.mapping_lr_mul
    x = z * torch.rsqrt((z**2).mean(dim=-1, keepdim=True) + 1e-8)
    if cfg.num_classes:
        e = params["class_embed"][labels]
        e = e * torch.rsqrt((e**2).mean(dim=-1, keepdim=True) + 1e-8)
        x = torch.cat([x, e], dim=-1)
    for layer in params["layers"]:
        x = _act_gain(eq_dense_torch(layer, x, lr_mul), cfg)
    return x


def style_generator_forward(params, cfg: ModelConfig, z, labels=None,
                            ws=None, noise=None):
    """`ws`: optional per-layer styles — a list of (n, w_dim) tensors in
    the JAX side's global layer order (stage-major convs, to-RGB last) —
    the style-mixing form. `noise`: optional per-layer noise planes (same
    indexing, broadcastable to the conv output) added as
    `noise_strength * plane` before each conv's activation."""
    resolutions = cfg.stage_resolutions()
    wlat = style_mapping_torch(params["mapping"], z, cfg, labels)
    n = z.shape[0]
    w_at = (lambda li: wlat) if ws is None else (lambda li: ws[li])
    x = params["const"][None].expand(n, -1, -1, -1)
    for i, sp in enumerate(params["stages"]):
        if i > 0:
            x = upsample(x)
        for j, conv_p in enumerate(sp["convs"]):
            li = i * cfg.blocks_per_stage + j
            y = modulated_conv_torch(conv_p, x, w_at(li),
                                     cfg.style.demodulate)
            if noise is not None:
                y = y + conv_p["noise_strength"] * noise[li]
            x = _act_gain(y, cfg)
        if cfg.attention_at(resolutions[i]):
            x = attention(sp["attn"], x, cfg)
    num_ws = len(params["stages"]) * cfg.blocks_per_stage + 1
    y = modulated_conv_torch(params["rgb"], x, w_at(num_ws - 1),
                             demodulate=False)
    return torch.tanh(y)


def to_torch_params(tree):
    """Our params pytree -> torch tensors (requires_grad on leaves)."""
    if isinstance(tree, dict):
        return {k: to_torch_params(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [to_torch_params(v) for v in tree]
    if tree is None:
        return tree
    out = t(tree)
    out.requires_grad_(True)
    return out
