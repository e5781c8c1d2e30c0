"""Scripted bf16 kernel sweep vs XLA oracles on the REAL TPU backend
(VERDICT r3 #6; CLAUDE.md: "bf16-only bugs are invisible to the fp32
suite").

Runs every Pallas kernel family in the production bf16 numerics (f32
params, bf16 activations) against its pure-XLA oracle, forward AND
backward, tolerance-asserted:

* fused_stage via the production stage builders (nn/blocks.py), covering
  mode in {conv-only, sigmoid, softmax} x resample in {upsample,
  downsample, plain} x {fwd, grads wrt x and every param leaf} — the
  generator head (upsample+conv[+gate]), the mid-stage plain block
  (bps=2), and the discriminator tail (conv+gate+downsample);
* fused_locate_attention (standalone gate kernel) vs
  locate_attention_xla_core, both modes;
* flash_attention vs attention_reference.

Usage:
    python scripts/bf16_kernel_sweep.py              # real TPU backend
    python scripts/bf16_kernel_sweep.py --interpret  # CPU interpret smoke
    python scripts/bf16_kernel_sweep.py --out docs/bf16_sweep.json

Tolerance discipline: a bf16 kernel cannot be asserted against a bf16
oracle with a bare relative bound — (a) softmax gates are shift-
invariant, so the true grad of the logit bias is ~0 and any relative
metric explodes on rounding noise, and (b) both sides carry bf16
cancellation noise on small-norm leaves. Instead each config computes an
FP32 ORACLE ground truth and asserts, per tensor with a scale-floored
denominator, that the fused-bf16 error does not exceed
max(ERR_FACTOR x the bf16-oracle's own error, --tol): the kernel may be
noisier than the XLA bf16 path only by a bounded factor, and tiny-norm
tensors are judged on the gradient's global scale, not their own.
Exit code 0 = all checks passed.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ERR_FACTOR = 2.0  # fused may be at most this factor noisier than XLA-bf16


def _norm(a) -> float:
    return float(np.linalg.norm(np.asarray(a, np.float64).ravel()))


def floored_rel(got, truth, gscale: float) -> float:
    """||got - truth|| / max(||truth||, 1e-3 * gscale): tiny-norm tensors
    (e.g. the ~0 softmax logit-bias grad) are judged on the global grad
    scale instead of their own vanishing norm."""
    t = np.asarray(truth, np.float64).ravel()
    denom = max(float(np.linalg.norm(t)), 1e-3 * gscale, 1e-12)
    return float(np.linalg.norm(np.asarray(got, np.float64).ravel() - t)) / denom


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="force CPU backend + interpret-mode kernels (smoke)")
    ap.add_argument("--tol", type=float, default=3e-2)
    ap.add_argument("--out", type=str, default="",
                    help="write the result table as JSON here")
    ap.add_argument("--res", type=int, default=64,
                    help="stage input resolution (fused kernels run on "
                         "(res x res) tiles; gates are bypassed)")
    args = ap.parse_args()

    if args.interpret:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    if not args.interpret and platform == "cpu":
        print("ERROR: real-backend sweep requested but backend is CPU; "
              "pass --interpret for the CPU smoke mode", file=sys.stderr)
        return 2

    from locate_tpu.config import AttentionConfig, ModelConfig
    from locate_tpu.nn import blocks
    from locate_tpu.nn.blocks import discriminator_stage, generator_stage
    from locate_tpu.ops.pallas import fused_attention as fa
    from locate_tpu.ops.pallas import flash_attention as fla

    # Kernels normally dispatch only at >= 512^2 locations; the sweep pins
    # numerics, not the gate, so force fusion at sweep sizes.
    blocks.FUSE_MIN_LOCATIONS = 0
    if args.interpret:
        # route every pallas_call through the interpreter
        import locate_tpu.ops.pallas.fused_stage as fs
        fs.INTERPRET_DEFAULT = getattr(fs, "INTERPRET_DEFAULT", False)

    tol = args.tol
    results = []
    failures = []

    def record(name, kind, ef, eo, ok):
        results.append({"check": name, "kind": kind,
                        "fused_vs_f32": ef, "xla_bf16_vs_f32": eo,
                        "ok": bool(ok)})
        if not ok:
            failures.append(
                f"{name} [{kind}] fused_err={ef:.3e} > "
                f"max({ERR_FACTOR}x oracle_err={eo:.3e}, {tol})")
        print(f"  {name:58s} {kind:4s} fused_err={ef:.3e} "
              f"xla_bf16_err={eo:.3e} {'ok' if ok else 'FAIL'}", flush=True)

    def check_pair(name, f_apply, o_apply, params, x):
        """fwd + grads (wrt x and every param leaf): fused-bf16 and
        oracle-bf16 each against the FP32 oracle truth."""
        cot_key = jax.random.PRNGKey(99)

        def loss(apply_fn):
            def fn(p, xx):
                y = apply_fn(p, xx)
                cot = jax.random.normal(cot_key, y.shape, jnp.float32)
                return (y.astype(jnp.float32) * cot).sum()
            return fn

        def to_f32(t):
            return jax.tree.map(
                lambda a: a.astype(jnp.float32)
                if a.dtype == jnp.bfloat16 else a, t)

        p32, x32 = to_f32(params), to_f32(x)
        t0 = time.perf_counter()
        yf = jax.jit(f_apply)(params, x)
        yo = jax.jit(o_apply)(params, x)
        yt = jax.jit(o_apply)(p32, x32)  # fp32 ground truth
        jax.block_until_ready((yf, yo, yt))
        ys = _norm(yt)
        ef, eo = floored_rel(yf, yt, ys), floored_rel(yo, yt, ys)
        record(name, "fwd", ef, eo, ef <= max(ERR_FACTOR * eo, tol))

        gf = jax.jit(jax.grad(loss(f_apply), argnums=(0, 1)))(params, x)
        go = jax.jit(jax.grad(loss(o_apply), argnums=(0, 1)))(params, x)
        gt = jax.jit(jax.grad(loss(o_apply), argnums=(0, 1)))(p32, x32)
        jax.block_until_ready((gf, go, gt))
        gscale = max(_norm(leaf) for leaf in jax.tree.leaves(gt))
        worst_ef, worst_eo, ok = 0.0, 0.0, True
        for a, b, t in zip(jax.tree.leaves(gf), jax.tree.leaves(go),
                           jax.tree.leaves(gt)):
            lef = floored_rel(a, t, gscale)
            leo = floored_rel(b, t, gscale)
            if lef > max(ERR_FACTOR * leo, tol):
                ok = False
            if lef > worst_ef:
                worst_ef, worst_eo = lef, leo
        record(name, "bwd", worst_ef, worst_eo, ok)
        print(f"    ({time.perf_counter() - t0:.1f}s)", flush=True)

    res = args.res

    def model_cfg(mode, **kw):
        base = dict(
            resolution=max(res * 2, 64),
            base_channels=128, max_channels=128, min_channels=128,
            attention=AttentionConfig(pos_features=8, bottleneck=4,
                                      mode=mode),
            use_pallas=True,
        )
        base.update(kw)
        return ModelConfig(**base)

    def stage_pair(builder, cfg, in_ch, out_ch, r, **kw):
        f = builder(in_ch, out_ch, r, cfg, **kw)
        o = builder(in_ch, out_ch, r,
                    dataclasses.replace(cfg, use_pallas=False), **kw)
        return f, o

    def nudged_init(layer, key, scale=0.01):
        p = layer.init(key)
        # attention logits are zero-init -> nudge so gates are non-trivial
        return jax.tree.map(
            lambda q: q + scale * jnp.sin(
                jnp.arange(q.size, dtype=jnp.float32)).reshape(q.shape),
            p,
        )

    key = jax.random.PRNGKey(0)
    print(f"bf16 kernel sweep: backend={platform} res={res} tol={tol}",
          flush=True)

    # --- fused_stage families via the production stage builders -------
    print("[fused_stage via nn/blocks stages]", flush=True)
    for mode in ("sigmoid", "softmax"):
        cfg = model_cfg(mode)
        # generator head: upsample + conv block + gate, one kernel (bps=1)
        f, o = stage_pair(generator_stage, cfg, 128, 128, res, first=False)
        p = nudged_init(o, key)
        x = jax.random.normal(key, (2, res // 2, res // 2, 128), jnp.bfloat16)
        check_pair(f"gen_stage up+conv+{mode} {res}^2", f.apply, o.apply, p, x)

        # discriminator tail: conv block + gate + downsample, one kernel
        f, o = stage_pair(discriminator_stage, cfg, 128, 128, res, last=False)
        p = nudged_init(o, key)
        x = jax.random.normal(key, (2, res, res, 128), jnp.bfloat16)
        check_pair(f"disc_stage conv+{mode}+down {res}^2", f.apply, o.apply,
                   p, x)

    # bps=2 generator: block 1 = upsample+conv (CONV-ONLY fusion, no gate),
    # block 2 = plain-resolution conv+gate — covers the plain-resample and
    # gate-free kernel variants in one stage.
    cfg = model_cfg("sigmoid", blocks_per_stage=2)
    f, o = stage_pair(generator_stage, cfg, 128, 128, res, first=False)
    p = nudged_init(o, key)
    x = jax.random.normal(key, (2, res // 2, res // 2, 128), jnp.bfloat16)
    check_pair(f"gen_stage bps2 (up+conv | conv+sigmoid) {res}^2",
               f.apply, o.apply, p, x)

    cfg = model_cfg("softmax", blocks_per_stage=2)
    f, o = stage_pair(discriminator_stage, cfg, 128, 128, res, last=False)
    p = nudged_init(o, key)
    x = jax.random.normal(key, (2, res, res, 128), jnp.bfloat16)
    check_pair(f"disc_stage bps2 (conv+softmax | conv+down) {res}^2",
               f.apply, o.apply, p, x)

    # gate_max clamp ACTIVE (ADVICE r4: the masked-dg backward path needs
    # bf16 coverage) — hot logit init so a solid fraction of gates exceed
    # the bound and the clamp subgradient actually fires.
    for mode in ("sigmoid", "softmax"):
        cfg = model_cfg(mode, attention=AttentionConfig(
            pos_features=8, bottleneck=4, mode=mode, gate_max=1.5))
        f, o = stage_pair(discriminator_stage, cfg, 128, 128, res,
                          last=False)
        p = nudged_init(o, key, scale=0.2)
        x = jax.random.normal(key, (2, res, res, 128), jnp.bfloat16)
        check_pair(f"disc_stage conv+{mode}+down gate_max1.5 {res}^2",
                   f.apply, o.apply, p, x)

        f, o = stage_pair(generator_stage, cfg, 128, 128, res, first=False)
        p = nudged_init(o, key, scale=0.2)
        x = jax.random.normal(key, (2, res // 2, res // 2, 128),
                              jnp.bfloat16)
        check_pair(f"gen_stage up+conv+{mode} gate_max1.5 {res}^2",
                   f.apply, o.apply, p, x)

    # attention disabled entirely: pure conv-block fusion both directions
    cfg = model_cfg("sigmoid", attention_stages=())
    f, o = stage_pair(generator_stage, cfg, 128, 128, res, first=False)
    p = nudged_init(o, key)
    x = jax.random.normal(key, (2, res // 2, res // 2, 128), jnp.bfloat16)
    check_pair(f"gen_stage up+conv (no attn) {res}^2", f.apply, o.apply, p, x)

    f, o = stage_pair(discriminator_stage, cfg, 128, 128, res, last=False)
    p = nudged_init(o, key)
    x = jax.random.normal(key, (2, res, res, 128), jnp.bfloat16)
    check_pair(f"disc_stage conv+down (no attn) {res}^2", f.apply, o.apply,
               p, x)

    # --- standalone fused_locate_attention kernel ----------------------
    print("[fused_locate_attention]", flush=True)
    h = w = res
    c, hd = 128, 32
    kx, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 4)
    x4 = jax.random.normal(kx, (2, h, w, c), jnp.bfloat16)
    pos = 0.1 * jax.random.normal(k1, (h * w, hd), jnp.float32)
    w1x = 0.1 * jax.random.normal(k2, (c, hd), jnp.float32)
    b1 = jnp.zeros((hd,), jnp.float32)
    w2 = 0.1 * jax.random.normal(k3, (hd, c), jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    for mode in ("sigmoid", "softmax"):
        def f_apply(p, xx, _mode=mode):
            return fa.fused_locate_attention(
                xx, p["pos"], p["w1x"], p["b1"], p["w2"], p["b2"],
                mode=_mode, interpret=args.interpret)

        def o_apply(p, xx, _mode=mode):
            n, hh, ww, cc = xx.shape
            y = fa.locate_attention_xla_core(
                xx.reshape(n, hh * ww, cc), p["pos"], p["w1x"], p["b1"],
                p["w2"], p["b2"], mode=_mode, act="leaky_relu",
                leaky_slope=0.2, hw_scale=float(hh * ww))
            return y.reshape(xx.shape)

        pp = {"pos": pos, "w1x": w1x, "b1": b1, "w2": w2, "b2": b2}
        check_pair(f"locate_attention {mode} {h}x{w}xC{c}", f_apply, o_apply,
                   pp, x4)

    # standalone kernel with the clamp active: 5x-hotter gate-MLP weights
    # so random inputs saturate gate_max=1.5 in both modes.
    for mode in ("sigmoid", "softmax"):
        def f_apply(p, xx, _mode=mode):
            return fa.fused_locate_attention(
                xx, p["pos"], p["w1x"], p["b1"], p["w2"], p["b2"],
                mode=_mode, gate_max=1.5, interpret=args.interpret)

        def o_apply(p, xx, _mode=mode):
            n, hh, ww, cc = xx.shape
            y = fa.locate_attention_xla_core(
                xx.reshape(n, hh * ww, cc), p["pos"], p["w1x"], p["b1"],
                p["w2"], p["b2"], mode=_mode, act="leaky_relu",
                leaky_slope=0.2, hw_scale=float(hh * ww), gate_max=1.5)
            return y.reshape(xx.shape)

        pp = {"pos": pos, "w1x": 5.0 * w1x, "b1": b1, "w2": 5.0 * w2,
              "b2": b2}
        check_pair(f"locate_attention {mode} gate_max1.5 {h}x{w}xC{c}",
                   f_apply, o_apply, pp, x4)

    # --- flash self-attention ------------------------------------------
    print("[flash_attention]", flush=True)
    b, t, dh = 2, 1024, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(11), 3)
    scale = 1.0 / float(np.sqrt(dh))
    qkv = {
        "q": jax.random.normal(kq, (b, t, dh), jnp.bfloat16),
        "k": jax.random.normal(kk, (b, t, dh), jnp.bfloat16),
        "v": jax.random.normal(kv, (b, t, dh), jnp.bfloat16),
    }

    def flash_apply(p, _unused):
        return fla.flash_attention(p["q"], p["k"], p["v"], scale=scale,
                                   interpret=args.interpret)

    def ref_apply(p, _unused):
        return fla.attention_reference(p["q"], p["k"], p["v"], scale=scale)

    check_pair(f"flash_attention B{b} T{t} dh{dh}", flash_apply, ref_apply,
               qkv, jnp.zeros((1,), jnp.bfloat16))

    # --- report ----------------------------------------------------------
    n_ok = sum(r["ok"] for r in results)
    print(f"\n{n_ok}/{len(results)} checks passed "
          f"(backend={platform}, tol={tol})")
    payload = {
        "backend": platform,
        "interpret": bool(args.interpret),
        "tol": tol,
        "res": res,
        "passed": n_ok,
        "total": len(results),
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {args.out}")
    if failures:
        print("FAILURES:\n  " + "\n  ".join(failures), file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
