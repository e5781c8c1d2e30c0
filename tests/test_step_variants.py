"""Step-variant tests: fused simultaneous step, hinge loss, LR schedules."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from locate_tpu.models.gan import build_gan
from locate_tpu.objectives.losses import d_hinge_loss, g_hinge_loss
from locate_tpu.train.state import create_train_state
from locate_tpu.train.step import make_train_step


def make_batch(cfg, key):
    img = jax.random.uniform(
        key, (cfg.train.global_batch, cfg.model.resolution, cfg.model.resolution, 3),
        minval=-1.0, maxval=1.0,
    )
    return {"image": img, "label": jnp.zeros((cfg.train.global_batch,), jnp.int32)}


def run_steps(cfg, n=6):
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    hist = []
    for _ in range(n):
        state, m = step(state, batch)
        hist.append({k: float(v) for k, v in m.items()})
    return state, hist


def test_fused_step_trains(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, fused_step=True)
    )
    state, hist = run_steps(cfg)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    assert hist[-1]["real_logits"] > hist[-1]["fake_logits"]
    assert int(state.step) == 6


def test_hinge_loss_golden():
    rs = np.random.RandomState(0)
    real = rs.randn(16).astype(np.float32)
    fake = rs.randn(16).astype(np.float32)
    ours_d = float(d_hinge_loss(jnp.asarray(real), jnp.asarray(fake)))
    ref_d = float(
        F.relu(1 - torch.from_numpy(real)).mean()
        + F.relu(1 + torch.from_numpy(fake)).mean()
    )
    np.testing.assert_allclose(ours_d, ref_d, rtol=1e-6)
    np.testing.assert_allclose(
        float(g_hinge_loss(jnp.asarray(fake))), float(-fake.mean()), rtol=1e-6
    )


def test_hinge_step_trains(tiny_config):
    cfg = dataclasses.replace(
        tiny_config, train=dataclasses.replace(tiny_config.train, loss="hinge")
    )
    _, hist = run_steps(cfg)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    assert hist[-1]["real_logits"] > hist[-1]["fake_logits"]


def test_warmup_cosine_schedule(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train,
            lr_schedule="linear_warmup_cosine",
            warmup_steps=2,
            total_steps=10,
        ),
    )
    _, hist = run_steps(cfg, n=3)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    # step 1 runs at warmup lr (tiny) -> params barely move vs default
    from locate_tpu.objectives.optim import make_schedule

    sched = make_schedule(cfg.train.g_opt.lr, cfg.train)
    assert float(sched(0)) < float(sched(2))
    assert float(sched(9)) < float(sched(2))


def test_multi_step_matches_sequential(tiny_config):
    """steps_per_call: one scan-of-k dispatch must reproduce k sequential
    single-step calls exactly (the scan body IS the single step), and the
    returned metrics must be the per-window mean."""
    from locate_tpu.train.step import make_multi_step

    cfg = tiny_config
    gan = build_gan(cfg)
    step = jax.jit(make_train_step(cfg, gan))
    multi = jax.jit(make_multi_step(make_train_step(cfg, gan), 2))

    batches = [make_batch(cfg, jax.random.PRNGKey(i)) for i in range(4)]

    s_seq = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    seq_hist = []
    for b in batches:
        s_seq, m = step(s_seq, b)
        seq_hist.append({k: float(v) for k, v in m.items()})

    s_scan = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    scan_hist = []
    for i in range(0, 4, 2):
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), batches[i], batches[i + 1]
        )
        s_scan, m = multi(s_scan, stacked)
        scan_hist.append({k: float(v) for k, v in m.items()})

    assert int(s_scan.step) == int(s_seq.step) == 4

    def assert_params_close(a, b):
        # The softmax gate's `to_logits.b` is a flat direction (shift-
        # invariant, true gradient exactly zero); Adam amplifies each
        # compilation's distinct reduction-order noise there to O(lr)
        # drift, so exclude it from the bitwise-ish comparison — the
        # functional check below covers it (a flat-direction shift never
        # changes the model's outputs).
        fa = jax.tree_util.tree_flatten_with_path(a)[0]
        fb = jax.tree.leaves(b)
        for (path, la), lb in zip(fa, fb):
            name = jax.tree_util.keystr(path)
            if "to_logits" in name and name.endswith("['b']"):
                continue
            np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-6, err_msg=name)

    assert_params_close(s_seq.g_params, s_scan.g_params)
    assert_params_close(s_seq.d_params, s_scan.d_params)
    # functional equality: both final generators map a fixed latent to the
    # same images (covers the excluded flat direction too)
    z = gan.sample_latents(jax.random.PRNGKey(9), 4)
    img_seq = gan.generator.apply(s_seq.g_params, z, None)
    img_scan = gan.generator.apply(s_scan.g_params, z, None)
    np.testing.assert_allclose(img_seq, img_scan, rtol=1e-4, atol=1e-5)
    # window metrics == mean of the two covered sequential steps
    for w, (a, b) in zip(scan_hist, [(0, 1), (2, 3)]):
        for key in ("d_loss", "g_loss"):
            np.testing.assert_allclose(
                w[key], (seq_hist[a][key] + seq_hist[b][key]) / 2,
                rtol=1e-5, err_msg=key,
            )


def test_steps_per_call_config_validation():
    import pytest

    from locate_tpu.config import TrainConfig

    with pytest.raises(ValueError, match="multiple of"):
        TrainConfig(steps_per_call=4, log_every=6)
    with pytest.raises(ValueError, match=">= 1"):
        TrainConfig(steps_per_call=0)
    TrainConfig(steps_per_call=4, log_every=8, sample_every=0,
                checkpoint_every=8, eval_every=0, total_steps=16)


def test_train_loop_steps_per_call(tiny_config, tmp_path):
    """End-to-end: the loop with steps_per_call=2 produces the same
    trajectory as the plain loop (same data order, same latent stream)."""
    from locate_tpu.train.loop import train

    def run(k):
        cfg = dataclasses.replace(
            tiny_config,
            train=dataclasses.replace(
                tiny_config.train, steps_per_call=k, log_every=2,
                total_steps=4, sample_every=0, checkpoint_every=0,
            ),
            workdir=str(tmp_path / f"k{k}"),
        )
        logged = []
        train(cfg, total_steps=4,
              hooks={"on_metrics": lambda s, m: logged.append((s, m))},
              resume=False)
        return logged

    l1, l2 = run(1), run(2)
    assert [s for s, _ in l1] == [s for s, _ in l2] == [2, 4]
    # k=1 logs instantaneous step metrics, k=2 logs window means, so the
    # values aren't directly comparable; the shared trajectory (same data
    # order, same latent stream) is pinned loosely here and exactly by
    # test_multi_step_matches_sequential above.
    m1 = {s: m for s, m in l1}
    m2 = {s: m for s, m in l2}
    np.testing.assert_allclose(m1[4]["d_loss"], m2[4]["d_loss"], rtol=0.2)
    assert np.isfinite(list(m2[4].values())).all()


def test_steps_per_call_override_order_independent():
    """get_config applies constraint-bearing overrides last, so users can
    pass steps_per_call before or after the cadences it validates
    against."""
    from locate_tpu.config import get_config

    ov = {
        "train.steps_per_call": "8",  # listed FIRST: still must not trip
        "train.log_every": "200",     # validation against preset log_every
        "train.sample_every": "2000",
        "train.checkpoint_every": "2000",
        "train.eval_every": "0",
        "train.total_steps": "100000",
    }
    cfg = get_config("celeba_64", ov)
    assert cfg.train.steps_per_call == 8 and cfg.train.log_every == 200


def test_multi_step_fused_flavor(tiny_config):
    """make_multi_step composes with the fused simultaneous step too: one
    scan-of-2 call == 2 sequential fused-step calls."""
    from locate_tpu.train.step import make_multi_step

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, fused_step=True),
    )
    gan = build_gan(cfg)
    step = jax.jit(make_train_step(cfg, gan))
    multi = jax.jit(make_multi_step(make_train_step(cfg, gan), 2))
    batches = [make_batch(cfg, jax.random.PRNGKey(i)) for i in range(2)]

    s_seq = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    for b in batches:
        s_seq, _ = step(s_seq, b)
    s_scan = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), batches[0], batches[1])
    s_scan, m = multi(s_scan, stacked)

    assert int(s_scan.step) == int(s_seq.step) == 2
    z = gan.sample_latents(jax.random.PRNGKey(9), 4)
    np.testing.assert_allclose(
        gan.generator.apply(s_seq.g_params, z, None),
        gan.generator.apply(s_scan.g_params, z, None),
        rtol=1e-4, atol=1e-5,
    )
    assert np.isfinite(list(jax.device_get(m).values())).all()


def test_wgan_loss_golden():
    from locate_tpu.objectives.losses import d_wgan_loss, g_wgan_loss

    rs = np.random.RandomState(0)
    real = rs.randn(16).astype(np.float32)
    fake = rs.randn(16).astype(np.float32)
    np.testing.assert_allclose(
        float(d_wgan_loss(jnp.asarray(real), jnp.asarray(fake))),
        float(torch.from_numpy(fake).mean() - torch.from_numpy(real).mean()),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(g_wgan_loss(jnp.asarray(fake))), float(-fake.mean()), rtol=1e-6
    )


def test_wgan_step_trains(tiny_config):
    """WGAN critic + R1 (the Lipschitz control the docstring prescribes):
    steps stay finite and the critic separates real from fake."""
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, loss="wgan", r1_gamma=0.1, r1_interval=1
        ),
    )
    _, hist = run_steps(cfg)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    assert hist[-1]["real_logits"] > hist[-1]["fake_logits"]


def test_gradient_penalty_linear_d():
    """For D(x) = <w, x> the gradient at ANY point (so any interpolate,
    any eps) is w, hence GP = (||w|| - 1)^2 exactly."""
    from locate_tpu.objectives.losses import gradient_penalty

    w = jnp.asarray(np.random.RandomState(0).randn(4, 4, 3).astype(np.float32))

    def d_apply(params, x, labels=None):
        return jnp.sum(x * params, axis=(1, 2, 3))

    rs = np.random.RandomState(1)
    real = jnp.asarray(rs.randn(3, 4, 4, 3).astype(np.float32))
    fake = jnp.asarray(rs.randn(3, 4, 4, 3).astype(np.float32))
    eps = jnp.asarray(rs.rand(3, 1, 1, 1).astype(np.float32))
    pen = float(gradient_penalty(d_apply, w, real, fake, eps))
    expect = (float(jnp.linalg.norm(w)) - 1.0) ** 2
    np.testing.assert_allclose(pen, expect, rtol=1e-5)


def test_gradient_penalty_golden_torch():
    """GP (value AND its d_params gradient — the part that trains) vs
    torch autograd's create_graph=True double backward on an identical
    tiny nonlinear critic."""
    from locate_tpu.objectives.losses import gradient_penalty

    rs = np.random.RandomState(0)
    w = rs.randn(4 * 4 * 3, 8).astype(np.float32)
    v = rs.randn(8).astype(np.float32)
    real = rs.randn(5, 4, 4, 3).astype(np.float32)
    fake = rs.randn(5, 4, 4, 3).astype(np.float32)
    eps = rs.rand(5, 1, 1, 1).astype(np.float32)

    def d_apply(params, x, labels=None):
        h = jnp.tanh(x.reshape(x.shape[0], -1) @ params["w"])
        return h @ params["v"]

    params = {"w": jnp.asarray(w), "v": jnp.asarray(v)}

    def pen_fn(p):
        return gradient_penalty(
            d_apply, p, jnp.asarray(real), jnp.asarray(fake),
            jnp.asarray(eps)
        )

    pen, grads = jax.value_and_grad(pen_fn)(params)

    wt = torch.from_numpy(w.copy()).requires_grad_(True)
    vt = torch.from_numpy(v.copy()).requires_grad_(True)
    x_hat = (
        torch.from_numpy(eps) * torch.from_numpy(real)
        + (1 - torch.from_numpy(eps)) * torch.from_numpy(fake)
    ).requires_grad_(True)
    score = (torch.tanh(x_hat.reshape(5, -1) @ wt) @ vt).sum()
    (gx,) = torch.autograd.grad(score, x_hat, create_graph=True)
    norms = torch.sqrt(gx.pow(2).sum(dim=(1, 2, 3)) + 1e-12)
    pen_t = ((norms - 1.0) ** 2).mean()
    pen_t.backward()
    np.testing.assert_allclose(float(pen), float(pen_t.detach()), rtol=1e-5)
    np.testing.assert_allclose(  # fp32 double-backward noise: ~5e-6 abs
        np.asarray(grads["w"]), wt.grad.numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads["v"]), vt.grad.numpy(), rtol=1e-3, atol=1e-5
    )


def test_wgan_gp_step_trains(tiny_config):
    """The classic WGAN-GP recipe (train.loss=wgan train.gp_gamma=10):
    finite steps, gp metric present and driven, critic separates."""
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, loss="wgan", gp_gamma=10.0
        ),
    )
    _, hist = run_steps(cfg)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    # a fresh-init critic is far from unit-gradient, so the penalty is
    # strictly positive (6 Adam steps at 2e-4 are NOT enough to assert a
    # monotone decrease — only that the term exists and is live)
    assert hist[0]["gp"] > 0.0
    assert hist[-1]["real_logits"] > hist[-1]["fake_logits"]


def test_feature_matching_golden_torch(tiny_config):
    """D's return_features output and the FM loss (value + G-side grad
    path via feats(fake)) vs the torch twin."""
    import torch_twin as tw
    from locate_tpu.models.discriminator import build_discriminator

    cfg = tiny_config.model
    disc = build_discriminator(cfg)
    params = disc.init(jax.random.PRNGKey(0))
    real = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3),
                           minval=-1.0, maxval=1.0), np.float32
    )
    fake = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (4, 16, 16, 3),
                           minval=-1.0, maxval=1.0), np.float32
    )

    def fm(p):
        _, f_fake = disc.apply(p, jnp.asarray(fake), None,
                               return_features=True)
        _, f_real = disc.apply(p, jnp.asarray(real), None,
                               return_features=True)
        f_real = jax.lax.stop_gradient(f_real)
        return jnp.mean(
            (jnp.mean(f_real, 0) - jnp.mean(f_fake, 0)) ** 2
        )

    val = float(fm(params))

    tp = tw.to_torch_params(jax.tree.map(np.asarray, params))
    _, tf_fake = tw.discriminator_forward(
        tp, cfg, tw.t(fake), return_features=True
    )
    _, tf_real = tw.discriminator_forward(
        tp, cfg, tw.t(real), return_features=True
    )
    val_t = ((tf_real.detach().mean(0) - tf_fake.mean(0)) ** 2).mean()
    np.testing.assert_allclose(val, float(val_t.detach()), rtol=2e-4,
                               atol=1e-6)


def test_feature_matching_step_trains(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, feature_matching=1.0),
    )
    _, hist = run_steps(cfg)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    assert hist[0]["fm"] > 0.0
    cfg_off = tiny_config
    _, hist_off = run_steps(cfg_off)
    assert hist[-1]["g_loss"] != hist_off[-1]["g_loss"]


def test_feature_matching_dp_matches_single_device(tiny_config):
    """FM's pmean'd global-batch feature means: 8-device GSPMD trajectory
    == single device (the scaling comment in fm_term is load-bearing)."""
    from locate_tpu.config import ParallelConfig
    from locate_tpu.parallel.mesh import make_mesh, single_device_mesh
    from test_parallel import run_steps as run_mesh_steps

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(tiny_config.train, feature_matching=1.0),
        parallel=ParallelConfig(),
    )
    _, h1 = run_mesh_steps(cfg, single_device_mesh(cfg.parallel), n_steps=2)
    _, h8 = run_mesh_steps(cfg, make_mesh(cfg.parallel), n_steps=2)
    for a, b in zip(h1, h8):
        for k in ("d_loss", "g_loss", "fm"):
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)


def test_path_lengths_linear_g():
    """For G(z) = reshape(z @ W), J^T y = (flat y) @ W^T exactly — the
    vjp-based lengths must match the closed form."""
    from locate_tpu.objectives.losses import path_lengths

    rs = np.random.RandomState(0)
    latent, h, w, c = 6, 4, 4, 3
    W = rs.randn(latent, h * w * c).astype(np.float32)
    z = rs.randn(5, latent).astype(np.float32)

    def g_apply(params, zz, labels=None):
        return (zz @ params).reshape(zz.shape[0], h, w, c)

    key = jax.random.PRNGKey(3)
    lengths = np.asarray(
        path_lengths(g_apply, jnp.asarray(W), jnp.asarray(z), None, key)
    )
    y = np.asarray(
        jax.random.normal(key, (5, h, w, c), jnp.float32)
    ) / np.sqrt(h * w)
    jt_y = y.reshape(5, -1) @ W.T
    np.testing.assert_allclose(
        lengths, np.sqrt((jt_y**2).sum(-1) + 1e-12), rtol=1e-5
    )


def test_path_length_reg_golden_torch():
    """d/dparams of mean((||J^T y|| - b)^2) for a tanh MLP generator vs
    torch's create_graph double backward (the trainable part of PL reg)."""
    from locate_tpu.objectives.losses import path_lengths

    rs = np.random.RandomState(1)
    latent, h, w, c = 4, 2, 2, 3
    W = rs.randn(latent, h * w * c).astype(np.float32)
    z = rs.randn(3, latent).astype(np.float32)
    b = 0.7

    def g_apply(params, zz, labels=None):
        return jnp.tanh(zz @ params).reshape(zz.shape[0], h, w, c)

    key = jax.random.PRNGKey(5)
    y = np.asarray(jax.random.normal(key, (3, h, w, c), jnp.float32))
    y = y / np.sqrt(h * w)

    def pen_fn(p):
        lengths = path_lengths(g_apply, p, jnp.asarray(z), None, key)
        return jnp.mean((lengths - b) ** 2)

    pen, grad = jax.value_and_grad(pen_fn)(jnp.asarray(W))

    Wt = torch.from_numpy(W.copy()).requires_grad_(True)
    zt = torch.from_numpy(z.copy()).requires_grad_(True)
    out = torch.tanh(zt @ Wt).reshape(3, -1)
    yt = torch.from_numpy(y.reshape(3, -1).copy())
    (jt_y,) = torch.autograd.grad(
        (out * yt).sum(), zt, create_graph=True
    )
    lengths_t = torch.sqrt(jt_y.pow(2).sum(-1) + 1e-12)
    pen_t = ((lengths_t - b) ** 2).mean()
    pen_t.backward()
    np.testing.assert_allclose(float(pen), float(pen_t.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad), Wt.grad.numpy(), rtol=1e-3, atol=1e-5
    )


def test_pl_reg_step_trains(tiny_config):
    """train.pl_gamma: lazy PL reg fires on pl_interval steps, pl_mean
    enters TrainState and moves, non-firing steps leave it unchanged."""
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, pl_gamma=2.0, pl_interval=2
        ),
    )
    gan = build_gan(cfg)
    state = create_train_state(cfg, gan, jax.random.PRNGKey(0))
    assert state.pl_mean is not None and float(state.pl_mean) == 0.0
    step = jax.jit(make_train_step(cfg, gan))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    hist, means = [], []
    for _ in range(4):
        state, m = step(state, batch)
        hist.append({k: float(v) for k, v in m.items()})
        means.append(float(state.pl_mean))
    assert all(np.isfinite(list(h.values())).all() for h in hist)
    # fires at steps 0 and 2 (step % 2 == 0): pl_mean moves there and is
    # carried unchanged on steps 1 and 3
    assert means[0] > 0.0
    assert means[1] == means[0]
    assert means[2] != means[1]
    assert means[3] == means[2]
    assert hist[1]["pl"] == 0.0  # lazy: no penalty off-interval


def test_clip_grad_norm(tiny_config):
    """d_opt.clip_grad_norm: the observed post-clip update direction obeys
    the cap — pinned by comparing one step against manually clipped optax
    updates; and the full step trains finite."""
    import optax
    from locate_tpu.objectives.optim import make_optimizers

    clip = 1e-3
    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train,
            d_opt=dataclasses.replace(tiny_config.train.d_opt,
                                      clip_grad_norm=clip),
            g_opt=dataclasses.replace(tiny_config.train.g_opt,
                                      clip_grad_norm=clip),
        ),
    )
    g_opt, d_opt = make_optimizers(cfg.train)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 100.0), "b": jnp.full((4,), 100.0)}
    st = d_opt.init(params)
    updates, _ = d_opt.update(grads, st, params)
    # reference: clip first, then the plain adam chain
    ref_opt = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adam(cfg.train.d_opt.lr, b1=cfg.train.d_opt.beta1,
                   b2=cfg.train.d_opt.beta2, eps=cfg.train.d_opt.eps),
    )
    ref_updates, _ = ref_opt.update(grads, ref_opt.init(params), params)
    for k in updates:
        np.testing.assert_allclose(np.asarray(updates[k]),
                                   np.asarray(ref_updates[k]), rtol=1e-6)

    _, hist = run_steps(cfg, n=3)
    assert all(np.isfinite(list(h.values())).all() for h in hist)
