"""CLI bench-command smoke tests (the driver-facing bench.py is exercised
on the chip; these pin the in-package bench commands' plumbing on CPU)."""

import json

from locate_tpu import cli


def run_cmd(capsys, *argv):
    rc = cli.main(list(argv))
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


TINY = [
    "model.base_channels=32", "model.max_channels=32",
    "model.min_channels=16", "model.latent_dim=16",
    "model.resolution=16", "data.resolution=16",
    "data.dataset=synthetic", "train.compute_dtype=float32",
]


def test_bench_sample_cli(capsys):
    d = run_cmd(
        capsys, "bench-sample", "cifar10_32", *TINY,
        "--batch", "4", "--steps", "2",
    )
    assert d["unit"] == "images/sec" and d["value"] > 0
    assert "sampling" in d["metric"]


def test_bench_input_cli(capsys):
    d = run_cmd(
        capsys, "bench-input", "cifar10_32", *TINY,
        "train.global_batch=8", "--batches", "3",
    )
    assert d["unit"] == "images/sec" and d["value"] > 0


def test_eval_cli_stats_flags(capsys, tmp_path):
    """The eval CLI's FID stats escape hatch end to end: train 2 tiny
    steps, eval with --stats-out/--real-stats-out/--features-out, then
    re-eval against the minted --ref-stats and get the SAME fid."""
    import numpy as np

    wd = str(tmp_path / "run")
    common = [
        "cifar10_32", *TINY, "train.global_batch=8", f"workdir={wd}",
    ]
    rc = cli.main([
        "train", *common, "train.total_steps=2", "train.log_every=1",
        "train.sample_every=0", "train.checkpoint_every=2",
        "train.eval_every=0",
    ])
    assert rc == 0
    stats = str(tmp_path / "gen_stats.npz")
    real_stats = str(tmp_path / "ref_stats.npz")
    feats = str(tmp_path / "feats.npz")
    d = run_cmd(
        capsys, "eval", *common, "--samples", "32",
        f"--stats-out={stats}", f"--real-stats-out={real_stats}",
        f"--features-out={feats}",
    )
    assert d["fid"] > 0 and d["stats_out"] == stats
    fz = np.load(feats)
    assert {"fake_features", "real_features"} <= set(fz.files)
    assert np.load(stats)["mu"].ndim == 1
    # same extractor + minted real stats => identical FID, no dataset
    d2 = run_cmd(
        capsys, "eval", *common, "--samples", "32",
        f"--ref-stats={real_stats}",
    )
    np.testing.assert_allclose(d2["fid"], d["fid"], rtol=1e-9)
    assert d2["kid"] is None and d2["real_side"] == "ref_stats"
