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
