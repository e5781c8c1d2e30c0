"""`locate-tpu compare` — model-free dataset-vs-dataset metrics (the
pytorch-fid workflow): identical sources give all-zero scores, different
sources are detected, path->reader inference works for folder/zip."""

import io
import json
import zipfile

import numpy as np
import pytest
from PIL import Image

from locate_tpu.cli import _infer_dataset_kind, main


def _write_folder(root, n, key, size=24):
    rng = np.random.default_rng(key)
    root.mkdir(exist_ok=True)
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"im{i:03d}.png")
    return str(root)


def _run(capsys, args):
    assert main(["compare"] + args) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_compare_identical_sources_zero(tmp_path, capsys):
    a = _write_folder(tmp_path / "a", 12, key=0)
    r = _run(capsys, [f"--a={a}", f"--b={a}", "--resolution=16",
                      "--samples=8", "--swd"])
    # same path + same seed -> identical sampled image sets. FID/SWD are
    # exact on identical sets; KID's unbiased MMD estimator excludes
    # diagonal terms so it only approaches 0 (small |value|, either sign).
    assert abs(r["fid"]) < 1e-3
    assert abs(r["kid"]) < 0.05
    assert r["swd_avg"] == 0.0
    assert r["a"]["kind"] == "folder" and r["a"]["n"] == 8


def test_compare_detects_difference_and_zip_inference(tmp_path, capsys):
    a = _write_folder(tmp_path / "a", 12, key=0)
    # structurally different set, shipped as a zip
    zpath = tmp_path / "b.zip"
    rng = np.random.default_rng(7)
    with zipfile.ZipFile(zpath, "w") as zf:
        for i in range(12):
            arr = np.zeros((24, 24, 3), np.uint8)
            arr[:, ::2, :] = rng.integers(200, 256)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            zf.writestr(f"im{i:03d}.png", buf.getvalue())
    r = _run(capsys, [f"--a={a}", f"--b={zpath}", "--resolution=16",
                      "--samples=8", "--swd", "--prdc-k=2"])
    assert r["b"]["kind"] == "zip"
    assert r["fid"] > 1.0
    assert r["swd_avg"] > 1.0
    assert set(r) >= {"precision", "recall", "density", "coverage"}


def test_infer_dataset_kind(tmp_path):
    assert _infer_dataset_kind("x/ds.zip") == "zip"
    assert _infer_dataset_kind("x/data.tfrecords") == "tfrecord"
    assert _infer_dataset_kind("x/env.mdb") == "lsun"
    d = tmp_path / "packed"
    d.mkdir()
    (d / "meta.json").write_text("{}")
    assert _infer_dataset_kind(str(d)) == "packed"
    assert _infer_dataset_kind(str(tmp_path)) == "folder"


def test_compare_usage_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["compare", "--a=x"])  # missing --b
    with pytest.raises(SystemExit):
        main(["compare", "--a=x", "--b=y", "train.seed=1"])  # no overrides
