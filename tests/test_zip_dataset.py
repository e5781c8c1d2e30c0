"""Zip-archive dataset (data.dataset="zip" — the StyleGAN2-ADA
dataset_tool.py format: image members + optional dataset.json labels,
read in place without extraction)."""

import dataclasses
import json
import zipfile

import numpy as np
import pytest

from locate_tpu.data.datasets import ImageFolder, ZipImages, make_dataset
from locate_tpu.data.pipeline import make_input_pipeline


def _png_bytes(rng, size=(20, 14)):
    import io

    from PIL import Image

    arr = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _write_zip(path, n=6, labels=None, subdirs=None, extra=()):
    rng = np.random.default_rng(0)
    with zipfile.ZipFile(path, "w") as zf:
        names = []
        for i in range(n):
            name = (f"{subdirs[i % len(subdirs)]}/img{i:03d}.png"
                    if subdirs else f"img{i:03d}.png")
            zf.writestr(name, _png_bytes(rng))
            names.append(name)
        for name, data in extra:
            zf.writestr(name, data)
        if labels is not None:
            zf.writestr(
                "dataset.json",
                json.dumps({"labels": [[nm, int(l)]
                                       for nm, l in zip(names, labels)]}),
            )
    return names


def test_zip_with_dataset_json_labels(tmp_path):
    path = str(tmp_path / "ds.zip")
    _write_zip(path, n=6, labels=[0, 1, 2, 0, 1, 2],
               extra=[("README.txt", b"not an image")])
    ds = ZipImages(path, resolution=16)
    assert len(ds) == 6
    assert ds.num_classes == 3
    img, lab = ds.example(0)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert [int(ds.labels[i]) for i in range(6)] == [0, 1, 2, 0, 1, 2]


def test_zip_subdir_classes_without_json(tmp_path):
    path = str(tmp_path / "ds.zip")
    _write_zip(path, n=6, subdirs=["cat", "dog"])
    ds = ZipImages(path, resolution=8)
    assert ds.num_classes == 2
    # sorted member order: cat/* then dog/*
    assert set(np.unique(ds.labels)) == {0, 1}


def test_zip_matches_extracted_folder(tmp_path):
    """The decode protocol must be byte-identical to ImageFolder on the
    extracted archive (same center-crop + bilinear resize), so packing
    either source gives the same shards."""
    path = str(tmp_path / "ds.zip")
    names = _write_zip(path, n=4)
    out = tmp_path / "extracted"
    with zipfile.ZipFile(path) as zf:
        zf.extractall(out)
    z = ZipImages(path, resolution=16)
    f = ImageFolder(str(out), resolution=16)
    assert [n.split("/")[-1] for n in z.names] == [
        fp.split("/")[-1] for fp in f.files
    ]
    for i in range(4):
        zi, _ = z.example(i)
        fi, _ = f.example(i)
        np.testing.assert_array_equal(zi, fi)


def test_zip_through_factory_and_pipeline(tmp_path):
    from locate_tpu.config import DataConfig

    path = str(tmp_path / "ds.zip")
    _write_zip(path, n=8, labels=[0, 1] * 4)
    cfg = DataConfig(dataset="zip", path=path, resolution=8, num_classes=2)
    ds = make_dataset(cfg)
    assert isinstance(ds, ZipImages)
    # dataset="folder" pointed at a .zip file routes here too
    ds2 = make_dataset(dataclasses.replace(cfg, dataset="folder"))
    assert isinstance(ds2, ZipImages)
    pipe = make_input_pipeline(cfg, 4, seed=0)
    try:
        batch = next(iter(pipe))
        img = np.asarray(batch["image"])
        assert img.shape == (4, 8, 8, 3)
        assert img.dtype == np.uint8
    finally:
        pipe.close()


def test_zip_empty_raises(tmp_path):
    path = str(tmp_path / "empty.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("notes.txt", b"x")
    with pytest.raises(FileNotFoundError):
        ZipImages(path, resolution=8)
