"""Input pipeline tests (SURVEY.md §4.5): dataset sources, producer thread,
sharding disjointness, device prefetch."""

import numpy as np
import pytest
from PIL import Image

from locate_tpu.config import DataConfig
from locate_tpu.data.datasets import ImageFolder, SyntheticImages, make_dataset
from locate_tpu.data.pipeline import BatchProducer, device_prefetch, make_input_pipeline


def test_synthetic_deterministic():
    ds = SyntheticImages(16, 3, length=100)
    a1, l1 = ds.example(7)
    a2, _ = ds.example(7)
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == (16, 16, 3) and a1.dtype == np.uint8
    b, _ = ds.example(8)
    assert not np.array_equal(a1, b)


def test_synthetic_class_palette():
    ds = SyntheticImages(16, 3, length=100, num_classes=4)
    _, l1 = ds.example(5)
    assert l1 == 5 % 4


def test_image_folder(tmp_path):
    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            arr = np.random.RandomState(i).randint(0, 255, (20, 30, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    ds = ImageFolder(str(tmp_path), resolution=16)
    assert len(ds) == 6 and ds.num_classes == 2
    img, label = ds.example(0)
    assert img.shape == (16, 16, 3) and label in (0, 1)


def test_producer_batches_and_shapes():
    ds = SyntheticImages(16, 3, length=64)
    prod = BatchProducer(ds, 8, seed=0, random_flip=True)
    it = iter(prod)
    b = next(it)
    assert b["image"].shape == (8, 16, 16, 3) and b["image"].dtype == np.uint8
    assert b["label"].shape == (8,)
    prod.close()


def test_shards_disjoint():
    """Two shards of the same epoch see disjoint example indices (checked
    via the deterministic per-index images)."""
    ds = SyntheticImages(16, 3, length=32)
    p0 = BatchProducer(ds, 16, shard_index=0, shard_count=2, seed=3, random_flip=False)
    p1 = BatchProducer(ds, 16, shard_index=1, shard_count=2, seed=3, random_flip=False)
    b0 = next(iter(p0))["image"]
    b1 = next(iter(p1))["image"]
    p0.close(); p1.close()
    # no image of shard 0's first epoch batch appears in shard 1's
    h0 = {bytes(x.tobytes()) for x in b0}
    h1 = {bytes(x.tobytes()) for x in b1}
    assert not (h0 & h1)


def test_producer_error_propagates():
    class Broken:
        def __len__(self):
            return 10

        def example(self, i, rng):
            raise RuntimeError("decode failed")

    prod = BatchProducer(Broken(), 2, seed=0)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(iter(prod))
    prod.close()


def test_device_prefetch_order():
    batches = [{"image": np.full((2, 4, 4, 3), i, np.uint8)} for i in range(5)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert int(np.asarray(b["image"])[0, 0, 0, 0]) == i


def test_make_input_pipeline_end_to_end():
    cfg = DataConfig(dataset="synthetic", resolution=16, prefetch=2)
    it = make_input_pipeline(cfg, 8, seed=0, process_index=0, process_count=1)
    b = next(it)
    assert b["image"].shape == (8, 16, 16, 3)


def test_cifar_fallback_to_synthetic():
    cfg = DataConfig(dataset="cifar10", path="/nonexistent", resolution=32)
    ds = make_dataset(cfg)
    img, _ = ds.example(0)
    assert img.shape == (32, 32, 3)


def test_input_pipeline_closeable():
    """InputPipeline.close() stops the producer thread (leak regression)."""
    import threading
    import time

    from locate_tpu.data.pipeline import make_input_pipeline

    cfg = DataConfig(dataset="synthetic", resolution=16, prefetch=2)
    before = threading.active_count()
    with make_input_pipeline(cfg, 8, seed=0, process_index=0, process_count=1) as it:
        b = next(it)
        assert b["image"].shape == (8, 16, 16, 3)
    time.sleep(1.0)  # producer polls its stop event at 0.5s
    assert threading.active_count() <= before


def test_pipeline_steps_per_call_stacking_order():
    """make_input_pipeline(steps_per_call=k) must deliver exactly the same
    examples, in the same order and with the same flips, as k consecutive
    batches of the k=1 pipeline (the producer assembles one k*B batch and
    the scan layout is a reshape view)."""
    from locate_tpu.config import DataConfig
    from locate_tpu.data.pipeline import make_input_pipeline

    dc = DataConfig(dataset="synthetic", resolution=16, random_flip=True)

    def first_batches(k, n):
        p = make_input_pipeline(
            dc, 8, seed=11, steps_per_call=k,
            process_index=0, process_count=1,
        )
        try:
            return [next(iter(p)) for _ in range(n)]
        finally:
            p.close()

    flat = first_batches(1, 4)
    stacked = first_batches(2, 2)
    for ci, call in enumerate(stacked):
        img = np.asarray(call["image"])
        lab = np.asarray(call["label"])
        assert img.shape[:2] == (2, 8)
        for j in range(2):
            ref = flat[ci * 2 + j]
            np.testing.assert_array_equal(img[j], np.asarray(ref["image"]))
            np.testing.assert_array_equal(lab[j], np.asarray(ref["label"]))


# ---------------------------------------------------------------------------
# LSUN LMDB export (data/lsun.py) — the lmdb package is absent here, so the
# reader is exercised through the injectable iterator and the gated error
# ---------------------------------------------------------------------------


def _fake_lsun_records():
    import io

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (200, 10, 10)).save(buf, format="JPEG")
    jpg = buf.getvalue()
    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (10, 200, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    return [(b"\x01\xffhashkey", jpg), (b"plainkey", png)]


def test_lsun_export_to_folder_and_train_path(tmp_path):
    """Exported files carry container-sniffed extensions, binary keys hex-
    encode, re-runs are idempotent, and the result feeds ImageFolder."""
    from locate_tpu.data.lsun import lsun_to_folder, sniff_extension

    recs = _fake_lsun_records()
    assert sniff_extension(recs[0][1]) == "jpg"
    assert sniff_extension(recs[1][1]) == "png"
    assert sniff_extension(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
    assert sniff_extension(b"garbage") == "bin"

    out = str(tmp_path / "lsun")
    n = lsun_to_folder("unused", out, _iter=lambda p: iter(recs))
    assert n == 2
    import os

    names = sorted(os.listdir(out))
    assert names == ["01ff686173686b6579.jpg", "plainkey.png"]
    # idempotent resume: same names, no .tmp litter
    n2 = lsun_to_folder("unused", out, _iter=lambda p: iter(recs))
    assert n2 == 2 and sorted(os.listdir(out)) == names

    ds = ImageFolder(out, resolution=8)
    assert len(ds) == 2
    img, _ = ds.example(0)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_lsun_reader_needs_no_lmdb_package(tmp_path):
    """iter_lmdb reads archives via the pure-Python reader — no `lmdb`
    package anywhere (the round-2 import gate is gone); missing paths
    still fail loudly."""
    import sys

    from lmdb_mini import write_lmdb
    from locate_tpu.data.lsun import iter_lmdb

    assert "lmdb" not in sys.modules  # nothing below may import it
    recs = sorted((bytes([65 + i]) * 4, b"v" * i) for i in range(5))
    write_lmdb(str(tmp_path / "env"), recs)
    assert list(iter_lmdb(str(tmp_path / "env"))) == recs
    with pytest.raises(Exception, match="data.mdb|No such file"):
        next(iter_lmdb(str(tmp_path / "missing")))
