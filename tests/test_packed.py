"""Packed dataset format (VERDICT r1 missing #3 / SURVEY.md §8 hard part
#4): pack → read round-trip fidelity, shard-boundary handling, producer
integration with deterministic resume, and make_dataset wiring."""

import os

import numpy as np
import pytest
from PIL import Image

from locate_tpu.config import DataConfig
from locate_tpu.data.datasets import ImageFolder, SyntheticImages, make_dataset
from locate_tpu.data.packed import PackedDataset, pack_dataset
from locate_tpu.data.pipeline import BatchProducer


def _collect(producer, n_batches):
    it = iter(producer)
    out = [next(it) for _ in range(n_batches)]
    producer.close()
    return out


def test_pack_roundtrip_synthetic(tmp_path):
    src = SyntheticImages(16, 3, length=37, num_classes=4)
    out = pack_dataset(src, str(tmp_path / "p"), shard_size=10, batch_size=8)
    ds = PackedDataset(out)
    assert len(ds) == 37
    assert ds.resolution == 16 and ds.channels == 3 and ds.num_classes == 4
    # every example identical to the source, across shard boundaries
    for i in (0, 9, 10, 11, 19, 20, 36):
        img, lab = ds.example(i)
        simg, slab = src.example(i)
        np.testing.assert_array_equal(img, simg)
        assert lab == slab


def test_pack_refuses_overwrite(tmp_path):
    src = SyntheticImages(8, 3, length=4)
    out = pack_dataset(src, str(tmp_path / "p"), shard_size=4)
    with pytest.raises(FileExistsError):
        pack_dataset(src, out)


def test_packed_batch_fast_matches_and_flips(tmp_path):
    src = SyntheticImages(16, 3, length=25)
    ds = PackedDataset(pack_dataset(src, str(tmp_path / "p"), shard_size=7))
    idx = [24, 0, 13, 7, 6, 14]
    flips = [False, True, False, True, False, True]
    imgs, labs = ds.batch_fast(idx, flips)
    assert imgs.shape == (6, 16, 16, 3) and imgs.dtype == np.uint8
    for k, (i, fl) in enumerate(zip(idx, flips)):
        want = src.example(i)[0]
        if fl:
            want = want[:, ::-1]
        np.testing.assert_array_equal(imgs[k], want)


def test_pack_from_image_folder(tmp_path):
    folder = tmp_path / "imgs"
    for cls in ("a", "b"):
        (folder / cls).mkdir(parents=True)
        for i in range(3):
            arr = np.random.RandomState(i).randint(0, 255, (20, 24, 3), np.uint8)
            Image.fromarray(arr).save(folder / cls / f"{i}.png")
    src = ImageFolder(str(folder), resolution=16)
    ds = PackedDataset(pack_dataset(src, str(tmp_path / "p"), shard_size=4))
    assert len(ds) == 6 and ds.num_classes == 2
    # packing decodes via the source's batch_fast (native C++ when built,
    # whose resize differs from PIL by a few LSB) — compare to that path,
    # with example() as the oracle within decoder tolerance
    for i in range(6):
        img, lab = ds.example(i)
        fast, labs = None, None
        try:
            fast, labs = src.batch_fast([i], [False])
        except RuntimeError:
            pass  # native loader unavailable: pack used example()
        if fast is not None:
            np.testing.assert_array_equal(img, fast[0])
            assert lab == int(labs[0])
        assert lab == src.example(i)[1]


def test_make_dataset_packed_and_resolution_guard(tmp_path):
    src = SyntheticImages(16, 3, length=8)
    out = pack_dataset(src, str(tmp_path / "p"))
    ds = make_dataset(DataConfig(dataset="packed", path=out, resolution=16))
    assert isinstance(ds, PackedDataset)
    with pytest.raises(ValueError, match="re-pack"):
        make_dataset(DataConfig(dataset="packed", path=out, resolution=32))


def test_producer_stream_identical_to_source(tmp_path):
    """The packed dataset slots under BatchProducer with bit-identical
    batches AND unchanged deterministic-resume semantics."""
    src = SyntheticImages(16, 3, length=40)
    packed = PackedDataset(pack_dataset(src, str(tmp_path / "p"), shard_size=16))

    full = _collect(BatchProducer(packed, 8, seed=5, random_flip=True), 5)
    ref = _collect(BatchProducer(src, 8, seed=5, random_flip=True), 5)
    for b, r in zip(full, ref):
        np.testing.assert_array_equal(b["image"], r["image"])
        np.testing.assert_array_equal(b["label"], r["label"])

    # resume: skipping 3 batches replays the exact tail of the stream
    resumed = _collect(
        BatchProducer(packed, 8, seed=5, random_flip=True, skip_examples=24), 2
    )
    for b, r in zip(resumed, full[3:]):
        np.testing.assert_array_equal(b["image"], r["image"])


def test_partial_pack_not_loadable(tmp_path):
    """A pack interrupted before meta.json is written is not a dataset."""
    d = tmp_path / "p"
    d.mkdir()
    (d / "shard_00000.u8").write_bytes(b"\0" * 64)
    with pytest.raises(FileNotFoundError, match="meta.json"):
        PackedDataset(str(d))
