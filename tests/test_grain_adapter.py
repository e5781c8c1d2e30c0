"""grain adapters: our datasets as grain sources, grain sources through
our producer pipeline, and a real grain DataLoader round trip."""

import numpy as np
import pytest

grain = pytest.importorskip("grain")

from locate_tpu.data.datasets import SyntheticImages
from locate_tpu.data.grain_adapter import AsGrainSource, GrainDataset
from locate_tpu.data.pipeline import BatchProducer


def test_as_grain_source_matches_dataset():
    ds = SyntheticImages(16, 3, length=32, num_classes=4)
    src = AsGrainSource(ds)
    assert len(src) == 32
    for i in (0, 7, 31):
        item = src[i]
        img, label = ds.example(i, None)
        np.testing.assert_array_equal(item["image"], img)
        assert int(item["label"]) == label


def test_grain_mapdataset_pipeline_over_our_source():
    """Drive a real grain pipeline (MapDataset: shuffle + batch) over a
    locate-tpu dataset."""
    ds = SyntheticImages(16, 3, length=24, num_classes=0)
    md = (
        grain.MapDataset.source(AsGrainSource(ds))
        .shuffle(seed=0)
        .batch(8)
    )
    batches = [md[i] for i in range(3)]
    assert all(b["image"].shape == (8, 16, 16, 3) for b in batches)
    assert all(b["image"].dtype == np.uint8 for b in batches)
    # shuffled epoch covers the dataset exactly once
    seen = np.concatenate([b["image"].reshape(8, -1) for b in batches])
    ref = np.stack([ds.example(i, None)[0].reshape(-1) for i in range(24)])
    assert {r.tobytes() for r in seen} == {r.tobytes() for r in ref}


def test_grain_source_through_our_producer():
    """A grain random-access source runs through locate-tpu's own
    BatchProducer with deterministic-resume semantics intact."""
    items = [
        {
            "image": np.full((16, 16, 3), i, np.uint8),
            "label": np.int32(i % 3),
        }
        for i in range(20)
    ]
    ds = GrainDataset(
        grain.MapDataset.source(items), resolution=16, num_classes=3
    )
    assert len(ds) == 20
    img, label = ds.example(5, None)
    assert img[0, 0, 0] == 5 and label == 2

    def collect(skip, n):
        prod = BatchProducer(
            ds, 4, shard_index=0, shard_count=1, random_flip=True,
            seed=3, prefetch=2, skip_examples=skip * 4,
        )
        try:
            it = iter(prod)
            return [next(it) for _ in range(n)]
        finally:
            prod.close()

    full = collect(0, 4)
    resumed = collect(2, 2)
    for a, b in zip(full[2:], resumed):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_grain_dataset_validates_items():
    ds = GrainDataset(
        grain.MapDataset.source([np.zeros((8, 8, 3), np.uint8)]),
        resolution=16,
    )
    with pytest.raises(ValueError, match="sized"):
        ds.example(0, None)
    ds_f32 = GrainDataset(
        grain.MapDataset.source([np.zeros((16, 16, 3), np.float32)]),
        resolution=16,
    )
    with pytest.raises(TypeError, match="uint8"):
        ds_f32.example(0, None)
