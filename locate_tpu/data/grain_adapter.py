"""grain <-> locate-tpu dataset adapters (SURVEY.md §8 suggested grain for
the host pipeline; the bespoke producer + native C++ decoder won on this
host — docs/DESIGN.md "Host pipeline" — so grain support ships as thin
adapters over the same Dataset protocol instead of a rewrite).

Two directions:

  * `AsGrainSource(dataset)` — expose any locate-tpu dataset (synthetic /
    CIFAR-10 / folder / packed) as a grain `RandomAccessDataSource`
    (`__len__` + `__getitem__` -> {"image", "label"}), so users can build
    grain pipelines (multiprocess workers, grain checkpointing) on top of
    this repo's data handling.

  * `GrainDataset(source, resolution)` — run any grain random-access
    source through locate-tpu's own producer/prefetch pipeline by
    implementing the Dataset protocol (`__len__`, `example`,
    `num_classes`). Items may be dicts ({"image", optional "label"}),
    (image, label) tuples, or bare HWC uint8 arrays, already sized to
    `resolution` (this adapter deliberately does no decoding/resizing —
    pair grain transforms or `locate-tpu pack` with it for that).

Both sides are pure host-side index math: deterministic-resume semantics
(`skip_examples` fast-forward) keep working because `example()` never
consumes the stream RNG (data/pipeline.py invariant).
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

from locate_tpu.data.datasets import Example


class AsGrainSource:
    """locate-tpu Dataset -> grain RandomAccessDataSource."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, index: int) -> dict:
        img, label = self._dataset.example(int(index), None)
        return {"image": img, "label": np.int32(label)}


def _to_example(item: Any, resolution: int, channels: int) -> Example:
    if isinstance(item, dict):
        img, label = item["image"], item.get("label", 0)
    elif isinstance(item, tuple) and len(item) == 2:
        img, label = item
    else:
        img, label = item, 0
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise TypeError(
            f"grain item image must be uint8 HWC, got dtype {img.dtype}"
        )
    if img.shape != (resolution, resolution, channels):
        raise ValueError(
            f"grain item image must already be sized "
            f"({resolution}, {resolution}, {channels}), got {img.shape}; "
            "resize in a grain transform or pre-pack the dataset"
        )
    return img, int(label)


class GrainDataset:
    """grain RandomAccessDataSource -> locate-tpu Dataset protocol.

    Use with the library API:

        src = grain.MapDataset.source(...)  # or any random-access source
        ds = GrainDataset(src, resolution=64, num_classes=0)
        pipeline = make_input_pipeline(..., dataset=ds)  # via make_dataset
                                                         # override hook

    The train loop's `make_input_pipeline` builds datasets from config
    strings; for grain sources construct `BatchProducer`/`InputPipeline`
    directly or monkey-patch `make_dataset` — the protocol is the contract.
    """

    def __init__(self, source, resolution: int, img_channels: int = 3,
                 num_classes: int = 0):
        self._source = source
        self.resolution = resolution
        self.img_channels = img_channels
        self.num_classes = num_classes

    def __len__(self) -> int:
        return len(self._source)

    def example(self, index: int, rng=None) -> Example:
        # rng is intentionally unused: the pipeline's deterministic-resume
        # fast-forward requires example() to never consume the stream RNG.
        return _to_example(
            self._source[int(index)], self.resolution, self.img_channels
        )
