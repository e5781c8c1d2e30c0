"""Deterministic data-stream fast-forward: batches N.. of a skipped stream
must equal batches N.. of the original stream (exact resume semantics)."""

import dataclasses

import numpy as np
import pytest

from locate_tpu.config import ModelConfig
from locate_tpu.data.datasets import SyntheticImages
from locate_tpu.data.pipeline import BatchProducer


@pytest.mark.parametrize("flip", [False, True])
def test_skip_matches_original(flip):
    ds = SyntheticImages(8, 3, length=20)

    def batches(skip, count):
        prod = BatchProducer(
            ds, 4, seed=7, random_flip=flip, skip_examples=skip * 4
        )
        it = iter(prod)
        out = [next(it) for _ in range(count)]
        prod.close()
        return out

    full = batches(0, 6)
    resumed = batches(3, 3)
    for a, b in zip(full[3:], resumed):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_skip_across_epochs():
    ds = SyntheticImages(8, 3, length=8)  # epoch = 2 batches of 4
    def batches(skip, count):
        prod = BatchProducer(ds, 4, seed=1, random_flip=True, skip_examples=skip * 4)
        it = iter(prod)
        out = [next(it) for _ in range(count)]
        prod.close()
        return out

    full = batches(0, 7)
    resumed = batches(5, 2)  # resume in epoch 3
    for a, b in zip(full[5:], resumed):
        np.testing.assert_array_equal(a["image"], b["image"])


def test_bad_resolution_rejected():
    with pytest.raises(ValueError, match="power of two"):
        ModelConfig(resolution=48)


def test_attention_stage_csv():
    cfg = ModelConfig(resolution=32, attention_stages="8,16")
    assert cfg.attention_at(8) and cfg.attention_at(16)
    assert not cfg.attention_at(32)
    assert not ModelConfig(resolution=32, attention_stages="none").attention_at(8)
