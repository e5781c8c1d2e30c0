"""TFRecord reader (data/tfrecords.py): round trip through our own
writer, framing-index random access, both record conventions, resize
path, pipeline + pack integration, and a cross-check against TensorFlow's
own writer/parser (the ground truth for the wire format)."""

import os

import numpy as np
import pytest

from locate_tpu.data.tfrecords import (
    TFRecordImages,
    encode_example,
    parse_example,
    write_tfrecord,
)


def _imgs(n, c, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, c, h, w), dtype=np.uint8)


def test_round_trip_stylegan_convention(tmp_path):
    imgs = _imgs(5, 3, 16, 16)
    path = str(tmp_path / "a.tfrecords")
    write_tfrecord(
        path, [encode_example(im, label=i % 3) for i, im in enumerate(imgs)]
    )
    ds = TFRecordImages(path, resolution=16)
    assert len(ds) == 5
    for i in (0, 3, 4, 1):  # random access, any order
        arr, lab = ds.example(i)
        assert arr.shape == (16, 16, 3) and arr.dtype == np.uint8
        np.testing.assert_array_equal(arr, imgs[i].transpose(1, 2, 0))
        assert lab == i % 3
    # the framing index was cached beside the shard
    assert os.path.exists(path + ".idx.npy")
    # a fresh instance uses the cached index
    ds2 = TFRecordImages(path, resolution=16)
    np.testing.assert_array_equal(ds2.example(2)[0], imgs[2].transpose(1, 2, 0))


def test_directory_of_shards_and_resize(tmp_path):
    imgs = _imgs(4, 3, 32, 32, seed=1)
    for s in range(2):
        write_tfrecord(
            str(tmp_path / f"shard-{s}.tfrecords"),
            [encode_example(im) for im in imgs[2 * s:2 * s + 2]],
        )
    ds = TFRecordImages(str(tmp_path), resolution=16)  # stored 32 -> 16
    assert len(ds) == 4
    arr, _ = ds.example(3)
    assert arr.shape == (16, 16, 3)
    # resize is PIL bilinear of the center crop — compare against it
    from PIL import Image

    ref = np.asarray(
        Image.fromarray(imgs[3].transpose(1, 2, 0)).resize(
            (16, 16), Image.BILINEAR
        )
    )
    np.testing.assert_array_equal(arr, ref)


def test_tfslim_encoded_convention(tmp_path):
    import io
    import struct

    from PIL import Image

    from locate_tpu.data.tfrecords import _field, _varint

    img = np.asarray(_imgs(1, 3, 16, 16, seed=2)[0].transpose(1, 2, 0))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")

    enc_feat = _field(1, 2, _field(1, 2, buf.getvalue()))   # BytesList
    lab_feat = _field(3, 2, _field(1, 2, _varint(7)))        # Int64List
    entries = [
        _field(1, 2, _field(1, 2, b"image/encoded") + _field(2, 2, enc_feat)),
        _field(1, 2, _field(1, 2, b"image/class/label") + _field(2, 2, lab_feat)),
    ]
    payload = _field(1, 2, b"".join(entries))
    path = str(tmp_path / "slim.tfrecords")
    write_tfrecord(path, [payload])

    ds = TFRecordImages(path, resolution=16)
    arr, lab = ds.example(0)
    np.testing.assert_array_equal(arr, img)  # PNG is lossless
    assert lab == 7


def test_pipeline_and_pack_integration(tmp_path):
    """dataset='tfrecord' feeds the producer pipeline and `pack`."""
    import dataclasses

    from locate_tpu.config import DataConfig
    from locate_tpu.data.datasets import make_dataset
    from locate_tpu.data.packed import pack_dataset, PackedDataset

    imgs = _imgs(6, 3, 16, 16, seed=3)
    path = str(tmp_path / "train.tfrecords")
    write_tfrecord(path, [encode_example(im) for im in imgs])
    dcfg = DataConfig(dataset="tfrecord", path=path, resolution=16)
    ds = make_dataset(dcfg)
    assert len(ds) == 6

    out = str(tmp_path / "packed")
    pack_dataset(ds, out)
    packed = PackedDataset(out)
    assert len(packed) == 6
    arr, _ = packed.example(0)
    np.testing.assert_array_equal(arr, imgs[0].transpose(1, 2, 0))


def test_truncated_shard_raises(tmp_path):
    imgs = _imgs(2, 3, 8, 8)
    path = str(tmp_path / "t.tfrecords")
    write_tfrecord(path, [encode_example(im) for im in imgs])
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-10])  # chop the tail record
    with pytest.raises(ValueError, match="truncated"):
        TFRecordImages(path, resolution=8)


def test_against_real_tensorflow(tmp_path):
    """Our writer's records parse with tf.train.Example AND our parser
    reads tf.io.TFRecordWriter output — both directions pinned against
    the ground-truth implementation."""
    tf = pytest.importorskip("tensorflow")

    img = _imgs(1, 3, 8, 8, seed=4)[0]
    # ours -> tf
    ours = str(tmp_path / "ours.tfrecords")
    write_tfrecord(ours, [encode_example(img, label=5)])
    rec = next(iter(tf.data.TFRecordDataset(ours)))
    ex = tf.train.Example()
    ex.ParseFromString(rec.numpy())
    f = ex.features.feature
    assert list(f["shape"].int64_list.value) == [3, 8, 8]
    assert f["image/class/label"].int64_list.value[0] == 5
    np.testing.assert_array_equal(
        np.frombuffer(f["data"].bytes_list.value[0], np.uint8).reshape(3, 8, 8),
        img,
    )

    # tf -> ours
    theirs = str(tmp_path / "theirs.tfrecords")
    ex2 = tf.train.Example(features=tf.train.Features(feature={
        "shape": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[3, 8, 8])),
        "data": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[img.tobytes()])),
    }))
    with tf.io.TFRecordWriter(theirs) as w:
        w.write(ex2.SerializeToString())
    feats = parse_example(
        open(theirs, "rb").read()[12:-4]  # strip framing of the 1 record
    )
    np.testing.assert_array_equal(feats["shape"], [3, 8, 8])
    ds = TFRecordImages(theirs, resolution=8)
    arr, _ = ds.example(0)
    np.testing.assert_array_equal(arr, img.transpose(1, 2, 0))