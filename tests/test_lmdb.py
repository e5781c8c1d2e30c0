"""Pure-Python LMDB reader (data/lmdb_reader.py): B+tree round trips
through the struct-level writer twin (lmdb_mini.py) across tree depths
and page sizes, overflow (BIGDATA) values, key lookup, the LSUN dataset
adapter + pipeline integration, the dependency-free lsun-export path,
and — where the real `lmdb` C library is installed — a byte-level
cross-check in both directions (auto-skipped here; runs on dev boxes)."""

import io
import os

import numpy as np
import pytest

from lmdb_mini import write_lmdb
from locate_tpu.data.lmdb_reader import LmdbError, LmdbImages, LmdbReader


def _records(n, seed=0, vmin=4, vmax=40):
    rng = np.random.default_rng(seed)
    recs = {}
    for _ in range(n):
        k = bytes(rng.integers(0, 256, rng.integers(4, 24), dtype=np.uint8))
        v = bytes(rng.integers(0, 256, rng.integers(vmin, vmax), dtype=np.uint8))
        recs[k] = v
    return sorted(recs.items())


@pytest.mark.parametrize("psize,n", [(512, 400), (4096, 1500)])
def test_roundtrip_and_random_access(tmp_path, psize, n):
    recs = _records(n)
    write_lmdb(str(tmp_path / "env"), recs, psize=psize)
    with LmdbReader(str(tmp_path / "env")) as r:
        assert r.psize == psize
        assert len(r) == len(recs)
        assert list(r.items()) == recs
        # random access by index, shuffled order (the dataset access path)
        idx = np.random.default_rng(1).permutation(len(recs))[:100]
        for i in idx:
            assert r[int(i)] == recs[int(i)]
        with pytest.raises(IndexError):
            r[len(recs)]
        # key lookup: every 37th hit + guaranteed misses
        for i in range(0, len(recs), 37):
            assert r.get(recs[i][0]) == recs[i][1]
        assert r.get(b"") is None or (b"", r.get(b"")) == recs[0]
        assert r.get(b"\xff" * 64) is None
    if psize == 512:
        with LmdbReader(str(tmp_path / "env")) as r:
            assert r.depth >= 3  # the small page size forces real branches


def test_overflow_values(tmp_path):
    # values far beyond one page -> BIGDATA nodes + multi-page overflow
    rng = np.random.default_rng(2)
    recs = sorted(
        (
            f"k{i:04d}".encode(),
            bytes(rng.integers(0, 256, size, dtype=np.uint8)),
        )
        for i, size in enumerate([10, 5000, 4096 - 16, 3 * 4096 + 7, 2048, 1])
    )
    write_lmdb(str(tmp_path / "env"), recs, psize=4096)
    with LmdbReader(str(tmp_path / "env")) as r:
        assert list(r.items()) == recs
        for i in range(len(recs)):
            assert r[i] == recs[i]
            assert r.get(recs[i][0]) == recs[i][1]


def test_empty_db(tmp_path):
    write_lmdb(str(tmp_path / "env"), [], psize=4096)
    with LmdbReader(str(tmp_path / "env")) as r:
        assert len(r) == 0
        assert list(r.items()) == []
        assert r.get(b"x") is None


def test_not_an_lmdb_file(tmp_path):
    p = tmp_path / "junk.mdb"
    p.write_bytes(b"\x00" * 8192)
    with pytest.raises(LmdbError):
        LmdbReader(str(p))


def test_cross_check_real_lmdb(tmp_path):
    """Both directions against the C library — the wire-format ground
    truth. Skipped where `lmdb` isn't installed (this CI box); runs on
    any dev machine that has it."""
    lmdb = pytest.importorskip("lmdb")
    recs = _records(300, seed=3, vmax=6000)
    # theirs -> ours
    env_dir = str(tmp_path / "real")
    os.makedirs(env_dir)
    env = lmdb.open(env_dir, map_size=1 << 26)
    with env.begin(write=True) as txn:
        for k, v in recs:
            txn.put(k, v)
    env.close()
    with LmdbReader(env_dir) as r:
        assert list(r.items()) == recs
    # ours -> theirs
    mine = str(tmp_path / "mine")
    write_lmdb(mine, recs, psize=4096)
    env = lmdb.open(mine, readonly=True, lock=False)
    with env.begin() as txn:
        assert [(bytes(k), bytes(v)) for k, v in txn.cursor()] == recs
    env.close()


# ---------------------------------------------------------------------------
# dataset adapter
# ---------------------------------------------------------------------------


def _webp_records(n, hw, seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    recs, imgs = [], []
    for i in range(n):
        arr = rng.integers(0, 256, (hw, hw, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "WEBP", lossless=True)
        recs.append((f"{seed}img{i:03d}".encode(), buf.getvalue()))
        imgs.append(arr)
    return sorted(recs), imgs


def test_lmdb_images_single_env(tmp_path):
    recs, _ = _webp_records(6, 16, seed=0)
    write_lmdb(str(tmp_path / "env"), recs, psize=4096)
    ds = LmdbImages(str(tmp_path / "env"), resolution=16)
    assert len(ds) == 6
    assert ds.num_classes == 0
    img, label = ds.example(3)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert label == 0
    # lossless webp at native size -> exact pixel round trip
    key, raw = recs[3]
    from PIL import Image

    ref = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    np.testing.assert_array_equal(img, ref)
    ds.close()


def test_lmdb_images_multi_category(tmp_path):
    """torchvision-style layout: one *_lmdb env per scene category ->
    class-per-subdir labels, resize from a larger source."""
    for ci, cat in enumerate(["aaa_train_lmdb", "bbb_train_lmdb"]):
        recs, _ = _webp_records(4, 24, seed=ci)
        write_lmdb(str(tmp_path / cat), recs, psize=4096)
    ds = LmdbImages(str(tmp_path), resolution=16)
    assert len(ds) == 8
    assert ds.num_classes == 2
    np.testing.assert_array_equal(ds.labels, [0] * 4 + [1] * 4)
    img, label = ds.example(5)
    assert img.shape == (16, 16, 3)
    assert label == 1
    ds.close()


def test_make_dataset_and_pipeline(tmp_path):
    from locate_tpu.config import DataConfig
    from locate_tpu.data.datasets import make_dataset
    from locate_tpu.data.pipeline import make_input_pipeline

    recs, _ = _webp_records(16, 16, seed=7)
    write_lmdb(str(tmp_path / "env"), recs, psize=4096)
    dcfg = DataConfig(
        dataset="lsun", path=str(tmp_path / "env"), resolution=16
    )
    assert isinstance(make_dataset(dcfg), LmdbImages)
    it = make_input_pipeline(dcfg, 4, seed=0, process_index=0,
                             process_count=1)
    batch = next(it)
    assert batch["image"].shape == (4, 16, 16, 3)
    assert np.asarray(batch["image"]).dtype == np.uint8
    it.close()


def test_lsun_export_without_lmdb_package(tmp_path):
    """lsun_to_folder end to end through the pure reader (the old
    import-gate is gone)."""
    from locate_tpu.data.lsun import lsun_to_folder, sniff_extension

    recs, _ = _webp_records(5, 8, seed=9)
    write_lmdb(str(tmp_path / "env"), recs, psize=4096)
    n = lsun_to_folder(str(tmp_path / "env"), str(tmp_path / "out"))
    assert n == 5
    files = sorted(os.listdir(tmp_path / "out"))
    assert len(files) == 5
    assert all(f.endswith(".webp") for f in files)
    k, v = recs[0]
    assert sniff_extension(v) == "webp"
    with open(tmp_path / "out" / files[0], "rb") as f:
        assert f.read() in dict(recs).values()
