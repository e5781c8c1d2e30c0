"""Native C++ loader tests: build, decode correctness vs PIL, resize
sanity, flip, error handling, and pipeline integration."""

import numpy as np
import pytest
from PIL import Image

from locate_tpu.data import native
from locate_tpu.data.datasets import ImageFolder
from locate_tpu.data.pipeline import BatchProducer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader failed to build"
)


def _write_png(path, arr):
    Image.fromarray(arr).save(path)


def _write_jpeg(path, arr, quality=95):
    Image.fromarray(arr).save(path, quality=quality)


def test_png_decode_exact(tmp_path):
    """Same-size PNG (no resize): native decode must be bit-exact."""
    arr = np.random.RandomState(0).randint(0, 255, (24, 24, 3), np.uint8)
    p = tmp_path / "a.png"
    _write_png(str(p), arr)
    out = native.decode_batch([str(p)], 24)
    np.testing.assert_array_equal(out[0], arr)


def test_jpeg_decode_matches_pil(tmp_path):
    """Same-size JPEG: both PIL and we use libjpeg -> near-identical."""
    arr = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    p = tmp_path / "a.jpg"
    _write_jpeg(str(p), arr)
    out = native.decode_batch([str(p)], 32)
    with Image.open(p) as im:
        ref = np.asarray(im.convert("RGB"))
    assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 1


def test_flip(tmp_path):
    arr = np.arange(24 * 24 * 3, dtype=np.uint8).reshape(24, 24, 3)
    p = tmp_path / "a.png"
    _write_png(str(p), arr)
    out = native.decode_batch([str(p), str(p)], 24, flips=[False, True])
    np.testing.assert_array_equal(out[1], out[0][:, ::-1])


def test_resize_uniform_exact(tmp_path):
    """Uniform color survives any resample exactly."""
    arr = np.full((100, 80, 3), (10, 200, 77), np.uint8)
    p = tmp_path / "a.png"
    _write_png(str(p), arr)
    out = native.decode_batch([str(p)], 16)
    assert (out[0] == np.array([10, 200, 77], np.uint8)).all()


def test_center_crop_geometry(tmp_path):
    """Left half red, right half blue, wide image: center crop keeps the
    middle -> left half of output red, right half blue."""
    arr = np.zeros((40, 120, 3), np.uint8)
    arr[:, :60] = (255, 0, 0)
    arr[:, 60:] = (0, 0, 255)
    p = tmp_path / "a.png"
    _write_png(str(p), arr)
    out = native.decode_batch([str(p)], 20)[0]
    assert (out[:, :8, 0] > 200).all()  # red side
    assert (out[:, 12:, 2] > 200).all()  # blue side


def test_grayscale_png_to_rgb(tmp_path):
    arr = np.random.RandomState(0).randint(0, 255, (16, 16), np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(arr, mode="L").save(p)
    out = native.decode_batch([str(p)], 16)
    np.testing.assert_array_equal(out[0][..., 0], out[0][..., 1])
    np.testing.assert_array_equal(out[0][..., 0], arr)


def test_jpeg_dct_downscale(tmp_path):
    """Large JPEG downscaled: result close to PIL's decode+resize path."""
    rs = np.random.RandomState(1)
    # smooth image (noise is destroyed by JPEG anyway)
    base = rs.randint(0, 255, (8, 8, 3), np.uint8)
    arr = np.asarray(
        Image.fromarray(base).resize((256, 256), Image.BILINEAR)
    )
    p = tmp_path / "big.jpg"
    _write_jpeg(str(p), arr)
    out = native.decode_batch([str(p)], 32)[0]
    with Image.open(p) as im:
        ref = np.asarray(im.convert("RGB").resize((32, 32), Image.BILINEAR))
    err = np.abs(out.astype(int) - ref.astype(int)).mean()
    assert err < 8.0, f"mean abs err {err}"


def test_bad_file_raises(tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8not a real jpeg")
    with pytest.raises(IOError, match="bad.jpg"):
        native.decode_batch([str(p)], 16)


def test_resize_batch_predecoded():
    imgs = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3), np.uint8)
    out = native.resize_batch(imgs, 16)
    assert out.shape == (4, 16, 16, 3)
    # identity resize is exact
    same = native.resize_batch(imgs, 32)
    np.testing.assert_array_equal(same, imgs)


def test_producer_uses_fast_path(tmp_path):
    for i in range(8):
        arr = np.random.RandomState(i).randint(0, 255, (20, 20, 3), np.uint8)
        _write_png(str(tmp_path / f"{i}.png"), arr)
    ds = ImageFolder(str(tmp_path), resolution=16)
    calls = {"fast": 0}
    orig = ds.batch_fast

    def counting(indices, flips):
        calls["fast"] += 1
        return orig(indices, flips)

    ds.batch_fast = counting
    prod = BatchProducer(ds, 4, seed=0)
    b = next(iter(prod))
    prod.close()
    assert b["image"].shape == (4, 16, 16, 3)
    assert calls["fast"] >= 1


def test_upscale_stays_inside_crop(tmp_path):
    """Upscaling a non-square image must not bleed pixels from outside the
    center-crop window (clamp-to-crop regression)."""
    arr = np.full((50, 100, 3), (255, 0, 0), np.uint8)   # red borders
    arr[:, 25:75] = (0, 255, 0)                          # green crop window
    p = tmp_path / "wide.png"
    Image.fromarray(arr).save(p)
    out = native.decode_batch([str(p)], 64)[0]
    assert (out[..., 0] == 0).all(), "red bled into the upscaled crop"
    assert (out[..., 1] == 255).all()
