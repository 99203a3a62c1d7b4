"""Native C++ decode extension (combo_avs_tpu/native): build + parity vs cv2.

The reference's data hot path runs in detectron2/torch's native DataLoader
workers (SURVEY §2.1 L0); this module is the repo's native equivalent. Tests
build the extension with the system toolchain (skip if unavailable) and pin:

* PNG decode bit-exact vs cv2 (color, gray, gray-as-color),
* JPEG decode vs cv2 (both link the system libjpeg -> exact here; tolerance
  kept for foreign libjpeg-turbo builds),
* cv2-compatible BT.601 gray conversion of color inputs (+-1 fixed-point),
* decode_batch ordering + threading, error propagation,
* mappers.read_image(s) prefer the native path and COMBO_NATIVE_IO=0
  disables it.
"""

import os

import cv2
import numpy as np
import pytest

from combo_avs_tpu import native


@pytest.fixture(scope="module")
def io_mod():
    mod = native.get_io()
    if mod is None:
        if not native.build():
            pytest.skip("native toolchain unavailable")
        mod = native.get_io()
    assert mod is not None
    return mod


@pytest.fixture(scope="module")
def imgs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(7)
    color = rng.randint(0, 256, (37, 53, 3), np.uint8)
    gray = rng.randint(0, 256, (41, 29), np.uint8)
    cv2.imwrite(str(d / "c.png"), cv2.cvtColor(color, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(d / "g.png"), gray)
    cv2.imwrite(str(d / "c.jpg"), cv2.cvtColor(color, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])
    return d, color, gray


def test_png_color_exact(io_mod, imgs):
    d, color, _ = imgs
    out = io_mod.decode(str(d / "c.png"))
    assert out.dtype == np.uint8 and out.shape == color.shape
    assert np.array_equal(out, color)


def test_png_gray_exact(io_mod, imgs):
    d, _, gray = imgs
    out = io_mod.decode(str(d / "g.png"), gray=True)
    assert np.array_equal(out, gray)


def test_gray_as_color_matches_cv2(io_mod, imgs):
    d, _, _ = imgs
    out = io_mod.decode(str(d / "g.png"))
    cv = cv2.cvtColor(cv2.imread(str(d / "g.png"), cv2.IMREAD_COLOR),
                      cv2.COLOR_BGR2RGB)
    assert np.array_equal(out, cv)


def test_color_as_gray_bt601(io_mod, imgs):
    d, _, _ = imgs
    out = io_mod.decode(str(d / "c.png"), gray=True)
    cv = cv2.imread(str(d / "c.png"), cv2.IMREAD_GRAYSCALE)
    assert np.abs(out.astype(int) - cv.astype(int)).max() <= 1


def test_jpeg_close_to_cv2(io_mod, imgs):
    d, _, _ = imgs
    out = io_mod.decode(str(d / "c.jpg"))
    cv = cv2.cvtColor(cv2.imread(str(d / "c.jpg"), cv2.IMREAD_COLOR),
                      cv2.COLOR_BGR2RGB)
    assert out.shape == cv.shape
    assert np.abs(out.astype(int) - cv.astype(int)).max() <= 2


def test_jpeg_gray_matches_cv2(io_mod, imgs):
    # gray JPEG decode goes through libjpeg's JCS_GRAYSCALE output, exactly
    # like cv2.IMREAD_GRAYSCALE (ADVICE r3: RGB-then-BT.601 differed by +-1,
    # which a downstream `// 255` binarization would corrupt)
    d, _, _ = imgs
    out = io_mod.decode(str(d / "c.jpg"), gray=True)
    cv = cv2.imread(str(d / "c.jpg"), cv2.IMREAD_GRAYSCALE)
    assert out.shape == cv.shape
    # same system libjpeg -> expected exact; keep +-1 for foreign builds
    assert np.abs(out.astype(int) - cv.astype(int)).max() <= 1


def test_decode_batch_order_and_threads(io_mod, imgs):
    d, color, gray = imgs
    paths = [str(d / "c.png"), str(d / "g.png")] * 5
    outs = io_mod.decode_batch(paths, threads=4)
    assert len(outs) == 10
    for i, o in enumerate(outs):
        ref = color if i % 2 == 0 else None
        if ref is not None:
            assert np.array_equal(o, ref)
        else:
            assert o.shape == (41, 29, 3)  # gray file expanded to RGB


def test_decode_errors(io_mod, imgs):
    d, _, _ = imgs
    with pytest.raises(IOError):
        io_mod.decode(str(d / "missing.png"))
    bad = d / "bad.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot-a-real-png")
    with pytest.raises(IOError):
        io_mod.decode(str(bad))
    with pytest.raises(IOError):
        io_mod.decode_batch([str(d / "c.png"), str(bad)], threads=2)


def test_read_image_uses_native_and_env_gate(io_mod, imgs, monkeypatch):
    from combo_avs_tpu.data import mappers

    d, color, gray = imgs
    assert np.array_equal(mappers.read_image(str(d / "c.png")), color)
    outs = mappers.read_images([str(d / "c.png")] * 3)
    assert all(np.array_equal(o, color) for o in outs)
    # env gate falls back to cv2 (and produces the same pixels)
    monkeypatch.setenv("COMBO_NATIVE_IO", "0")
    native._cached = False
    try:
        assert native.get_io() is None
        assert np.array_equal(mappers.read_image(str(d / "c.png")), color)
        assert np.array_equal(
            mappers.read_image(str(d / "g.png"), gray=True), gray)
    finally:
        native._cached = False
