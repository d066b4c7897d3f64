"""PNG decode coverage beyond the 8-bit straight-line baseline:
Adam7 interlacing and palette color (bit depths 2/8), validated
against an INDEPENDENT encoder — every fixture under
``tests/fixtures/png_*.png`` was written by Java 17's
``javax.imageio`` PNG writer (Adam7 via
``ImageWriteParam.setProgressiveMode``; palette via
``IndexColorModel`` images), with the pixel/palette formulas
replicated in numpy here. PNG is lossless, so every assertion is
exact equality.
"""

from __future__ import annotations

import numpy as np
import pytest

from pydin_spark.operators.multimodal import _decode_png, encode_png

_FIXTURES = __file__.rsplit("/", 1)[0] + "/fixtures"


def _fixture(name: str) -> bytes:
    with open(f"{_FIXTURES}/{name}", "rb") as f:
        return f.read()


def _grid():
    return np.mgrid[0:23, 0:37]


def _gray():
    y, x = _grid()
    return ((x * 41 + y * 97 + (x * y) % 13 * 17) % 256).astype(
        np.uint8)


def test_adam7_gray_and_rgb():
    """Awkward 37x23 dims stress every pass's ceil geometry (empty
    columns/rows in early passes, ragged final pass)."""
    y, x = _grid()
    assert np.array_equal(_decode_png(_fixture("png_gray_adam7.png")),
                          _gray())
    rgb = np.stack([_gray(), ((x * 7) % 256).astype(np.uint8),
                    ((y * 31) % 256).astype(np.uint8)], axis=-1)
    assert np.array_equal(_decode_png(_fixture("png_rgb_adam7.png")),
                          rgb)


@pytest.mark.parametrize("name", ["png_pal4.png", "png_pal4_adam7.png"])
def test_palette_2bit(name):
    """ctype 3 at bit depth 2: sub-byte index unpacking (+ Adam7)."""
    y, x = _grid()
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [128, 128, 128]], np.uint8)
    assert np.array_equal(_decode_png(_fixture(name)),
                          pal[(x + y) % 4])


@pytest.mark.parametrize("name", ["png_pal8.png", "png_pal8_adam7.png"])
def test_palette_8bit(name):
    y, x = _grid()
    i = np.arange(200)
    pal = np.stack([(i * 3) % 256, (255 - i) % 256, (i * 7) % 256],
                   axis=-1).astype(np.uint8)
    assert np.array_equal(_decode_png(_fixture(name)),
                          pal[(x * 5 + y * 11) % 200])


def test_own_encoder_roundtrip_regression():
    """The pre-existing straight-line paths still roundtrip through
    our own encoder with every filter type."""
    rng = np.random.default_rng(5)
    for shape in [(16, 16), (16, 16, 3), (16, 16, 2), (16, 16, 4)]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(
            _decode_png(encode_png(px, (0, 1, 2, 3, 4))), px)


def test_unsupported_still_raises():
    # forge a 16-bit depth header over a valid fixture
    b = bytearray(_fixture("png_pal8.png"))
    b[24] = 16                  # IHDR bit depth byte
    with pytest.raises(NotImplementedError, match="stdlib PNG path"):
        _decode_png(bytes(b))
