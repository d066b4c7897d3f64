"""Baseline JPEG codec tests (VERDICT r9 #9).

The stdlib+numpy codec pair in :mod:`pydin_spark.operators.jpeg` is
the JPEG twin of the PNG pair already gated in
``test_r11_operators.py`` — it makes ``fake=False`` multimodal
decode real in-container for the second dominant web image format.

Interop fixtures: ``JAVA_GRAY_JPG`` / ``JAVA_RGB_JPG`` below were
produced by a genuinely independent encoder — Java 17's
``javax.imageio`` (``ImageIO.write(img, "jpg", ...)``) over
deterministic images whose pixel formulas are replicated in numpy
here, so the test asserts our decoder against a third-party
bitstream, not our own. The RGB fixture is 4:2:0 subsampled with an
APP0/JFIF header, exercising the sampling-factor upsample path our
encoder never emits. The reverse direction (JRE decoding our
encoder's output, including restart-marker streams) was verified
manually during development; in-container we assert the
self-consistent roundtrip plus the independent-decode direction.
"""

from __future__ import annotations

import base64

import numpy as np
import pytest

from pydin_spark.operators.jpeg import decode_jpeg, encode_jpeg

# javax.imageio (Java 17) output over the formula images below.
JAVA_GRAY_JPG = base64.b64decode(
    "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8U"
    "HRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAYACgBAREA"
    "/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQA"
    "AAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJico"
    "KSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKT"
    "lJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo"
    "6erx8vP09fb3+Pn6/9oACAEBAAA/APSb3RY/LPyiuI1fRY9x+UVgposfm/dFdRo+ix5X"
    "5RXZW2ix+UPlFF7q8fln5hXE6vq8e5vmFYKavH5v3hXUaPq8eV+YV2Ntq8flj5hXlt7r"
    "Mnln5jXE6vrMm5vmNYCazJ5v3jXUaPrMmV+Y12VtrMnlj5jX/9k=")
JAVA_RGB_JPG = base64.b64decode(
    "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8U"
    "HRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgN"
    "DRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIy"
    "MjIyMjL/wAARCAAYACgDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQF"
    "BgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEI"
    "I0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNk"
    "ZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLD"
    "xMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEB"
    "AQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJB"
    "UQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZH"
    "SElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaan"
    "qKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oA"
    "DAMBAAIRAxEAPwDi4LQYHFXI7QZ6U2CQYFXI5BXLPLZdj7nOJUbMs2loMjiuo020HHFY"
    "NnIMiuo02QcV5OLy2Vtj4rmo850NlaDA4oq1ZSDAor5yplsubYqcqNz5+gkOBVyOQ5oo"
    "r98nhqfY0zivUs9TTs5DuFdRpsh4oorycXhqdtj4v29Tn3OrspDgUUUV83Uw1Pm2HOvU"
    "vuf/2Q==")


def _java_gray():
    """Pixel formula of the Java fixture (verified byte-identical to
    the BufferedImage raster dump at fixture-generation time)."""
    y, x = np.mgrid[0:24, 0:40]
    return np.clip(
        (128 + 60 * np.sin(y / 5.0) + 50 * np.cos(x / 6.0)).astype(int),
        0, 255)


def _java_rgb():
    y, x = np.mgrid[0:24, 0:40]
    return np.stack([_java_gray(), (x * 6) % 256, (y * 9) % 256],
                    axis=-1)


def test_constant_tiles_roundtrip_exactly_at_q100():
    """The ``multimodal_jpeg`` oracle premise: constant 8x8 tiles at
    quality=100 (all-1 quant tables) roundtrip EXACTLY — the only
    nonzero coefficient is the integral DC term 8*(v-128)."""
    for vals in ((65, 108, 32, 255), (0, 1, 254, 128)):
        px = np.empty((16, 16), dtype=np.uint8)
        px[:8, :8], px[:8, 8:] = vals[0], vals[1]
        px[8:, :8], px[8:, 8:] = vals[2], vals[3]
        assert np.array_equal(decode_jpeg(encode_jpeg(px, quality=100)),
                              px)


def test_gray_roundtrip_error_bounds():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)  # non-mult-8
    d100 = decode_jpeg(encode_jpeg(img, quality=100))
    assert d100.shape == img.shape and d100.dtype == np.uint8
    assert np.abs(d100.astype(int) - img.astype(int)).max() <= 1
    smooth = (128 + 40 * np.sin(np.arange(32)[:, None] / 6)
              + 40 * np.cos(np.arange(40)[None, :] / 7)).astype(np.uint8)
    ds = decode_jpeg(encode_jpeg(smooth, quality=85))
    assert np.abs(ds.astype(int) - smooth.astype(int)).max() <= 4


def test_rgb_roundtrip():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(float) - rgb).mean() < 8.0
    # constant color: only chroma-matrix rounding, no DCT loss
    crgb = np.full((8, 8, 3), (10, 200, 99), dtype=np.uint8)
    dcrgb = decode_jpeg(encode_jpeg(crgb, quality=100))
    assert np.abs(dcrgb.astype(int) - crgb.astype(int)).max() <= 1


def test_decode_independent_encoder_gray():
    """Fixture came from javax.imageio, not our encoder."""
    dec = decode_jpeg(JAVA_GRAY_JPG)
    ref = _java_gray()
    assert dec.shape == ref.shape
    assert np.abs(dec.astype(float) - ref).mean() < 2.0
    assert np.abs(dec.astype(int) - ref).max() <= 8


def test_decode_independent_encoder_rgb_420_subsampled():
    """JRE RGB JPEGs are 4:2:0 + APP0/JFIF — exercises the
    sampling-factor upsample path and marker-skip path."""
    dec = decode_jpeg(JAVA_RGB_JPG)
    ref = _java_rgb()
    assert dec.shape == ref.shape
    # chroma is quartered: loose per-pixel, tight mean
    assert np.abs(dec.astype(float) - ref).mean() < 6.0


def test_restart_interval_roundtrip_identical():
    """DRI/RSTn streams decode to the same pixels as the plain
    stream — covers predictor reset + bitstream realignment on both
    sides (and is the segment-parallel-decode hook at scale)."""
    img = (128 + 50 * np.sin(np.arange(40)[:, None] / 4)
           + 40 * np.cos(np.arange(56)[None, :] / 5)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    dri = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in dri and b"\xff\xd0" in dri
    assert np.array_equal(decode_jpeg(dri), plain)
    rgb = np.stack([img, np.roll(img, 3, axis=1),
                    np.roll(img, 5, axis=0)], axis=-1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb, quality=90, restart_interval=3)),
        decode_jpeg(encode_jpeg(rgb, quality=90)))


def test_error_paths():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # lossless (SOF3) stays the documented plug-point
    prog = bytearray(JAVA_GRAY_JPG)
    idx = prog.index(b"\xff\xc0")
    prog[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_jpeg(bytes(prog))


# ---- progressive (SOF2) ----------------------------------------------

_FIXTURES = __file__.rsplit("/", 1)[0] + "/fixtures"


def _fixture(name: str) -> bytes:
    with open(f"{_FIXTURES}/{name}", "rb") as f:
        return f.read()


def _noise_gray():
    y, x = np.mgrid[0:64, 0:56]
    return (x * 37 + y * 91 + ((x * x + y * y) % 7) * 31) % 256


def _noise_rgb():
    y, x = np.mgrid[0:64, 0:56]
    return np.stack([_noise_gray(), (x * 11 + y * 53) % 256,
                     (x * x * 3 + y * 29) % 256], axis=-1)


def test_progressive_decode_gray():
    """javax.imageio progressive stream (DC first/refine + AC band
    first scans + AC refinement, per its default scan script)."""
    dec = decode_jpeg(_fixture("prog_gray.jpg"))
    ref = _java_gray()
    assert dec.shape == ref.shape
    assert np.abs(dec.astype(float) - ref).mean() < 2.0


def test_progressive_decode_rgb_420():
    """Progressive + 4:2:0 subsampling + interleaved DC scans."""
    dec = decode_jpeg(_fixture("prog_rgb.jpg"))
    ref = _java_rgb()
    assert dec.shape == ref.shape
    assert np.abs(dec.astype(float) - ref).mean() < 6.0


def test_progressive_coefficient_exact_vs_baseline():
    """The decisive check: the JRE encoded the SAME image both
    baseline and progressive at the same quality — identical
    quantized coefficients in two different entropy codings. A
    correct progressive decode (EOBRUN, ZRL, successive-
    approximation refinement bits) must therefore produce pixels
    IDENTICAL to the baseline decode; any scan-logic bug breaks
    equality. High-frequency fixture keeps every AC band busy."""
    pg = decode_jpeg(_fixture("prog_noise_gray.jpg"))
    bg = decode_jpeg(_fixture("base_noise_gray.jpg"))
    assert np.array_equal(pg, bg)
    assert np.abs(pg.astype(float) - _noise_gray()).mean() < 15.0
    pr = decode_jpeg(_fixture("prog_noise_rgb.jpg"))
    br = decode_jpeg(_fixture("base_noise_rgb.jpg"))
    assert pr.shape == _noise_rgb().shape
    assert np.array_equal(pr, br)


def test_extract_features_real_decode_on_jpeg(spark):
    """fake=False with NO injected decoder and NO PIL: baseline
    JPEGs decode through the stdlib codec inside the Arrow stage
    (the dispatch added in multimodal._decode_image)."""
    from pydin_spark.operators import multimodal

    px = np.empty((16, 16), dtype=np.uint8)
    px[:8, :8], px[:8, 8:], px[8:, :8], px[8:, 8:] = 65, 108, 32, 255
    payload = encode_jpeg(px, quality=100)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(payload), None)],
        multimodal.ASSET_SCHEMA)
    row = multimodal.extract_features(assets, dim=4,
                                      fake=False).first()
    expect = [float(c.mean()) for c in
              np.array_split(px.ravel().astype(np.float64), 4)]
    assert row["n_bytes"] == len(payload)
    assert row["feature"] == pytest.approx(expect)
