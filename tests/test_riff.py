"""RIFF container codecs (PCM WAV + MJPEG AVI) and their multimodal
wiring — the audio/video halves of the in-container real-decode
family (images: PNG/JPEG, tested in test_r11_operators / test_jpeg).
"""

from __future__ import annotations

import base64

import numpy as np
import pytest

from pydin_spark.operators.jpeg import decode_jpeg, encode_jpeg
from pydin_spark.operators.riff import (avi_frames, decode_avi_frames,
                                        decode_wav, encode_avi_mjpeg,
                                        encode_wav)


def test_wav_roundtrip_8bit_mono():
    s = np.arange(256, dtype=np.uint8)
    rate, arr = decode_wav(encode_wav(s, sample_rate=8000,
                                      sample_width=1))
    assert rate == 8000
    assert np.array_equal(arr, s.astype(np.float64) - 128.0)


def test_wav_roundtrip_16bit_stereo():
    rng = np.random.default_rng(1)
    st = rng.integers(-32768, 32767, (100, 2)).astype(np.int16)
    rate, arr = decode_wav(encode_wav(st, sample_rate=44100,
                                      sample_width=2))
    assert rate == 44100 and arr.shape == (100, 2)
    assert np.array_equal(arr, st.astype(np.float64))


#: 16-bit stereo PCM WAV written by an INDEPENDENT encoder — Java
#: 17's javax.sound.sampled (AudioSystem.write, WAVE type) over the
#: deterministic samples below. The reverse direction (the JRE
#: reading OUR 8-bit and 16-bit-stereo output bit-exactly) was
#: verified at fixture-generation time.
JAVA_WAV = base64.b64decode(
    "UklGRiQBAABXQVZFZm10IBAAAAABAAIAIlYAAIhYAQAEABAAZGF0YQABAADY3EAf"
    "BN5GHjDfTB1c4FIciOFYG7TiXhrg42QZDOVqGDjmcBdk53YWkOh8FbzpghTo6ogT"
    "FOyOEkDtlBFs7poQmO+gD8Twpg7w8awNHPOyDEj0uAt09b4KoPbECcz3ygj4+NAH"
    "JPrWBlD73AV8/OIEqP3oA9T+7gIAAPQBLAH6AFgCAACEAwb/sAQM/twFEv0IBxj8"
    "NAge+2AJJPqMCir5uAsw+OQMNvcQDjz2PA9C9WgQSPSUEU7zwBJU8uwTWvEYFWDw"
    "RBZm73AXbO6cGHLtyBl47PQafusgHITqTB2K6XgekOikH5bn0CCc5vwhouUoI6jk"
    "VCSu44AltOKsJrrh")


def test_decode_independent_encoder_wav():
    """Fixture came from javax.sound.sampled, not our encoder."""
    rate, arr = decode_wav(JAVA_WAV)
    n = np.arange(64)
    expect = np.stack([(n * 300 - 9000).astype(np.int16),
                       (8000 - n * 250).astype(np.int16)],
                      axis=1).astype(np.float64)
    assert rate == 22050 and arr.shape == (64, 2)
    assert np.array_equal(arr, expect)


def test_wav_odd_data_length_word_alignment():
    """RIFF chunks are word-aligned; an odd-length data chunk must
    still parse (the pad byte is not a sample)."""
    s = np.array([1, 2, 3], dtype=np.uint8)
    payload = encode_wav(s, sample_width=1) + b"LIST\x04\x00\x00\x00INFO"
    rate, arr = decode_wav(payload)
    assert np.array_equal(arr, s.astype(np.float64) - 128.0)


def _wav(tag, rate, bits, data, extensible=False):
    """Hand-build a WAV header around raw sample bytes (mono)."""
    import struct
    fmt = struct.pack("<HHIIHH", 0xFFFE if extensible else tag,
                      1, rate, rate * bits // 8, bits // 8, bits)
    if extensible:                      # cbSize=22 + GUID(tag)
        fmt += struct.pack("<HHIH", 22, bits, 0, tag)
        fmt += b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_float_24bit_and_extensible_formats():
    """IEEE-float (tag 3, 32/64-bit), 24/32-bit integer PCM, and
    WAVE_FORMAT_EXTENSIBLE wrappers all decode to native-scale
    float64 exactly."""
    f = np.array([0.5, -0.25, 1.0, -1.0], dtype="<f4")
    rate, a = decode_wav(_wav(3, 48000, 32, f.tobytes()))
    assert rate == 48000 and np.array_equal(a, f.astype(np.float64))
    f8 = np.array([0.1, -0.9], dtype="<f8")
    _, a = decode_wav(_wav(3, 96000, 64, f8.tobytes()))
    assert np.array_equal(a, f8)
    vals = np.array([0, 1, -1, 8388607, -8388608, 123456], np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little")
                   for v in vals)
    _, a = decode_wav(_wav(1, 44100, 24, raw))
    assert np.array_equal(a, vals.astype(np.float64))
    i4 = np.array([2**31 - 1, -2**31, 7], dtype="<i4")
    _, a = decode_wav(_wav(1, 44100, 32, i4.tobytes()))
    assert np.array_equal(a, i4.astype(np.float64))
    _, a = decode_wav(_wav(3, 48000, 32, f.tobytes(), extensible=True))
    assert np.array_equal(a, f.astype(np.float64))
    s = np.array([100, -200], dtype="<i2")
    _, a = decode_wav(_wav(1, 8000, 16, s.tobytes(), extensible=True))
    assert np.array_equal(a, s.astype(np.float64))


def test_wav_error_paths():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"\xff\xd8\xff\xe0 definitely not riff")
    # non-PCM format tag is the documented plug-point
    good = bytearray(encode_wav(np.zeros(4, np.uint8)))
    fmt_at = good.index(b"fmt ") + 8
    good[fmt_at:fmt_at + 2] = (85).to_bytes(2, "little")  # MP3 tag
    with pytest.raises(NotImplementedError, match="non-PCM"):
        decode_wav(bytes(good))


def test_avi_mjpeg_roundtrip_and_sampling():
    frames = [encode_jpeg(np.full((16, 16), v, np.uint8), quality=100)
              for v in (40, 120, 220)]
    avi = encode_avi_mjpeg(frames, fps=2)          # 500 ms/frame
    uspf, back = avi_frames(avi)
    assert uspf == 500_000
    assert [bytes(f) for f in back] == frames
    # floor-sampling: the frame on screen at each instant
    sampled = decode_avi_frames(avi, 500)
    assert [t for t, _ in sampled] == [0, 500, 1000]
    assert [int(decode_jpeg(f).mean()) for _, f in sampled] \
        == [40, 120, 220]
    sampled = decode_avi_frames(avi, 700)
    assert [t for t, _ in sampled] == [0, 700, 1400]
    assert [int(decode_jpeg(f).mean()) for _, f in sampled] \
        == [40, 120, 220]


def test_avi_odd_frame_length_word_alignment():
    """An odd-length JPEG frame forces the writer's pad byte; the
    walker must skip it or every later chunk misparses."""
    f1 = encode_jpeg(np.full((8, 8), 7, np.uint8), quality=90)
    if len(f1) % 2 == 0:        # trailing pad after EOI keeps the
        f1 += b"\x00"           # frame valid but odd-length
    f2 = encode_jpeg(np.full((8, 8), 200, np.uint8), quality=90)
    avi = encode_avi_mjpeg([f1, f2], fps=1)
    _, back = avi_frames(avi)
    assert [bytes(b) for b in back] == [f1, f2]


def test_avi_error_paths():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE", 1000)


def test_extract_audio_features_real_wav(spark):
    """fake=False with no decoder: PCM WAV decodes through the
    stdlib codec inside the Arrow stage; per-chunk RMS matches
    independent numpy math."""
    from pydin_spark.operators import multimodal

    rng = np.random.default_rng(3)
    samples = rng.integers(0, 256, 64).astype(np.uint8)
    payload = encode_wav(samples, sample_rate=16000, sample_width=1)
    assets = spark.createDataFrame(
        [(7, "audio", bytearray(payload), None)],
        multimodal.ASSET_SCHEMA)
    row = multimodal.extract_audio_features(assets, dim=4,
                                            fake=False).first()
    centered = samples.astype(np.float64) - 128.0
    expect = [float(np.sqrt(np.mean(c * c)))
              for c in np.array_split(centered, 4)]
    assert row["n_samples"] == 64 and row["sample_rate"] == 16000
    assert row["feature"] == pytest.approx(expect)


def test_sample_frames_real_mjpeg_avi(spark):
    """fake=False with no decoder: MJPEG AVI parses through the
    stdlib RIFF walker inside the Arrow stage; each sampled frame is
    the original JPEG payload."""
    from pydin_spark.operators import multimodal

    frames = [encode_jpeg(np.full((8, 8), v, np.uint8), quality=100)
              for v in (11, 222)]
    avi = encode_avi_mjpeg(frames, fps=1)          # 1000 ms/frame
    assets = spark.createDataFrame(
        [(5, "video", bytearray(avi),
          ("video/x-msvideo", 8, 8, 2000))],
        multimodal.ASSET_SCHEMA)
    rows = (multimodal.sample_frames(assets, every_ms=1000,
                                     fake=False)
            .orderBy("frame_no").collect())
    assert [(r["frame_no"], r["ts_ms"]) for r in rows] \
        == [(0, 0), (1, 1000)]
    assert [decode_jpeg(bytes(r["frame"]))[0, 0] for r in rows] \
        == [11, 222]


def test_read_assets_magic_byte_sniffing(spark, tmp_path):
    """sniff=True classifies by payload magic bytes (pure Column
    exprs on the binaryFile scan), regardless of extension."""
    from pydin_spark.operators import multimodal

    (tmp_path / "a.bin").write_bytes(
        multimodal.encode_png(np.zeros((4, 4), np.uint8)))
    (tmp_path / "b.dat").write_bytes(
        encode_jpeg(np.zeros((8, 8), np.uint8)))
    (tmp_path / "c.raw").write_bytes(encode_wav(np.zeros(4, np.uint8)))
    (tmp_path / "d.xyz").write_bytes(
        encode_avi_mjpeg([encode_jpeg(np.zeros((8, 8), np.uint8))]))
    (tmp_path / "e.txt").write_bytes(b"hello plain text")
    sniffed = multimodal.read_assets(spark, str(tmp_path), sniff=True)
    assert sorted(r["kind"] for r in sniffed.select("kind").collect()) \
        == ["audio", "image", "image", "txt", "video"]
    by_ext = multimodal.read_assets(spark, str(tmp_path))
    assert sorted(r["kind"] for r in by_ext.select("kind").collect()) \
        == ["bin", "dat", "raw", "txt", "xyz"]


def test_sample_frames_non_avi_still_raises(spark):
    """The plug-point error survives for containers the stdlib path
    does not cover (e.g. raw bytes that aren't RIFF/AVI)."""
    from pyspark.sql.utils import PythonException

    from pydin_spark.operators import multimodal

    assets = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x00\x00\x20ftypmp42"),
          (None, None, None, 1000))],
        multimodal.ASSET_SCHEMA)
    with pytest.raises(PythonException, match="MJPEG AVI"):
        multimodal.sample_frames(assets, every_ms=1000,
                                 fake=False).collect()
