"""Pure-stdlib RIFF containers: PCM WAV (audio) and MJPEG AVI (video).

The third and fourth members of the in-container codec family
(PNG/JPEG live in :mod:`multimodal` / :mod:`jpeg`): with these, every
modality of the multimodal surface has a REAL ``fake=False`` path
with zero native dependencies —

- audio: canonical PCM WAV (RIFF/WAVE fmt+data), 8-bit unsigned or
  16-bit signed, any channel count;
- video: motion-JPEG AVI (RIFF/'AVI ' hdrl+movi), each frame a
  baseline JPEG decoded by :mod:`pydin_spark.operators.jpeg`.

MJPEG-in-AVI is the classic codec-free interchange format (every
ffmpeg/opencv build reads it), and PCM WAV is *the* uncompressed
audio container — so these are representative real formats, not toy
ones. Compressed formats (MP3/AAC/H.264...) remain the documented
``decoder=`` plug-points for librosa/ffmpeg.

Like the JPEG codec, entropy-light parsing happens per asset inside
an Arrow batch; a 100 TB pipeline scales by partitioning over assets,
and heavyweight codecs plug in through the same seam without touching
the Spark-side plumbing.
"""

from __future__ import annotations

import struct

# ---- WAV --------------------------------------------------------------


def encode_wav(samples, sample_rate: int = 8000,
               sample_width: int = 1) -> bytes:
    """int array (n,) mono or (n, ch) → canonical PCM WAV bytes.

    ``sample_width`` 1 → 8-bit unsigned PCM, 2 → 16-bit signed
    little-endian PCM (the two layouts RIFF/WAVE defines for
    integer PCM).
    """
    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, ch = arr.shape
    if sample_width == 1:
        data = arr.astype(np.uint8).tobytes()
    elif sample_width == 2:
        data = arr.astype("<i2").tobytes()
    else:
        raise ValueError("sample_width must be 1 or 2")
    byte_rate = sample_rate * ch * sample_width
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate,
                      ch * sample_width, 8 * sample_width)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))  # word-align
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """PCM WAV bytes → ``(sample_rate, samples ndarray)``.

    Samples come back as float64 CENTERED at zero in native scale
    (8-bit: value−128; 16/24/32-bit integer: the signed value;
    float WAV: the stored floats, conventionally in [-1, 1]), shape
    (n,) for mono else (n, channels) — the form feature math wants.
    Covers integer PCM (tag 1, 8/16/24/32-bit), IEEE float (tag 3,
    32/64-bit) and WAVE_FORMAT_EXTENSIBLE wrapping either.
    """
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, fmt_raw, data = 12, None, b"", None
    while pos + 8 <= len(payload):
        cid, ln = payload[pos:pos + 4], struct.unpack(
            "<I", payload[pos + 4:pos + 8])[0]
        chunk = payload[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)            # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
            fmt_raw = chunk
        elif cid == b"data":
            data = chunk
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(fmt_raw) >= 40:
        # WAVE_FORMAT_EXTENSIBLE: real format tag leads the GUID
        audio_format = struct.unpack("<H", fmt_raw[24:26])[0]
    if audio_format == 1:                   # integer PCM
        if bits == 8:
            arr = np.frombuffer(data, dtype=np.uint8).astype(
                np.float64) - 128.0
        elif bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float64)
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            arr = np.where(v >= 1 << 23, v - (1 << 24),
                           v).astype(np.float64)
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV")
    elif audio_format == 3:                 # IEEE float
        if bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit float WAV")
    else:
        raise NotImplementedError(
            f"non-PCM WAV (format tag {audio_format}) — pass "
            f"decoder= to plug a codec in")
    if ch > 1:
        arr = arr[: (len(arr) // ch) * ch].reshape(-1, ch)
    return rate, arr


# ---- MJPEG AVI --------------------------------------------------------

_AVIH = struct.Struct("<IIIIIIIIIIIIII")    # 56-byte main header
_STRH = struct.Struct("<4s4sIHHIIIIIIIIhhhh")


def encode_avi_mjpeg(frames, fps: int = 25) -> bytes:
    """List of JPEG frame payloads → minimal spec-correct MJPEG AVI
    (RIFF 'AVI ': hdrl{avih, strl{strh,strf}}, movi{00dc…}, idx1).

    Width/height are read from the first frame's SOF0 so the headers
    are honest; all frames must share dimensions (MJPEG rule).
    """
    frames = [bytes(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    w, h = _jpeg_dims(frames[0])
    uspf = 1_000_000 // fps

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = _AVIH.pack(uspf, 0, 0, 0x10, len(frames), 0, 1, 0, w, h,
                      0, 0, 0, 0)
    strh = _STRH.pack(b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0xFFFFFFFF, 0, 0, 0, w, h)
    # BITMAPINFOHEADER
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    idx, off = bytearray(), 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _jpeg_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from a baseline JPEG's SOF marker."""
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9):
            continue
        ln = struct.unpack(">H", payload[pos:pos + 2])[0]
        if marker in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack(">HH", payload[pos + 3:pos + 7])
            return w, h
        pos += ln
    raise ValueError("no SOF marker in JPEG frame")


def avi_frames(payload: bytes):
    """MJPEG AVI bytes → ``(usec_per_frame, [jpeg_bytes, ...])``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    uspf, frames = None, []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal uspf
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            ln = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            body_at = pos + 8
            if cid == b"LIST":
                walk(buf, body_at + 4, body_at + ln)
            elif cid == b"avih":
                uspf = struct.unpack("<I", buf[body_at:body_at + 4])[0]
            elif cid[2:] in (b"dc", b"db"):
                frames.append(buf[body_at:body_at + ln])
            pos = body_at + ln + (ln & 1)

    walk(payload, 12, len(payload))
    if uspf is None:
        raise ValueError("truncated AVI: missing avih header")
    return uspf, frames


def decode_avi_frames(payload: bytes, every_ms: int):
    """The video ``decoder=`` contract over MJPEG AVI: sample one
    frame per ``every_ms`` of timeline and return
    ``[(ts_ms, jpeg_bytes), ...]`` — for each target instant the
    frame on screen at that instant (floor by frame period)."""
    uspf, frames = avi_frames(payload)
    if not frames:
        return []
    duration_ms = (uspf * len(frames)) // 1000
    out = []
    for t in range(0, max(duration_ms, 1), max(every_ms, 1)):
        i = min((t * 1000) // uspf, len(frames) - 1)
        out.append((t, frames[i]))
    return out
