"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct —
the lakehouse-native layout (parquet stores the bytes inline or as
pointers; Spark never interprets them). Decode/feature steps run as
Arrow-batched ``mapInPandas`` so each task touches a bounded batch of
payloads and the pipeline scales by partitioning alone.

The heavyweight codecs (PIL/librosa/ffmpeg) are NOT available in this
environment, but every modality still has a REAL in-container path
through representative formats: baseline PNGs via the pure-stdlib
codec here (``_decode_png``: zlib inflate + filter reconstruction),
baseline AND progressive JPEGs via
:mod:`pydin_spark.operators.jpeg` (Huffman + IDCT, SOF0/2), PCM WAV audio and MJPEG AVI video via
:mod:`pydin_spark.operators.riff`. Compressed/exotic formats decode
through PIL when installed or the ``decoder=`` seam, and otherwise
raise the documented plug-point ``NotImplementedError`` (or run the
deterministic ``fake=True`` path) — the Spark-side plumbing (schema,
batch iteration, partition sizing) is real and tested either way.

Pluggable-decoder seam: every real-path operator takes a ``decoder=``
callable (payload ``bytes`` → pixel ``ndarray``, or for video
``(payload, every_ms)`` → ``[(ts_ms, frame_bytes), ...]``). The
callable is pickled into the Arrow stage with the closure — the ONLY
portable injection point, since ``mapInPandas`` bodies run in separate
worker processes where driver-side ``sys.modules`` patching never
arrives. With no decoder given, the image path tries PIL and raises a
clear plug-point error when absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: canonical schema for a multimodal asset table
ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image|audio|video
    T.StructField("payload", T.BinaryType(), True),   # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = ("asset_id long, kind string, n_bytes long, "
                  "feature array<double>")


def read_assets(spark, path: str, sniff: bool = False) -> DataFrame:
    """Ingest raw files as assets via the distributed binaryFile source.

    ``kind`` comes from the file extension by default; ``sniff=True``
    classifies by payload magic bytes instead (PNG/JPEG → image,
    RIFF/WAVE → audio, RIFF/AVI → video, else the extension) — pure
    Column expressions over the first payload bytes, so the sniff
    rides the same scan with no extra pass."""
    df = spark.read.format("binaryFile").load(path)
    ext = F.lower(F.element_at(F.split("path", r"\."), -1))
    if sniff:
        kind = (F.when(F.substring("content", 1, 8)
                       == F.lit(_PNG_MAGIC), "image")
                .when(F.substring("content", 1, 2)
                      == F.lit(b"\xff\xd8"), "image")
                .when((F.substring("content", 1, 4) == F.lit(b"RIFF"))
                      & (F.substring("content", 9, 4)
                         == F.lit(b"WAVE")), "audio")
                .when((F.substring("content", 1, 4) == F.lit(b"RIFF"))
                      & (F.substring("content", 9, 4)
                         == F.lit(b"AVI ")), "video")
                .otherwise(ext))
    else:
        kind = ext
    return df.select(
        F.abs(F.xxhash64("path")).alias("asset_id"),
        kind.alias("kind"),
        F.col("content").alias("payload"),
        F.struct(F.lit(None).cast("string").alias("mime"),
                 F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.lit(None).cast("long").alias("duration_ms")).alias("meta"))


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


#: Adam7 pass geometry (PNG spec §8.2): (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_defilter(raw, off, hp, stride, bpp, np):
    """Reconstruct one (sub-)image's filtered scanlines (PNG §9):
    ``hp`` rows of ``stride`` bytes, filter-type byte per row,
    ``bpp`` = filter byte distance. Returns (pixels, bytes read)."""
    out = np.empty((hp, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(hp):
        ftype = raw[off + y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=off + y * (stride + 1) + 1).astype(np.int32)
        up = prev.astype(np.int32)
        if ftype == 0:                      # None
            cur = line
        elif ftype == 2:                    # Up
            cur = (line + up) & 0xFF
        else:                               # Sub / Average / Paeth:
            cur = np.empty(stride, dtype=np.int32)  # left-sequential
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = up[x]
                if ftype == 1:              # Sub
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:            # Average
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:            # Paeth
                    c = up[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) \
                        else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        prev = cur.astype(np.uint8)
        out[y] = prev
    return out, off + hp * (stride + 1)


def _decode_png(payload: bytes):
    """Pure-stdlib PNG decode (zlib inflate + per-row filter
    reconstruction, PNG spec §9 and §13): color types 0 (grayscale,
    returns H×W), 2 (RGB, H×W×3), 3 (palette, returns H×W×3 through
    the PLTE lookup; bit depths 1/2/4/8), 4 (gray+alpha, H×W×2) and
    6 (RGBA, H×W×4) at 8-bit depth, both non-interlaced and Adam7
    interlaced (§8.2) — effectively every PNG a standard writer
    emits. PIL, when installed, still takes precedence (16-bit,
    tRNS transparency, ...)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        chunk = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    depth_ok = depth == 8 or (ctype == 3 and depth in (1, 2, 4))
    if channels is None or not depth_ok or interlace > 1:
        raise NotImplementedError(
            f"stdlib PNG path covers 8-bit ctype 0/2/4/6 and "
            f"1/2/4/8-bit palette, interlace 0/1; got depth={depth} "
            f"ctype={ctype} interlace={interlace} — install PIL or "
            f"pass decoder=")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    bits_pp = channels * depth
    bpp = max(1, bits_pp // 8)
    raw = zlib.decompress(b"".join(idat))

    def pixels(sub, hp, wp):
        """(hp, stride) filtered bytes → (hp, wp, channels) values."""
        if depth == 8:
            return sub.reshape(hp, wp, channels)
        bits = np.unpackbits(sub, axis=1)[:, :wp * depth]
        weights = 1 << np.arange(depth - 1, -1, -1)
        return (bits.reshape(hp, wp, depth) * weights).sum(
            axis=2, dtype=np.int32).astype(np.uint8)[..., None]

    out = np.zeros((h, w, channels), dtype=np.uint8)
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    off = 0
    for x0, y0, dx, dy in passes:
        wp = -(-(w - x0) // dx) if w > x0 else 0
        hp = -(-(h - y0) // dy) if h > y0 else 0
        if wp == 0 or hp == 0:
            continue
        stride = -(-wp * bits_pp // 8)
        sub, off = _png_defilter(raw, off, hp, stride, bpp, np)
        out[y0::dy, x0::dx] = pixels(sub, hp, wp)
    if off != len(raw):
        raise ValueError("corrupt PNG: wrong decompressed size")
    if ctype == 3:
        return plte[out[:, :, 0]]
    return out.reshape(h, w, channels) if channels > 1 \
        else out.reshape(h, w)


def encode_png(pixels, filters=(0,)) -> bytes:
    """Pure-stdlib PNG encode — the write-side twin of
    :func:`_decode_png` (8-bit gray/RGB/gray+alpha/RGBA,
    non-interlaced): lets a pipeline materialize derived images
    (resized thumbnails, rendered features) back into a standard
    container with zero native dependencies. ``filters`` cycles per
    row (PNG §9 types 0-4) — compression tuning on the write path,
    and on the test path the way every reconstruction branch of the
    decoder gets exercised."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim not in (2, 3):
        raise ValueError("pixels must be H×W or H×W×C")
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    try:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    except KeyError:
        raise ValueError(f"unsupported channel count {ch}") from None
    flat = px.reshape(h, w * ch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = int(filters[y % len(filters)])
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:      # Sub
            enc = (cur - left) & 0xFF
        elif f == 2:      # Up
            enc = (cur - prev) & 0xFF
        elif f == 3:      # Average
            enc = (cur - (left + prev) // 2) & 0xFF
        elif f == 4:      # Paeth
            ul = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - ul
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - ul))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    return (_PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype,
                                         0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _decode_image(payload: bytes, decoder=None):
    """Decode ``payload`` to a 2-D (or H×W×C) pixel ndarray.

    ``decoder`` is the pluggable seam — any picklable
    ``bytes -> ndarray`` callable. Without one, tries PIL (grayscale
    decode); with PIL absent, baseline PNGs decode through the
    stdlib codec (:func:`_decode_png`) and JPEGs (baseline and
    progressive) through :mod:`pydin_spark.operators.jpeg` so the
    real path covers the two dominant web image formats in-container;
    anything else raises the documented plug-point error, never a
    silent fake.
    """
    if decoder is not None:
        return decoder(payload)
    try:  # pragma: no cover - env lacks codecs
        import io

        import numpy as np
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
    except ImportError:
        if payload[:8] == _PNG_MAGIC:
            return _decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg
            return decode_jpeg(payload)
        raise NotImplementedError(
            "image decode requires PIL/opencv for non-PNG/JPEG "
            "formats (neither present in this container); pass "
            "decoder= (bytes -> ndarray) to plug one in — baseline "
            "PNGs and JPEGs decode via the stdlib codecs") from None


def extract_features(assets: DataFrame, dim: int = 8,
                     fake: bool = True, decoder=None) -> DataFrame:
    """Per-asset feature vector via Arrow-batched mapInPandas.

    ``fake=True`` derives a deterministic pseudo-feature from the payload
    bytes (length + rolling byte sums) so the distributed plumbing is
    exercised end-to-end without codecs; ``fake=False`` decodes real
    pixels through ``decoder`` (or PIL when installed) and emits
    ``dim`` per-chunk pixel means — the same Arrow path either way.
    """

    def featurize(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                buf = bytes(payload or b"")
                nbytes.append(len(buf))
                if fake:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                else:
                    arr = np.asarray(
                        _decode_image(buf, decoder)).ravel()
                if arr.size == 0:
                    feats.append([0.0] * dim)
                elif fake:
                    chunks = np.array_split(arr.astype(np.float64), dim)
                    feats.append([float(c.sum() % 997) for c in chunks])
                else:
                    chunks = np.array_split(arr.astype(np.float64), dim)
                    feats.append([float(c.mean()) if c.size else 0.0
                                  for c in chunks])
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "feature": feats,
            })

    # ship ONLY the columns the Arrow stage reads (guide: an opaque
    # function over extra columns silently widens the Arrow transfer
    # and defeats scan pruning) — callers may pass wider frames
    return (assets.select("asset_id", "kind", "payload")
            .mapInPandas(featurize, schema=FEATURE_SCHEMA))


AUDIO_FEATURE_SCHEMA = ("asset_id long, kind string, n_samples long, "
                        "sample_rate int, feature array<double>")


def extract_audio_features(assets: DataFrame, dim: int = 4,
                           fake: bool = True,
                           decoder=None) -> DataFrame:
    """Per-asset audio features via Arrow-batched mapInPandas:
    ``dim`` per-chunk RMS values over the mono-mixed, zero-centered
    sample stream (the classic energy envelope).

    ``fake=True`` treats the payload bytes themselves as 8-bit
    samples so the plumbing runs codec-free; ``fake=False`` decodes
    for real — through ``decoder`` (``bytes -> (rate, ndarray)``,
    the librosa adapter's contract) when given, else the stdlib PCM
    WAV codec (:func:`pydin_spark.operators.riff.decode_wav`);
    compressed formats without a decoder raise the plug-point error.
    """

    def featurize(batches):
        import numpy as np
        import pandas as pd

        from .riff import decode_wav

        for pdf in batches:
            feats, counts, rates = [], [], []
            for payload in pdf["payload"]:
                buf = bytes(payload or b"")
                if fake:
                    rate, arr = 0, np.frombuffer(
                        buf, dtype=np.uint8).astype(np.float64) - 128.0
                elif decoder is not None:
                    rate, arr = decoder(buf)
                    arr = np.asarray(arr, dtype=np.float64)
                else:
                    rate, arr = decode_wav(buf)
                if arr.ndim > 1:            # mono mix
                    arr = arr.mean(axis=1)
                counts.append(int(arr.size))
                rates.append(int(rate))
                if arr.size == 0:
                    feats.append([0.0] * dim)
                else:
                    feats.append([
                        float(np.sqrt(np.mean(c * c))) if c.size
                        else 0.0
                        for c in np.array_split(arr, dim)])
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_samples": counts,
                "sample_rate": rates,
                "feature": feats,
            })

    # ship only the columns the Arrow stage reads (see
    # extract_features)
    return (assets.select("asset_id", "kind", "payload")
            .mapInPandas(featurize, schema=AUDIO_FEATURE_SCHEMA))


def resize_images(assets: DataFrame, width: int = 64, height: int = 64,
                  fake: bool = True, decoder=None) -> DataFrame:
    """Image-resize plumbing: per-asset output payload of the target
    size with updated metadata.

    ``fake=True`` produces a deterministic byte-resampled payload of
    exactly ``width*height`` bytes (index-stretched from the source
    bytes) so batch shape, output schema, and metadata rewriting are
    exercised without PIL; ``fake=False`` decodes real pixels through
    ``decoder``/PIL and nearest-neighbor resamples them to
    ``height×width`` (pure numpy index math — no codec needed for the
    resample itself).
    """

    def resize(batches):
        import numpy as np
        import pandas as pd
        target = width * height
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                buf = bytes(payload or b"")
                if not fake:
                    px = np.asarray(_decode_image(buf, decoder))
                    if px.ndim > 2:  # collapse channels to grayscale
                        px = px.mean(axis=-1)
                    px = np.atleast_2d(px)
                    if px.size == 0:
                        payloads.append(bytes(target))
                        continue
                    ri = (np.arange(height) * px.shape[0]) // height
                    ci = (np.arange(width) * px.shape[1]) // width
                    payloads.append(
                        px[np.ix_(ri, ci)].astype(np.uint8).tobytes())
                    continue
                if not buf:
                    payloads.append(bytes(target))
                    continue
                arr = np.frombuffer(buf, dtype=np.uint8)
                idx = (np.arange(target) * len(arr)) // target
                payloads.append(arr[idx].tobytes())
            meta = pd.DataFrame({
                "mime": ["image/raw"] * len(pdf),
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "duration_ms": [None] * len(pdf),
            })
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "payload": payloads,
                "meta": meta.to_dict("records"),
            })

    # ship only the columns the Arrow stage reads (see
    # extract_features)
    return assets.select("asset_id", "kind", "payload").mapInPandas(
        resize,
        schema=("asset_id long, kind string, payload binary, "
                "meta struct<mime:string,width:int,height:int,"
                "duration_ms:bigint>"))


def sample_frames(assets: DataFrame, every_ms: int = 1000,
                  fake: bool = True, decoder=None) -> DataFrame:
    """Frame-sampling plumbing for video assets: one output row per
    sampled frame with (asset_id, frame_no, ts_ms, frame binary).

    With ``fake=True`` emits deterministic slices of the payload as
    pseudo-frames. ``fake=False`` drives the pluggable video seam:
    ``decoder(payload, every_ms)`` must return an iterable of
    ``(ts_ms, frame_bytes)`` (the ffmpeg adapter's contract). With no
    decoder, MJPEG AVI payloads sample for REAL through the stdlib
    RIFF parser (:func:`pydin_spark.operators.riff.
    decode_avi_frames`, frames then being baseline JPEGs the stdlib
    codec can decode); other containers raise the plug-point error.
    """

    def sample(batches):
        import pandas as pd
        for pdf in batches:
            rows = {"asset_id": [], "frame_no": [], "ts_ms": [],
                    "frame": []}
            for asset_id, payload, duration in zip(
                    pdf["asset_id"], pdf["payload"],
                    pdf["meta"].map(lambda m: (m or {}).get("duration_ms"))):
                buf = bytes(payload or b"")
                if not fake:
                    vdec = decoder
                    if vdec is None and buf[:4] == b"RIFF" \
                            and buf[8:12] == b"AVI ":
                        from .riff import decode_avi_frames
                        vdec = decode_avi_frames
                    if vdec is None:
                        raise NotImplementedError(
                            "video decode covers MJPEG AVI in-"
                            "container; other containers need "
                            "ffmpeg — pass decoder= ((payload, "
                            "every_ms) -> [(ts_ms, bytes)]) to "
                            "plug one in")
                    for i, (ts, frame) in enumerate(
                            vdec(buf, every_ms)):
                        rows["asset_id"].append(asset_id)
                        rows["frame_no"].append(i)
                        rows["ts_ms"].append(int(ts))
                        rows["frame"].append(bytes(frame))
                    continue
                total = int(duration or 3000)
                for i, ts in enumerate(range(0, total, every_ms)):
                    lo = (i * 16) % max(len(buf), 1)
                    rows["asset_id"].append(asset_id)
                    rows["frame_no"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["frame"].append(buf[lo:lo + 16])
            yield pd.DataFrame(rows)

    # ship only the columns the Arrow stage reads (see
    # extract_features)
    return assets.select("asset_id", "payload", "meta").mapInPandas(
        sample, schema="asset_id long, frame_no int, ts_ms long, frame binary")
