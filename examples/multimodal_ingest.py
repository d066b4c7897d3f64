"""Multimodal ingest — every modality decoded for REAL in-container.

Run:  python examples/multimodal_ingest.py [out_dir]

Synthesizes a mixed asset lake (PNG + JPEG images, PCM WAV audio,
MJPEG AVI video — all via the stdlib codec family), lands it as a
binary-payload parquet table, then runs the real ``fake=False``
paths end-to-end:

images → decode (stdlib PNG/JPEG) → per-chunk pixel-mean features →
  near-duplicate pairs by feature cosine;
audio → stdlib WAV decode → per-chunk RMS energy envelope;
video → RIFF walk → one frame per second → per-frame JPEG decode →
  per-frame features.

Every decode runs inside an Arrow-batched ``mapInPandas`` stage over
the payload column — the pipeline scales by partitioning over assets
(no driver-side payload ever), so the same script is the 100 TB plan
with PIL/ffmpeg plugged through the ``decoder=`` seam for compressed
formats.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from pyspark.sql import functions as F

from pydin_spark import get_session, load_table
from pydin_spark.operators import multimodal, similarity
from pydin_spark.operators.jpeg import encode_jpeg
from pydin_spark.operators.riff import encode_avi_mjpeg, encode_wav

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("multimodal-ingest", master="local[8]",
                        extra_conf={"spark.driver.memory": "6g"})
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    # 1. synthesize the asset lake from document text (deterministic):
    #    PNG/JPEG tiles, a WAV tone-ish sample stream, a 3-frame AVI
    @F.pandas_udf("binary")
    def make_asset(texts, kinds):
        import pandas as pd
        out = []
        for t, k in zip(texts, kinds):
            b = ((t or "").encode("utf-8") + b" " * 16)[:16]
            px = np.frombuffer(b, np.uint8).reshape(4, 4)
            tile = np.repeat(np.repeat(px, 4, 0), 4, 1)   # 16x16
            if k == "png":
                out.append(multimodal.encode_png(tile))
            elif k == "jpeg":
                out.append(encode_jpeg(tile, quality=90))
            elif k == "audio":
                out.append(encode_wav(np.frombuffer(
                    (b * 64), np.uint8), sample_rate=8000))
            else:                                          # video
                frames = [encode_jpeg(np.full((8, 8), v, np.uint8),
                                      quality=90) for v in b[:3]]
                out.append(encode_avi_mjpeg(frames, fps=1))
        return pd.Series(out)

    kinds = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("audio"),
                F.lit("video")),
        (F.col("doc_id") % 4 + 1).cast("int"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(kinds.isin("png", "jpeg"), "image")
        .otherwise(kinds).alias("kind"),
        make_asset("text", kinds).alias("payload"),
        F.struct(F.lit(None).cast("string").alias("mime"),
                 F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.lit(3000).cast("long").alias("duration_ms"))
        .alias("meta"))
    assets.write.mode("overwrite").parquet(f"{out_dir}/assets")
    lake = spark.read.parquet(f"{out_dir}/assets")
    print("asset lake:", lake.count(), "rows ->", f"{out_dir}/assets")

    # 2. images: real decode -> features -> near-dup pairs by cosine
    images = lake.where("kind = 'image'")
    feats = multimodal.extract_features(images, dim=8, fake=False)
    emb = feats.select(F.col("asset_id").alias("vec_id"),
                       F.col("feature").alias("embedding"))
    dups = similarity.cosine_dup_pairs(emb, threshold=0.999,
                                       method="block")
    print("image assets:", images.count(),
          "near-dup feature pairs:", dups.count())

    # 3. audio: real WAV decode -> RMS energy envelope
    audio = multimodal.extract_audio_features(
        lake.where("kind = 'audio'"), dim=4, fake=False)
    audio.write.mode("overwrite").parquet(f"{out_dir}/audio_features")
    print("audio assets:", audio.count(), "(per-chunk RMS written)")

    # 4. video: RIFF walk -> 1 frame/s -> per-frame real JPEG decode
    frames = multimodal.sample_frames(lake.where("kind = 'video'"),
                                      every_ms=1000, fake=False)
    frame_feats = multimodal.extract_features(
        frames.select(
            (F.col("asset_id") * 10 + F.col("frame_no"))
            .alias("asset_id"),
            F.lit("image").alias("kind"),
            F.col("frame").alias("payload"),
            F.lit(None).cast(
                "struct<mime:string,width:int,height:int,"
                "duration_ms:bigint>").alias("meta")),
        dim=2, fake=False)
    frame_feats.write.mode("overwrite").parquet(f"{out_dir}/frames")
    print("video frames decoded:", frame_feats.count())
    spark.stop()


if __name__ == "__main__":
    main()
