"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libs in this container): the
deterministic fake decoder derives "pixels"/"samples" from md5 of the
payload, so schemas, batch shapes, partitioning, and UDF signatures are
real and tested while the codec itself is a marked substitution point.
Swap `_decode_image_stub` for a real `PIL.Image.open` (etc.) in
production — the Spark-side plumbing does not change.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("payload", T.BinaryType(), False),   # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
])


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + int(rng.integers(0, 256)))
        rows.append((
            i, kind, bytearray(payload),
            int(rng.integers(16, 257)) if kind != "audio" else None,
            int(rng.integers(16, 257)) if kind != "audio" else None,
            16000 if kind == "audio" else None,
            int(rng.integers(1, 64)) if kind == "video" else None,
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic fake pixels from md5(payload).
    Replace with a real image decode (PIL/opencv) in production."""
    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_image_features(media: DataFrame, resize_to: int = 8) -> DataFrame:
    """(media_id, mean_r, mean_g, mean_b, thumb): decode -> resize ->
    channel stats, as an Arrow-batched mapInPandas over binary payloads.
    The real pattern for 100 TB: predicate pushdown selects kind='image',
    only payload+dims cross the Arrow boundary, batches stay columnar."""

    def feats(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            # zip over column arrays, not iterrows(): the per-ROW decode
            # call is inherent to opaque binary payloads, but pandas
            # row-object construction is not
            for mid, payload, w, h in zip(
                    pdf["media_id"], pdf["payload"],
                    pdf["width"], pdf["height"]):
                img = _decode_image_stub(bytes(payload), int(w), int(h))
                # nearest-neighbor "resize" to resize_to x resize_to
                ys = np.linspace(0, img.shape[0] - 1, resize_to).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, resize_to).astype(int)
                thumb = img[np.ix_(ys, xs)]
                means = img.reshape(-1, 3).mean(axis=0)
                out.append((
                    int(mid), float(means[0]), float(means[1]),
                    float(means[2]), bytearray(thumb.tobytes()),
                ))
            yield pd.DataFrame(
                out, columns=["media_id", "mean_r", "mean_g", "mean_b",
                              "thumb"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(feats, schema=("media_id long, mean_r double, "
                                    "mean_g double, mean_b double, "
                                    "thumb binary"))
    )


def sample_video_frames(media: DataFrame, every: int = 10) -> DataFrame:
    """(media_id, frame_idx): frame-sampling plan rows (decode stubbed
    out — the real kernel would emit decoded frames per sampled index)."""
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id",
                F.explode(F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every)))
                .alias("frame_idx"))
    )


def audio_chunk_stats(media: DataFrame, chunk_ms: int = 250) -> DataFrame:
    """(media_id, chunk_idx, rms): STUB 'decode' derives samples from
    md5(payload); chunking/batching plumbing is real."""

    def stats(batches):
        import pandas as pd

        for pdf in batches:
            mids, chunks, rmss = [], [], []
            for mid, payload, sr in zip(pdf["media_id"], pdf["payload"],
                                        pdf["sample_rate"]):
                seed = int(hashlib.md5(bytes(payload)).hexdigest()[:8], 16)
                rng = np.random.default_rng(seed)
                sr = int(sr)
                samples = rng.normal(size=sr)  # 1 fake second
                step = sr * chunk_ms // 1000
                # vectorized per-chunk RMS: reduceat over squared samples
                starts = np.arange(0, samples.size, step)
                sums = np.add.reduceat(samples ** 2, starts)
                lens = np.diff(np.append(starts, samples.size))
                rms = np.sqrt(sums / lens)
                mids.extend([int(mid)] * rms.size)
                chunks.extend(range(rms.size))
                rmss.extend(rms.tolist())
            yield pd.DataFrame({"media_id": mids, "chunk_idx": chunks,
                                "rms": rmss})

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "sample_rate")
        .mapInPandas(stats,
                     schema="media_id long, chunk_idx int, rms double")
    )
