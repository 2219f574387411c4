"""Multimodal plumbing tests: schemas, batch shapes, deterministic stub
decoders (the decode itself is a marked stub — no media libs here)."""

import numpy as np


def test_media_table_and_image_features(spark):
    from cuely_spark.ops.multimodal import (
        extract_image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30, seed=42)
    assert media.count() == 30
    feats = extract_image_features(media, resize_to=4).orderBy("media_id")
    rows = feats.collect()
    assert len(rows) == 10  # every 3rd row is an image
    for r in rows:
        assert 0 <= r["mean_r"] <= 255
        assert len(bytes(r["thumb"])) == 4 * 4 * 3
    # deterministic: same seed -> same features
    rows2 = extract_image_features(synthetic_media(spark, n=30, seed=42),
                                   resize_to=4).orderBy("media_id").collect()
    assert [r["mean_r"] for r in rows] == [r["mean_r"] for r in rows2]


def test_video_frame_sampling(spark):
    from cuely_spark.ops.multimodal import sample_video_frames, synthetic_media

    media = synthetic_media(spark, n=30, seed=42)
    frames = sample_video_frames(media, every=10)
    vids = {r["media_id"]: r["n_frames"] for r in
            media.filter("kind = 'video'").collect()}
    got = frames.groupBy("media_id").count().collect()
    for r in got:
        exp = (vids[r["media_id"]] + 9) // 10
        assert r["count"] == exp


def test_audio_chunk_stats(spark):
    from cuely_spark.ops.multimodal import audio_chunk_stats, synthetic_media

    media = synthetic_media(spark, n=12, seed=1)
    stats = audio_chunk_stats(media, chunk_ms=250).collect()
    assert len(stats) == 4 * len(
        media.filter("kind = 'audio'").collect())  # 1s fake / 250ms
    assert all(np.isfinite(r["rms"]) and r["rms"] > 0 for r in stats)
