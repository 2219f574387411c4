"""Multimodal tests: real BMP/WAV codecs (pure numpy / stdlib wave),
decode dispatch with the marked stub fallback for compressed formats,
and the Arrow-batched feature/chunk plumbing."""

import numpy as np


def test_bmp_roundtrip_and_wav_roundtrip():
    from cuely_spark.ops.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    for h, w in [(5, 7), (8, 8), (1, 13)]:  # odd widths hit row padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)
    s = (rng.normal(scale=0.3, size=5000) * 32767).clip(
        -32768, 32767).astype(np.int16)
    dec, sr = decode_wav(encode_wav(s, 16000))
    assert sr == 16000
    np.testing.assert_allclose(dec, s.astype(np.float64) / 32768.0)


def test_decode_dispatch_fallback_is_deterministic():
    from cuely_spark.ops.multimodal import _decode_audio, _decode_image

    blob = b"\x89PNG not really" * 8  # not BMP/WAV -> stub branch
    a = _decode_image(blob, 6, 4)
    b = _decode_image(blob, 6, 4)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 6, 3)
    s1, sr1 = _decode_audio(blob, 100)
    s2, sr2 = _decode_audio(blob, 100)
    assert sr1 == sr2 == 100
    np.testing.assert_array_equal(s1, s2)


def test_media_table_and_image_features(spark):
    from cuely_spark.ops.multimodal import (
        decode_bmp,
        extract_image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30, seed=42)
    assert media.count() == 30
    feats = extract_image_features(media, resize_to=4).orderBy("media_id")
    rows = feats.collect()
    assert len(rows) == 10  # every 3rd row is an image
    # features come from REAL decoded pixels: recompute locally
    payloads = {r["media_id"]: bytes(r["payload"]) for r in
                media.filter("kind = 'image'").collect()}
    for r in rows:
        img = decode_bmp(payloads[r["media_id"]])
        np.testing.assert_allclose(
            [r["mean_r"], r["mean_g"], r["mean_b"]],
            img.reshape(-1, 3).mean(axis=0))
        assert len(bytes(r["thumb"])) == 4 * 4 * 3


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


def test_audio_chunk_stats_real_wav(spark):
    from cuely_spark.ops.multimodal import (
        audio_chunk_stats,
        decode_wav,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12, seed=1)
    stats = audio_chunk_stats(media, chunk_ms=250).collect()
    payloads = {r["media_id"]: bytes(r["payload"]) for r in
                media.filter("kind = 'audio'").collect()}
    by_media: dict[int, dict[int, float]] = {}
    for r in stats:
        by_media.setdefault(r["media_id"], {})[r["chunk_idx"]] = r["rms"]
    assert set(by_media) == set(payloads)
    for mid, chunks in by_media.items():
        samples, sr = decode_wav(payloads[mid])
        step = sr * 250 // 1000
        exp_n = -(-samples.size // step)
        assert len(chunks) == exp_n
        # first chunk's RMS matches a local recompute of the real PCM
        np.testing.assert_allclose(
            chunks[0], float(np.sqrt(np.mean(samples[:step] ** 2))))
