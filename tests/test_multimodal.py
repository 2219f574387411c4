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
    from cuely_spark.ops.jpeg import decode_jpeg
    from cuely_spark.ops.multimodal import decode_png

    for r in rows:
        payload = payloads[r["media_id"]]
        if payload[:4] == b"\x89PNG":
            img = decode_png(payload)
        elif payload[:3] == b"\xff\xd8\xff":
            img = decode_jpeg(payload)
        else:
            img = decode_bmp(payload)
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


def test_png_roundtrip_and_all_filters():
    """encode_png(filter 0) round-trips; the decoder handles every PNG
    filter type (Sub/Up/Average/Paeth) on a hand-filtered stream."""
    import struct
    import zlib

    import numpy as np

    from cuely_spark.ops.multimodal import (_PNG_SIG, decode_png,
                                            encode_png)

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)

    # hand-build a stream using each filter type per row
    h, w, bpp = px.shape[0], px.shape[1], 3
    stride = w * bpp
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = [0, 1, 2, 3, 4][y % 5]
        rec = flat[y]
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = rec[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            filt[x] = (rec[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = rec
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(raw))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    payload = (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), px)


def test_png_gray_and_rgba():
    import struct
    import zlib

    import numpy as np

    from cuely_spark.ops.multimodal import _PNG_SIG, decode_png

    def mk(ctype, channels, px):
        h, w = px.shape[:2]
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        idat = zlib.compress(raw)

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I",
                                  zlib.crc32(tag + data) & 0xFFFFFFFF))
        return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
                + chunk(b"IEND", b""))

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, size=(4, 5, 1), dtype=np.uint8)
    got = decode_png(mk(0, 1, gray))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))
    rgba = rng.integers(0, 256, size=(4, 5, 4), dtype=np.uint8)
    got = decode_png(mk(6, 4, rgba))
    assert np.array_equal(got, rgba[:, :, :3])


def test_image_features_decode_png_payloads(spark):
    """The Spark feature extractor must produce REAL stats for PNG
    payloads (not the md5 stub)."""
    import numpy as np

    from cuely_spark.ops.multimodal import (MEDIA_SCHEMA, encode_png,
                                            extract_image_features)

    px = np.zeros((6, 6, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # pure-ish red
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(px)), 6, 6, None, None)],
        schema=MEDIA_SCHEMA)
    row = extract_image_features(df).collect()[0]
    assert row["mean_r"] == 200.0 and row["mean_g"] == 0.0
