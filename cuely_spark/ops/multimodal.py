"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decoding is REAL for the formats this container can decode without
codec libraries:

- **BMP** (24-bit uncompressed) — pure-numpy header parse + row gather;
- **PNG** (8-bit gray/RGB/RGBA, non-interlaced) — stdlib zlib inflate
  + numpy per-row unfiltering (all five filter types incl. Paeth);
- **WAV** (PCM) — stdlib ``wave`` + numpy frombuffer;
- **JPEG** (baseline sequential, ITU-T T.81) — Annex-K Huffman +
  dequant + IDCT in ops/jpeg.py, with a matching encoder for
  round-trip tests (progressive streams raise).

Codecs needing a real media library (MP3/AAC/H.264, progressive
JPEG, WebP) remain a marked substitution point: payloads whose magic
bytes aren't BMP/PNG/JPEG/WAV fall back to the deterministic md5 stub
so schemas,
batch shapes, partitioning, and UDF signatures stay real and tested
everywhere. Swap `_decode_image` / `_decode_audio`'s fallback branch
for PIL/ffmpeg in production — the Spark-side plumbing does not
change.
"""

from __future__ import annotations

import hashlib
import io
import struct

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


# ---------------------------------------------------------------------------
# real codecs (no external libs)

def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> 24-bit uncompressed BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR, 4-byte row padding)."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # BGR, flip
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> RGB uint8 (h, w, 3). Pure numpy."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, "
                         f"compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                         offset=offset).reshape(h, row_bytes)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> PNG bytes (8-bit truecolor, filter 0 per
    row, one zlib IDAT). Pure stdlib: zlib deflate + crc32."""
    import zlib

    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 9)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> RGB uint8 (h, w, 3). Pure stdlib zlib inflate + numpy
    per-row unfiltering (all five filter types incl. Paeth; 8-bit
    gray / RGB / RGBA, no interlace). Closes the codec gap the builder
    brief calls out — PNG needs no codec library, only DEFLATE."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, "
                         f"interlace={interlace})")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    bpp = channels
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride,
                             offset=y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:    # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0      # left
                b = prev[x]                              # up
                if ftype == 1:    # Sub
                    rec[x] = (rec[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[x] = (rec[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    rec[x] = (rec[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    img = out.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    elif channels == 4:
        img = img[:, :, :3]
    return img


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> PCM WAV bytes (stdlib wave)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float64 mono samples in [-1, 1), sample_rate)."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    s = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        s = s.reshape(-1, nch).mean(axis=1)
    return s, sr


# ---------------------------------------------------------------------------
# decode dispatch: real where the bytes are decodable here, loud stub
# fallback for compressed codecs (the production substitution point)

def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        # REAL baseline JPEG decode (stdlib+numpy, ops/jpeg.py);
        # progressive/arithmetic streams raise loudly rather than
        # returning silently wrong pixels
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    # SUBSTITUTION POINT: remaining compressed formats (WebP/AVIF/...)
    # need a codec lib not shipped in this container — deterministic
    # fake pixels keep the pipeline testable end-to-end
    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def _decode_audio(payload: bytes, sample_rate: int):
    """-> (samples, real sample rate). The HEADER's rate wins over the
    metadata column — chunk boundaries must track the actual audio."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    # SUBSTITUTION POINT: MP3/AAC need ffmpeg — deterministic fake
    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.normal(size=int(sample_rate)), int(sample_rate)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table matching MEDIA_SCHEMA with REAL
    payloads: images are 24-bit BMPs, audio is PCM WAV (so the decode
    path is exercised for real); video payloads stay opaque (frame
    sampling is plan-level)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.integers(4, 33))
            h = int(rng.integers(4, 33))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            # rotate the real codecs so ALL decode paths run end-to-end
            which = (i // 3) % 3
            if which == 0:
                payload = encode_bmp(px)
            elif which == 1:
                payload = encode_png(px)
            else:
                from .jpeg import encode_jpeg

                payload = encode_jpeg(px, quality=92)
            rows.append((i, kind, bytearray(payload), w, h, None, None))
        elif kind == "audio":
            sr = 16000
            nsamp = int(rng.integers(sr // 4, sr))
            samples = (rng.normal(scale=0.2, size=nsamp)
                       * 32767).clip(-32768, 32767).astype(np.int16)
            rows.append((i, kind, bytearray(encode_wav(samples, sr)),
                         None, None, sr, None))
        else:
            payload = rng.bytes(128 + int(rng.integers(0, 256)))
            rows.append((i, kind, bytearray(payload),
                         int(rng.integers(16, 257)),
                         int(rng.integers(16, 257)),
                         None, int(rng.integers(1, 64))))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


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
                img = _decode_image(bytes(payload), int(w), int(h))
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
    """(media_id, chunk_idx, rms): real PCM decode for WAV payloads
    (md5 stub fallback for compressed codecs); chunked RMS vectorized
    with reduceat."""

    def stats(batches):
        import pandas as pd

        for pdf in batches:
            mids, chunks, rmss = [], [], []
            for mid, payload, sr in zip(pdf["media_id"], pdf["payload"],
                                        pdf["sample_rate"]):
                samples, sr = _decode_audio(bytes(payload), int(sr))
                step = max(1, sr * chunk_ms // 1000)
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
