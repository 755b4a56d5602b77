"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed by Arrow-batched Pandas
iterators (mapInPandas).

The Spark-side contract (schema, partitioning, batch shape, UDF
signatures) is real and tested. The codec layer is tiered:

- REAL pure-NumPy decoders for PPM (P6) and BMP (24-bit uncompressed)
  — formats whose headers are a few dozen lines of NumPy, needing no
  external image library. `decode_image` returns an (h, w, 3) uint8
  array; `encode_ppm` round-trips. Feature extraction and resize
  operate on REAL pixels whenever the payload decodes.
- Other formats (JPEG/PNG/...) stay gated behind a PIL import that is
  absent in this container (`NotImplementedError` with an actionable
  message), falling back to deterministic byte-statistics features so
  pipelines remain end-to-end testable.

Scale notes: binary payloads ride the scan (parquet binary columns are
page-compressed); mapInPandas streams Arrow batches so peak memory is
one batch per core, and `maxRecordsPerBatch` bounds it for fat blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType(), True),       # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = "media_id long, n_bytes long, feat array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA table from the documents fixture (text bytes
    as a stand-in payload) — the typed-binary-column contract the
    reference's BinaryType rows map to (SURVEY §1.2 Binary*)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


# ---- real pure-NumPy codecs (PPM P6, BMP 24bpp) ---------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "PPM P6 is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray:
    """P6 parser: magic, whitespace/comment-tolerant header of
    width/height/maxval, then raw RGB rows."""
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255 (16-bit) not supported")
    pos += 1  # single whitespace after maxval, then raster
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """BMP (BITMAPINFOHEADER, 24 bpp, BI_RGB uncompressed): BGR rows,
    4-byte-aligned, bottom-up (top-down when height < 0)."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} not supported")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode → (h, w, 3) uint8 RGB. PPM/BMP are native NumPy;
    anything else requires PIL (absent in this container → actionable
    NotImplementedError, callers fall back to byte-statistics
    features)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    try:
        from PIL import Image  # noqa: F401  (not in this container)
    except ImportError as exc:
        raise NotImplementedError(
            "only PPM(P6)/BMP(24bpp) decode natively; other formats need "
            "PIL/pillow, absent in this environment — byte-statistics "
            "fallback features are used instead"
        ) from exc
    raise NotImplementedError("PIL present but format handler not wired")


def _try_decode(payload: bytes) -> np.ndarray | None:
    if payload is None or len(payload) < 2 or payload[:2] not in (b"P6", b"BM"):
        return None
    try:
        return decode_image(payload)
    except (ValueError, NotImplementedError, IndexError):
        return None


def _pixel_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real pixel statistics: per-channel mean/std (scaled to [0,1]) +
    a (dim-6)-bin luminance histogram (L1-normalized) — deterministic,
    resolution-invariant."""
    px = img.astype(np.float64)
    mean = px.mean(axis=(0, 1)) / 255.0
    std = px.std(axis=(0, 1)) / 255.0
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(luma, bins=max(dim - 6, 1), range=(0.0, 255.0))[0].astype(np.float64)
    hist = hist / max(hist.sum(), 1.0)
    return np.concatenate([mean, std, hist]).astype(np.float32)


def _block_mean_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Area-average resize via bucketed accumulation (the real kernel a
    PIL `resize(..., BOX)` computes): each source pixel contributes to
    the target cell its center falls in — exact for integer shrink
    factors, deterministic for all."""
    h, w, _ = img.shape
    yi = np.minimum((np.arange(h) * th) // h, th - 1)
    xi = np.minimum((np.arange(w) * tw) // w, tw - 1)
    out = np.zeros((th, tw, 3), dtype=np.float64)
    cnt = np.zeros((th, tw, 1), dtype=np.float64)
    np.add.at(out, (yi[:, None], xi[None, :]), img.astype(np.float64))
    np.add.at(cnt, (yi[:, None], xi[None, :]), 1.0)
    return np.rint(out / np.maximum(cnt, 1.0)).astype(np.uint8)


def _fake_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic byte-statistics features: histogram of byte values
    folded into `dim` buckets, L1-normalized. Stands in for a real
    decode+embed; stable across runs and engines."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def ppm_media_from_documents(docs: DataFrame, w: int = 16, h: int = 16) -> DataFrame:
    """MEDIA_SCHEMA table whose payloads are REAL PPM(P6) images,
    deterministically rendered from each document's text bytes (tiled
    into the w×h×3 raster) — gives the decode path genuine pixels to
    chew on with zero external fixtures. mapInPandas because the PPM
    encode is a Python kernel; Arrow-batched like every other op here."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = w * h * 3
        for pdf in batches:
            payloads = []
            for s in pdf["text"]:
                raw = (s or "").encode("utf-8")
                buf = (
                    np.frombuffer((raw * (n // max(len(raw), 1) + 1))[:n], dtype=np.uint8)
                    if raw else np.zeros(n, dtype=np.uint8)
                )
                payloads.append(encode_ppm(buf.reshape(h, w, 3)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = docs.select("doc_id", "text").mapInPandas(
        op, schema="media_id long, payload binary"
    )
    return media.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.lit(w).cast("int").alias("width"),
            F.lit(h).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, (id, n_bytes,
    feat) batches out. Payloads that decode (PPM/BMP) get REAL pixel
    statistics; opaque formats fall back to byte statistics."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feat(b):
            img = _try_decode(b)
            return (_pixel_features(img, dim) if img is not None
                    else _fake_features(b, dim)).tolist()

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                "feat": payloads.map(feat),
            })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing (video analog): slice the payload into
    fixed-stride 'frames'. Real decoders replace the slicing only."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = ("media_id long, payload binary, "
                 "meta struct<kind:string,mime:string,width:int,height:int,duration_ms:bigint>")


def resize_images(media: DataFrame, target_w: int = 16, target_h: int = 16) -> DataFrame:
    """mapInPandas resize: payload in, downsampled payload + UPDATED
    typed metadata (width/height) out. Decodable payloads (PPM/BMP) go
    through a REAL area-average pixel resize and re-encode as PPM;
    opaque payloads keep the deterministic byte-stride downsample so
    the pipeline shape is format-independent."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            payloads = []
            metas = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = _try_decode(bytes(payload) if payload is not None else None)
                if img is not None:
                    out = encode_ppm(_block_mean_resize(img, target_w, target_h))
                else:
                    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                    if len(buf) == 0:
                        out = b""
                    else:
                        idx = np.linspace(0, len(buf) - 1, num=min(n_out, len(buf))).astype(np.int64)
                        out = buf[idx].tobytes()
                payloads.append(out)
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = target_w, target_h
                if img is not None:
                    m["mime"] = "image/x-portable-pixmap"
                metas.append(m)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads, "meta": metas})

    return media.mapInPandas(op, schema=RESIZE_SCHEMA)


CHANNEL_SUM_SCHEMA = "media_id long, r_sum long, g_sum long, b_sum long"


def channel_sums(media: DataFrame) -> DataFrame:
    """mapInPandas: decode payload → EXACT integer per-channel pixel
    sums (int64 — no float path at all), for value-level verification
    of decode/resize kernels. Rows whose payload does not decode are
    dropped (same policy as sample_frames for NULL payloads)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rs, gs, bs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _try_decode(bytes(payload) if payload is not None else None)
                if img is None:
                    continue
                s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                ids.append(mid)
                rs.append(int(s[0]))
                gs.append(int(s[1]))
                bs.append(int(s[2]))
            yield pd.DataFrame({"media_id": ids, "r_sum": rs, "g_sum": gs, "b_sum": bs})

    return media.mapInPandas(op, schema=CHANNEL_SUM_SCHEMA)


# ---- real WAV (RIFF/PCM) codec --------------------------------------------
# The audio sibling of the PPM/BMP discipline above: header + frame
# parsing is a few dozen lines of NumPy, so the decode is REAL;
# compressed codecs (MP3/AAC/IEEE-float WAV) would need an audio
# library absent in this container and raise an actionable
# NotImplementedError instead.


def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """int16 PCM samples (1-D, or (n, channels) interleaved on write) →
    canonical 44-byte-header RIFF/WAVE bytes."""
    a = np.ascontiguousarray(samples, dtype="<i2")
    data = a.tobytes()
    n = len(data)
    byte_rate = sample_rate * channels * 2
    return (
        b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")                  # wFormatTag: PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")       # block align
        + (16).to_bytes(2, "little")                 # bits per sample
        + b"data" + n.to_bytes(4, "little")
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Real RIFF chunk walk → ((n, channels) int16 array, sample_rate,
    channels). Handles non-canonical chunk order and extra chunks
    (LIST/fact/cue) by walking the chunk directory; PCM 16-bit only —
    IEEE-float / ADPCM / compressed payloads raise
    NotImplementedError (they need an audio library this container
    doesn't ship)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = {
                "tag": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt["tag"] != 1 or fmt["bits"] != 16:
        raise NotImplementedError(
            f"only PCM 16-bit WAV decodes natively (tag={fmt['tag']}, "
            f"bits={fmt['bits']}); float/ADPCM/compressed audio needs an "
            "audio library absent in this environment")
    ch = max(fmt["channels"], 1)
    frames = len(data) // (2 * ch)
    samples = np.frombuffer(data, dtype="<i2", count=frames * ch)
    return samples.reshape(frames, ch), fmt["rate"], ch


def wav_media_from_documents(docs: DataFrame, n_samples: int = 256,
                             sample_rate: int = 8000) -> DataFrame:
    """MEDIA_SCHEMA-shaped table whose payloads are REAL PCM WAV files,
    deterministically rendered from each document's text bytes: byte i
    of the UTF-8 text (tiled to n_samples) becomes int16 sample
    (byte − 128) · 256. Same zero-external-fixtures discipline as
    ppm_media_from_documents — and the byte→sample map is exactly
    recoverable in SQL, so amplitude statistics get a value oracle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for s in pdf["text"]:
                raw = (s or "").encode("utf-8")
                buf = (
                    np.frombuffer((raw * (n_samples // max(len(raw), 1) + 1))
                                  [:n_samples], dtype=np.uint8)
                    if raw else np.zeros(n_samples, dtype=np.uint8)
                )
                samples = (buf.astype(np.int16) - 128) * 256
                payloads.append(encode_wav(samples, sample_rate))
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = docs.select("doc_id", "text").mapInPandas(
        op, schema="media_id long, payload binary")
    return media.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("audio").alias("kind"),
            F.lit("audio/wav").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(n_samples * 1000 // sample_rate).cast("long")
            .alias("duration_ms"),
        ).alias("meta"),
    )


AUDIO_STATS_SCHEMA = ("media_id long, channels int, sample_rate int, "
                      "n_samples long, duration_ms long, mean_amp double, "
                      "peak bigint, rms double")


def audio_stats(media: DataFrame) -> DataFrame:
    """mapInPandas audio analysis: real WAV header+frame parse →
    (channels, sample_rate, n_samples, duration_ms) from the header
    directory and (mean_amp, peak, rms) from the PCM frames. Exact
    float discipline mirrors _pixel_features: integer sample sums are
    exact in float64; mean = sum/n and rms = sqrt(sumsq/n) round
    identically in any engine. Payloads that don't parse as PCM WAV
    are dropped (same policy as channel_sums for undecodable images)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "channels", "sample_rate",
                                   "n_samples", "duration_ms", "mean_amp",
                                   "peak", "rms")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, rate, ch = decode_wav(
                        bytes(payload) if payload is not None else b"")
                except (ValueError, NotImplementedError):
                    continue
                flat = samples.astype(np.int64).ravel()
                n = len(flat)
                out["media_id"].append(mid)
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n // ch)
                out["duration_ms"].append((n // ch) * 1000 // max(rate, 1))
                out["mean_amp"].append(float(flat.sum()) / n if n else 0.0)
                out["peak"].append(int(np.abs(flat).max()) if n else 0)
                out["rms"].append(
                    float(np.sqrt(float((flat * flat).sum()) / n)) if n
                    else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=AUDIO_STATS_SCHEMA)
