"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed by Arrow-batched Pandas
iterators (mapInPandas).

The Spark-side contract (schema, partitioning, batch shape, UDF
signatures) is real and tested; the *codec* step is stubbed because
image/audio libraries are not in this container: `decode_image` raises
NotImplementedError unless a PIL import succeeds, and the feature
extractor uses a deterministic byte-statistics fake so pipelines remain
end-to-end testable. Swapping in a real decoder touches ONLY the
`_decode` internals — batch plumbing is unchanged.

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


def _decode_real(payload: bytes):
    try:
        from PIL import Image  # noqa: F401  (not in this container)
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL/pillow — not present in this "
            "environment; the deterministic fake feature path is used in "
            "pipelines instead"
        ) from exc


def _fake_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic byte-statistics features: histogram of byte values
    folded into `dim` buckets, L1-normalized. Stands in for a real
    decode+embed; stable across runs and engines."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, (id, n_bytes,
    feat) batches out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                "feat": payloads.map(lambda b: _fake_features(b, dim).tolist()),
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
    typed metadata (width/height) out — the Spark-side contract a real
    PIL `Image.resize` drops into. The deterministic fake keeps every
    (target_w*target_h)-th byte via a numpy stride so output size is
    exactly w*h bytes; the real decoder (`_decode_real`) stays gated
    behind the PIL import per the environment contract."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            payloads = []
            metas = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(buf) == 0:
                    out = b""
                else:
                    idx = np.linspace(0, len(buf) - 1, num=min(n_out, len(buf))).astype(np.int64)
                    out = buf[idx].tobytes()
                payloads.append(out)
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = target_w, target_h
                metas.append(m)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads, "meta": metas})

    return media.mapInPandas(op, schema=RESIZE_SCHEMA)
