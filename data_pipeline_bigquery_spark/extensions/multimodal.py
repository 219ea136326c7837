"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / frame-sample as Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED:
``_decode_frames`` produces deterministic fake "frames" (fixed-size byte
slices) and is clearly marked.  Everything around it — binary column
handling, schema, batch iteration, partition parallelism — is the real
Spark plumbing a production decoder would drop into.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_SIZE = 4096  # bytes per fake "frame"

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_md5 string"


def binary_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Typed metadata over an opaque binary payload column: byte length,
    content digest, chunk count for a 64 KiB chunked store."""
    payload = F.col(payload_col)
    byte_len = F.length(payload).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        byte_len.alias("byte_len"),
        F.md5(payload).alias("content_md5"),
        F.ceil(byte_len / F.lit(65536.0)).cast("int").alias("n_chunks"),
    )


def _decode_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """STUB decoder. A real implementation would call PIL/pyav here:

        raise NotImplementedError("codec not available in this image")

    Instead we return deterministic byte slices so the distributed
    plumbing (schema, batching, hashing) is testable end-to-end.
    """
    if payload is None:
        return []
    step = max(len(payload) // max(n_frames, 1), 1)
    return [payload[i * step : i * step + FRAME_SIZE] for i in range(n_frames) if i * step < len(payload)]


RESIZED_SCHEMA = "doc_id long, width int, height int, resized_bytes int, resized_md5 string"

FEATURE_DIM = 16
# chunk_sums are the exact integer sufficient statistics the float means
# derive from: they make the python batch path hash-checkable by an
# engine that can't reproduce float32 model math
FEATURE_SCHEMA = "doc_id long, chunk_sums array<long>, feature array<float>"


def _decode_image(payload: bytes) -> bytes:
    """STUB image decoder — a real one calls ``PIL.Image.open`` here
    (``raise NotImplementedError("PIL not available in this image")``).
    Returns the payload as the fake "pixel buffer"."""
    return payload or b""


def resize_images(
    df: DataFrame, id_col: str, payload_col: str, width: int = 224, height: int = 224
) -> DataFrame:
    """Decode → resize → re-encode, Arrow batch at a time.  The resize
    itself is stubbed (deterministic truncate/pad of the fake pixel
    buffer to width*height bytes); the ``mapInPandas`` shape — binary in,
    binary-derived columns out, no driver involvement — is exactly the
    production pattern."""
    import hashlib

    id_name, payload_name = id_col, payload_col
    target = width * height

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("doc_id", "width", "height", "resized_bytes", "resized_md5")}
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                buf = _decode_image(payload)
                resized = buf[:target].ljust(target, b"\0")
                out["doc_id"].append(int(doc_id))
                out["width"].append(width)
                out["height"].append(height)
                out["resized_bytes"].append(len(resized))
                out["resized_md5"].append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(out)

    from data_pipeline_bigquery_spark.extensions.dedup_text import spread_small_input

    return spread_small_input(df.select(F.col(id_col), F.col(payload_col))).mapInPandas(
        gen, RESIZED_SCHEMA
    )


def extract_features(df: DataFrame, id_col: str, payload_col: str, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extract: binary payload → fixed-dim float vector, the
    embedding-model inference shape.  STUB model: per-chunk mean byte
    value, L2-normalized — deterministic, so tests can assert values.
    A real model swaps the numpy block for an ONNX/torch forward pass
    per Arrow batch (vectorized, GPU-friendly batch boundary)."""
    import numpy as np

    id_name, payload_name = id_col, payload_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sums, feats = [], [], []
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                buf = np.frombuffer(_decode_image(payload), dtype=np.uint8)
                chunks = np.array_split(buf, dim) if buf.size else [np.array([])] * dim
                v = np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)
                norm = float(np.linalg.norm(v))
                ids.append(int(doc_id))
                sums.append([int(c.sum()) for c in chunks])
                feats.append((v / norm if norm else v).tolist())
            yield pd.DataFrame({"doc_id": ids, "chunk_sums": sums, "feature": feats})

    from data_pipeline_bigquery_spark.extensions.dedup_text import spread_small_input

    return spread_small_input(df.select(F.col(id_col), F.col(payload_col))).mapInPandas(
        gen, FEATURE_SCHEMA
    )


def frame_sample(df: DataFrame, id_col: str, payload_col: str, n_frames: int = 4) -> DataFrame:
    """Sample N "frames" per document via ``mapInPandas`` — Arrow batches
    in, Arrow batches out, one python worker per partition.  This is the
    pattern (and the exact signature) a real video frame-sampler uses;
    only ``_decode_frames`` is fake."""
    import hashlib

    id_name, payload_name = id_col, payload_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                for idx, frame in enumerate(_decode_frames(payload, n_frames)):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    from data_pipeline_bigquery_spark.extensions.dedup_text import spread_small_input

    # python decode is the bottleneck: one input file must not mean one worker
    return spread_small_input(df.select(F.col(id_col), F.col(payload_col))).mapInPandas(
        gen, FRAME_SCHEMA
    )
