"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / resize / feature-extract / frame-sample as
Arrow-batched ``mapInPandas`` kernels.

The decode path is REAL: :mod:`.codecs` implements uncompressed P6 PPM,
24-bit BMP, and zlib-deflated 8-bit PNG in pure python + numpy,
dispatched on magic bytes, so resize/features/frame-sample/roundtrip do
actual pixel math over a real compressed format too.  The remaining
compressed codecs (JPEG/H.264, exotic PNG sub-formats) raise
``NotImplementedError`` at the same dispatch seam — that is where a
production image swaps in PIL/pyav.

Payload synthesis (:func:`ppm_payload` / :func:`video_payload`) is a
Catalyst binary expression — header literal + byte-sliced text — so at
100 TB the payload column is built scan-side in the JVM and only the
``mapInPandas`` decode crosses into python, one Arrow batch at a time.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.functions.text import ascii_fold_sql

from data_pipeline_bigquery_spark.extensions.codecs import (
    decode_frames,
    decode_image,
    encode_ppm,
    resize_nearest,
)


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


def ppm_payload(text_col: str, width: int, height: int) -> Column:
    """A valid P6 PPM whose raster is the UTF-8 bytes of ``text_col``
    (truncated / space-padded to ``width*height*3``) — built entirely
    JVM-side with binary concat/substr/rpad, no python.

    The pad byte is 0x20 (space), not NUL, so the whole payload stays
    ASCII when the text is ASCII — which lets the DuckDB oracle rebuild
    the identical byte stream with VARCHAR functions and hash-verify
    the python decode kernels end to end (see the multimodal oracle SQL
    in ``queries/extensions.py``).

    NULL text rasters as an ALL-PAD payload (coalesce to '') — here
    and in :func:`video_payload`/:func:`wav_payload` — so a NULL-text
    doc still carries a total, decodable payload instead of a NULL the
    python kernels crash on; the oracles pad coalesce(text, '')
    identically (degenerate-corpus sweep catch)."""
    n = width * height * 3
    header = F.lit(f"P6\n{width} {height}\n255\n".encode())
    folded = ascii_fold_sql(f"coalesce(`{text_col}`, '')")
    body = F.expr(f"rpad(substr(encode({folded}, 'UTF-8'), 1, {n}), {n}, X'20')")
    return F.concat(header, body)


# byte offset between consecutive frames' raster views of the text —
# shared with the DuckDB oracle SQL (queries/extensions.py derives its
# substr positions from this constant, so payload geometry has ONE home)
FRAME_BYTE_STRIDE = 37


def ppm_header(width: int, height: int) -> bytes:
    """The P6 header both the JVM payload synthesis and the oracle SQL
    derive sizes from (no hardcoded 13s/589s anywhere)."""
    return f"P6\n{width} {height}\n255\n".encode()


def video_payload(text_col: str, width: int, height: int, n_frames: int) -> Column:
    """The engine's "video" container: ``n_frames`` full P6 images back
    to back, frame *i* rastered from a byte-shifted view of the text so
    frames differ deterministically.  Space-padded like
    :func:`ppm_payload` (oracle-replicable bytes)."""
    n = width * height * 3
    header = F.lit(ppm_header(width, height))
    folded = ascii_fold_sql(f"coalesce(`{text_col}`, '')")
    parts: list[Column] = []
    for i in range(n_frames):
        start = 1 + i * FRAME_BYTE_STRIDE
        parts.append(header)
        parts.append(
            F.expr(f"rpad(substr(encode({folded}, 'UTF-8'), {start}, {n}), {n}, X'20')")
        )
    return F.concat(*parts)


RESIZED_SCHEMA = "doc_id long, width int, height int, resized_bytes int, resized_md5 string"


def resize_images(
    df: DataFrame, id_col: str, payload_col: str, width: int = 224, height: int = 224
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, Arrow batch at a
    time.  Real pixel math over the pure-python codecs; binary in,
    binary-derived columns out, no driver involvement."""
    id_name, payload_name = id_col, payload_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("doc_id", "width", "height", "resized_bytes", "resized_md5")}
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                pixels = decode_image(bytes(payload))
                resized = encode_ppm(resize_nearest(pixels, width, height))
                out["doc_id"].append(int(doc_id))
                out["width"].append(width)
                out["height"].append(height)
                out["resized_bytes"].append(len(resized))
                out["resized_md5"].append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(out)

    from data_pipeline_bigquery_spark.extensions.dedup_text import spread_small_input

    # python decode is the bottleneck: one input file must not mean one worker
    return spread_small_input(
        df.select(F.col(id_col), F.col(payload_col)), key=id_col
    ).mapInPandas(
        gen, RESIZED_SCHEMA
    )


FEATURE_DIM = 16
# chunk_sums are the exact integer sufficient statistics the float means
# derive from: they make the python batch path hash-checkable by an
# engine that can't reproduce float32 model math
FEATURE_SCHEMA = "doc_id long, chunk_sums array<long>, feature array<float>"


def extract_features(df: DataFrame, id_col: str, payload_col: str, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extract: decoded pixel buffer → fixed-dim float vector,
    the embedding-model inference shape.  Deterministic "model": per-chunk
    mean intensity over the real decoded raster, L2-normalized.  A real
    model swaps the numpy block for an ONNX/torch forward pass per Arrow
    batch (vectorized, GPU-friendly batch boundary)."""
    id_name, payload_name = id_col, payload_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sums, feats = [], [], []
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                buf = decode_image(bytes(payload)).reshape(-1)
                chunks = np.array_split(buf, dim)
                v = np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)
                norm = float(np.linalg.norm(v))
                ids.append(int(doc_id))
                sums.append([int(c.sum()) for c in chunks])
                feats.append((v / norm if norm else v).tolist())
            yield pd.DataFrame({"doc_id": ids, "chunk_sums": sums, "feature": feats})

    from data_pipeline_bigquery_spark.extensions.dedup_text import spread_small_input

    return spread_small_input(
        df.select(F.col(id_col), F.col(payload_col)), key=id_col
    ).mapInPandas(
        gen, FEATURE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_md5 string"


def sample_frame_indices(n_stored: int, n_sample: int) -> list[int]:
    """Evenly-covering sample of ``n_sample`` source-frame indices out
    of ``n_stored``: ``i * n_stored // n_sample`` — spans the whole clip
    (first through last region) for ANY ratio, unlike a floor-div
    stride, which degenerates to the leading frames whenever
    ``n_stored < 2 * n_sample``.  Deduplicated (order-preserving) when
    the clip has fewer frames than requested.  Shared with the DuckDB
    oracle SQL, which embeds exactly this pick list."""
    if n_stored <= 0:
        return []
    return list(dict.fromkeys(i * n_stored // n_sample for i in range(n_sample)))


def frame_sample(df: DataFrame, id_col: str, payload_col: str, n_frames: int = 4) -> DataFrame:
    """Sample up to N frames per video via ``mapInPandas``: the payload
    is a concatenated-P6 stream; every stored frame is decoded for real
    and an evenly-covering subset re-encoded + digested.  ``frame_idx``
    is the SOURCE frame index (identifies the stored frame, not the
    sample position).  Arrow batches in, Arrow batches out, one python
    worker per partition."""
    id_name, payload_name = id_col, payload_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                frames = decode_frames(bytes(payload))
                for src_idx in sample_frame_indices(len(frames), n_frames):
                    enc = encode_ppm(frames[src_idx])
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(src_idx)
                    out["frame_bytes"].append(len(enc))
                    out["frame_md5"].append(hashlib.md5(enc).hexdigest())
            yield pd.DataFrame(out)

    from data_pipeline_bigquery_spark.extensions.dedup_text import spread_small_input

    return spread_small_input(
        df.select(F.col(id_col), F.col(payload_col)), key=id_col
    ).mapInPandas(
        gen, FRAME_SCHEMA
    )


# audio geometry — ONE home, shared by wav_payload, the kernel, and the
# DuckDB oracle SQL (queries/extensions.py derives its substr/window
# arithmetic from these, per the shared-constants rule the image oracles
# follow)
AUDIO_N_SAMPLES = 800
AUDIO_RATE = 8000
AUDIO_WINDOW = 100


def wav_payload(
    text_col: str, n_samples: int = AUDIO_N_SAMPLES, rate: int = AUDIO_RATE
) -> Column:
    """A valid unsigned-8-bit PCM mono WAV whose sample stream is the
    UTF-8 bytes of ``text_col`` (truncated / space-padded to
    ``n_samples``) — literal 44-byte header + JVM rpad/substr body,
    the audio twin of :func:`ppm_payload`.  ASCII text ⇒ every byte is
    oracle-reconstructable with VARCHAR functions."""
    from data_pipeline_bigquery_spark.extensions.codecs import wav_header

    header = F.lit(wav_header(n_samples, rate))
    folded = ascii_fold_sql(f"coalesce(`{text_col}`, '')")
    body = F.expr(
        f"rpad(substr(encode({folded}, 'UTF-8'), 1, {n_samples}), {n_samples}, X'20')"
    )
    return F.concat(header, body)


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, rate int, n_samples int, n_windows int,"
    " total_energy bigint, crossings bigint, energy_md5 string"
)


def audio_features(
    df: DataFrame, id_col: str, payload_col: str, window: int = AUDIO_WINDOW
) -> DataFrame:
    """Windowed signal features over decoded PCM — per-window energy
    (sum |sample − 128|, integer-exact) and mean-crossing count (sign
    changes of the centered signal), the cheap speech/music/silence
    discriminators an audio curation pass runs before expensive ASR.

    Real decode (`codecs.decode_audio` RIFF walk) per Arrow batch;
    features are integer sums so the DuckDB oracle reproduces them
    exactly from the same synthesized bytes, and ``energy_md5`` hashes
    the ordered per-window energies (comma-joined) to keep driver rows
    small."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline_bigquery_spark.extensions.codecs import decode_audio

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decode_audio(bytes(payload))
                dev = np.abs(samples.astype(np.int64) - 128)
                n = len(samples)
                # ceil windows: a partial tail window is a window (the
                # oracle SQL groups EVERY sample by i // window, so
                # dropping the tail would desync digest vs total_energy
                # whenever window doesn't divide n)
                n_win = (n + window - 1) // window
                energies = np.add.reduceat(dev, np.arange(0, n, window)) if n else np.array([], dtype=np.int64)
                centered = samples.astype(np.int64) < 128
                crossings = int((centered[:-1] != centered[1:]).sum())
                out.append(
                    (
                        int(doc_id),
                        int(rate),
                        n,
                        n_win,
                        int(dev.sum()),
                        crossings,
                        hashlib.md5(
                            ",".join(str(int(e)) for e in energies).encode()
                        ).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "rate", "n_samples", "n_windows",
                    "total_energy", "crossings", "energy_md5",
                ],
            )

    return df.mapInPandas(gen, AUDIO_FEATURES_SCHEMA)


PNG_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, raster_md5 string, "
    "roundtrip_ok boolean"
)


def png_roundtrip(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Compressed-format coverage: decode the P6 payload, RE-ENCODE it
    as a real zlib-deflated PNG (``codecs.encode_png``), decode THAT
    with the pure-python PNG decoder (``codecs.decode_png`` — chunk
    walk, CRC checks, scanline unfiltering), and emit the decoded
    raster's digest + a pixel-exact roundtrip flag.  The digest equals
    the original raster's md5 iff encoder and decoder are both
    faithful, which is what lets a SQL oracle (that cannot inflate
    zlib) still hash-check a compressed codec end to end."""
    id_name, payload_name = id_col, payload_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline_bigquery_spark.extensions.codecs import (
            decode_png,
            encode_png,
        )

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                pixels = decode_image(bytes(payload))
                decoded = decode_png(encode_png(pixels))
                out.append(
                    (
                        int(doc_id),
                        int(decoded.shape[1]),
                        int(decoded.shape[0]),
                        hashlib.md5(decoded.tobytes()).hexdigest(),
                        bool(np.array_equal(pixels, decoded)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "raster_md5", "roundtrip_ok",
                ],
            )

    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        spread_small_input,
    )

    return spread_small_input(
        df.select(F.col(id_col), F.col(payload_col)), key=id_col
    ).mapInPandas(gen, PNG_ROUNDTRIP_SCHEMA)


DHASH_SCHEMA = "doc_id long, dhash string"


def dhash_images(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Perceptual image hash (dHash): decode → integer grayscale →
    nearest-resize to 9×8 → 64 left-vs-right brightness comparisons →
    16-hex fingerprint.  Two images with the same dHash look alike
    even when their bytes differ (re-encode, slight crop) — the
    image-side analog of MinHash for text, and the primitive behind
    perceptual media dedup.  Pure integer math end to end
    (``(r+g+b)//3`` grayscale, the `resize_nearest` index arithmetic),
    so the DuckDB oracle rebuilds the exact fingerprint byte-for-byte
    from the synthesized raster."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline_bigquery_spark.extensions.codecs import (
            decode_image,
            resize_nearest,
        )

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_image(bytes(payload))
                gray = px.astype(np.int64).sum(axis=2) // 3  # h×w ints
                # same nearest index arithmetic as codecs.resize_nearest
                # ((out_i * in) // out), applied to the 2-D grayscale
                h, w = gray.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                small = gray[ys][:, xs]
                # MSB-first row bytes, fully vectorized
                bits = small[:, 1:] > small[:, :-1]
                out.append((int(doc_id), np.packbits(bits).tobytes().hex()))
            yield pd.DataFrame(out, columns=["doc_id", "dhash"])

    return df.mapInPandas(gen, DHASH_SCHEMA)
