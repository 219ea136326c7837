"""Media-lake ingestion via Spark's built-in ``binaryFile`` source.

The multimodal pillar so far synthesizes payloads in-plan
(`extensions/multimodal.py`); a real training-data lake instead holds
millions of media FILES (images, audio, video segments) under a
prefix, and the ingestion step is "scan the directory into a binary
column".  Spark ships a first-class source for exactly this:
``spark.read.format("binaryFile")`` yields one row per file with
``(path, modificationTime, length, content)`` — distributed listing,
no driver-side walk, and files are assigned to tasks by size
(``spark.sql.files.maxPartitionBytes``), so a 100 TB media prefix
scans with the same partitioning machinery as parquet.

Scale notes:
- ``pathGlobFilter`` prunes non-media files at LISTING time (never
  opened).  Column pruning applies too: a query that only needs
  ``length``/``path`` (e.g. an inventory) never reads file bytes —
  the source skips content materialization (verify: ReadSchema in
  the scan node omits ``content``).
- Downstream dedup should hash content once and shuffle the 32-byte
  digest, never the payload (`multimodal_binary_dedup` pattern).
- The per-row file WRITER here is fixture scaffolding for this
  sandbox (a lake would already have the files).  It still writes
  executor-side via ``foreachPartition`` — no driver collect — so
  the shape is honest; a cluster deployment would swap ``open`` for
  the Hadoop FileSystem API or write through a blob-store client.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: magic-byte prefixes → media kind (hex, matched against the head of
#: the binary content — pure codegen, no UDF)
_MAGIC = {
    "50360a": "ppm",      # "P6\n"
    "424d": "bmp",        # "BM"
    "52494646": "riff",   # "RIFF" (WAV/AVI container)
    "ffd8ff": "jpeg",
    "89504e47": "png",
}


def write_media_dir(
    df: DataFrame, path: str, name_col: str, payload_col: str
) -> None:
    """Write one file per row, executor-side.

    ``name_col`` must be unique per row (it becomes the filename) and
    ``payload_col`` must be binary.  The target directory is created
    driver-side once; each partition then writes its own rows locally.
    Deterministic overwrite: same name → same file rewritten.
    """
    os.makedirs(path, exist_ok=True)

    def _write(rows) -> None:
        for r in rows:
            fname = os.path.join(path, r[name_col])
            with open(fname, "wb") as f:
                f.write(r[payload_col])

    df.select(name_col, payload_col).foreachPartition(_write)


def scan_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Distributed directory scan → one row per file with its bytes."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def media_inventory(df: DataFrame) -> DataFrame:
    """Per-file inventory: name, byte size, content digest, sniffed
    kind from magic bytes.  All codegen expressions — the only
    content-wide work is one md5 pass."""
    head8 = F.lower(F.hex(F.expr("substring(content, 1, 4)")))
    kind = F.lit("unknown")
    # longest prefix wins: each when() wraps the previous chain, so the
    # LAST magic added is evaluated first — iterate shortest-first so
    # the longest magics end up outermost
    for magic, k in sorted(_MAGIC.items(), key=lambda kv: len(kv[0])):
        kind = F.when(head8.startswith(magic.lower()), F.lit(k)).otherwise(kind)
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
        kind.alias("kind"),
    )
