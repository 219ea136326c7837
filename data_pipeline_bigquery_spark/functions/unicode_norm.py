"""Explicit full-Unicode normalization — the pre-processing op that
:mod:`.text` promises ("Full-Unicode normalization (NFC, casefold) is a
real pipeline step but belongs in an EXPLICIT pre-processing op").

Two tiers, split by verifiability:

* :func:`nfc_normalize` — canonical composition (NFC).  Unicode's
  normalization-stability policy pins NFC of every *assigned* code
  point forever, and unassigned code points pass through unchanged, so
  independent conformant implementations agree byte-for-byte: Python's
  ``unicodedata`` and DuckDB's utf8proc ``nfc_normalize`` probed
  IDENTICAL on combining-mark reordering, precomposed/decomposed pairs,
  Hangul jamo composition, ligatures (NFC keeps them), and ZWJ emoji —
  this one IS cross-engine-oracled (``unicode_nfc_audit``).
* :func:`nfkc_casefold` — the aggressive comparison-key form
  (compatibility decomposition + full case folding, the W3C/UTS#46
  "NFKC_Casefold" shape).  Full casefold is ENGINE-SPECIFIC by the
  probes in :mod:`.text` (İ, final sigma, ß), so this op is
  deliberately SINGLE-ENGINE: Python's ``str.casefold`` owns the
  transform, and no DuckDB oracle is claimed for outputs that flow
  through it.  Use it to BUILD match keys inside one engine, never to
  compare across engines.

Both are Arrow-batched scalar pandas UDFs (the sanctioned Python path:
one Python call per ~10k-row batch, not per row); work is per-row
linear, shuffle-free, and partition-independent — the 100 TB shape is
"one extra projection on the scan".
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


# return types are DataType objects, not DDL strings: the string form
# parses through the active SparkContext, which would make importing
# this module require a live session


@F.pandas_udf(StringType())
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Canonical composition (NFC), NULL-preserving."""
    return s.map(
        lambda v: unicodedata.normalize("NFC", v) if isinstance(v, str) else v
    )


@F.pandas_udf(StringType())
def nfkc_casefold(s: pd.Series) -> pd.Series:
    """NFKC + full casefold + re-NFC — single-engine match keys ONLY
    (see module docstring; casefold output is not oracle-comparable).
    The trailing NFC pass closes the classic gap where casefolding a
    compatibility form re-exposes composable sequences."""
    return s.map(
        lambda v: unicodedata.normalize(
            "NFC", unicodedata.normalize("NFKC", v).casefold()
        )
        if isinstance(v, str)
        else v
    )


def nfc_changed(raw: Column | str, normed: Column | str) -> Column:
    """1 when normalization rewrote the string, 0 otherwise (NULL-safe:
    NULL text was not rewritten)."""
    r = F.col(raw) if isinstance(raw, str) else raw
    n = F.col(normed) if isinstance(normed, str) else normed
    return F.when(r != n, F.lit(1)).otherwise(F.lit(0)).cast("int")
