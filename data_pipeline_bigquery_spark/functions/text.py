"""Engine-portable text folding primitives.

Full Unicode case mapping is ENGINE-SPECIFIC and can never hash-match
across Spark and an independent SQL engine: the JVM's ``lower()`` is
the contextual full map (U+0130 İ → "i" + U+0307, two code points;
final-sigma Σ → ς at word end; ``upper('ß') = 'SS'``) while DuckDB's
utf8proc maps codepoint-to-codepoint (İ → i, Σ → σ always, upper(ß) =
ẞ) — probed divergences, see tools/unicode_corpus_sweep.py.  Every
parity-compared text pipeline therefore folds case ASCII-ONLY via
``translate`` (identical semantics in Spark SQL and DuckDB, never
length-changing): a no-op wherever ``lower()`` was on the ASCII
fixtures, deterministic and engine-identical on any corpus.
Full-Unicode normalization (NFC, casefold) is a real pipeline step but
belongs in an EXPLICIT pre-processing op with one engine owning the
transform — never silently inside a cross-engine-verified operator.

The same portability rule produces the ``ascii_fold`` family: the
synthetic multimodal payloads raster TEXT BYTES, and DuckDB has no
byte-addressed ``substring``/``md5`` over BLOBs — so the raster input
is folded to pure ASCII first (every non-ASCII code point → ``?``,
one per code point on both regex engines, probed incl. ZWJ/astral),
making byte and code-point windows coincide.  Real media bytes enter
through ``sources/media.py`` (binaryFile), not through text rasters.

Escaping note: the non-ASCII class ``[^\\x00-\\x7F]`` reaches the two
engines through DIFFERENT literal syntaxes — Spark SQL string
literals unescape backslashes (the SQL text needs ``\\\\x``), DuckDB's
are standard-SQL verbatim (``\\x`` stays) — hence the paired
``*_sql`` / ``*_duckdb_sql`` generators.  The Column form bypasses SQL
parsing entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"

#: the regex itself (one code point per match on both engines)
_NON_ASCII_RE = "[^\\x00-\\x7F]"


def ascii_lower(col: Column | str) -> Column:
    """ASCII-only lowercase, engine-portable (Column form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_UPPER, ASCII_LOWER)


def ascii_lower_sql(expr: str) -> str:
    """ASCII-only lowercase as a SQL string — valid verbatim in BOTH
    Spark SQL and DuckDB (no escapes involved), so oracle twins embed
    the identical text."""
    return f"translate({expr}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


#: the literal both sides splice into SQL for the common ``lower(text)``
LOWER_TEXT_SQL = ascii_lower_sql("text")


def ascii_fold(col: Column | str) -> Column:
    """Non-ASCII code points → '?' (Column form, no SQL parsing)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _NON_ASCII_RE, "?")


def ascii_fold_sql(expr: str) -> str:
    """Spark-SQL-text form (backslashes doubled for the SQL parser)."""
    pat = _NON_ASCII_RE.replace("\\", "\\\\")
    return f"regexp_replace({expr}, '{pat}', '?')"


def ascii_fold_duckdb_sql(expr: str) -> str:
    """DuckDB twin (verbatim backslashes, global flag explicit)."""
    return f"regexp_replace({expr}, '{_NON_ASCII_RE}', '?', 'g')"


# ``ascii_fold`` maps EVERY non-ASCII code point to the same '?', so two
# entirely different non-Latin strings fold EQUAL (levenshtein 0) — a
# false-positive class on multilingual corpora (r10 ADVICE).  Fuzzy
# matchers therefore surface a ``fold_ambiguous`` flag: the pair's
# distance is trustworthy only when neither input lost information to
# the fold (or the raw strings are bytewise equal, where distance 0 is
# sound regardless).  Detection matches per code point on both engines
# (probed incl. astral, see module docstring).


def has_nonascii(col: Column | str) -> Column:
    """TRUE iff the string contains any non-ASCII code point (Column
    form — ``rlike`` takes the regex verbatim, no SQL unescaping)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(_NON_ASCII_RE)


def has_nonascii_sql(expr: str) -> str:
    """Spark-SQL-text form (backslashes doubled for the SQL parser)."""
    pat = _NON_ASCII_RE.replace("\\", "\\\\")
    return f"({expr} rlike '{pat}')"


def has_nonascii_duckdb_sql(expr: str) -> str:
    """DuckDB twin (verbatim backslashes)."""
    return f"regexp_matches({expr}, '{_NON_ASCII_RE}')"
