"""Surrogate-key and CSV-list expressions.

Reference: md5 surrogate edge ids
(``/root/reference/pipeline/hubspot_association_bigquery/hubspot_association_bigquery.py:72-73``),
composite string keys (``pipeline/email_read_log/email_read_log.py:42-44``),
CSV membership / append / order-preserving dedup
(``pipeline/mautic_hubspot_email_log/mautic_hubspot_email_read_activities.py:100-124``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cols(parts) -> list[Column]:
    return [F.col(p) if isinstance(p, str) else p for p in parts]


def md5_surrogate_key(*parts: Column | str, sep: str = "") -> Column:
    """C5 md5_surrogate_key: ``md5(from + type + to)``.

    Deterministic, collision-negligible, and — unlike the reference's
    row-loop — computed distributed, per partition, with no shuffle.
    """
    cols = [c.cast("string") for c in _cols(parts)]
    return F.md5(F.concat_ws(sep, *cols))


def concat_key(*parts: Column | str, sep: str = "_") -> Column:
    """C7 string_concat_key: ``contactId + '_' + email_id``."""
    return F.concat_ws(sep, *[c.cast("string") for c in _cols(parts)])


def csv_contains(csv_col: Column | str, value: Column | str) -> Column:
    """C9 csv_membership_test: ``email_id in list.split(',')``."""
    c = F.col(csv_col) if isinstance(csv_col, str) else csv_col
    v = F.col(value) if isinstance(value, str) else value
    return F.array_contains(F.split(c, ","), v.cast("string"))


def csv_append_dedup(csv_col: Column | str, new_id: Column | str) -> Column:
    """C10 csv_append + order-preserving dedup.

    Prepend ``new_id`` to the CSV then drop later duplicates —
    ``array_distinct`` keeps first occurrence, matching the reference's
    ``remove_duplicates`` (first-seen-wins) semantics.
    """
    c = F.col(csv_col) if isinstance(csv_col, str) else csv_col
    n = F.col(new_id) if isinstance(new_id, str) else new_id
    appended = F.concat(F.array(n.cast("string")), F.split(c, ","))
    return F.concat_ws(",", F.array_distinct(appended))
