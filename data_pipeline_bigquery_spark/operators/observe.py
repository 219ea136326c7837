"""Single-pass pipeline metrics via the Observation API.

The reference audits loads with SEPARATE count/null-check queries after
each write (e.g. the row-count contract in
``/root/reference/pipeline/hubspot_2_bigquery_migration/companies_pipeline.py:136``
and the quality checks it runs as extra BigQuery scans).  At 100 TB a
second scan per metric is the difference between one pass and N passes:
``df.observe`` attaches aggregate metrics to the SAME job — they are
computed by the running tasks and published when the action finishes,
costing zero extra scans.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, metrics: Mapping[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action ran the plan.  Metrics piggyback on the job — no extra scan.
    """
    obs = Observation(name)
    cols = [c.alias(a) for a, c in metrics.items()]
    return df.observe(obs, *cols), obs


def standard_load_metrics(pk: str, cursor_col: str) -> dict[str, Column]:
    """The reference's post-load audit as one observation set: row
    count, null-pk count, max cursor."""
    return {
        "n_rows": F.count(F.lit(1)),
        "null_pk": F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0)),
        "max_cursor": F.max(F.col(cursor_col)),
    }
