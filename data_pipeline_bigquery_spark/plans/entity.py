"""Entity sync plan — the companies/contacts/deals pipeline core.

Reference: ``Hubspot_companies_to_BigQuery``
(``/root/reference/pipeline/hubspot_2_bigquery_migration/companies_pipeline.py:97-136``;
contacts/deals are line-for-line clones).  Steps re-expressed:

1. incremental scan with pushed ``cursor_col > cursor`` predicate
   (S4 — Catalyst pushes it into the parquet/DSv2 scan),
2. dedup to one row per pk, latest-cursor wins (A1, determinized),
3. run-metadata stamping (P4),
4. explicit projection (P1).

One shuffle total (the dedup window on pk).  At 100 TB the cursor
predicate prunes partitions before any I/O if the lake is
date-partitioned — the same reason the reference pushes the filter into
the HubSpot search API.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame

from data_pipeline_bigquery_spark.operators.dedup import dedup_keep_latest
from data_pipeline_bigquery_spark.operators.metadata import zip_emitted_info


def entity_sync_plan(
    source: DataFrame,
    pk: str,
    cursor_col: str,
    cursor: _dt.datetime | str | None,
    emitted_at: _dt.datetime | str,
    emitted_id: str,
    columns: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """``tiebreak_col``: a unique column breaking cursor ties so the
    dedup is total-order deterministic (the reference relies on pandas
    arrival order here — not reproducible distributed)."""
    from pyspark.sql import functions as F

    df = source
    if cursor is not None:
        df = df.filter(F.col(cursor_col) > F.lit(cursor).cast("timestamp"))
    df = dedup_keep_latest(df, [pk], [cursor_col, tiebreak_col or pk])
    df = zip_emitted_info(df, emitted_at, emitted_id)
    if columns:
        df = df.select(*columns, "emitted_at", "emitted_id")
    return df
