"""Join operators (SURVEY §2.4).

Every reference join is a small-side equi-join executed driver-side in
pandas (e.g. ``pd.merge`` at
``/root/reference/pipeline/mautic_hubspot_email_log/mautic_hubspot_email_read_activities.py:183``)
or delegated to a remote engine (the Redash NOT-EXISTS round-trip,
``pipeline/hubspot_association_bigquery/hubspot_association_bigquery.py:53-58``).
Here they are Spark joins; ``broadcast=True`` pins the small side as a
broadcast hash join (no shuffle of the big side) — at 100 TB the fact
table never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_broadcast(df: DataFrame, broadcast: bool) -> DataFrame:
    return F.broadcast(df) if broadcast else df


def enrich_left_join(
    left: DataFrame, right: DataFrame, on: list[str] | str, broadcast: bool = True
) -> DataFrame:
    """J1/J2 left_equi_join: enrich a fact side with a (small) lookup."""
    return left.join(_maybe_broadcast(right, broadcast), on, "left")


def semi_join(
    left: DataFrame, keys: DataFrame, on: list[str] | str, broadcast: bool = True
) -> DataFrame:
    """F5/J5 semi_filter_isin: keep rows whose key exists in ``keys``.

    Replaces the reference's driver-side ``isin`` against a fetched list
    (``hubspot_association_bigquery.py:85``) — no collect, no size limit.
    """
    return left.join(_maybe_broadcast(keys, broadcast), on, "left_semi")


def anti_join(
    left: DataFrame, existing: DataFrame, on: list[str] | str, broadcast: bool = True
) -> DataFrame:
    """J3/U3 anti_join: "new minus existing".

    Collapses the reference's ship-ids-to-Redash NOT-EXISTS round-trip
    (``hubspot_association_bigquery.py:53-58``) into one left_anti join.
    """
    return left.join(_maybe_broadcast(existing, broadcast), on, "left_anti")
