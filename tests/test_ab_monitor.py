"""Online A/B monitor (streaming/ab_monitor.py): counters accumulate
across epochs, replays never double-count, and the cumulative rollup
matches a one-shot batch computation over the same events."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: streaming monitor replay/model proofs
pytestmark = _pytest_tier.mark.slow

import hashlib

import pytest

from data_pipeline_bigquery_spark.streaming.ab_monitor import (
    ab_monitor_stream,
    ab_rollup,
    process_ab_batch,
)

SCHEMA = "user_id long, event_type string, value double"


def _arm(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:7], 16) % 2


ROWS = [
    (1, "purchase", 300.0),   # conversion
    (1, "click", 500.0),      # not a purchase
    (2, "purchase", 100.0),   # below value threshold
    (3, "purchase", 251.0),   # conversion
    (4, "view", 10.0),
]


def test_counters_match_model_and_replay_idempotent(spark, tmp_path):
    counters = str(tmp_path / "counters")
    batch = spark.createDataFrame(ROWS, SCHEMA)
    for _ in range(2):  # replayed epoch must overwrite itself
        process_ab_batch(batch, 0, counters)

    exp = {0: [0, 0], 1: [0, 0]}
    for uid, et, val in ROWS:
        a = _arm(uid)
        exp[a][0] += 1
        exp[a][1] += 1 if (et == "purchase" and val >= 250) else 0
    got = {
        r.arm: [r.n_events, r.n_conv]
        for r in spark.read.parquet(counters).collect()
    }
    assert got == {a: v for a, v in exp.items() if v[0] > 0}


def test_rollup_accumulates_and_z_matches_batch_formula(spark, tmp_path):
    counters = str(tmp_path / "counters")
    src = str(tmp_path / "in")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = ab_monitor_stream(
            stream, counters, checkpoint=str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    # second epoch of traffic
    more = [(5, "purchase", 400.0), (6, "purchase", 260.0), (7, "view", 1.0)]
    spark.createDataFrame(more, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()

    roll = ab_rollup(spark, counters).collect()[0]
    allrows = ROWS + more
    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for uid, et, val in allrows:
        a = _arm(uid)
        n[a] += 1
        conv[a] += 1 if (et == "purchase" and val >= 250) else 0
    assert (roll.n_control, roll.n_treatment) == (n[0], n[1])
    assert (roll.conv_control, roll.conv_treatment) == (conv[0], conv[1])
    assert roll.rate_control_permille == conv[0] * 1000 // n[0]

    import math

    pc, pt = conv[0] / n[0], conv[1] / n[1]
    p = (conv[0] + conv[1]) / (n[0] + n[1])
    z = (pt - pc) / math.sqrt(p * (1 - p) * (1 / n[0] + 1 / n[1]))
    assert roll.z_two_proportion == pytest.approx(z, abs=1e-6)
