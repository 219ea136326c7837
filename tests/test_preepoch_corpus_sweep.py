"""Pre-epoch timestamp parity sweep — regression form of
tools/preepoch_corpus_sweep.py.

Every fixture timestamp is post-1970, so negative-epoch arithmetic was
never driven on both engines at once.  The round-10 campaign shifted
the corpus to straddle 1970 and found the epoch-MILLIS family split:
Spark's ``unix_millis``/``unix_seconds`` FLOOR while DuckDB's
``epoch_ms`` — and the reference's ``int(dt.timestamp() * 1000)`` —
truncate toward zero, one unit apart on every pre-1970 instant with
sub-unit residue.  ``to_epoch_millis`` now truncates via
``(us - us % 1000) / 1000`` (exact in int64/double range);
``to_epoch_seconds`` deliberately KEEPS floor (second-grain bucketing,
pinned by event_burstiness's floor-each oracle) — see
``functions/timestamps.py``.  This sweep re-runs every
orders/lineitem/events-reading key on the shifted corpus against its
oracle.
"""

from __future__ import annotations

import os
import sys

import pytest

# slow tier: registry-WIDE hostile-corpus invariance sweep (~220 keys,
# tens of minutes of the default run's wall).  It re-proves the
# epoch-truncation contract in functions/timestamps.py, which only
# changes when that module changes; the default tier's oracle-parity
# sweep still covers every key on the canonical corpus.
pytestmark = pytest.mark.slow

from data_pipeline_bigquery_spark.queries import registry
from tests.conftest import SF_DIR
from tests.oracle_compare import compare

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from preepoch_corpus_sweep import build_dir, select_keys  # noqa: E402

REG = registry()
# shared selection function — the pinned set cannot drift from the runner
TS_KEYS = select_keys(REG)


@pytest.fixture(scope="module")
def preepoch_dir(tmp_path_factory):
    return build_dir(str(tmp_path_factory.mktemp("preepoch_sf")), SF_DIR)


@pytest.mark.parametrize("key", TS_KEYS)
def test_ts_key_on_preepoch_corpus(spark, preepoch_dir, key):
    spec = REG[key]
    problems = compare(spec.fn(spark, preepoch_dir), spec.oracle, preepoch_dir)
    assert not problems, f"{key}:\n" + "\n".join(problems)
