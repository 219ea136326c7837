"""NULL/empty-text corpus sweep: every document-centric key queued in
the r08 driver window runs on a corpus containing a NULL-text doc, an
empty-string doc, a one-token doc, and normal docs — the rule-17
NULL-propagation class (explode/unnest drop vs keep, greatest/least
NULL-skipping) is exactly where engines diverge silently.  Each key
must (a) not crash on either engine and (b) hash-match the oracle on
the same degenerate dir."""

from __future__ import annotations

import pyarrow as pa
import pytest

from data_pipeline_bigquery_spark.queries import registry
from tests.test_analytics19_20_edges import _edge_dir, _parity

_DOC_KEYS = [
    "rag_chunk_windows",
    "heaps_law_vocab_growth",
    "bigram_coverage_quality",
    "dedup_signature_manifest",
    "source_overlap_matrix",
    "learning_curve_quality",
    "vocabulary_overlap_between_langs",
    "source_similarity_bhattacharyya",
    "capture_recapture_dup_estimate",
    "lang_id_confusion",
]


def _degenerate_docs():
    texts = [
        None,
        "",
        "solo",
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    langs = ["en", "de", "en", "en", "es", "en"]
    sources = ["src0", "src1", "src0", "src1", "src0", "src1"]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                [len(t) if t is not None else 0 for t in texts], pa.int64()
            ),
        }
    )


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    return _edge_dir(
        tmp_path_factory.mktemp("nulltext"), documents=_degenerate_docs()
    )


@pytest.mark.parametrize("key", _DOC_KEYS)
def test_doc_key_survives_null_and_empty_text(spark, degenerate_dir, key):
    spec = registry()[key]
    _parity(spark, spec, degenerate_dir)
