"""Unicode-hostility parity sweep — regression form of
tools/unicode_corpus_sweep.py.

The fixture corpus is ASCII, so the fixture parity sweep can never
reach the places where Spark (JVM full contextual case mapping:
İ → i+U+0307, final-sigma ς, upper(ß)=SS) and DuckDB (utf8proc
codepoint-wise: İ → i, σ always, ẞ) legitimately disagree — the round-10
campaign found 24 diverging keys this way (engine ``lower()`` in every
shingle/token pipeline, byte-vs-codepoint ``substr`` in the multimodal
payload oracles, ``strlen``-vs-``length`` in length_quantile_normalize).
The fixes route all parity-compared case folding through
``functions/text.py::ascii_lower`` and fold multimodal raster text to
ASCII; this sweep pins them by running every document-reading key on a
corpus of the classic hostile classes (Turkish dotted/dotless I, ß,
final sigma, NFC-vs-NFD pairs, full-width forms, astral emoji + ZWJ,
CJK, RTL, zero-width chars, sub-shingle-window multibyte texts)
against its DuckDB oracle on the same dir.
"""

from __future__ import annotations

import os
import sys

import pytest

# slow tier: registry-WIDE hostile-corpus invariance sweep (~210 keys).
# It re-proves the unicode-normalization seam (functions/text.py),
# which only changes when that module changes; the default tier's
# oracle-parity sweep still covers every key on the canonical corpus.
pytestmark = pytest.mark.slow

from data_pipeline_bigquery_spark.queries import registry
from tests.conftest import SF_DIR
from tests.oracle_compare import compare

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from unicode_corpus_sweep import build_dir, select_keys  # noqa: E402

REG = registry()
# doc-, name- and events-reading keys — the ONE selection function is
# shared with the standalone runner so the pinned set cannot drift
DOC_KEYS = select_keys(REG)


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    return build_dir(str(tmp_path_factory.mktemp("unicode_sf")), SF_DIR)


@pytest.mark.parametrize("key", DOC_KEYS)
def test_doc_key_on_unicode_corpus(spark, unicode_dir, key):
    spec = REG[key]
    problems = compare(spec.fn(spark, unicode_dir), spec.oracle, unicode_dir)
    assert not problems, f"{key}:\n" + "\n".join(problems)
