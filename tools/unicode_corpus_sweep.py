#!/usr/bin/env python
"""Unicode-hostility parity sweep over the document-reading registry.

The fixture corpus is ASCII; Spark (JVM/UTF8String) and DuckDB (utf8proc)
can legitimately disagree on non-ASCII case mapping, code-point vs
code-unit windows, and grapheme-aware functions — divergences the
fixture sweep and the r8 degenerate sweeps (NULL/empty/short text, all
ASCII) can never reach.  This campaign replaces `documents` with a
corpus of the classic hostile classes (Turkish dotted/dotless I, ß,
final sigma, NFC-vs-NFD pairs, full-width forms, astral emoji + ZWJ
sequences, CJK, RTL, zero-width chars, >127-byte-but-<12-char texts)
and runs every doc-reading key's Spark form against its DuckDB oracle
on the same dir.

The corpus also plants hostile part/customer NAMES (levenshtein /
phonetic / ER keys) and hostile EVENTS (unicode event_type values,
unicode/escaped/astral JSON props), so the sweep covers every
document-, name-, and event-reading key — 201 of the 350.

Usage: python tools/unicode_corpus_sweep.py [out_dir]
Prints one line per key; exits 1 if any key diverges.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# (text, lang, source) — doc_id is positional, n_chars = len(text)
#
# Length envelope: every multi-word doc repeats its phrase to ~150+
# chars.  The planted-near-dup keys pair each doc with its 4-char-
# shifted copy, and minhash_lsh_recall_contract's documented domain is
# pairs with shingle-Jaccard >= ~0.9 (its banding geometry catches a
# J=0.8 pair with only ~31% probability — below-gate recall on
# marginal pairs is CORRECT gate behavior, not an engine split).
# Long repetitive texts put every planted pair near J~1, so a gate
# trip in this sweep means a genuine divergence.  The two sub-window
# docs stay short on purpose (their pairs fall out of the truth set).
HOSTILE_DOCS: list[tuple[str | None, str, str]] = [
    # Turkish dotted capital İ (U+0130) and dotless ı (U+0131): the
    # locale-sensitive lowercase pair; JVM default-locale toLowerCase
    # vs utf8proc can split here
    (("İstanbul ISPARTA ılık Iı İİİ noktalı " * 5).strip(), "tr", "src0"),
    # German sharp s: upper(ß) = SS (length-changing case map)
    (("Straße STRASSE grüße ÄÖÜ äöü weiß " * 5).strip(), "de", "src0"),
    # NFC vs NFD of the same visible string — distinct code points, so
    # exact-dedup MUST treat them as different on BOTH engines
    (("café résumé touché " * 9).strip(), "fr", "src1"),
    (("café résumé touché " * 7).strip(), "fr", "src1"),
    # Greek capital sigma: contextual final-sigma lowercase (ς vs σ)
    (("ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΥΣ ΣΟΦΙΑΣ σοφίας " * 6).strip(), "el", "src0"),
    # Full-width Latin + digits (case maps exist in the FF00 block)
    (("ＦＵＬＬＷＩＤＴＨ ｈｅｌｌｏ １２３４５ ＡＢＣ ｘｙｚ " * 6).strip(), "en", "src1"),
    # Astral plane: emoji, ZWJ family, flag pairs, skin-tone modifier,
    # math alphanumerics — 4-byte UTF-8, surrogate pairs in UTF-16
    (("🎉🚀 family 👨‍👩‍👧‍👦 flags 🇺🇸🇹🇷 tone 👍🏽 math 𝕞𝕒𝕥𝕙 𝓈𝒸𝓇𝒾𝓅𝓉 " * 3).strip(), "en", "src0"),
    # CJK + half-width katakana (width folding is a classic drift)
    (("漢字テスト 中文测试 日本語の文書 ﾊﾝｶｸ ｶﾀｶﾅ 한국어 " * 6).strip(), "ja", "src1"),
    # RTL Arabic/Hebrew mixed with LTR
    (("مرحبا بالعالم שלום עולם mixed direction " * 5).strip(), "ar", "src0"),
    # Cyrillic (has full case maps) + archaic yat
    (("Привет МИР ѢѣѲѳ ЁёЙй " * 8).strip(), "ru", "src1"),
    # zero-width space/joiner, NBSP, tab, newline inside text
    (("zero​width‍joined nbsp tab\tand\nnewline end " * 4).strip(), "en", "src0"),
    # shorter than the 12-char shingle window in CODE POINTS but far
    # beyond 12 UTF-8 BYTES — splits code-point vs byte windows
    ("ελληνικά", "el", "src1"),
    ("中文短文", "zh", "src0"),
    # repetitive unicode (compression/repetition keys see ratio < 300)
    ("αβγδ " * 120, "el", "src1"),
    # duplicate pair ACROSS sources for dedup keys, non-ASCII payload
    (("повторяющийся документ для дедупликации точный " * 4).strip(), "ru", "src0"),
    (("повторяющийся документ для дедупликации точный " * 4).strip(), "ru", "src1"),
    # ASCII baseline + NULL + empty (guard branches stay exercised)
    (("the quick brown fox jumps over the lazy dog " * 4).strip(), "en", "src0"),
    (None, "en", "src1"),
    ("", "en", "src0"),
]


def hostile_documents_table():
    import pyarrow as pa

    texts = [t for t, _, _ in HOSTILE_DOCS]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([l for _, l, _ in HOSTILE_DOCS]),
            "source": pa.array([s for _, _, s in HOSTILE_DOCS]),
            "n_chars": pa.array(
                [len(t) if t is not None else 0 for t in texts], pa.int64()
            ),
        }
    )


# hostile NAME plants for part.p_name / customer.c_name — the
# levenshtein / phonetic / entity-resolution keys process names, and
# Spark's levenshtein walks code points while DuckDB's walks UTF-8
# bytes (probed: 'café'/'cafe' = 1 vs 2), fixed by ASCII-folding the
# DP inputs on both engines.  Pairs share their first-3-char block
# (and brand, patched uniform over the planted rows) so the blocked
# matchers actually pair them; distances straddle the <=2 gate.
HOSTILE_PART_NAMES = [
    "café blue steel",        # vs plain: 1 substitution
    "cafe blue steel",
    "caféé blue steel",       # 2 non-ASCII
    "grüne farbe metall",     # vs next: 1 sub inside a gram
    "grune farbe metall",
    "İstanbul kırmızı bakır",  # Turkish pair, distance 2 after fold
    "Istanbul kirmizi bakır",
    "端州铜器 classic",        # CJK block (folds to ???? classic)
    "端州银器 classic",        # 1 CJK substitution -> folds EQUAL
]
HOSTILE_CUSTOMER_NAMES = [
    "Customer#000000001ß",    # adjacent sorted neighbors, distance 1
    "Customer#000000001s",
    "Customer#000000002é",
    "Customer#000000002e",
]


# hostile event plants: unicode event_type values on a row fraction
# (grouping/ordering/md5-keyed paths must agree on non-ASCII keys) and
# unicode JSON props (both engines' JSON parsers must unescape \\uXXXX,
# astral, and nested non-ASCII keys identically)
HOSTILE_EVENT_TYPES = ["покупка", "señal", "ÉVÉNEMENT", "购买事件"]
HOSTILE_PROPS = [
    '{"country":"Türkiye","city":"İstanbul"}',
    '{"emoji":"🎉👍🏽","nested":{"ключ":"значение"}}',
    '{"esc":"\\u0130 and \\u00df literal","tab":"a\\tb"}',
    '{"s":"ΣΟΦΙΑΣ","mixed":["ﾊﾝｶｸ","中文",42]}',
]


def hostile_events_table(src_path: str):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(src_path)
    types = tbl.column("event_type").to_pylist()
    props = tbl.column("props").to_pylist() if "props" in tbl.column_names else None
    ids = tbl.column("event_id").to_pylist()
    for i, eid in enumerate(ids):
        if eid is not None and eid % 7 == 3:
            types[i] = HOSTILE_EVENT_TYPES[eid % len(HOSTILE_EVENT_TYPES)]
        if props is not None and eid is not None and eid % 5 == 2:
            props[i] = HOSTILE_PROPS[eid % len(HOSTILE_PROPS)]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("event_type"),
        "event_type",
        pa.array(types, pa.string()),
    )
    if props is not None:
        tbl = tbl.set_column(
            tbl.schema.get_field_index("props"), "props", pa.array(props, pa.string())
        )
    return tbl


def _patch_names(src_path: str, col: str, names: list[str]):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(src_path)
    vals = tbl.column(col).to_pylist()
    vals[: len(names)] = names[: len(vals)]
    idx = tbl.schema.get_field_index(col)
    tbl = tbl.set_column(idx, col, pa.array(vals, pa.string()))
    if col == "p_name" and "p_brand" in tbl.column_names:
        # uniform brand over the planted rows so brand-blocked passes pair them
        brands = tbl.column("p_brand").to_pylist()
        brands[: len(names)] = [brands[0]] * min(len(names), len(brands))
        bidx = tbl.schema.get_field_index("p_brand")
        tbl = tbl.set_column(bidx, "p_brand", pa.array(brands, pa.string()))
    return tbl


def build_dir(base: str, sf_src: str) -> str:
    import pyarrow.parquet as pq

    from data_pipeline_bigquery_spark.catalog import FIXTURE_TABLES

    os.makedirs(base, exist_ok=True)
    for t in FIXTURE_TABLES:
        dst = os.path.join(base, f"{t}.parquet")
        # unlink before any write: a pre-existing SYMLINK here (a dir
        # previously built by another sweep) would make write_table
        # follow it and overwrite the shared source fixture in place
        if t in ("documents", "part", "events", "customer") and os.path.lexists(dst):
            os.unlink(dst)
        if t == "documents":
            pq.write_table(hostile_documents_table(), dst)
        elif t == "part":
            pq.write_table(
                _patch_names(
                    os.path.join(sf_src, f"{t}.parquet"), "p_name", HOSTILE_PART_NAMES
                ),
                dst,
            )
        elif t == "events":
            pq.write_table(
                hostile_events_table(os.path.join(sf_src, f"{t}.parquet")), dst
            )
        elif t == "customer":
            pq.write_table(
                _patch_names(
                    os.path.join(sf_src, f"{t}.parquet"),
                    "c_name",
                    HOSTILE_CUSTOMER_NAMES,
                ),
                dst,
            )
        elif not os.path.lexists(dst):
            os.symlink(os.path.join(sf_src, f"{t}.parquet"), dst)
    return base


def select_keys(reg) -> list[str]:
    """The sweep's key set — ONE definition shared with the pinning
    test (tests/test_unicode_corpus_sweep.py) so the suite can never
    drift from the documented runner."""
    return sorted(
        k
        for k, s in reg.items()
        if s.oracle
        and (
            "documents" in s.oracle.lower()
            or "events" in s.oracle.lower()
            or "p_name" in s.oracle
            or "c_name" in s.oracle
        )
    )


def main() -> int:
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from oracle_compare import compare

    from data_pipeline_bigquery_spark.queries import registry
    from data_pipeline_bigquery_spark.session import get_spark

    out_dir = (
        sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="uni_sf_")
    )
    sf_src = os.environ.get("UNI_SF_SRC", "/root/testdata/sf0.001")
    d = build_dir(out_dir, sf_src)
    spark = get_spark(app_name="unicode_corpus_sweep")
    reg = registry()
    doc_keys = select_keys(reg)
    print(f"{len(doc_keys)} doc/name/event-reading keys against {d}", flush=True)
    bad = 0
    for k in doc_keys:
        t0 = time.monotonic()
        try:
            problems = compare(reg[k].fn(spark, d), reg[k].oracle, d)
        except Exception as exc:
            problems = [f"{type(exc).__name__}: {exc}"[:400]]
        status = "OK" if not problems else "DIVERGES"
        print(f"{status:8s} {k:40s} {time.monotonic() - t0:5.1f}s", flush=True)
        for p in problems:
            print(f"         {p}", flush=True)
            bad += 1
    print(f"{'FAIL' if bad else 'OK'}: {bad} problem(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
