"""Hypothesis property tests for the text-function kit: the Column
expressions must agree with straightforward pure-Python references on
arbitrary generated corpora — catching edge cases (empty/blank text,
repeated separators, single tokens) that the fixed oracle corpus
misses.

Alphabet is printable ASCII on purpose: Java regex ``\\s`` (used by
the JVM-side expressions) is ASCII-only while Python's ``\\s`` is
unicode-aware, so unicode whitespace would make reference and engine
legitimately differ. Unicode CONTENT is covered by the fixed corpus in
test_text_semantics.py; the property here is tokenizer algebra, not
charset handling.

Each example set runs as ONE Spark job (hypothesis generates a batch
of documents, the assertions compare per-row) — max_examples stays
small because a Spark round-trip is ~100 ms, not ~1 us.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions import text as T

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)
CORPUS = st.lists(ASCII_TEXT, min_size=1, max_size=30)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _py_tokens(s: str) -> list[str]:
    trimmed = s.strip()
    # Java split(\s+) semantics on trimmed ASCII input
    return re.split(r"[ \t\n\x0b\f\r]+", trimmed) if trimmed else []


def _py_shingles(s: str, n: int = 3) -> list[str]:
    toks = [t.lower() for t in _py_tokens(s)]
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        sh = " ".join(toks[i : i + n])
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


def _py_rolling(s: str) -> int:
    acc = 0
    for tok in (t.lower() for t in _py_tokens(s)):
        code = len(tok) * 256 + ord(tok[0])
        acc = (acc * T.ROLLING_HASH_BASE + code) % T.ROLLING_HASH_MOD
    return acc


@given(CORPUS)
@_SETTINGS
def test_token_count_matches_python_reference(spark, corpus):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "id int, t string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", T.token_count(F.col("t")).alias("n")).collect()
    }
    for i, s in enumerate(corpus):
        assert got[i] == len(_py_tokens(s)), repr(s)


@given(CORPUS)
@_SETTINGS
def test_shingles_match_python_reference(spark, corpus):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "id int, t string")
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", T.word_shingles(F.col("t"), 3).alias("sh")).collect()
    }
    for i, s in enumerate(corpus):
        assert got[i] == _py_shingles(s, 3), repr(s)


@given(CORPUS)
@_SETTINGS
def test_rolling_fingerprint_matches_python_fold(spark, corpus):
    # non-empty-token inputs only: the reference fold needs tok[0]
    corpus = [s for s in corpus if s.strip()] or ["x"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "id int, t string")
    got = {
        r["id"]: r["fp"]
        for r in df.select("id", T.rolling_fingerprint(F.col("t")).alias("fp")).collect()
    }
    for i, s in enumerate(corpus):
        assert got[i] == _py_rolling(s), repr(s)


@given(ASCII_TEXT, ASCII_TEXT)
@_SETTINGS
def test_fingerprint_whitespace_case_invariance(spark, a, b):
    """doc_fingerprint must identify texts equal up to case and
    whitespace runs, and separate texts that differ otherwise."""
    variants = [(0, a), (1, "  " + a.upper() + "  "), (2, re.sub(r"(\S)", r"\1", a)), (3, b)]
    df = spark.createDataFrame(variants, "id int, t string")
    fp = {
        r["id"]: r["fp"]
        for r in df.select("id", T.doc_fingerprint(F.col("t")).alias("fp")).collect()
    }
    assert fp[0] == fp[1] == fp[2]
    norm = lambda s: re.sub(r"[ \t\n\x0b\f\r]+", " ", s.strip().lower())  # noqa: E731
    if norm(a) == norm(b):
        assert fp[0] == fp[3]
    else:
        assert fp[0] != fp[3]


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing invariant: any shared token run of length >=
    window + k - 1 (= 6 here) leaves at least one COMMON (hash)
    fingerprint in both documents; disjoint texts share none."""
    from pubg_data_pipeline_spark.functions.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight nine ten {shared} eleven"),
            (3, "totally different words everywhere here again and again more"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, "doc_id", "text")
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "shared run left no common fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_winnowing_short_documents_are_empty_not_crashing(spark):
    from pubg_data_pipeline_spark.functions.text import winnowing_fingerprints

    docs = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e")],  # < k and < w+k-1 grams
        "doc_id long, text string",
    )
    out = winnowing_fingerprints(docs, "doc_id", "text").collect()
    assert [r["doc_id"] for r in out] == []  # 5 tokens -> 3 grams < window


# --------------------------------------------- duplicate_spans algebra

def _ref_duplicate_spans(docs, gram_len, min_span):
    """Pure-Python ExactSubstr reference: gram -> corpus count, then
    gaps-and-islands merge of duplicated gram positions per doc."""
    from collections import Counter

    toks = {i: re.split(r"\s+", t.strip().lower()) for i, t in docs}
    grams = Counter()
    per_doc = {}
    for i, tk in toks.items():
        gs = [" ".join(tk[p : p + gram_len]) for p in range(len(tk) - gram_len + 1)]
        per_doc[i] = gs
        grams.update(gs)
    out = set()
    for i, gs in per_doc.items():
        dup_pos = [p for p, g in enumerate(gs) if grams[g] > 1]
        if not dup_pos:
            continue
        start = prev = dup_pos[0]
        runs = []
        for p in dup_pos[1:]:
            if p == prev + 1:
                prev = p
            else:
                runs.append((start, prev))
                start = prev = p
        runs.append((start, prev))
        for s, e in runs:
            span_tokens = e - s + gram_len
            if span_tokens >= min_span:
                out.add((i, s, e + gram_len - 1, span_tokens))
    return out


# Tiny vocabulary on purpose: natural cross-doc gram collisions.
WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
DOC = st.lists(WORDS, min_size=0, max_size=20).map(" ".join)


@given(st.lists(DOC, min_size=1, max_size=8))
@_SETTINGS
def test_duplicate_spans_matches_python_reference(spark, docs):
    from pubg_data_pipeline_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in dedup.duplicate_spans(
            df, "text", "doc_id", gram_len=3, min_span_tokens=4
        ).collect()
    }
    assert got == _ref_duplicate_spans(rows, 3, 4)
