"""Cross-validate the text Column expressions against plain-Python
reference implementations over an edge-case corpus (empty strings,
repeated whitespace, unicode, punctuation runs) — one Spark job over
the whole corpus, compared elementwise."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions.text import (
    BPE_ISH_PATTERN,
    ROLLING_HASH_BASE,
    ROLLING_HASH_MOD,
    regex_token_count,
    rolling_fingerprint,
    text_stats_columns,
    word_shingles,
)

CORPUS = [
    "plain words here",
    "  leading and trailing  ",
    "tabs\tand\nnewlines mixed\t in",
    "double  spaces   collapse",
    "punctuation! heavy, text; with: lots. of? marks...",
    "UPPER and MiXeD Case",
    "numbers 123 and 456mix",
    "a",
    "one two",
    "the the the the",
    "unicode: café naïve 的 是",
    "symbols #$% @&* ^~`",
    "hyphen-ated words stay-together",
    "quoted 'words' and \"phrases\"",
]


def py_tokens(s: str) -> list[str]:
    s = s.strip()
    return re.split(r"\s+", s) if s else []


def py_rolling(s: str) -> int:
    acc = 0
    for t in py_tokens(s.lower()):
        code = len(t) * 256 + ord(t[0])
        acc = (acc * ROLLING_HASH_BASE + code) % ROLLING_HASH_MOD
    return acc


def py_shingles(s: str, n: int = 3) -> list[str]:
    toks = py_tokens(s.lower())
    seen, out = set(), []
    for i in range(max(len(toks) - n + 1, 0)):
        sh = " ".join(toks[i : i + n])
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


@pytest.fixture(scope="module")
def computed(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "i int, text string"
    )
    cols = text_stats_columns(F.col("text"))
    rows = df.select(
        "i",
        "text",
        cols["n_tokens"].alias("n_tokens"),
        regex_token_count(F.col("text")).alias("bpe_tokens"),
        rolling_fingerprint(F.col("text")).alias("rh"),
        word_shingles(F.col("text")).alias("shingles"),
    ).collect()
    return {r["i"]: r for r in rows}


def test_token_count_matches_python(computed):
    for i, s in enumerate(CORPUS):
        assert computed[i]["n_tokens"] == len(py_tokens(s)), repr(s)


def test_bpe_ish_count_matches_python(computed):
    pat = re.compile(BPE_ISH_PATTERN)
    for i, s in enumerate(CORPUS):
        # Java regex and Python re agree on this ASCII-class subset
        assert computed[i]["bpe_tokens"] == len(pat.findall(s)), repr(s)


def test_rolling_hash_matches_python(computed):
    for i, s in enumerate(CORPUS):
        assert computed[i]["rh"] == py_rolling(s), repr(s)


def test_shingles_match_python(computed):
    for i, s in enumerate(CORPUS):
        assert sorted(computed[i]["shingles"]) == sorted(py_shingles(s)), repr(s)
