"""Text-analysis column expressions for the LLM-data-pipeline surface.

All pure Column expressions (JVM-side, codegen-friendly) so they scale
to 100 TB corpora without Python in the hot path. The reference has no
text operators — this is the BASELINE.json extension surface: token
counting, quality scoring, language-ID heuristic, fingerprinting,
shingling for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately small + deterministic so the
# DuckDB oracle can replicate the exact same counts.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "les", "et"),
    "zh": ("的", "是", "了"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def word_tokens(text: Column) -> Column:
    """Array of whitespace tokens of the trimmed text."""
    return F.split(F.trim(text), r"\s+")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    puncts = F.length(F.regexp_replace(text, r"[^.!?,;:'\"()\[\]-]", ""))
    return puncts / F.greatest(F.length(text), F.lit(1))


def marker_hits(text: Column, words: tuple[str, ...]) -> Column:
    """How many tokens of the text are one of the marker words.

    Token-filter form (not regex) so the DuckDB oracle replicates it
    exactly with ``list_filter(regexp_split_to_array(...), ...)``.
    """
    toks = word_tokens(F.lower(text))
    wordset = [F.lit(w) for w in words]
    return F.size(F.filter(toks, lambda t: t.isin(*wordset) if len(wordset) > 1 else t == wordset[0]))


def stopword_ratio(text: Column) -> Column:
    """Stopword-token occurrences over total tokens."""
    return marker_hits(text, STOPWORDS).cast("double") / F.greatest(token_count(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1].

    Rewards mid-length documents with a healthy stopword ratio and low
    punctuation density — the standard web-corpus quality triad.
    """
    n_tok = token_count(text)
    length_term = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 10, F.lit(1.0))
    return F.round((length_term + stop_term + punct_term) / 3.0, 6)


def lang_id_expr(text: Column) -> Column:
    """Pick the language whose marker-word hit count is highest.

    Deterministic argmax with ties broken by language-code order.
    """
    scores = [(lang, marker_hits(text, words)) for lang, words in sorted(LANG_MARKERS.items())]
    best = F.lit("unknown")
    best_score = F.lit(0)
    # Iterate in reverse-sorted order so earlier codes win ties via >=.
    for lang, score in reversed(scores):
        cond = score >= best_score
        # strictly-positive requirement so no-hit rows stay 'unknown'
        best = F.when((score > 0) & cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def text_stats_columns(text: Column) -> dict[str, Column]:
    """All text-quality columns built from SHARED subtrees.

    Calling token_count/stopword_ratio/quality_score separately builds
    structurally-duplicated lambda subtrees that codegen's
    subexpression elimination can't always unify (lambda-variable
    identity), which bloats the generated code and its compile time
    (~6s for the 5-column stats projection). Building every derived
    column from the same Column objects keeps the tree small; runtime
    semantics are identical to the individual helpers.
    """
    n_tok = token_count(text)
    toks_lower = word_tokens(F.lower(text))
    stops = [F.lit(w) for w in STOPWORDS]
    stop_hits = F.size(F.filter(toks_lower, lambda t: t.isin(*stops)))
    stop_ratio = stop_hits.cast("double") / F.greatest(n_tok, F.lit(1))
    puncts = F.length(F.regexp_replace(text, r"[^.!?,;:'\"()\[\]-]", ""))
    praw = puncts / F.greatest(F.length(text), F.lit(1))
    length_term = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stop_ratio * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(praw * 10, F.lit(1.0))
    quality = F.round((length_term + stop_term + punct_term) / 3.0, 6)
    return {
        "n_tokens": n_tok,
        "stop_hits": stop_hits,
        "stop_ratio": stop_ratio,
        "punct_ratio": praw,
        "quality": quality,
    }


def doc_fingerprint(text: Column) -> Column:
    """Normalization-stable exact-dup fingerprint: md5 of
    lowercased, whitespace-collapsed text."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# non-alnum symbols — the regex subset shared by Java regex and RE2 so
# the DuckDB oracle counts identically.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer (vs whitespace
    token_count, which merges punctuation into words)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


ROLLING_HASH_BASE = 131
ROLLING_HASH_MOD = 9_007_199_254_740_881  # largest prime < 2^53


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``acc = (acc*B + code(tok)) mod P`` with a per-token code from its
    length and first character. Unlike the md5 set fingerprint this is
    sequence-sensitive (token swaps change it), and the fold stays in
    exact long arithmetic (acc < P < 2^53, acc*B < 2^63 — no ANSI
    overflow), so DuckDB's list_reduce reproduces it bit-for-bit."""
    toks = word_tokens(F.lower(text))
    code = lambda t: F.length(t) * 256 + F.ascii(F.substring(t, 1, 1))  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * ROLLING_HASH_BASE + code(t), F.lit(ROLLING_HASH_MOD)),
    )


def _ngram_array(toks: Column, n: int) -> Column:
    """Word n-grams from a token array via shifted slices + zip_with.

    The lambdas reference ONLY their lambda variables — never `toks`
    directly. An outer expression captured inside a higher-order-
    function lambda (e.g. ``element_at(toks, i)`` with `toks` a
    `split(...)` tree) is re-evaluated per array element by codegen,
    turning tokenization into O(m) regex splits per document (measured
    8s -> 0.5s on the contamination query at sf0.1). Slices evaluate
    `toks` a constant number of times per row instead."""
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, k)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, k), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return grams


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Array of word n-grams WITH multiplicity (unlike word_shingles,
    which distincts) — the input to repetition metrics, where duplicate
    n-grams are the signal."""
    return _ngram_array(word_tokens(F.lower(text)), n)


# RE2-compatible redaction patterns (no backrefs/lookaround) so the
# DuckDB oracle applies the identical substitutions.
URL_PATTERN = r"https?://\S+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"


def clean_text(text: Column) -> Column:
    """Curation-grade normalization: lowercase, redact URLs and emails
    to fixed placeholder tokens, collapse whitespace runs, trim. Pure
    regexp_replace chain — JVM-side, no Python in the hot path."""
    out = F.lower(F.trim(text))
    out = F.regexp_replace(out, URL_PATTERN, "<url>")
    out = F.regexp_replace(out, EMAIL_PATTERN, "<email>")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def split_bucket(fingerprint: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    """Deterministic train/val/test assignment from a content hash:
    bucket = fingerprint mod 100. Hash-based (not random) so the split
    is reproducible across runs, engines, and re-partitioning — the
    property a 100 TB pipeline needs for resumable dataset builds."""
    b = F.pmod(fingerprint, F.lit(100))
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram shingles (distinct), for MinHash/Jaccard.

    Implemented with JVM-side array functions (see _ngram_array for
    why shifted slices, not indexed element_at)."""
    return F.array_distinct(_ngram_array(word_tokens(F.lower(text)), n))


def winnowing_fingerprints(
    df, id_col: str, text_col: str, k: int = 3, window: int = 4
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-token gram with the shared exact
    polynomial (same base/modulus as rolling_fingerprint, so DuckDB
    reproduces it bit-for-bit), slide a ``window`` over the gram
    hashes, and select the RIGHTMOST minimal hash per window. The
    selected (position, hash) set is the standard plagiarism/overlap
    fingerprint: guaranteed to share a selection for any match of
    length >= window + k - 1, at ~2/(window+1) sampling density.

    Coverage floor (by the same guarantee): documents SHORTER than
    window + k - 1 tokens (default 6) form no full window and emit
    ZERO fingerprints — two identical 5-token docs share no winnowing
    fingerprints here. That is inside the algorithm's contract (it
    only promises matches of guarantee length), but consumers needing
    short-doc coverage must pair this with exact_text_dedup /
    ngram_jaccard_pairs, which have no length floor.

    ROW form, not array expressions: tokens explode once, the k-gram
    hash is a lead() composition (each gram hashed exactly once), and
    the per-window rightmost-min is one frame aggregate —
    ``min(struct(hash, -pos))`` picks the smallest hash and, among
    ties, the largest position. An array-expression formulation is
    quadratic in practice: Catalyst inlines the gram-array expression
    into every slice reference inside the selection lambda and
    re-evaluates it per window (measured 110 s vs ~1 s at sf0.01).
    Returns (id_col, fp_pos, fp_hash), distinct.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(word_tokens(F.lower(F.col(text_col)))).alias("__j", "__t"),
    ).select(
        id_col,
        "__j",
        (F.length("__t") * 256 + F.ascii(F.substring("__t", 1, 1)))
        .cast("long")
        .alias("__c"),
    )
    w_seq = Window.partitionBy(id_col).orderBy("__j")
    gram = F.lit(0).cast("long")
    # pmod EVERY step (same discipline as rolling_fingerprint): folding
    # k codes unreduced overflows int64 around k ~ 8 on ordinary text,
    # which under ANSI mode is an ARITHMETIC_OVERFLOW job kill
    for i in range(k):
        gram = F.pmod(
            gram * ROLLING_HASH_BASE + F.lead("__c", i, None).over(w_seq),
            F.lit(ROLLING_HASH_MOD),
        )
    grams = (
        toks.withColumn("__h", gram)
        .filter(F.col("__h").isNotNull())  # tail positions with < k tokens
        .select(id_col, F.col("__j").alias("__g"), "__h")
    )
    w_win = (
        Window.partitionBy(id_col).orderBy("__g").rowsBetween(0, window - 1)
    )
    sel = (
        grams.withColumn(
            "__m", F.min(F.struct(F.col("__h"), (-F.col("__g")).alias("__ng"))).over(w_win)
        )
        .withColumn("__n_in_win", F.count(F.lit(1)).over(w_win))
        .filter(F.col("__n_in_win") == window)  # full windows only
    )
    # +1: gram positions are reported 1-based (posexplode is 0-based),
    # matching the classic formulation and the SQL oracle.
    return sel.select(
        id_col,
        (-F.col("__m.__ng") + 1).cast("int").alias("fp_pos"),
        F.col("__m.__h").alias("fp_hash"),
    ).distinct()
