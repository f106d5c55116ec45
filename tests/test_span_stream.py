"""Streaming ExactSubstr span flagging (streaming/app.py:
span_flag_epoch): cross-epoch duplicate detection against the
persisted gram-count index, replay idempotency, index compaction, and
the end-to-end availableNow stream."""

from __future__ import annotations

import json

from pubg_data_pipeline_spark.streaming import app

FOOTER = "all rights reserved by the example publishing network corp"  # 9 tokens


def _spans(spark, spans_path):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r["__epoch"])
        for r in spark.read.parquet(spans_path).collect()
    }


def test_span_flags_cross_epoch_and_within_batch(spark, tmp_path):
    idx, sp = str(tmp_path / "gram_idx"), str(tmp_path / "spans")
    # Epoch 0: two docs sharing the footer -> BOTH flagged (within-batch
    # duplication); one unique doc -> clean.
    b0 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon " + FOOTER),
            (2, "one two three four five six seven " + FOOTER),
            (3, "entirely unique words that never repeat anywhere at all"),
        ],
        "doc_id int, text string",
    )
    app.span_flag_epoch(b0, 0, idx, sp, gram_len=5, min_span_tokens=9)
    got0 = _spans(spark, sp)
    assert got0 == {(1, 5, 13, 9, 0), (2, 7, 15, 9, 0)}

    # Epoch 1: a NEW doc reusing the historical footer is flagged even
    # though nothing in its own batch repeats; a unique doc stays clean.
    b1 = spark.createDataFrame(
        [
            (10, "fresh opening words here then " + FOOTER),
            (11, "some other totally novel content with no known phrases"),
        ],
        "doc_id int, text string",
    )
    app.span_flag_epoch(b1, 1, idx, sp, gram_len=5, min_span_tokens=9)
    got1 = _spans(spark, sp)
    assert got1 == got0 | {(10, 5, 13, 9, 1)}


def test_span_flag_epoch_replay_is_idempotent(spark, tmp_path):
    idx, sp = str(tmp_path / "gram_idx"), str(tmp_path / "spans")
    b0 = spark.createDataFrame(
        [(1, "aa bb cc dd ee " + FOOTER)], "doc_id int, text string"
    )
    b1 = spark.createDataFrame(
        [(2, "ff gg hh ii jj " + FOOTER)], "doc_id int, text string"
    )
    app.span_flag_epoch(b0, 0, idx, sp, gram_len=5, min_span_tokens=9)
    app.span_flag_epoch(b1, 1, idx, sp, gram_len=5, min_span_tokens=9)
    before_spans = _spans(spark, sp)
    before_idx = {
        (r.gram, r.n, r["__epoch"]) for r in spark.read.parquet(idx).collect()
    }
    # at-least-once retry of epoch 1
    app.span_flag_epoch(b1, 1, idx, sp, gram_len=5, min_span_tokens=9)
    assert _spans(spark, sp) == before_spans
    assert {
        (r.gram, r.n, r["__epoch"]) for r in spark.read.parquet(idx).collect()
    } == before_idx


def test_compact_gram_index_preserves_flagging(spark, tmp_path):
    idx, sp = str(tmp_path / "gram_idx"), str(tmp_path / "spans")
    app.span_flag_epoch(
        spark.createDataFrame(
            [(1, "aa bb cc dd ee " + FOOTER)], "doc_id int, text string"
        ),
        0, idx, sp, gram_len=5, min_span_tokens=9,
    )
    app.span_flag_epoch(
        spark.createDataFrame(
            [(2, "ff gg hh ii jj kk ll mm")], "doc_id int, text string"
        ),
        1, idx, sp, gram_len=5, min_span_tokens=9,
    )
    app.compact_gram_index(spark, idx)
    import os

    dirs = [d for d in os.listdir(idx) if d.startswith("__epoch=")]
    assert dirs == ["__epoch=0"]
    # a post-compaction epoch still sees the historical footer
    app.span_flag_epoch(
        spark.createDataFrame(
            [(20, "later arrival reusing that footer " + FOOTER)],
            "doc_id int, text string",
        ),
        2, idx, sp, gram_len=5, min_span_tokens=9,
    )
    assert (20, 5, 13, 9, 2) in _spans(spark, sp)


def test_streaming_span_flags_end_to_end(spark, tmp_path):
    src = tmp_path / "span_src"
    src.mkdir()
    idx, sp = str(tmp_path / "gram_idx_e2e"), str(tmp_path / "spans_e2e")
    ckpt = str(tmp_path / "span_ckpt")
    (src / "b1.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": "start of first page " + FOOTER})
        + "\n"
        + json.dumps({"doc_id": 2, "text": "second page body text " + FOOTER})
        + "\n"
        + json.dumps({"doc_id": 3, "text": "clean page with only original words"})
    )
    stream = spark.readStream.schema("doc_id int, text string").json(str(src))
    q = app.streaming_span_flags(
        stream, idx, sp, gram_len=5, min_span_tokens=9,
        available_now=True, checkpoint=ckpt,
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    flagged = {r.doc_id for r in spark.read.parquet(sp).collect()}
    assert flagged == {1, 2}
