"""Physical-plan regression tests: the scale properties claimed in
README/SURVEY must be visible in the executed plan, not just asserted
in prose — broadcasts on dimension joins, two-phase top-k instead of
single-partition sorts, partial aggregation, filter pushdown."""

from __future__ import annotations

import re

import pytest

from pubg_data_pipeline_spark.plans import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _plan(spark, name: str) -> str:
    df = SPECS[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_dimensions(spark):
    plan = _plan(spark, "top_revenue_nations")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_flagship_ranking_avoids_global_sort(spark):
    # rank<=10 over the aggregated frame compiles to a two-phase top-k
    # (TakeOrderedAndProject / WindowGroupLimit), not a 1-partition sort
    plan = _plan(spark, "player_ranking_top10")
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan


def test_recent_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "recent_events_top10")


def test_pricing_summary_pushdown_and_partial_agg(spark):
    plan = _plan(spark, "pricing_summary")
    # shipdate predicate reaches the parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    # partial (map-side) + final aggregation
    assert plan.count("HashAggregate") >= 2


def test_zscore_broadcasts_stats_no_collect(spark):
    plan = _plan(spark, "zscore_anomalies")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_column_pruning_reaches_scan(spark):
    # high_k_events projects 2 columns; the events scan must not read value/ts
    plan = _plan(spark, "high_k_events")
    scan = plan.split("ReadSchema", 1)[1][:200]
    assert "props" in scan and "event_id" in scan
    assert "value" not in scan and "user_id" not in scan


def test_q4_exists_plans_as_semi_join(spark):
    # the EXISTS correlation must become a semi join (order rows never
    # duplicated by multi-line matches), with the quarter filter
    # pushed into the orders scan
    plan = _plan(spark, "order_priority_checking")
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters", 1)[1][:600]


def test_q19_disjunction_stays_hash_join(spark):
    # Catalyst must extract the common p_partkey equi-key from the
    # OR-of-ANDs predicate — a nested-loop join here would be O(n*m)
    plan = _plan(spark, "disjunctive_brand_revenue")
    assert "HashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q7_nation_pair_broadcasts_dims(spark):
    plan = _plan(spark, "volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q15_scalar_max_is_broadcast_not_collect(spark):
    # the MAX(rev) scalar joins back via a broadcast of the 1-row
    # aggregate; no driver-side collect exists in the plan path
    plan = _plan(spark, "top_supplier_revenue")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_q17_windowed_avg_single_lineitem_scan(spark):
    # the correlated per-part average is a window over the joined rows:
    # lineitem must be scanned once, not once for the avg and once for
    # the probe side
    plan = _plan(spark, "small_quantity_revenue")
    assert plan.count("Scan parquet") - plan.count("ReusedExchange") <= 2  # lineitem + part


def test_corpus_vocabulary_two_phase_topk(spark):
    # top-50 terms must be TakeOrderedAndProject (two-phase top-k),
    # never a global sort, and the count aggregate must be partial+final
    plan = _plan(spark, "corpus_vocabulary")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_paragraph_block_dedup_single_block_shuffle(spark):
    # the keeper decision is one window over the block hash plus the
    # per-doc re-aggregate — no self-join back to the corpus
    plan = _plan(spark, "paragraph_block_dedup")
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_fuzzy_pairs_block_join_not_cartesian(spark):
    # the brand block key must drive an equi-join (hash or broadcast);
    # levenshtein is a post-join filter, never a cartesian product
    plan = _plan(spark, "part_name_fuzzy_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_fuzzy_pairs_skewed_block_exact_and_bounded(spark):
    # One giant block (every row the same brand) — the shape the
    # length-band refinement exists for. The result must equal the
    # brute-force all-pairs answer (the refinement is provably exact),
    # and the join must stay an equi-join on (block, length).
    from pubg_data_pipeline_spark.operators.relational import fuzzy_blocked_pairs

    rows = [(i, "B#1", f"name {i:04d}") for i in range(300)]
    rows += [(1000, "B#1", "exact match x"), (1001, "B#1", "exact match y"),
             (1002, "B#1", "exact match xyzzy")]  # len differs by 3: never a pair
    df = spark.createDataFrame(rows, "id long, brand string, name string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in fuzzy_blocked_pairs(df, "id", "brand", "name", max_dist=2).collect()
    }
    import itertools

    expect = {}
    def _lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    for (ia, _, na), (ib, _, nb) in itertools.combinations(rows, 2):
        a, b = (ia, ib) if ia < ib else (ib, ia)
        sa, sb = (na, nb) if ia < ib else (nb, na)
        d = _lev(sa, sb)
        if d <= 2:
            expect[(a, b)] = d
    assert got == expect
    assert (1000, 1002) not in got  # length gap 3 pruned by the band key
    plan = fuzzy_blocked_pairs(df, "id", "brand", "name")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_global_rank_window_is_bucket_partitioned(spark):
    # The data-table window must be PARTITIONED by the coarse score
    # bucket (parallel local sorts); only the n_buckets-row offset
    # table may pass through a single-partition window. A bare global
    # row_number would instead put the full table behind
    # Exchange SinglePartition.
    plan = _plan(spark, "doc_length_global_rank")
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln and "row_number" in ln]
    assert window_lines, plan
    assert any("__gr_bucket" in ln for ln in window_lines), window_lines


def test_grouping_id_is_expand_aggregate(spark):
    # grouping sets plan as one Expand feeding a partial+final aggregate
    plan = _plan(spark, "order_priority_grouping_id")
    assert "Expand" in plan
    assert plan.count("HashAggregate") >= 2


def test_hard_negatives_broadcast_query_side(spark):
    # the 5-row query set broadcasts into the corpus scan; corpus-side
    # data never shuffles for the score (BroadcastNestedLoopJoin on the
    # tiny side is the intended crossJoin(broadcast(q)) shape)
    plan = _plan(spark, "embedding_hard_negatives")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_context_packing_windows_are_bucket_partitioned(spark):
    # the per-row running offset must ride the decomposed prefix sum
    # (bucket-partitioned window), never Exchange SinglePartition over
    # the data table
    plan = _plan(spark, "context_window_packing")
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln and "sum" in ln]
    assert any("__gr_bucket" in ln for ln in window_lines), window_lines


def test_dsir_weights_broadcast_distributions(spark):
    # both 64-row probability tables broadcast back to the token
    # stream; the only data-sized shuffle is the final doc_id agg
    plan = _plan(spark, "doc_importance_weights")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_basket_pairs_have_no_join(spark):
    # pairs explode from per-order collect_set baskets — there must be
    # no self-join of the lineitem scan left in the plan
    plan = _plan(spark, "part_basket_pairs")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cms_probe_join_broadcasts_sketch(spark):
    # the 1 KB counter grid must broadcast into the probe join, and the
    # grid build must partial-aggregate before its (bounded) shuffle
    plan = _plan(spark, "event_user_cms_frequency")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_covariance_is_single_scan(spark):
    # one pass: exactly one embeddings file scan feeds the Arrow-lane
    # Gramian; the cross-dim fan-out happens on the 1-row moments frame
    plan = _plan(spark, "embedding_covariance")
    assert plan.count("Scan parquet") == 1, plan
    assert "MapInPandas" in plan


def test_bootstrap_has_no_resample_shuffle(spark):
    # the x32 replica fan-out is map-side (Generate under the scan
    # side, no Exchange between scan and partial agg); order-statistics
    # joins on the 32-row frame broadcast
    plan = _plan(spark, "order_price_bootstrap_ci")
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan
    scan_to_agg = plan.split("Exchange")[-1]
    assert "Generate explode" in scan_to_agg, (
        "explode must sit below the first exchange (map-side fan-out)"
    )


def test_funnel_measures_single_exchange_per_grouping(spark):
    """funnel_step_latency: the measures fold is ONE aggregation pass —
    whole-history binding = exactly one hash exchange on user_id before
    the fold, plus the small cohort-day agg; no window, no join, no
    Python in the plan."""
    import re

    plan = _plan(spark, "funnel_step_latency")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "Join" not in plan  # iterated-join is the ORACLE's shape, not ours
    # per-user fold + per-day rollup: two clustering exchanges total
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_capped_session_fold_adds_no_exchange(spark):
    """session_sequences with max_events_per_session: the per-session
    row_number rides the sessionize window's [user_id] hash
    distribution ([key] is a subset of [key, session_id]) — the cap
    costs a local sort, never a shuffle."""
    import re

    from pubg_data_pipeline_spark.operators import sequence
    from pubg_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    base = sequence.session_sequences(ev)
    capped = sequence.session_sequences(ev, max_events_per_session=100)
    n_base = len(
        re.findall(
            r"Exchange hashpartitioning",
            base._jdf.queryExecution().executedPlan().toString(),
        )
    )
    n_capped = len(
        re.findall(
            r"Exchange hashpartitioning",
            capped._jdf.queryExecution().executedPlan().toString(),
        )
    )
    assert n_capped == n_base


def test_prefix_sum_consumers_tokenize_once(spark):
    """quality_token_budget_sample / context_window_packing materialize
    their tokenized projection once (lazy localCheckpoint) before
    global_prefix_sum, whose plan references its input multiple times:
    the query plan must carry NO parquet re-scan of documents (every
    reference reads the cached narrow projection) and therefore no
    duplicated regex tokenization."""
    for name in ("quality_token_budget_sample", "context_window_packing"):
        plan = _plan(spark, name)
        assert "Scan ExistingRDD" in plan, name
        assert "Scan parquet" not in plan, name
        # format-robust guard (the two asserts above lose their teeth
        # if load_table ever serves a non-parquet source): EVERY scan
        # in the plan, whatever its format, must be the cached RDD —
        # the barrier is the only thing standing between
        # global_prefix_sum's three input references and three regex
        # tokenizations of the corpus.
        scan_kinds = set(re.findall(r"Scan (\w+)", plan))
        assert scan_kinds <= {"ExistingRDD"}, f"{name}: source re-scanned: {scan_kinds}"
