"""Scalar-function + reshaping coverage: pivot, positional explode,
top-N per group, string/date function kits, ordered collect_set.

None of these appear in the reference (its expression surface is the
arithmetic/CASE family of SURVEY.md §2.2) — they complete the
standard relational toolkit a reference user would expect when moving
real workloads onto the engine, each with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.plans.base import QuerySpec, exact_scaled, sql_scaled
from pubg_data_pipeline_spark.sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts, one column per event type
    (explicit value list so the output schema is static — required for
    both the oracle and any production sink)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


_PIVOT_SQL = """
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
FROM events GROUP BY user_id
"""


def token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token stream with positions for the first documents
    (J2's positional variant — SURVEY.md §2.3 notes ours covers
    explode_outer/posexplode for null-safety/position)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "token")
    )


_TOKEN_POS_SQL = r"""
SELECT doc_id, CAST(u['pos'] AS INT) AS pos, u['tok'] AS token
FROM (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(arr)),
                               i -> {'pos': i - 1, 'tok': arr[i]})) AS u
  FROM (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
    FROM documents WHERE doc_id < 10
  )
)
"""


def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group: rank within partition, filter — compiles to
    WindowGroupLimit (per-partition top-k, no global sort)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice", "c_name")
    )


_TOP3_SQL = """
SELECT c_mktsegment, rn, o_orderkey, o_totalprice, c_name FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice, c_name,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
"""


def customer_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function kit: upper/substring/length/LIKE/concat/replace."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.col("c_name").like("%1%").cast("int").alias("has_one"),
        F.concat_ws("/", "c_mktsegment", "c_name").alias("seg_name"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
    )


_STRINGS_SQL = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       substring(c_name, 1, 8) AS name_prefix,
       length(c_name) AS name_len,
       CAST(c_name LIKE '%1%' AS INT) AS has_one,
       concat_ws('/', c_mktsegment, c_name) AS seg_name,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked
FROM customer WHERE c_custkey <= 500
"""


def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction kit: year/month/quarter/day aggregation.
    (dayofweek is deliberately excluded: Spark counts 1=Sunday, DuckDB
    0=Sunday — an engine-semantics difference the docs call out.)"""
    orders = load_table(spark, sf_dir, "orders")
    agged = orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum(exact_scaled(F.col("o_totalprice"))).alias("cents"),
        F.min(F.dayofmonth("o_orderdate")).alias("first_dom"),
    )
    return agged.select(
        "yr", "qtr", "mo", "order_count", "first_dom",
        F.round(F.col("cents") / 100.0, 2).alias("total_value"),
    )


_MONTHS_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(month(o_orderdate) AS INT) AS mo,
       COUNT(*) AS order_count,
       CAST(MIN(day(o_orderdate)) AS INT) AS first_dom,
       ROUND(CAST(SUM({sql_scaled('o_totalprice', 2)}) AS BIGINT) / 100.0, 2) AS total_value
FROM orders GROUP BY 1, 2, 3
"""


def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set with deterministic ordering, emitted as a joined
    string (list-typed outputs hash differently across engines'
    client layers, so the canonical form is a string)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )


_COLLECT_SQL = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def user_recent_value_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function kit over per-user event histories: ordered
    collect -> slice of the 3 most recent -> element extraction and an
    exact sum over the slice (the ArrayType handling the reference
    only touches via match_ids/size — SURVEY.md §2.3 J3)."""
    ev = load_table(spark, sf_dir, "events")
    # Bounded per-group state: rank each user's events newest-first
    # with a window (sort-based, SPILLS on a hot user) and collect only
    # the rank<=3 survivors — collect_list over the FULL history would
    # hold a hot user's millions of events in one non-spilling
    # aggregation buffer just to slice 3. n_events rides the same
    # window as count over the partition.
    w_all = Window.partitionBy("user_id")
    w_ord = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    top3 = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            exact_scaled(F.col("value")).alias("cents"),
        )
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__r", F.row_number().over(w_ord))
        .filter(F.col("__r") <= 3)
    )
    # structs sort lexicographically: (ts, event_id) DESC == reverse order
    last3 = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "cents")), asc=False
    )
    return (
        top3.groupBy("user_id", F.col("__n").alias("n_events"))
        .agg(last3.alias("last3"))
        .select(
            "user_id",
            F.col("n_events").cast("int").alias("n_events"),
            F.element_at("last3", 1)["event_id"].alias("latest_event_id"),
            F.round(
                F.aggregate(
                    F.transform("last3", lambda s: s["cents"]),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                / 100.0,
                2,
            ).alias("last3_value"),
        )
    )


_ARRAYS_SQL = f"""
WITH h AS (
  SELECT user_id,
         list_sort(list({{'ts': ts, 'event_id': event_id, 'cents': {sql_scaled('value', 2)}}})) AS hist
  FROM events GROUP BY user_id
), s AS (
  SELECT user_id, hist, list_reverse(hist)[1:3] AS last3 FROM h
)
SELECT user_id,
       CAST(len(hist) AS INT) AS n_events,
       last3[1]['event_id'] AS latest_event_id,
       ROUND(list_sum(list_transform(last3, x -> x['cents'])) / 100.0, 2) AS last3_value
FROM s
"""


def decimal_revenue_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType money aggregation (SURVEY.md §1.2: the engine adds
    DecimalType for money-like columns): prices cast to DECIMAL(18,2)
    at the scan, summed exactly in decimal, emitted as exact doubles.
    The alternative to the scaled-integer encoding used elsewhere —
    same order-independence, expressed through the type system."""
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    agged = orders.groupBy("o_orderstatus").agg(
        F.sum(dec).alias("total_dec"),
        F.count(F.lit(1)).alias("n_orders"),
        F.max(dec).alias("max_dec"),
    )
    return agged.select(
        "o_orderstatus",
        "n_orders",
        F.col("total_dec").cast("double").alias("total_price"),
        F.col("max_dec").cast("double").alias("max_price"),
    )


_DECIMAL_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders GROUP BY o_orderstatus
"""


def user_type_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType where natural (SURVEY.md §1.2): per-user map of
    event_type -> exact value cents, built with map_from_entries and
    consumed with element_at lookups (nulls for absent types)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.sum(exact_scaled(F.col("value"))).alias("cents")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cents")))
        ).alias("by_type")
    )
    return mapped.select(
        "user_id",
        F.size("by_type").alias("n_types"),
        F.round(F.element_at("by_type", F.lit("purchase")) / 100.0, 2).alias("purchase_value"),
        F.round(F.element_at("by_type", F.lit("error")) / 100.0, 2).alias("error_value"),
    )


_MAP_SQL = f"""
SELECT user_id,
       CAST(COUNT(*) AS INT) AS n_types,
       ROUND(CAST(MAX(CASE WHEN event_type = 'purchase' THEN cents END) AS BIGINT) / 100.0, 2)
         AS purchase_value,
       ROUND(CAST(MAX(CASE WHEN event_type = 'error' THEN cents END) AS BIGINT) / 100.0, 2)
         AS error_value
FROM (
  SELECT user_id, event_type, SUM({sql_scaled('value', 2)}) AS cents
  FROM events GROUP BY user_id, event_type
) GROUP BY user_id
"""


def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    and DuckDB ``quantile_cont`` both use linear interpolation).

    Scale note: exact percentile needs a per-group sort/collect of the
    column; at 100 TB switch to ``approx_percentile`` (t-digest) — the
    same trade as countDistinct vs approx_count_distinct."""
    orders = load_table(spark, sf_dir, "orders")
    pct = F.expr(
        "percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9))"
    ).alias("pcts")
    agged = orders.groupBy("o_orderstatus").agg(pct, F.count(F.lit(1)).alias("n_orders"))
    return agged.select(
        "o_orderstatus",
        "n_orders",
        F.round(F.element_at("pcts", 1), 4).alias("p25"),
        F.round(F.element_at("pcts", 2), 4).alias("p50"),
        F.round(F.element_at("pcts", 3), 4).alias("p75"),
        F.round(F.element_at("pcts", 4), 4).alias("p90"),
    )


_PERCENTILES_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90
FROM orders GROUP BY o_orderstatus
"""


def value_k_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics kit: Pearson correlation + sample
    covariance between the value metric and the props.k field, per
    event type."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    # Decomposed, GUARDED forms instead of F.corr/F.covar_samp: under
    # ANSI mode Spark's corr THROWS DIVIDE_BY_ZERO on a zero-variance
    # or single-row group (verified live) while DuckDB's corr returns
    # NULL — the guards reproduce the SQL NULL contract. Pairwise-
    # complete semantics (rows where either side is NULL are skipped)
    # match both engines' built-ins.
    both = F.col("value").isNotNull() & F.col("k").isNotNull()
    x = F.when(both, F.col("value").cast("double"))
    y = F.when(both, F.col("k").cast("double"))
    agged = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(x).alias("__np"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    np_ = F.col("__np").cast("double")
    varx = np_ * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = np_ * F.col("__syy") - F.col("__sy") * F.col("__sy")
    corr = F.when(
        (F.col("__np") > 1) & (varx > 0) & (vary > 0),
        (np_ * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
        / (F.sqrt(varx) * F.sqrt(vary)),
    )
    covar = F.when(
        F.col("__np") > 1,
        (F.col("__sxy") - F.col("__sx") * F.col("__sy") / np_) / (np_ - 1),
    )
    return agged.select(
        "event_type",
        "n",
        F.round(corr, 4).alias("corr_value_k"),
        F.round(covar, 2).alias("covar_value_k"),
    )


_CORR_SQL = r"""
SELECT event_type, COUNT(*) AS n,
       ROUND(corr(value, k), 4) AS corr_value_k,
       ROUND(covar_samp(value, k), 2) AS covar_value_k
FROM (SELECT event_type, value,
             CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k
      FROM events)
GROUP BY event_type
"""


def props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType semi-structured path (Spark 4): parse the props JSON
    blob into a variant once, then typed-extract fields from it —
    the open-schema alternative to from_json's fixed StructType (the
    reference carries such blobs as opaque strings; SURVEY.md §2.3 J5).
    Aggregated per event_type so the variant extraction feeds a normal
    relational pipeline."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.variant_get(F.parse_json("props"), "$.k", "int").alias("k")
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("k_total"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


_VARIANT_SQL = """
SELECT event_type,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS k_total,
       MIN(k) AS k_min,
       MAX(k) AS k_max
FROM (SELECT event_type, CAST(props->>'$.k' AS INT) AS k FROM events)
GROUP BY event_type
"""


def top2_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL front-end on both engines):
    each customer's two largest orders. Catalyst rewrites the lateral
    limit into a per-key window — same physical shape as the
    DataFrame top-N-per-group, proven here through the SQL surface."""
    for name in ("customer", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_LATERAL_SQL)


_LATERAL_SQL = """
SELECT c_custkey, c_mktsegment, l.o_orderkey, l.o_totalprice
FROM customer,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
"""


def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-flag measure columns into long
    (measure, value) form — the inverse of the pivot query, closing
    the reshape pair. Aggregates first so the unpivot is over a small
    wide table."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum(exact_scaled(F.col("l_extendedprice"))) / 100.0, 2).alias("price"),
        F.round(F.sum(exact_scaled(F.col("l_discount"))) / 100.0, 2).alias("discount"),
    )
    return wide.unpivot("l_returnflag", ["qty", "price", "discount"], "measure", "total")


_UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT l_returnflag,
         ROUND(SUM(l_quantity), 2) AS qty,
         ROUND(CAST(SUM({sql_scaled('l_extendedprice', 2)}) AS BIGINT) / 100.0, 2) AS price,
         ROUND(CAST(SUM({sql_scaled('l_discount', 2)}) AS BIGINT) / 100.0, 2) AS discount
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, total
FROM wide UNPIVOT (total FOR measure IN (qty, price, discount))
"""


def event_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_`` expression family: under the engine's default
    ANSI mode a divide-by-zero or bad cast kills the whole job, so the
    production-safe form for dirty data is ``try_divide``/``try_cast``
    (NULL on failure, row survives). Exercised against the JSON
    ``props.k`` payload where ``k - 50`` legitimately hits zero. The
    per-row double division is IEEE-deterministic cross-engine, so the
    quotient needs no rounding; only the dividend is pre-rounded to
    pin the parquet double."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .where(F.col("k").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_id",
            F.try_divide(F.round("value", 2), F.col("k") - 50).alias("per_unit"),
            F.expr("TRY_CAST(event_type AS INT)").alias("bad_parse"),
        )
    )


# DuckDB has no try_divide; CASE WHEN denominator = 0 is the exact
# NULL-on-zero semantics. TRY_CAST covers the parse leg.
_TRY_SQL = r"""
SELECT event_id,
       CASE WHEN k - 50 = 0 THEN NULL ELSE ROUND(value, 2) / (k - 50) END AS per_unit,
       TRY_CAST(event_type AS INT) AS bad_parse
FROM (SELECT event_id, value, event_type,
             TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k FROM events) t
WHERE k IS NOT NULL AND value IS NOT NULL
"""


def part_name_collation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface: COUNT(DISTINCT x) under the binary
    collation vs UTF8_LCASE (case-insensitive) over a deliberately
    case-diverse name set (each part name unioned with its uppercased
    form, so the two counts must differ by construction). Collations
    make case/accent rules a COLUMN property enforced by every
    comparison, join, and aggregate — the engine-level replacement for
    scattering lower() around queries and hoping nobody forgets one.
    The DuckDB oracle expresses the same semantics as
    COUNT(DISTINCT LOWER(x)) (exact for this ASCII name set)."""
    from pubg_data_pipeline_spark.plans.sql_queries import _sql

    return _sql(
        spark,
        sf_dir,
        ("part",),
        """
        WITH names AS (
          SELECT p_brand, p_name AS n FROM part
          UNION ALL
          SELECT p_brand, UPPER(p_name) FROM part
        )
        SELECT p_brand,
               COUNT(DISTINCT n) AS n_binary,
               COUNT(DISTINCT COLLATE(n, 'UTF8_LCASE')) AS n_ci
        FROM names GROUP BY p_brand
        """,
    )


_COLLATION_SQL = """
WITH names AS (
  SELECT p_brand, p_name AS n FROM part
  UNION ALL
  SELECT p_brand, UPPER(p_name) FROM part
)
SELECT p_brand,
       COUNT(DISTINCT n) AS n_binary,
       COUNT(DISTINCT LOWER(n)) AS n_ci
FROM names GROUP BY p_brand
"""


def user_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode per group — the argmax-over-aggregate shape:
    two hash aggregates (per-(user, type) counts, then min_by over the
    composite ordering (-n, type)), never a window over raw rows.
    Built-in ``mode()`` is nondeterministic on ties in BOTH engines, so
    the tie is pinned explicitly: highest count, then lexically
    smallest type — cross-engine reproducible, which is the whole
    point of a modal feature that feeds training data."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    ord_key = F.struct((-F.col("n")).alias("nn"), F.col("event_type"))
    return counts.groupBy("user_id").agg(
        F.min_by("event_type", ord_key).alias("modal_type"),
        F.max("n").alias("modal_n"),
    )


_MODAL_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY user_id, event_type
), r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
  FROM c
)
SELECT user_id, event_type AS modal_type, n AS modal_n FROM r WHERE rk = 1
"""


SPECS = [
    QuerySpec("event_type_pivot", event_type_pivot, _PIVOT_SQL, ("reshape",)),
    QuerySpec("event_try_arithmetic", event_try_arithmetic, _TRY_SQL, ("expr", "types")),
    QuerySpec(
        "part_name_collation_counts", part_name_collation_counts, _COLLATION_SQL, ("expr", "types")
    ),
    QuerySpec("user_modal_event_type", user_modal_event_type, _MODAL_SQL, ("agg",)),
    QuerySpec("props_variant_extract", props_variant_extract, _VARIANT_SQL, ("semi", "types")),
    QuerySpec("top2_orders_lateral", top2_orders_lateral, _LATERAL_SQL, ("sql", "window")),
    QuerySpec("lineitem_measures_unpivot", lineitem_measures_unpivot, _UNPIVOT_SQL, ("reshape",)),
    QuerySpec("user_recent_value_arrays", user_recent_value_arrays, _ARRAYS_SQL, ("agg", "array")),
    QuerySpec("decimal_revenue_summary", decimal_revenue_summary, _DECIMAL_SQL, ("agg", "types")),
    QuerySpec("user_type_value_map", user_type_value_map, _MAP_SQL, ("agg", "types")),
    QuerySpec("order_price_percentiles", order_price_percentiles, _PERCENTILES_SQL, ("agg", "stats")),
    QuerySpec("value_k_correlation", value_k_correlation, _CORR_SQL, ("agg", "stats")),
    QuerySpec("token_positions", token_positions, _TOKEN_POS_SQL, ("reshape", "llm")),
    QuerySpec("top3_orders_per_segment", top3_orders_per_segment, _TOP3_SQL, ("window",)),
    QuerySpec("customer_name_features", customer_name_features, _STRINGS_SQL, ("expr",)),
    QuerySpec("orders_by_month", orders_by_month, _MONTHS_SQL, ("expr", "time")),
    QuerySpec("user_event_type_sets", user_event_type_sets, _COLLECT_SQL, ("agg",)),
]
