"""Distributed connected components over an edge list.

The reference has no graph operator at all; its dedup story stops at
"alert was already sent" set membership (reference:
monitoring/alert_manager.py:83-94). A corpus dedup pipeline needs the
next step: near-dup PAIRS (MinHash/SimHash/Jaccard candidates from
operators/dedup.py) must be closed into CLUSTERS so one canonical
document per duplicate group survives — pairs alone under-delete
(A~B, B~C but A!~C still means keep only one of {A,B,C}).

Algorithm: iterative min-label propagation with pointer jumping
("hash-to-min", Rastogi et al. 2012, "Finding Connected Components in
Map-Reduce in Logarithmic Rounds"). Each round every node takes the
min component id over itself and its neighbors, then shortcuts through
its current component pointer (label(label(n))) — the pointer-jump
halves chain depth, giving O(log d) rounds on diameter-d components
instead of O(d) for plain neighbor flooding.

Scale notes (100 TB): each round is two shuffles on the node id
(neighbor min + pointer join), both over the *node/edge* tables — no
per-component serialization point, no driver-side graph. Rounds
localCheckpoint their result: iterative self-joins otherwise double
the Catalyst plan every round (analysis time goes exponential) and
replay the whole lineage on failure. Dedup graphs converge in 2-4
rounds (components are near-cliques of duplicates, diameter ~1-2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _persisted_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently registered with the block manager.
    localCheckpoint registers its backing RDD here at CALL time (even
    eager=False), so diffing before/after a checkpoint identifies
    exactly the blocks that checkpoint owns."""
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.keysIterator()
    out: set[int] = set()
    while it.hasNext():
        out.add(it.next())
    return out


def _release_rdds(spark: SparkSession, ids: set[int]) -> None:
    """Unpersist the given RDD ids. DataFrame.unpersist() is a NO-OP
    for localCheckpoint blocks (they are registered at the RDD layer,
    not the Dataset cache manager — verified: the persistent-RDD count
    is unchanged after df.unpersist()), so superseded per-round
    checkpoints must be released through the block manager's own
    registry or they accumulate for the process lifetime."""
    if not ids:
        return
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.valuesIterator()
    while it.hasNext():
        r = it.next()
        if r.id() in ids:
            r.unpersist(False)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id in the node's connected
    component — a deterministic canonical cluster id.

    Edges are treated as undirected; self-loops and duplicates are
    fine (they collapse in the symmetrize-distinct step).

    ``checkpoint_dir``: by default rounds truncate lineage with
    ``localCheckpoint`` — executor-local blocks, right for local mode
    and fastest, but NOT executor-loss tolerant (a lost executor's
    cached blocks cannot be recomputed once lineage is truncated). On
    a real cluster pass a fault-tolerant directory (HDFS/S3) and each
    round checkpoints there via ``sparkContext.setCheckpointDir`` +
    ``DataFrame.checkpoint`` instead, surviving executor loss at the
    cost of one distributed write per round.
    """

    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame, eager: bool) -> tuple[DataFrame, set[int]]:
        """Checkpoint + the set of RDD ids the checkpoint registered,
        so superseded rounds can be released (reliable-checkpoint mode
        registers nothing block-side; its ids set is simply empty)."""
        before = _persisted_rdd_ids(spark)
        out = df.checkpoint(eager=eager) if checkpoint_dir is not None else df.localCheckpoint(eager=eager)
        return out, _persisted_rdd_ids(spark) - before

    # Materialize the raw edge projection EAGERLY before symmetrizing:
    # union(e, e.swapped) duplicates the entire upstream subtree in the
    # logical plan, so an expensive pair-generation pipeline (shingle
    # explode + 3 aggregates for the Jaccard case) would be analyzed
    # and executed twice — measured 2x the whole-query cost at sf0.1.
    # After the checkpoint the union reads a cached RDD twice instead.
    e0, e0_ids = _ckpt(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")), eager=True)
    sym, sym_ids = _ckpt(
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        eager=False,
    )
    # Size the loop's shuffle width to the edge count (~500k edges per
    # partition), exactly as AQE would coalesce it: the near-dup edge
    # list is orders smaller than the corpus, and running log-d rounds
    # of 32-way shuffles over a few thousand edges spends everything on
    # task scheduling. The count also materializes the symmetrized
    # checkpoint so each loop round starts from cached edges.
    n_edges = sym.count()
    n_parts = max(1, min(sym.sparkSession.sparkContext.defaultParallelism, n_edges // 500_000))
    # Partition by "b" — the loop's only join against e keys on b
    # (labels renamed node->b), so the edge side never reshuffles
    # inside the loop.
    e, _e_ids = _ckpt(sym.repartition(n_parts, "b"), eager=True)
    # Initialize at least(node, min_neighbor) — the first half of a
    # propagation round folded into the init aggregate. Dup graphs are
    # near-cliques, and a clique is already at fixpoint after this, so
    # the loop's first round detects convergence immediately (one full
    # round saved on the dominant shape; chains just shift by one).
    # Every node of the symmetrized edge list appears as "a"; nodes
    # whose ONLY edges were self-loops vanished in the a != b filter,
    # so they are unioned back as their own singleton component — the
    # documented contract is every node appearing in ``edges``.
    init = (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__mn"))
        .select("node", F.least(F.col("node"), F.col("__mn")).alias("comp"))
    )
    loop_nodes = e.select(F.col("a").alias("node")).distinct()
    self_only = (
        e0.select(F.col("a").alias("node"))
        .union(e0.select(F.col("b").alias("node")))
        .distinct()
        .join(loop_nodes, "node", "left_anti")
        .select("node", F.col("node").alias("comp"))
    )
    # Convergence detection: labels only ever decrease. For NUMERIC ids
    # sum(comp) is strictly monotone until fixpoint — two equal
    # consecutive sums mean no label moved, one tiny aggregation per
    # round (which doubles as the action materializing the round's
    # checkpoint); decimal(38,0) keeps it exact under ANSI at any id
    # scale. Non-numeric ids (string doc keys) cannot be cast — ANSI
    # throws, and legacy NULL sums would fake instant convergence — so
    # they use an exact changed-row probe against the previous labels
    # (limit(1) short-circuits; one small extra join per round).
    labels, labels_ids = _ckpt(init.unionByName(self_only), eager=False)
    numeric_comp = dict(labels.dtypes)["comp"] in (
        "tinyint", "smallint", "int", "bigint",
    ) or dict(labels.dtypes)["comp"].startswith("decimal")

    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    # Seed the convergence detector with the INIT labels' sum, riding
    # the very action that materializes the init checkpoint (lazy ckpt
    # + sum, replacing the former eager ckpt's internal action — zero
    # extra jobs): labels are monotone non-increasing, so round-1 sum
    # == init sum proves round 1 moved nothing and init was already
    # the fixpoint. Dup graphs are star/clique shaped — init
    # (least(node, min-neighbor)) IS their fixpoint — so this detects
    # convergence after ONE round instead of the two the prev_sum=None
    # seed forced (the string path always had this: it compares
    # against the previous labels directly). Saves a full
    # propagate+jump round (4-6 serial jobs) on init-fixpoint graphs,
    # costs nothing on the rest.
    if numeric_comp:
        prev_sum = _label_sum(labels)
    else:
        prev_sum = None
        labels.count()  # materialize the lazy init checkpoint
    # e0 fed sym, e, and the self-loop union; sym fed e. Both are dead
    # weight once labels materialize — release their blocks so repeated
    # CC calls in one session don't accumulate checkpoint storage.
    _release_rdds(spark, e0_ids | sym_ids)
    if n_edges == 0:
        # only self-loops (or no edges): already at fixpoint; the edge
        # table won't be read again
        _release_rdds(spark, _e_ids)
        return labels.select("node", F.col("comp").alias("component"))
    for _ in range(max_iter):
        # 1. neighbor min: comp'(n) = min(comp(n), min_{m in N(n)} comp(m))
        nbr_min = (
            e.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # 2. pointer jump: comp''(n) = comp'(comp'(n)) — halves chains.
        ptr = stepped.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp2")
        )
        jumped, jumped_ids = _ckpt(
            stepped.join(ptr, "comp", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))
                ).alias("comp"),
            ),
            eager=False,
        )
        if numeric_comp:
            cur_sum = _label_sum(jumped)
            converged = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            converged = (
                jumped.join(
                    labels.select("node", F.col("comp").alias("__prev")), "node"
                )
                .filter(F.col("comp") != F.col("__prev"))
                .limit(1)
                .count()
                == 0
            )
        # the action above materialized `jumped`; the superseded round's
        # blocks are now dead — release before rebinding (the final
        # round's blocks back the returned frame and stay)
        _release_rdds(spark, labels_ids)
        labels, labels_ids = jumped, jumped_ids
        if converged:
            break
    # only the final labels blocks back the returned frame; the edge
    # table is loop-internal
    _release_rdds(spark, _e_ids)
    return labels.select("node", F.col("comp").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Close near-dup pairs into clusters: (cluster_id, n_members,
    max_member). ``cluster_id`` = min member id = the canonical keeper
    under the keep-lowest-id policy (the same deterministic policy as
    ``dedup.exact_text_dedup``). Singletons (docs in no pair) are not
    emitted — they are trivially their own keeper.

    ``components``: pass a precomputed (node, component) closure of the
    SAME pair set to skip the iterative CC — the expensive half of
    every closure consumer, so pipelines running several of them share
    one materialized closure (same derived-artifact pattern as the
    pair table itself)."""
    comp = (
        components
        if components is not None
        else connected_components(pairs, src=id_a, dst=id_b)
    )
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_member"),
    )


def deduped_corpus_by_quality(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Cluster dedup keeping the BEST-quality member per near-dup
    cluster (ties broken by min id) — what a real curation run wants:
    when a boilerplate-stripped page and its raw twin collide, keep
    the higher-quality one, not the lower doc id. One window over the
    (tiny) membership table picks keepers; the corpus-side removal is
    the same broadcast anti-join as ``deduped_corpus``. ``components``
    as in :func:`dedup_clusters`."""
    from pyspark.sql import Window

    comp = (
        components
        if components is not None
        else connected_components(pairs, src=id_a, dst=id_b)
    )
    members = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(quality_col).alias("__q")), "node"
    )
    w = Window.partitionBy("component").orderBy(F.col("__q").desc(), F.col("node").asc())
    losers = (
        members.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("node").alias(id_col))
    )
    return df.join(F.broadcast(losers), id_col, "left_anti")


def deduped_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Apply cluster dedup to the corpus: drop every row whose id sits
    in a near-dup cluster but is not the cluster's minimum. One
    broadcast-able join against the (small) non-keeper set — at 100 TB
    the removal list is |duplicates|, orders below |corpus|.
    ``components`` as in :func:`dedup_clusters`."""
    comp = (
        components
        if components is not None
        else connected_components(pairs, src=id_a, dst=id_b)
    )
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(F.broadcast(losers), id_col, "left_anti")


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """All triangles in an undirected graph, one row per triangle with
    members sorted ``(id_a < id_b < id_c)``.

    Uses DEGREE ORIENTATION (each undirected edge directed from its
    lower-(degree, id) endpoint to the higher): the oriented graph is
    acyclic, every triangle appears exactly once as u->v, v->w, u->w,
    and — the scale property — out-degrees are bounded by O(sqrt(m)),
    so the wedge join materializes O(m^1.5) candidates worst-case
    instead of the O(sum deg^2) a naive id-orientation pays on skewed
    graphs (one celebrity node with degree d creates d^2/2 wedges
    under id-order; at most m under degree order). Two shuffles: one
    to attach degrees, one wedge equi-join + closing-edge semi pattern.

    The reference has no graph surface at all; this extends the
    near-dup pair/cluster layer (operators/dedup.py, graph.py) with
    the standard triangle primitive used for dup-cluster density and
    social-graph metrics.
    """
    # Materialize the edge projection EAGERLY: the oriented edge list is
    # referenced four times below (degree count + three join legs), and
    # an expensive upstream pair pipeline (e.g. Jaccard candidate
    # generation) would otherwise be re-executed once per reference —
    # measured 4x the whole-query cost on the near-dup graph. Same
    # rationale as connected_components' edge checkpoint above.
    spark = edges.sparkSession
    before = _persisted_rdd_ids(spark)
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )
    e0_ids = _persisted_rdd_ids(spark) - before
    und = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    with_deg = _degree_oriented(und)
    _release_rdds(spark, e0_ids)
    return _wedge_triangles(with_deg)


def _degree_oriented(und: DataFrame) -> DataFrame:
    """Degree-orient a symmetrized undirected edge list ``(u, v)``:
    attach both endpoint degrees, keep each undirected edge once,
    oriented low-(deg,id) -> high-(deg,id). Eagerly checkpointed — the
    wedge join reads it three times, and the caller may release the
    upstream edge blocks as soon as this returns."""
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    return (
        und.join(deg, "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v")),
            "v",
        )
        .filter(
            (F.col("deg") < F.col("deg_v"))
            | ((F.col("deg") == F.col("deg_v")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        .localCheckpoint(eager=True)
    )


def _wedge_triangles(with_deg: DataFrame) -> DataFrame:
    """The wedge equi-join + closing-edge pattern over an already
    degree-oriented (and materialized) edge list; one row per triangle,
    members sorted."""
    d1 = with_deg
    d2 = with_deg.select(F.col("u").alias("v"), F.col("v").alias("w"))
    d3 = with_deg.select(F.col("u").alias("u"), F.col("v").alias("w"))
    tri = d1.join(d2, "v").join(d3, ["u", "w"])
    sorted_ids = F.array_sort(F.array("u", "v", "w"))
    return tri.select(
        sorted_ids[0].alias("id_a"),
        sorted_ids[1].alias("id_b"),
        sorted_ids[2].alias("id_c"),
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: 2*T(v) / (deg(v) *
    (deg(v)-1)) where T(v) counts triangles through v — THE density
    diagnostic for near-dup clusters (a clique of true duplicates has
    coefficient 1.0 everywhere; chance shingle collisions produce
    star-ish subgraphs near 0.0), and the standard social-graph
    metric.

    Reuses the degree-oriented ``triangles`` wedge join, explodes each
    triangle to its three members (3 rows per triangle — bounded), and
    joins counts back onto the degree table: one extra shuffle over
    the TRIANGLE list, never the corpus. Nodes on no triangle get 0.0;
    degree-1 nodes have an undefined denominator and report 0.0.
    """
    # one eager checkpoint serves BOTH the degree table and the
    # triangle join's references — without it an expensive upstream
    # pair pipeline would re-execute per consumer (the same hazard
    # triangles() guards internally; see its comment)
    spark = edges.sparkSession
    before = _persisted_rdd_ids(spark)
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )
    e0_ids = _persisted_rdd_ids(spark) - before
    # Materialize the symmetrized edge list ONCE and share it between
    # the degree table and the orientation (previously this function
    # computed und/deg itself for the coefficient AND called the public
    # triangles(), which re-checkpointed e0 and recomputed und/deg from
    # scratch for the orientation — one whole union+distinct exchange,
    # one groupBy and one checkpoint materialization of pure double
    # work per execution).
    und = (
        e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    _release_rdds(spark, e0_ids)
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("degree"))
    tri_nodes = (
        _wedge_triangles(_degree_oriented(und))
        .select(F.explode(F.array("id_a", "id_b", "id_c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    joined = deg.join(tri_nodes, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                F.coalesce(F.col("n_triangles"), F.lit(0))
                * 2.0
                / (F.col("degree") * (F.col("degree") - 1)),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coef"),
    )
    return joined


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected graph — the
    centrality score that picks the most-representative member of a
    near-dup cluster (the "canonical doc" refinement over min-id /
    max-quality keepers) and completes the graph kit's iterative-
    dataflow trio (connected components, triangles, PageRank).

    Scale shape mirrors connected_components: the edge projection is
    checkpointed ONCE (an expensive upstream pair pipeline must not
    re-execute per iteration or per join leg), source degrees are
    attached once to that same cached edge list, and each iteration is
    a single equi-join on the source node + one aggregation keyed on
    the destination — O(m) per round, no growing lineage on the data
    path. Fixed iteration count keeps the plan finite (rank deltas
    converge geometrically at ``damping``^k; 5 rounds is the classic
    cluster-triage setting). The node count is one scalar driver agg,
    same justification as CC's convergence check.

    Nodes are the graph's vertices (isolated docs never enter the
    edge list); undirected edges contribute in both directions, so
    there are no dangling nodes and total rank mass stays 1.
    """
    spark = edges.sparkSession
    before = _persisted_rdd_ids(spark)
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )
    e0_ids = _persisted_rdd_ids(spark) - before
    und = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    edges_deg = und.join(deg, "u").localCheckpoint(eager=True)
    # e0's blocks fed the eager edges_deg materialization and are dead
    # weight afterwards — release them (via the block-manager registry;
    # DataFrame.unpersist() is a no-op for checkpoint blocks) so
    # repeated pagerank calls don't accumulate checkpoint storage.
    _release_rdds(spark, e0_ids)
    nodes = edges_deg.select(F.col("u").alias("node")).distinct()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            edges_deg.join(ranks, edges_deg["u"] == ranks["node"])
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("degree")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        # No re-join against `nodes`: the symmetrized edge list contains
        # every node as a destination (each undirected edge contributes
        # both directions, and every vertex has degree >= 1), so
        # `contrib` covers the node set exactly each iteration — the
        # former nodes.join(contrib, "left") + coalesce(c, 0) was an
        # identity that cost one join + one exchange per iteration
        # (plan: 10 joins -> 5 for 5 iterations). Dangling-node mass
        # redistribution is exactly the case this would matter for, and
        # the symmetrization rules it out by construction.
        ranks = contrib.select(
            "node",
            (F.lit(base) + F.lit(damping) * F.col("c")).alias("rank"),
        )
    return ranks
