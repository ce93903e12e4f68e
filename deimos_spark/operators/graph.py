"""Connected components over a pair relation — duplicate-CLUSTER
formation, the pipeline step after near-dup PAIR generation (minhash /
simhash / cosine pairs give edges; training-data dedup keeps one doc
per connected component).

Spark-first shape: iterative min-label propagation expressed with
DataFrame joins — each round every node adopts the smallest label in
its neighborhood (its own or a neighbor's), so labels flood toward each
component's minimum id. Convergence in O(diameter) rounds; near-dup
graphs are overwhelmingly small star-ish clusters, so diameter is tiny
(the `max_iters` gate guards adversarial chains). Each round is two
hash joins + one aggregate on (node, label) longs — shuffle keys stay
8-byte, no vertex state lives on the driver, and `localCheckpoint`
truncates the growing join lineage every few rounds (the standard
iterative-DataFrame pattern; without it Catalyst re-analyzes an
exponentially deeper plan each round).

The per-round `.count()` driver call is a bounded CONTROL read (one
long), not a data collect — the reference-style anti-pattern audit
(SURVEY §4) allows exactly this class.

Reference parity note: the reference has no graph layer (its dedup is
keyed upsert, deimos/active_record_consume/batch_consumption.rb) — this
is part of the LLM-training-data extension surface, like dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """→ (node, component) where component = min node id reachable.

    Only nodes that appear in `edges` are labeled (isolated docs are
    their own cluster by definition — callers left-join and coalesce).

    Every round MATERIALIZES its label relation (localCheckpoint whose
    first action IS the convergence probe — one job per round, r15).
    The r13 shape checkpointed every 5th
    round only, which made each window quadratic in evaluations: round
    i+1's joins re-executed round i's un-materialized plan, and the
    per-round changed-count evaluated the same plan AGAIN — ~30
    round-evaluations per 5-round window instead of 5 (measured as the
    dominant term of t20's 187s heavy-tier cost at sf0.1). With the
    round materialized, the changed probe is a scan of local shuffle-
    free blocks and the next round starts from data, not lineage; old
    checkpoint blocks are freed by the ContextCleaner as each round's
    frame goes out of scope."""
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    # Symmetric closure once; materialized and reused across every round.
    # localCheckpoint PRESERVES outputPartitioning (LogicalRDD carries it
    # — verified in the formatted plan), so both loop inputs are laid out
    # on their join keys ONCE here: sym hash(b) and labels hash(node).
    # Each round's inner join (b==node) and left join (node) then find
    # both sides co-partitioned and the only per-round exchange left is
    # the groupBy's b→a re-key — at 100 TB that removes two of the three
    # shuffles from every iteration.
    # "spark.sql.shuffle.partitions" can be non-numeric on platforms that
    # manage it themselves (e.g. "auto" under some AQE deployments) —
    # fall back to the cluster's default parallelism (ADVICE r14)
    try:
        P = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        P = edges.sparkSession.sparkContext.defaultParallelism
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().repartition(P, "b").localCheckpoint(eager=True)

    # Label init fused with round 1 (r15): starting from identity labels,
    # the first round's nbr_min is just min-neighbor — so initialize
    # comp = least(node, min(b)) directly. Same shuffle the old
    # distinct-on-node init paid (hash on the node key), one fewer loop
    # round: at sf0.1 that is one checkpoint+probe job pair (~0.6s);
    # at 100 TB it is a full join+agg round over the edge relation.
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("_mb"))
        .select(
            "node", F.least(F.col("node"), F.col("_mb")).alias("comp")
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iters):
        # smallest label in each node's neighborhood
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(sym["a"].alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # pointer jump (hash-min + path compression, r14): compose the
        # stepped label with the PREVIOUS round's relation —
        # comp ← comp_prev[comp] — so label distance to the component
        # minimum roughly HALVES per round on chain-shaped components:
        # O(log diameter) rounds instead of O(diameter). The sf0.1
        # near-dup graph measured 17 rounds × ~0.35s under plain
        # propagation (one long chain); jumping cuts it to ~6. Using
        # the previous (already-checkpointed) relation as the lookup
        # keeps the round a single linear pipeline — a same-round
        # self-join would evaluate the step twice. comp values are
        # always member ids, so the lookup hits (coalesce is
        # empty-graph safety); labels only decrease, so
        # comp_prev[comp] ≤ comp and convergence detection stays
        # `final < previous`.
        lk = labels.select(
            F.col("node").alias("_jn"), F.col("comp").alias("_jc")
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.col("comp").alias("_c0"),
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("_c1"),
        )
        new_labels = (
            stepped.join(lk, stepped["_c1"] == lk["_jn"], "left")
            .select(
                "node",
                F.least(
                    F.col("_c1"), F.coalesce("_jc", F.col("_c1"))
                ).alias("comp"),
                (
                    F.least(F.col("_c1"), F.coalesce("_jc", F.col("_c1")))
                    < F.col("_c0")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        # Probe FUSED into the materialization (r15): with a LAZY
        # checkpoint, this full count is the first action on the round's
        # relation — it computes and caches every partition (local
        # checkpointing persists partitions as the job computes them;
        # doCheckpoint() at job end finds none missing), truncates the
        # lineage exactly as eager=True did, AND returns the changed
        # count — one job per round instead of two. The old shape paid a
        # second full scan of the labels relation per round just for the
        # probe (limit(1) can't be used here: a partial-scan job would
        # leave partitions uncached and the NEXT round would recompute
        # them). Bit-identical labels either way.
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.select("node", "comp")


def cluster_sizes(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """→ (comp, size) per duplicate cluster (size ≥ 2 by construction,
    since only edge-connected nodes are labeled), ordered by size desc,
    comp asc — the dedup report: keep `comp`, drop `size - 1` docs."""
    cc = connected_components(edges, src, dst)
    return (
        cc.groupBy("comp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.desc("size"), F.asc("comp"))
    )


def keep_representatives(
    corpus: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """APPLY the dedup decision: → the SURVIVING rows of `corpus`
    after dropping every near-duplicate except each cluster's
    min-id representative — the step between t20's cluster report and
    actually writing the deduped training corpus.

    Keep rule: a row survives iff it appears in no duplicate cluster
    (isolated — connected_components only labels edge-connected
    nodes) OR it IS its cluster's minimum id. One hash join of the
    corpus against the (node, comp) label relation on the id key —
    the label side is bounded by the number of near-duplicate docs,
    ≤ the corpus, so the join is the ordinary co-partitioned shape at
    any scale (AQE broadcasts it when the dup set is small)."""
    comp = connected_components(edges, src, dst).withColumnRenamed(
        "node", id_col
    )
    return (
        corpus.join(comp, id_col, "left")
        .where(F.col("comp").isNull() | (F.col("comp") == F.col(id_col)))
        .drop("comp")
    )
