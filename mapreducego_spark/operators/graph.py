"""Connected components over a pair/edge DataFrame — the cluster
step of a dedup pipeline.

Near-dup detection (MinHash, SimHash, embedding-LSH) emits PAIRS;
an actual 100 TB dedup run must then collapse pairs into CLUSTERS
and keep one representative per cluster. That collapse is connected
components: docs are nodes, verified near-dup pairs are edges, a
cluster is a component, the representative is its minimum doc id.

Algorithm: iterative min-label propagation — every node repeatedly
adopts the smallest label among itself and its neighbors until a
fixpoint. Each iteration is ONE shuffle (an equi-join edges->labels
plus a groupBy-min), and the iteration count is the graph diameter.
Near-dup graphs are unions of small dense cliques (diameter is
small, typically <= 3-4), so this runs in a handful of rounds; for
adversarial long-chain graphs the alternating large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) bounds rounds at O(log^2 n) — the max_iter
guard below fails loudly rather than silently emitting a
non-fixpoint labeling.

Lineage hygiene: each iteration's labels are eagerly
localCheckpoint-ed — without it the plan doubles per round and the
driver spends more time analyzing than the cluster spends shuffling
(the standard iterative-DataFrame pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster_rep) for every node appearing in ``pairs``, where
    cluster_rep is the minimum node id of the component.

    ``pairs`` must be numeric node ids. Undirected: each input row
    (a, b) is treated as both a->b and b->a.
    """
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy(F.col("s").alias("id"))
        .agg(F.min("d").alias("lab"))
        .withColumn("lab", F.least("id", "lab"))
        .localCheckpoint(eager=True)
    )
    # Convergence detector: labels only ever DECREASE, so the label
    # sum is strictly monotone until the fixpoint — comparing two
    # scalar sums replaces a per-iteration join+count (one cheap agg
    # on the already-materialized checkpoint instead of a second
    # shuffle).
    prev_sum = labels.agg(F.sum("lab")).collect()[0][0]
    for _ in range(max_iter):
        # smallest label visible through one hop (F.least skips nulls,
        # so isolated-this-round nodes keep their current label)
        nbr = (
            edges.join(labels, edges.s == labels.id)
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("lab").alias("nbr_lab"))
        )
        hopped = labels.join(nbr, "id", "left").select(
            "id", F.least("lab", "nbr_lab").alias("lab")
        )
        # pointer jump: additionally adopt the label OF your label
        # (lab <- labels[lab]) — halves the remaining distance to the
        # component min each round, so rounds ~ log2(diameter) rather
        # than diameter (pointer doubling, as in PRAM list ranking /
        # the Kiveris et al. star operations). One extra equi-join of
        # the label table with itself per round.
        jump = hopped.select(
            F.col("id").alias("lab"), F.col("lab").alias("jlab")
        )
        labels = (
            hopped.join(jump, "lab", "left")
            .select("id", F.least("lab", "jlab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lab")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select(
                F.col("id").cast("long").alias("doc_id"),
                F.col("lab").cast("long").alias("cluster_rep"),
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint within {max_iter} iterations "
        "(graph diameter exceeds the guard) — raise max_iter or switch "
        "to the large-star/small-star variant for long-chain graphs"
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the
    iterative-algorithm tier beyond connected components.

    Per iteration: ONE shuffle — out-degree-normalized contributions
    flow along edges (equi-join ranks->edges, groupBy dst, sum),
    then rank = (1-d)/N + d * (inflow + dangling_mass/N). Dangling
    nodes (no out-edges) redistribute their rank uniformly via a
    scalar aggregate, not a join. Degrees are precomputed once and
    persisted; each iteration's ranks are eagerly localCheckpoint-ed
    so the plan does not double per round (same lineage hygiene as
    connected_components above).

    Approximate by nature (float sums + fixed iterations): no SQL
    oracle — correctness is pytest vs a serial reference
    implementation to 1e-9 on the fixture graph, plus the rank-sum
    invariant (sums to 1 every iteration)."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("d").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # nodes with no out-edges carry deg null -> dangling
    ranks = (
        nodes.join(out_deg, "id", "left")
        .select("id", "deg", F.lit(1.0 / n_nodes).alias("rank"))
        .localCheckpoint(eager=True)
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        dangling = (
            ranks.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        inflow = (
            e.join(ranks, e.s == ranks.id)
            .groupBy(F.col("d").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        ranks = (
            ranks.drop("rank")
            .join(inflow, "id", "left")
            .select(
                "id",
                "deg",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0))
                       + F.lit(dangling / n_nodes))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("id").cast("long").alias("id"), F.col("rank").cast("double").alias("rank")
    )


def pagerank_exact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank in fixed-point integer arithmetic (ranks in units of
    1/``scale``, "picoranks" at the default): the same per-iteration
    dataflow as :func:`pagerank` — one shuffle per round, dangling
    mass via a scalar aggregate — but every quantity is a long and
    every division is integer division, so the result after a fixed
    round count is EXACTLY reproducible by any engine (no float
    summation-order ambiguity). This is what lets an iterative
    algorithm carry a DuckDB oracle instead of a tolerance pytest.

    Arithmetic contract (mirrored verbatim in the SQL oracle):
      init       = scale div N
      share(u,v) = rank_u div deg_u              per out-edge
      dang_each  = (sum of dangling ranks) div N
      rank'      = (15*init) div 100 + (85*(inflow + dang_each)) div 100

    The div-truncation loses < 1 unit per term — at scale=1e12 the
    total mass drift is < N*2e-12 per round, far below any ranking-
    relevant difference, and identically computed everywhere."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("d").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    init = scale // n_nodes
    base = (15 * init) // 100
    out_deg = e.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ranks = (
        nodes.join(out_deg, "id", "left")
        .select("id", "deg", F.lit(init).cast("long").alias("rank"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iter):
        dangling = (
            ranks.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("long"))
            .collect()[0][0]
        )
        dang_each = int(dangling) // n_nodes
        inflow = (
            e.join(ranks, e.s == ranks.id)
            .groupBy(F.col("d").alias("id"))
            .agg(F.sum(F.expr("rank div deg")).alias("inflow"))
        )
        ranks = (
            ranks.drop("rank")
            .join(inflow, "id", "left")
            .select(
                "id",
                "deg",
                F.expr(
                    f"{base}L + (85 * (coalesce(inflow, 0L) + {dang_each}L))"
                    " div 100"
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("id").cast("long").alias("id"),
        F.col("rank").cast("long").alias("rank_pico"),
    )
