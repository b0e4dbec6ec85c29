"""Vector similarity search over the ``embeddings`` table.

Baseline: brute-force cosine top-k — correct, O(|Q| x |N|), the
thing you verify everything else against. Scale path: sign-LSH
(random hyperplane) bucketing — candidates only form inside a
bucket, turning the crossJoin into an equi-join on the sketch key.

All arithmetic runs in double after casting the float32 arrays up
front, with sequential-fold summation (F.aggregate) — bit-identical
to the DuckDB oracle's list_sum fold, so cosine values hash-match
without tolerance hacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducego_spark.operators.util import guard_limit
from mapreducego_spark.sources.catalog import load_table

N_QUERY_VECS = 10  # vec_id < 10 are the query set in the fixture queries
TOP_K = 5


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: query vectors (vec_id < N) x all
    vectors, rank by (cosine desc, vec_id asc), keep top K.

    Physical shape: the query side is tiny -> broadcast it, so the
    'cross' is a broadcast nested loop over one pass of the big side
    — no shuffle of the corpus at all; the only exchange is the
    final per-query top-k (TakeOrdered via window + filter)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", F.col("rk").cast("long").alias("rk"))
        .orderBy("q_id", "rk")
    )


# --- scale path: sign-LSH bucketed ANN ---------------------------------

N_PLANES = 6  # 6-bit sketch -> 64 buckets; multi-probe widens recall


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1),
    derived from md5 — reproducible across engines and runs (no RNG
    state; SURVEY §7 risk d)."""
    import hashlib

    h = hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()[:8]
    return (int(h, 16) % 20000 - 10000) / 10000.0


def lsh_sketch(vec: Column, dims: int, n_planes: int = N_PLANES) -> Column:
    """Sign-sketch bit string: bit p = 1 iff dot(vec, plane_p) > 0.
    Planes are embedded constants (broadcast-free, codegen'd)."""
    bits = []
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(_plane_component(p, d)) for d in range(dims)]
        )
        bits.append(F.when(dot(vec, plane) > 0, "1").otherwise("0"))
    return F.concat(*bits)


def vector_ann_lsh(spark: SparkSession, sf_dir: str, dims: int = 64) -> DataFrame:
    """ANN top-k via sign-LSH: bucket all vectors by 12-bit sketch,
    then rank only within the query's bucket. At 100 TB the bucket
    join replaces the broadcast scan of brute force; recall is
    tested against vector_topk in tests (driver check: rows-only —
    approximate results have no SQL oracle)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    sketched = emb.withColumn("sketch", lsh_sketch(F.col("v"), dims))
    # multi-probe: each query also probes every bucket at Hamming
    # distance 1 from its own sketch (n_planes+1 probes) — the
    # standard recall lift that avoids re-hashing the corpus
    probes = F.array(
        F.col("sketch"),
        *[
            F.concat(
                F.substring("sketch", 1, p),
                F.when(F.substring("sketch", p + 1, 1) == "1", "0").otherwise("1"),
                F.substring("sketch", p + 2, N_PLANES - p - 1),
            )
            for p in range(N_PLANES)
        ],
    )
    queries = (
        sketched.filter(F.col("vec_id") < N_QUERY_VECS)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.explode(probes).alias("sketch"),
        )
    )
    scored = (
        F.broadcast(queries)
        .join(sketched, "sketch")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", F.col("rk").cast("long").alias("rk"))
        .orderBy("q_id", "rk")
    )


# --- embedding-cosine near-dedup ----------------------------------------

DEDUP_COS_THRESHOLD = 0.35  # calibrated to the synthetic fixture: random
# 64-dim embeddings peak at cosine ~0.49, so 0.35 surfaces the true
# near-pairs; a real near-dup corpus would sit at 0.9+


def embedding_pairs_exact(
    emb: DataFrame,
    threshold: float = DEDUP_COS_THRESHOLD,
    max_vectors: int = 10_000,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: all (a < b) with
    cosine >= threshold. O(n^2) — the correctness baseline the LSH
    variant below replaces at scale (same role ngram_jaccard plays
    for MinHash; already ~78s for 5k vectors on local[32]).

    Quadratic guard (same policy as ngram_jaccard): corpora over
    ``max_vectors`` fail loudly at execution time instead of melting
    down — route them through embedding_pairs_lsh."""
    n = emb.agg(F.count(F.lit(1)).alias("__n"))
    guarded = (
        emb.crossJoin(F.broadcast(n))
        .filter(
            guard_limit(
                F.col("__n"),
                max_vectors,
                F.concat(
                    F.lit("embedding_pairs_exact: corpus of "),
                    F.col("__n"),
                    F.lit(
                        f" vectors exceeds max_vectors={max_vectors}; "
                        "use embedding_pairs_lsh"
                    ),
                ),
            )
        )
        .drop("__n")
    )
    a = guarded.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = guarded.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_pairs_lsh(
    emb: DataFrame, dims: int = 64, threshold: float = DEDUP_COS_THRESHOLD
) -> DataFrame:
    """Scale path: sign-LSH bucketed near-dup — candidates only form
    between vectors whose 6-bit sketch matches (equi-join on the
    sketch key, linear shuffle), then exact cosine verifies. Same
    bucket-then-verify shape as MinHash dedup: no quadratic pair
    stream ever materializes. Precision is exact (verify step);
    recall is the bucket collision rate ((1 - theta/pi)^6 per pair),
    raised in production by multi-probe or more tables — asserted
    against the exact baseline in tests."""
    sketched = emb.withColumn("sketch", lsh_sketch(F.col("v"), dims))
    a = sketched.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "sketch"
    )
    b = sketched.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "sketch"
    )
    return (
        a.join(b, "sketch")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: exact embedding-cosine near-dup pairs over the
    embeddings table (oracle-checked baseline)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    return embedding_pairs_exact(emb)


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: LSH-bucketed embedding near-dup (the 100 TB
    path; rows-only — recall asserted vs the exact baseline in
    tests/test_vector.py)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    return embedding_pairs_lsh(emb)


def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-label classification: majority label among the top-5
    cosine neighbors of each query vector (ties -> smaller label)."""
    top = vector_topk(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("label"),
    )
    votes = (
        top.join(emb, "vec_id")
        .groupBy("q_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("q_id", F.col("label").alias("pred_label"), "n_votes")
        .orderBy("q_id")
    )
