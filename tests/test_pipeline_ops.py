"""Training-pipeline ops: quota sampling, shard packing,
decontamination — invariants the oracle hash-match can't express
(partition invariance, budget bounds, contamination soundness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducego_spark.functions.text import (
    N_BENCH_DOCS,
    decontaminate,
    pack_shards,
    sample_stratified,
    tokens_col,
)
from mapreducego_spark.sources.catalog import load_table


def test_stratified_quota_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    quota = 7
    got = sample_stratified(docs, quota=quota)
    sizes = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {lang: min(quota, n) for lang, n in full.items() if n}


def test_stratified_stable_under_repartitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in sample_stratified(docs, quota=9).collect()}
    b = {r.doc_id for r in sample_stratified(docs.repartition(7), quota=9).collect()}
    assert a == b and a


def test_pack_shards_matches_serial_cumsum(spark, sf_dir):
    """The distributed two-phase prefix sum must equal the one-task
    serial answer exactly."""
    docs = load_table(spark, sf_dir, "documents")
    shard_tokens = 1000
    got = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in pack_shards(docs, shard_tokens=shard_tokens).collect()
    }
    # serial reference in plain python, same hash order
    import hashlib

    rows = sorted(
        ((hashlib.md5(str(d).encode()).hexdigest(), d, n) for d, (n, _) in got.items()),
    )
    cum = 0
    for h, d, n in rows:
        assert got[d] == (n, cum // shard_tokens), f"doc {d}"
        cum += n


def test_pack_shards_stable_under_repartitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.shard_id) for r in pack_shards(docs, 1000).collect()}
    b = {
        (r.doc_id, r.shard_id)
        for r in pack_shards(docs.repartition(11), 1000).collect()
    }
    assert a == b and a


def test_decontaminate_sound_and_complete(spark, sf_dir):
    """Kept docs share NO trigram with the bench set; dropped docs
    (other than the bench set itself) share at least one."""
    docs = load_table(spark, sf_dir, "documents")
    toks = {
        r.doc_id: r.t
        for r in docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            tokens_col(F.col("text")).alias("t"),
        ).collect()
    }

    def tris(ts):
        return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}

    bench = set()
    for d, ts in toks.items():
        if d < N_BENCH_DOCS:
            bench |= tris(ts)
    kept = {r.doc_id for r in decontaminate(docs).collect()}
    for d, ts in toks.items():
        if d < N_BENCH_DOCS:
            assert d not in kept
        elif d in kept:
            assert not (tris(ts) & bench), f"doc {d} kept but contaminated"
        else:
            assert tris(ts) & bench, f"doc {d} dropped but clean"


def test_heavy_hitters_exact(spark, sf_dir):
    """Two-pass MG+recount must equal the full groupBy answer — the
    candidate pruning is lossless for true heavy hitters."""
    from mapreducego_spark.functions.text import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    k = 30
    got = {(r.word, r.cnt) for r in heavy_hitters(docs, k=k).collect()}
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
    total = toks.count()
    want = {
        (r.word, r.cnt)
        for r in toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(total))
        .collect()
    }
    assert got == want and got


def test_heavy_hitters_exact_on_repartitioned_input(spark, sf_dir):
    """Partition layout must not change the answer (MG candidates
    differ per layout; the recount makes the result invariant)."""
    from mapreducego_spark.functions.text import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    a = {(r.word, r.cnt) for r in heavy_hitters(docs, k=60).collect()}
    b = {
        (r.word, r.cnt)
        for r in heavy_hitters(docs.repartition(13), k=60).collect()
    }
    assert a == b and a
