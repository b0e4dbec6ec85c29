"""Golden tests for the flagship wordcount — the reference's one real
workload (reference test/wordCount.go:14-32), checked against an
independent pure-Python tokenizer, through BOTH the DataFrame-native
and the faithful Map/Reduce plugin tiers."""

from __future__ import annotations

import re
from collections import Counter

from mapreducego_spark.functions.text import wordcount
from mapreducego_spark.operators.mapreduce import mr_wordcount
from mapreducego_spark.sources.catalog import load_table


def python_wordcount(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in re.split("[^A-Za-z]+", t or ""):
            if w:
                c[w.lower()] += 1
    return c


def test_wordcount_matches_python_golden(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    expected = python_wordcount([r.text for r in docs.select("text").collect()])
    got = {r.word: r.cnt for r in wordcount(spark, docs).collect()}
    assert got == dict(expected)


def test_mr_tier_equals_dataframe_tier(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df_native = {r.word: r.cnt for r in wordcount(spark, docs).collect()}
    mr = {r.word: r.cnt for r in mr_wordcount(docs).collect()}
    assert mr == df_native


def test_wordcount_topk_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = [(r.word, r.cnt) for r in wordcount(spark, docs, top_k=5).collect()]
    b = [(r.word, r.cnt) for r in wordcount(spark, docs, top_k=5).collect()]
    assert a == b
    assert len(a) == 5
    # ordered by (cnt desc, word asc)
    assert a == sorted(a, key=lambda x: (-x[1], x[0]))


def test_inverted_index_posting_cap_and_order(spark):
    """The stored posting head must be the k smallest doc_ids in
    ascending order (the two-phase local prune must not change the
    answer), and df/total counts must ignore the cap entirely."""
    from mapreducego_spark.functions.text import inverted_index
    from mapreducego_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    full = {
        r["word"]: r
        for r in inverted_index(docs, k_postings=10**6).collect()
    }
    capped = {
        r["word"]: r for r in inverted_index(docs, k_postings=3).collect()
    }
    assert set(full) == set(capped)
    for w, r in capped.items():
        ids = [int(x) for x in r["postings_head"].split(",") if x]
        assert ids == sorted(ids)
        assert len(ids) <= 3
        full_ids = [int(x) for x in full[w]["postings_head"].split(",") if x]
        assert ids == full_ids[: len(ids)]
        # counts identical regardless of cap
        assert (r["df"], r["total_count"]) == (
            full[w]["df"],
            full[w]["total_count"],
        )


def test_inverted_index_partition_invariant(spark):
    """Same index regardless of input partitioning (the local-prune
    phase depends on spark_partition_id internally but the merged
    result must not)."""
    from mapreducego_spark.functions.text import inverted_index
    from mapreducego_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(map(tuple, inverted_index(docs, k_postings=5).collect()))
    b = sorted(
        map(tuple, inverted_index(docs.repartition(17), k_postings=5).collect())
    )
    assert a == b
