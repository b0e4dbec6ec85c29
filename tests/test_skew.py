"""Skew guards for the near-dedup tier: exact-duplicate collapse
before LSH, band-bucket size cap, and the ngram posting-list
assertion (VERDICT r01 next-round items 4 and 5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducego_spark.functions.dedup import (
    collapse_shingle_duplicates,
    lsh_band_keys,
    minhash_candidate_pairs,
    minhash_pairs,
    minhash_signatures,
    ngram_pairs,
    shingle_docs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_identical_docs_collapse_to_one_representative(spark):
    # 5000 copies of one page + 2 distinct near-dup docs. Without the
    # collapse, the 5000 copies share every band bucket and the
    # self-join forms C(5000,2) ~ 12.5M candidate pairs.
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(5000)]
    rows += [
        (9001, "alpha beta gamma delta epsilon zeta eta theta"),
        (9002, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    docs = _docs(spark, rows)
    shingled = collapse_shingle_duplicates(shingle_docs(docs))
    assert shingled.count() == 3  # 5000 copies -> 1 representative
    reps = {r.doc_id for r in shingled.select("doc_id").collect()}
    assert 0 in reps  # min doc_id kept

    # Candidate pairs stay tiny: the dup group contributes nothing.
    cands = minhash_candidate_pairs(lsh_band_keys(minhash_signatures(shingled)))
    assert cands.count() <= 3

    pairs = minhash_pairs(docs).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(9001, 9002)}


def test_bucket_cap_drops_oversized_buckets(spark):
    # 12 DISTINCT docs sharing most shingles (collapse can't merge
    # them) all land in the same band buckets; a cap of 5 must drop
    # those buckets rather than self-join them.
    # letter suffixes: the tokenizer treats digits as delimiters
    base = "one two three four five six seven eight nine ten"
    rows = [(i, f"{base} unique{chr(97 + i)}") for i in range(12)]
    docs = _docs(spark, rows)
    capped = minhash_pairs(docs, max_bucket_size=5)
    uncapped = minhash_pairs(docs, max_bucket_size=None)
    assert uncapped.count() > 0
    assert capped.count() < uncapped.count()


def test_ngram_posting_list_guard_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    shared = "common bigram " * 3
    rows = [(i, f"{shared} filler{i} words{i}") for i in range(50)]
    docs = _docs(spark, rows)
    with pytest.raises((Py4JJavaError, PySparkException)):
        ngram_pairs(docs, max_posting=10).collect()
    # and passes untouched when under the cap
    assert ngram_pairs(docs, max_posting=1000).count() >= 0


def test_minhash_unpersists_its_caches(spark):
    docs = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e g")])
    before = len([r for r in spark.sparkContext._jsc.getPersistentRDDs().items()])
    minhash_pairs(docs).collect()
    after = len([r for r in spark.sparkContext._jsc.getPersistentRDDs().items()])
    assert after <= before + 1  # only the localCheckpoint block remains
