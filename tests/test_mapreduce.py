"""The faithful Map/Reduce plugin contract (reference
mpWorker/worker.go:21-22), including the delimiter case the
reference's '"key:value"' wire format breaks on (worker.go:145-146)."""

from __future__ import annotations

from mapreducego_spark.operators.mapreduce import map_reduce


def test_colon_values_survive(spark):
    # The reference splits "key:value" on ':' and would corrupt this.
    df = spark.createDataFrame([("x",), ("x",), ("y",)], ["value"])
    out = map_reduce(
        df,
        lambda s: [(s, "a:b:c")],
        lambda k, vs: "|".join(sorted(vs)),
    ).collect()
    got = {r.key: r.result for r in out}
    assert got == {"x": "a:b:c|a:b:c", "y": "a:b:c"}


def test_reduce_sees_all_values_per_key(spark):
    df = spark.createDataFrame([(f"row{i}",) for i in range(100)], ["value"])
    out = map_reduce(
        df,
        lambda s: [("k" + str(len(s) % 3), s)],
        lambda k, vs: str(len(vs)),
        num_partitions=4,
    ).collect()
    assert sum(int(r.result) for r in out) == 100


def test_reduce_merges_key_runs_across_arrow_batches(spark):
    # The batched reduce walks each partition's sorted stream; a key
    # whose run spans multiple Arrow batches must still see ALL its
    # values in one reduce_fn call. Force tiny batches to exercise it.
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        df = spark.createDataFrame([(f"row{i}",) for i in range(500)], ["value"])
        out = map_reduce(
            df,
            lambda s: [("only_key", s)],  # one giant key run
            lambda k, vs: str(len(vs)),
            num_partitions=3,
        ).collect()
        assert {r.key: r.result for r in out} == {"only_key": "500"}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_map_can_emit_zero_or_many(spark):
    df = spark.createDataFrame([("ab",), ("",), ("c",)], ["value"])
    out = map_reduce(
        df,
        lambda s: [(ch, "1") for ch in s],  # 0..n pairs per record
        lambda k, vs: str(len(vs)),
    ).collect()
    assert {r.key: r.result for r in out} == {"a": "1", "b": "1", "c": "1"}


def test_hash_partition_colocates_keys(spark):
    # A5 contract (reference worker.go:142-151): equal keys land in
    # the same partition after repartition(R, key).
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"k{i % 7}", str(i)) for i in range(200)], ["key", "value"]
    ).repartition(5, "key")
    parts = df.select("key", F.spark_partition_id().alias("pid")).distinct()
    per_key = parts.groupBy("key").count().collect()
    assert all(r["count"] == 1 for r in per_key)


def test_run_job_files_to_files(spark, tmp_path):
    """End-to-end job runner: text files in, R JSON bucket files out;
    same counts as a serial reference run; each key lives in exactly
    one bucket (the fnv%R contract, expressed via Spark's hash
    shuffle)."""
    import collections
    import glob
    import json
    import re

    from mapreducego_spark.operators.mapreduce import (
        run_job,
        wordcount_map,
        wordcount_reduce,
    )

    lines = [
        "the quick brown fox",
        "jumps over the lazy dog",
        "the dog barks",
        "fox and dog and fox",
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("\n".join(lines[:2]))
    (src / "b.txt").write_text("\n".join(lines[2:]))
    out = str(tmp_path / "out")
    run_job(spark, str(src), wordcount_map, wordcount_reduce, out, num_reducers=4)

    serial: collections.Counter = collections.Counter()
    for line in lines:
        for w in re.split("[^A-Za-z]+", line):
            if w:
                serial[w.lower()] += 1

    got: dict[str, int] = {}
    key_files: dict[str, set] = {}
    parts = sorted(glob.glob(out + "/part-*"))
    assert len(parts) == 4
    for part in parts:
        with open(part) as fh:
            for raw in fh:
                row = json.loads(raw)
                got[row["key"]] = int(row["result"])
                key_files.setdefault(row["key"], set()).add(part)
    assert got == dict(serial)
    assert all(len(fs) == 1 for fs in key_files.values())
