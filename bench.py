"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (collect) after a warm-up of the
session; timings are per-query wall clock. The headline set spans the
engine's tiers: scan+agg, multi-join, windows, session windows, as-of,
MinHash dedup, vector top-k, and the Map/Reduce plugin tier.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "wordcount",
    "agg_pricing_summary",
    "filter_project",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "window_rank",
    "window_running",
    "window_session",
    "window_tumbling",
    "dedup_minhash",
    "simhash",
    "vector_topk",
    "mr_wordcount",
]


def main() -> None:
    from mapreducego_spark.registry import QUERIES
    from mapreducego_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footer caches so q1 doesn't pay
    # session startup.
    QUERIES["topk"](spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        # noop sink: executes the FULL plan (no count() short-circuit,
        # no driver collect bottleneck) — the honest execution time.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
