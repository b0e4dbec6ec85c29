"""Isolate one registry query: warmed best-of-N wall (noop sink) plus
the formatted physical plan, for the optimization rounds' before/after
evidence (guide §1: measure first, noop sink, label jobs).

Usage:
  python tools/prof_query.py <query> [more queries...] \
      [--reps N] [--sf DIR] [--plan-dir plans/r17 --suffix before]

Writes <plan-dir>/<query>_<suffix>.txt when --plan-dir is given.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from mapreducego_spark.registry import QUERIES
    from mapreducego_spark.session import get_spark

    spark = get_spark("prof")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py: footer caches + codegen
    QUERIES["topk"](spark, args.sf).collect()

    for name in args.queries:
        spark.sparkContext.setJobDescription(f"prof:{name}")
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        print(
            f"{name}: best={best:.3f}s  runs="
            + ",".join(f"{w:.3f}" for w in walls),
            flush=True,
        )
        if args.plan_dir:
            import contextlib
            import io

            os.makedirs(args.plan_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            out = os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"  plan -> {out}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
