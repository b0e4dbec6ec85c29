"""Ratio-of-ratios scale profiling (r8 verdict item 5).

The bench's sf1 block gives ONE scaling ratio (sf0.1 -> sf1, 10x
rows, fixed cores). A high ratio there is ambiguous: it can mean
genuine superlinearity (bad) or just fixed-cost amortization fading
(the sf0.1 base was mostly session/stage fixed cost, so 10x data
looks like ~5x wall even for linear work). A SECOND scale step
separates the two: for t(s) = c + k*s^a, the measured per-step
exponent alpha = ln(t2/t1)/ln(s2/s1) RISES toward the true a as the
fixed cost c amortizes away — so if alpha at the bigger step stays
<= ~1, the work is at-worst-linear and the sf1 ratio was
amortization, while alpha climbing past 1 at the bigger step is the
actual superlinearity signature.

This tool profiles the three worst sf1 ratios from BENCH_r08
(perplexity_score 4.93x, bpe_apply 4.83x, dedup_minhash 4.69x — all
documents-only queries) at a THIRD point: sf3 = 30x sf0.1 documents,
built with the same marker-interleave amplification as tools/make_sf1
(two-letter copy codes since 30 > 26 copies; same heavy-tailed
shingle-frequency preservation argument documented there). Writes
SCALE_PROFILE.json, which bench.py embeds into BENCH_DETAIL.json
under "scale_profile" on its next run.

Usage: python tools/scale_profile.py  (~2-4 min)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from tools.make_sf1 import K_DOC, SRC, ensure_sf1  # noqa: E402

SF3_OUT = os.environ.get("SPARK_GRAFT_SF3_DIR", "/tmp/spark_graft_sf3")
SF3_COPIES = 30
# v2 (r10): sf3 now also materializes embeddings (make_sf1's
# key-shifted verbatim-copy recipe at 30 copies) so the semantic
# tier — the newest quadratic-risk surface — gets its third scale
# point (r9 verdict item 8).
SF3_VERSION = 2

PROFILED = [
    "perplexity_score",
    "bpe_apply",
    "dedup_minhash",
    # r10: the semantic tier. With corpus-scaled k (constant cluster
    # DENSITY), SemDeDup's within-cluster pair volume per input row
    # stays constant on real corpora; the amplified fixtures instead
    # raise duplicate multiplicity with scale (30 near-copies per
    # original at sf3), so expect the same workload-inherent shape
    # as dedup_minhash, resolved by the measured pair volume below.
    # kmeans assignment is n*k work and k scales with n here BY
    # CONTRACT (TARGET_CLUSTER_SIZE), so its mandatory-work
    # denominator is n*k, not row count.
    "kmeans_embed",
    "semantic_dedup",
    # r11 (r10 verdict item 4): the r10 compositions. Their cost is
    # their proven inputs (semantic_dedup + hard_negatives + one
    # broadcast join; bm25 + cosine + bounded RRF fusion), so the
    # expectation is the inputs' own shapes with no new growth —
    # now measured rather than argued by construction.
    "mine_training_pairs",
    "hybrid_rerank",
    # r12 (r11 verdict item 3): the ANN arm. Its extra cost over
    # hybrid_rerank is IVF-PQ training (bounded-sample k-means —
    # constant in corpus size once the sample caps) plus the ADC
    # scan (linear in corpus rows per query); expect at-worst-linear
    # with a flat train floor. If train dominates at small sf the
    # ratio can even be SUB-linear.
    "hybrid_rerank_ann",
]


def _sf3_documents_sql() -> str:
    """30-copy amplification of sf0.1 documents — make_sf1's recipe
    with the copy ordinal encoded as TWO base-26 letters (one letter
    caps at 26 copies); position letters unchanged. Markers stay
    letters-only (engine tokenizer splits on [^a-z]+) and
    position-dependent (rare bigrams, heavy tail preserved)."""
    src = f"read_parquet('{SRC}/documents.parquet')"
    k = "CAST(k.range AS BIGINT)"
    copies = f"(SELECT * FROM range({SF3_COPIES})) k"
    copy_code = (
        "chr(97 + CAST(k.range // 26 AS INT)) || "
        "chr(97 + CAST(k.range % 26 AS INT))"
    )
    return f"""
        WITH amp AS (
            SELECT doc_id + {k} * {K_DOC} AS doc_id,
                   CASE WHEN k.range = 0 THEN text
                        ELSE array_to_string(list_transform(
                                 string_split(text, ' '),
                                 (tok, i) -> CASE WHEN i % 3 = 0
                                     THEN tok || ' cv' || {copy_code}
                                          || chr(97 + CAST((i // 3) % 26 AS INT))
                                          || chr(97 + CAST((i // 78) % 26 AS INT))
                                     ELSE tok END), ' ')
                             || ' cv' || {copy_code} || 'zz'
                   END AS text,
                   lang, source
            FROM {src}, {copies}
        )
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM amp"""


def ensure_sf3() -> str:
    import duckdb

    from tools.make_sf1 import K_VEC

    marker = os.path.join(SF3_OUT, "_done")
    want = f"v{SF3_VERSION} copies={SF3_COPIES}"
    if os.path.exists(marker) and open(marker).read().strip() == want:
        return SF3_OUT
    os.makedirs(SF3_OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY ({_sf3_documents_sql()}) TO '{SF3_OUT}/documents.parquet'"
        " (FORMAT PARQUET)"
    )
    # embeddings: make_sf1's key-shifted verbatim copies at 30x
    con.execute(
        f"""COPY (
            SELECT vec_id + CAST(k.range AS BIGINT) * {K_VEC} AS vec_id,
                   embedding, label
            FROM read_parquet('{SRC}/embeddings.parquet'),
                 (SELECT * FROM range({SF3_COPIES})) k
        ) TO '{SF3_OUT}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    with open(marker, "w") as fh:
        fh.write(want)
    return SF3_OUT


def _time_query(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    from mapreducego_spark.registry import QUERIES

    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
    return best


def _diagnose(a1: float, a2: float) -> str:
    if a2 > 1.15 and a2 > a1:
        return (
            "SUPERLINEAR: per-step exponent rises past 1 at the"
            " larger step — investigate"
        )
    if a2 <= 1.05:
        return (
            "at-worst-linear: exponent at the larger (better-"
            "amortized) step <= ~1, so the sf0.1->sf1 ratio was"
            " fixed-cost amortization, not algorithmic growth"
        )
    return (
        "near-linear with residual fixed-cost fade; exponent"
        " <= 1.15 at the larger step — watch, not a flag"
    )


def _workload_volume(spark, name: str, sf_dir: str) -> int | None:
    """The mandatory-work denominator for queries whose true workload
    is NOT row count. For dedup_minhash that is the LSH candidate-pair
    volume sum-over-buckets C(n,2): every correct verifier must score
    each candidate once, so wall growing SLOWER than this volume is
    sublinear-in-workload even when it outpaces row growth. The
    amplified corpora raise duplicate multiplicity with scale (sf1 =
    10 near-copies per original, sf3 = 30), so candidate volume grows
    ~C(30,2)/C(10,2) = 9.67x per 3x rows BY CONSTRUCTION — a density
    property of the test corpus, not of 100 TB web corpora, whose
    cluster sizes don't grow with corpus size."""
    from pyspark.sql import functions as F

    if name == "dedup_minhash":
        from mapreducego_spark.functions.dedup import (
            _doc_shingles,
            collapse_shingle_duplicates,
            lsh_band_keys,
            minhash_signatures,
        )

        sh = collapse_shingle_duplicates(_doc_shingles(spark, sf_dir))
        bands = lsh_band_keys(minhash_signatures(sh))
        return int(
            bands.groupBy("band", "band_key")
            .count()
            .agg(F.sum(F.expr("count*(count-1)/2")).alias("p"))
            .collect()[0]["p"]
        )
    if name == "semantic_dedup":
        # mandatory work = within-cluster pair volume (every correct
        # SemDeDup scores each same-cluster pair once); the amplified
        # corpus multiplies duplicate multiplicity 10 -> 30, so this
        # grows ~C(30,2)/C(10,2) per 3x rows by construction.
        from mapreducego_spark.functions.vector import kmeans_assignments

        return int(
            kmeans_assignments(spark, sf_dir)
            .groupBy("cluster")
            .count()
            .agg(F.sum(F.expr("count*(count-1)/2")).alias("p"))
            .collect()[0]["p"]
        )
    if name == "kmeans_embed":
        # mandatory work = n*k distance evaluations per Lloyd
        # iteration, and k scales with n by the TARGET_CLUSTER_SIZE
        # contract — so the true workload grows quadratically in the
        # row count BY DESIGN (constant cluster density); wall
        # growing slower than n*k is sublinear in the workload.
        from mapreducego_spark.functions.vector import (
            TARGET_CLUSTER_SIZE,
            K_MEANS_K,
        )

        n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        k = max(K_MEANS_K, n // TARGET_CLUSTER_SIZE)
        return n * k
    return None


def main() -> None:
    from mapreducego_spark.session import get_spark

    sf1_dir = ensure_sf1()
    sf3_dir = ensure_sf3()
    spark = get_spark("scale_profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM + parquet footers, so the first timed run isn't
    # paying session fixed cost the others don't
    spark.read.parquet(f"{SRC}/documents.parquet").count()

    out: dict = {
        "points": {"sf0.1": SRC, "sf1": sf1_dir, "sf3": sf3_dir},
        "step_factors": {"sf0.1->sf1": 10, "sf1->sf3": 3},
        "queries": {},
    }
    for name in PROFILED:
        t01 = _time_query(spark, name, SRC)
        t1 = _time_query(spark, name, sf1_dir)
        t3 = _time_query(spark, name, sf3_dir)
        r10 = t1 / t01
        r3 = t3 / t1
        a1 = math.log(r10) / math.log(10)
        a2 = math.log(r3) / math.log(3)
        row = {
            "sf0.1_sec": round(t01, 3),
            "sf1_sec": round(t1, 3),
            "sf3_sec": round(t3, 3),
            "ratio_sf1_over_sf0.1": round(r10, 2),
            "ratio_sf3_over_sf1": round(r3, 2),
            "exponent_step1": round(a1, 3),
            "exponent_step2": round(a2, 3),
            "diagnosis": _diagnose(a1, a2),
        }
        if "SUPERLINEAR" in row["diagnosis"]:
            v1 = _workload_volume(spark, name, sf1_dir)
            v3 = _workload_volume(spark, name, sf3_dir)
            if v1 and v3:
                vr = v3 / v1
                row["workload_volume_sf1"] = v1
                row["workload_volume_sf3"] = v3
                row["workload_ratio_sf3_over_sf1"] = round(vr, 2)
                if r3 <= vr:
                    row["diagnosis"] = (
                        "workload-inherent: the mandatory work"
                        f" volume grows {vr:.1f}x per 3x rows"
                        " (candidate/within-cluster pairs track"
                        " duplicate multiplicity 10->30 ~"
                        " C(30,2)/C(10,2); k-means n*k tracks the"
                        " corpus-scaled-k contract); wall grew only"
                        f" {r3:.2f}x < {vr:.1f}x — sublinear in the"
                        " true workload, no algorithmic defect"
                    )
        out["queries"][name] = row
        print(
            f"{name}: {t01:.2f}s / {t1:.2f}s / {t3:.2f}s  "
            f"a1={a1:.2f} a2={a2:.2f}  {row['diagnosis']}",
            flush=True,
        )
    path = os.path.join(REPO, "SCALE_PROFILE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
