"""Semantic clustering tier (r9): integer-exact k-means,
SemDeDup-style within-cluster dedup, and the quality keep rule.

The DuckDB oracle is the primary evidence (all three are full
hash-compare registry rows); these tests pin the ALGORITHM against
an independent serial numpy reference and the algebraic laws the
operators promise, so a refactor that stays self-consistent with
the oracle's SQL twin but breaks the published semantics still
fails somewhere.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_ORACLE

K = 8
ITERS = 3


def _serial_kmeans(sf_dir: str):
    """Independent reference: the same integer-exact Lloyd loop in
    plain numpy/python — micro quantization, lowest-vec_id init,
    argmin with ties to the smaller cluster, floor(sum/n) update,
    empty clusters keeping their centroid."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_ids = t["vec_id"].to_pylist()
    embs = t["embedding"].to_pylist()
    order = np.argsort(vec_ids, kind="stable")
    ids = [int(vec_ids[i]) for i in order]
    micro = [
        [math.floor(float(np.float64(np.float32(x))) * 1_000_000.0)
         for x in embs[i]]
        for i in order
    ]
    m = np.array(micro, dtype=np.int64)  # sorted by vec_id
    cent = m[:K].copy()
    for _ in range(ITERS):
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # numpy argmin: first min = smaller id
        nxt = cent.copy()
        for c in range(K):
            members = m[assign == c]
            if len(members):
                s = members.sum(axis=0)
                nxt[c] = np.array(
                    [math.floor(int(si) / len(members)) for si in s],
                    dtype=np.int64,
                )
        cent = nxt
    d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    dist = d[np.arange(len(m)), assign]
    return ids, m, assign, dist


def test_kmeans_matches_serial_reference(spark):
    from mapreducego_spark.functions.vector import kmeans_embed

    ids, _, assign, dist = _serial_kmeans(SF_ORACLE)
    got = {
        r["vec_id"]: (r["cluster"], r["dist_sq"])
        for r in kmeans_embed(spark, SF_ORACLE).collect()
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid] == (int(assign[i]), int(dist[i])), vid


def test_kmeans_inertia_decreases_over_iterations(spark):
    """Lloyd's invariant: total inertia is non-increasing per
    iteration (each assignment step and each update step can only
    lower it for exact centroids; the floor quantization perturbs by
    <1 micro-unit per dim, negligible against the measured drops)."""
    from mapreducego_spark.functions.vector import kmeans_assignments

    inertias = [
        kmeans_assignments(spark, SF_ORACLE, iters=i)
        .groupBy()
        .sum("dist_sq")
        .collect()[0][0]
        for i in range(ITERS + 1)
    ]
    assert all(
        b <= a for a, b in zip(inertias, inertias[1:])
    ), inertias


def test_semantic_dedup_laws(spark):
    """Each dropped vector's dominating rep is a smaller id in the
    SAME cluster; the claimed cosine-over-micro >= 7/20 holds when
    recomputed independently in float; and no retained pair with a
    smaller-id same-cluster neighbor above threshold was missed."""
    from mapreducego_spark.functions.vector import (
        kmeans_assignments,
        semantic_dedup,
    )

    dropped = semantic_dedup(spark, SF_ORACLE).collect()
    assigned = {
        r["vec_id"]: (int(r["cluster"]), np.array(r["m"], dtype=np.int64))
        for r in kmeans_assignments(spark, SF_ORACLE).collect()
    }
    flagged = set()
    for r in dropped:
        c, mv = assigned[r["vec_id"]]
        cd, md = assigned[r["dup_of"]]
        assert r["dup_of"] < r["vec_id"]
        assert cd == c == r["cluster"]
        dot = int(mv @ md)
        na2, nb2 = int(mv @ mv), int(md @ md)
        assert dot > 0
        assert (20 * dot) ** 2 >= 49 * na2 * nb2  # python ints: exact
        flagged.add(r["vec_id"])
    # completeness: brute-force within-cluster check finds no vector
    # the operator failed to flag
    ids = sorted(assigned)
    for i, vb in enumerate(ids):
        cb, mb = assigned[vb]
        should = any(
            (
                assigned[va][0] == cb
                and int(assigned[va][1] @ mb) > 0
                and (20 * int(assigned[va][1] @ mb)) ** 2
                >= 49 * int(assigned[va][1] @ assigned[va][1]) * int(mb @ mb)
            )
            for va in ids[:i]
        )
        assert should == (vb in flagged), vb


def test_dedup_keep_best_laws(spark):
    """The keeper is a member of its own cluster with the maximal
    (n_chars, -doc_id) among members, and clusters partition exactly
    the doc set dedup_clusters reports."""
    from mapreducego_spark.functions.dedup import (
        dedup_clusters,
        dedup_keep_best,
    )

    clusters: dict[int, list[int]] = {}
    for r in dedup_clusters(spark, SF_ORACLE).collect():
        clusters.setdefault(r["cluster_rep"], []).append(r["doc_id"])
    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    rows = dedup_keep_best(spark, SF_ORACLE).collect()
    assert {r["cluster_rep"] for r in rows} == set(clusters)
    for r in rows:
        members = clusters[r["cluster_rep"]]
        assert r["n_members"] == len(members)
        best = min(members, key=lambda d: (-n_chars[d], d))
        assert r["keep_doc_id"] == best
        assert r["keep_n_chars"] == n_chars[best]


def test_hard_negatives_laws(spark):
    """Every mined negative has a label different from its query's,
    and per query the rows are exactly the brute-force top-5 among
    different-label candidates (recomputed independently here with
    the same rounding)."""
    import pyarrow.parquet as pq

    from mapreducego_spark.functions.vector import hard_negatives

    t = pq.read_table(f"{SF_ORACLE}/embeddings.parquet")
    ids = [int(x) for x in t["vec_id"].to_pylist()]
    labs = dict(zip(ids, [int(x) for x in t["label"].to_pylist()]))
    embs = dict(zip(ids, t["embedding"].to_pylist()))

    def cos(a, b):
        accd = accn_a = accn_b = 0.0
        for x, y in zip(a, b):  # dim-ordered fold, same as engine
            xd, yd = float(np.float64(np.float32(x))), float(
                np.float64(np.float32(y))
            )
            accd += xd * yd
            accn_a += xd * xd
            accn_b += yd * yd
        return round(accd / (math.sqrt(accn_a) * math.sqrt(accn_b)), 6)

    got: dict[int, list] = {}
    for r in hard_negatives(spark, SF_ORACLE).collect():
        assert labs[r["vec_id"]] == r["neg_label"] != labs[r["q_id"]]
        got.setdefault(r["q_id"], []).append(
            (r["rk"], r["vec_id"], r["cos_sim"])
        )
    for q in [i for i in ids if i < 10]:
        cand = sorted(
            (
                (-cos(embs[q], embs[v]), v)
                for v in ids
                if v != q and labs[v] != labs[q]
            )
        )[:5]
        want = [
            (rk + 1, v, -negc) for rk, (negc, v) in enumerate(cand)
        ]
        assert got[q] == want, q


def test_contamination_report_laws(spark):
    """Reported docs are exactly decontaminate's dropped set, and
    the earliest-hit position indexes a gram that is genuinely a
    benchmark gram."""
    from mapreducego_spark.functions.text import (
        N_BENCH_DOCS,
        contamination_report,
        decontaminate,
    )
    from mapreducego_spark.sources.catalog import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    kept = {
        r["doc_id"] for r in decontaminate(docs).collect()
    }
    all_ids = {
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if r["doc_id"] >= N_BENCH_DOCS
    }
    reported = {
        r["doc_id"]: r
        for r in contamination_report(docs).collect()
    }
    assert set(reported) == all_ids - kept
    # spot-check hit positions on a few docs against raw text
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    bench_grams = set()
    for b in range(N_BENCH_DOCS):
        tk = re.findall(r"[a-z0-9]+", texts[b].lower())
        bench_grams |= {
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        }
    for doc_id in sorted(reported)[:10]:
        r = reported[doc_id]
        tk = re.findall(r"[a-z0-9]+", texts[doc_id].lower())
        grams = [" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)]
        hits = [i + 1 for i, g in enumerate(grams) if g in bench_grams]
        assert r["first_hit_pos"] == hits[0]
        assert r["n_hit_grams"] == len(
            {grams[i - 1] for i in hits}
        )
        assert r["min_gram"] == min(grams[i - 1] for i in hits)


def test_mine_training_pairs_composition_law(spark):
    """mine_training_pairs must be EXACTLY the broadcast equi-join of
    its two source tiers' outputs (anchor = SemDeDup representative
    in the query set, positives = its dominated near-dups, negatives
    = its mined hard negatives, degenerate pos==neg rows excluded) —
    recomposed independently here from the tiers' own collect()s."""
    from mapreducego_spark.functions.vector import (
        hard_negatives,
        mine_training_pairs,
        semantic_dedup,
    )

    sd = semantic_dedup(spark, SF_ORACLE).collect()
    hn = hard_negatives(spark, SF_ORACLE).collect()
    want = sorted(
        (
            s["dup_of"], s["vec_id"], s["cluster"],
            n["vec_id"], n["neg_label"], n["cos_sim"], n["rk"],
        )
        for s in sd
        for n in hn
        if n["q_id"] == s["dup_of"] and s["vec_id"] != n["vec_id"]
    )
    got = sorted(
        tuple(r)
        for r in mine_training_pairs(spark, SF_ORACLE).collect()
    )
    assert got == want
    # non-degenerate at the gate scale: several anchors compose
    assert len({g[0] for g in got}) >= 3


def test_hybrid_rerank_composition_law(spark):
    """hybrid_rerank must equal the independent recomposition of its
    three tiers: bm25_docs' committed ranking, a brute-force cosine
    top-10 per anchored query embedding, and rrf_fusion's integer
    contributions (1e12 // (60 + rank), missing ranker = 0), fused
    rank tie-broken on doc_id."""
    import pyarrow.parquet as pq

    from mapreducego_spark.functions.text import BM25_QUERIES, bm25_docs
    from mapreducego_spark.functions.vector import hybrid_rerank

    lex = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25_docs(spark, SF_ORACLE).collect()
    }

    t = pq.read_table(f"{SF_ORACLE}/embeddings.parquet")
    ids = [int(x) for x in t["vec_id"].to_pylist()]
    embs = dict(zip(ids, t["embedding"].to_pylist()))

    def cos(a, b):
        accd = accn_a = accn_b = 0.0
        for x, y in zip(a, b):
            xd = float(np.float64(np.float32(x)))
            yd = float(np.float64(np.float32(y)))
            accd += xd * yd
            accn_a += xd * xd
            accn_b += yd * yd
        return round(accd / (math.sqrt(accn_a) * math.sqrt(accn_b)), 6)

    sem = {}
    for qid, _terms in BM25_QUERIES:
        cand = sorted(
            ((-cos(embs[qid], embs[v]), v) for v in ids if v != qid)
        )[:10]
        for rk, (_, v) in enumerate(cand):
            sem[(qid, v)] = rk + 1

    want = {}
    for qid, _terms in BM25_QUERIES:
        pool = {d for (q, d) in lex if q == qid} | {
            d for (q, d) in sem if q == qid
        }
        scored = sorted(
            (
                -(
                    (10**12 // (60 + lex[(qid, d)]) if (qid, d) in lex else 0)
                    + (10**12 // (60 + sem[(qid, d)]) if (qid, d) in sem else 0)
                ),
                d,
            )
            for d in pool
        )[:10]
        for rk, (negscore, d) in enumerate(scored):
            want[(qid, d)] = (
                lex.get((qid, d)), sem.get((qid, d)), -negscore, rk + 1
            )

    got = {
        (r["query_id"], r["doc_id"]): (
            r["rank_lex"], r["rank_sem"], r["rrf_score"], r["fused_rank"]
        )
        for r in hybrid_rerank(spark, SF_ORACLE).collect()
    }
    assert got == want
    # the hybrid is non-degenerate: at least one fused row per query
    # exists that only ONE ranker surfaced
    assert any(v[0] is None or v[1] is None for v in got.values())


def test_hybrid_rerank_ann_recall_floor_vs_exact(spark):
    """hybrid_rerank_ann (r11): the exact hybrid_rerank IS the
    oracle — same lexical arm, same fusion, so every divergence is
    the IVF-PQ dense arm's cell-routing/quantization approximation.
    Floors: per-query fused-top-10 overlap mean >= 0.6, min >= 0.5
    (measured 0.75 / 0.6 on the fixture), and the lexical ranks the
    two hybrids surface must agree exactly wherever both emit a
    row."""
    from mapreducego_spark.functions.vector import (
        hybrid_rerank,
        hybrid_rerank_ann,
    )

    exact = hybrid_rerank(spark, SF_ORACLE).collect()
    ann = hybrid_rerank_ann(spark, SF_ORACLE).collect()
    ex, an = {}, {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["doc_id"])
    for r in ann:
        an.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert set(ex) == set(an)
    recalls = {
        q: len(ex[q] & an[q]) / len(ex[q]) for q in ex
    }
    assert sum(recalls.values()) / len(recalls) >= 0.6, recalls
    assert min(recalls.values()) >= 0.5, recalls
    # shared lexical arm: identical rank_lex on common rows
    lex_exact = {
        (r["query_id"], r["doc_id"]): r["rank_lex"] for r in exact
    }
    for r in ann:
        key = (r["query_id"], r["doc_id"])
        if key in lex_exact:
            assert r["rank_lex"] == lex_exact[key], key
    # the dense arm contributed: some fused rows carry a dense rank
    assert any(r["rank_sem"] is not None for r in ann)
