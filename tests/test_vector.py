"""Vector similarity: brute-force correctness vs numpy, ANN recall
floor, kNN vote integrity."""

from __future__ import annotations

import numpy as np

from mapreducego_spark.functions.vector import (
    N_QUERY_VECS,
    TOP_K,
    knn_label_vote,
    vector_ann_lsh,
    vector_topk,
)
from mapreducego_spark.sources.catalog import load_table


def _numpy_topk(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in range(N_QUERY_VECS):
        qi = int(np.where(ids == q)[0][0])
        sims = mat_n @ mat_n[qi]
        order = sorted(
            ((round(float(s), 6), int(i)) for s, i in zip(sims, ids) if i != q),
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [i for _, i in order[:TOP_K]]
    return out


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    expected = _numpy_topk(spark, sf_dir)
    got: dict[int, list[int]] = {}
    for r in vector_topk(spark, sf_dir).collect():
        got.setdefault(r.q_id, []).append((r.rk, r.vec_id))
    got = {q: [v for _, v in sorted(pairs)] for q, pairs in got.items()}
    assert got == expected


def test_ann_recall_floor(spark, sf_dir):
    """Multi-probe sign-LSH must recover a reasonable share of the
    true top-k on random data (6-bit sketch + 7 probes)."""
    truth = _numpy_topk(spark, sf_dir)
    ann: dict[int, set[int]] = {q: set() for q in truth}
    for r in vector_ann_lsh(spark, sf_dir).collect():
        ann.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(ann[q] & set(truth[q])) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    assert hits / total >= 0.2, f"ANN recall {hits}/{total} below floor"


def test_ann_is_subset_scored_correctly(spark, sf_dir):
    """ANN results must carry the same cosine values as brute force
    (the approximation is in candidate generation, never scoring)."""
    brute = {
        (r.q_id, r.vec_id): r.cos_sim for r in vector_topk(spark, sf_dir).collect()
    }
    for r in vector_ann_lsh(spark, sf_dir).collect():
        if (r.q_id, r.vec_id) in brute:
            assert abs(r.cos_sim - brute[(r.q_id, r.vec_id)]) < 1e-9


def test_knn_vote_majority(spark, sf_dir):
    top = vector_topk(spark, sf_dir).collect()
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    votes: dict[int, list[int]] = {}
    for r in top:
        votes.setdefault(r.q_id, []).append(labels[r.vec_id])
    for r in knn_label_vote(spark, sf_dir).collect():
        counts = sorted(
            ((votes[r.q_id].count(l), -l) for l in set(votes[r.q_id])),
            reverse=True,
        )
        assert counts[0][0] == r.n_votes
        assert -counts[0][1] == r.pred_label


def test_embedding_dedup_lsh_subset_of_exact(spark, sf_dir):
    """Bucketed embedding near-dup: exact verify means every emitted
    pair must appear in the brute-force baseline with the same
    cosine; precision is exact, only recall is approximate."""
    from mapreducego_spark.functions.vector import (
        dedup_embedding,
        dedup_embedding_lsh,
    )

    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in dedup_embedding(spark, sf_dir).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in dedup_embedding_lsh(spark, sf_dir).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, cs in lsh.items():
        assert abs(cs - exact[pair]) < 1e-9
