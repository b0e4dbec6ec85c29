"""ANN recall floors at 10x corpus scale (r8 verdict item 6).

The fixture-scale recall pytests pin LSH/IVF/PQ/IVFPQ recall at
sf0.001-sf0.01, but bucket density changes with corpus size. The
make_sf1 embeddings amplification is VERBATIM key-shifted copies,
which makes a naive sf1 recall measurement vacuous both ways
(measured before this test landed): every query's exact top-10 is
saturated by its own 9 byte-identical copies, which every index
trivially co-buckets — recall 1.0 with zero information — while
distinct-neighbor recall@10 is structurally ~0 for the EXACT oracle
too (the copies occupy the slots), so neither direction measures the
index. This module therefore stages a JITTERED 10x corpus: copy 0
verbatim, copies 1-9 component-wise perturbed by deterministic
seeded noise, renormalization-free so near-duplicate geometry
survives. Under jitter the copies are near-dups, not byte-dups:
sign-LSH bits flip, IVF cell assignment can move, PQ codes differ —
exactly the 10x-density failure modes the r8 verdict asked to pin.
Floors are the fixture-scale floors.

Sigma calibration (measured while landing this): sigma 0.02 against
component scale ~0.15 keeps copy-cosine ~0.99 and every index still
scores recall 1.0 (band-probe survival ~1) — floors vacuous; sigma
0.05 (copy-cosine ~0.92) measured lsh 0.98 / ivf 1.0 / pq 1.0 /
ivfpq 1.0 — the first setting where an index actually loses
candidates to bit flips, so that is the staged corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from mapreducego_spark.functions.vector import (
    N_QUERY_VECS,
    TOP_K,
    vector_ann_lsh,
    vector_topk,
)
from mapreducego_spark.sources.catalog import load_table

JITTER_DIR = "/tmp/spark_graft_sf1_jitter"
JITTER_COPIES = 10
JITTER_SIGMA = 0.05
_K_VEC = 10_000_000  # make_sf1's vec_id shift, reused for familiarity


@pytest.fixture(scope="module")
def sf1_jitter_dir():
    """Stage the jittered 10x embeddings corpus (idempotent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(JITTER_DIR, "_done")
    want = f"v1 copies={JITTER_COPIES} sigma={JITTER_SIGMA}"
    if os.path.exists(marker) and open(marker).read().strip() == want:
        return JITTER_DIR
    os.makedirs(JITTER_DIR, exist_ok=True)
    src = pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    ids = src.column("vec_id").to_numpy()
    labels = src.column("label").to_numpy()
    mat = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    out_ids, out_labels, out_vecs = [], [], []
    for k in range(JITTER_COPIES):
        rng = np.random.default_rng(900_000 + k)
        noise = (
            np.zeros_like(mat)
            if k == 0
            else rng.normal(0.0, JITTER_SIGMA, mat.shape).astype(np.float32)
        )
        out_ids.append(ids + k * _K_VEC)
        out_labels.append(labels)
        out_vecs.append(mat + noise)
    tbl = pa.table(
        {
            "vec_id": np.concatenate(out_ids),
            "embedding": pa.array(
                np.concatenate(out_vecs).tolist(),
                type=pa.list_(pa.float32()),
            ),
            "label": np.concatenate(out_labels),
        }
    )
    pq.write_table(tbl, os.path.join(JITTER_DIR, "embeddings.parquet"))
    with open(marker, "w") as fh:
        fh.write(want)
    return JITTER_DIR


@pytest.fixture(scope="module")
def sf1_truth(spark, sf1_jitter_dir):
    """Exact cosine top-k per query over the jittered 10x corpus —
    the same rounding/tie-break contract as the engine."""
    rows = load_table(spark, sf1_jitter_dir, "embeddings").collect()
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


def _recall(truth: dict, rows) -> float:
    got: dict[int, set[int]] = {q: set() for q in truth}
    for r in rows:
        got.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(got[q] & set(truth[q])) for q in truth)
    return hits / sum(len(truth[q]) for q in truth)


def test_exact_topk_is_exact_at_sf1(spark, sf1_jitter_dir, sf1_truth):
    """Sanity anchor: the brute-force engine entry must agree with
    numpy on the 10x corpus before any ANN floor means anything."""
    got: dict[int, list[int]] = {}
    for r in vector_topk(spark, sf1_jitter_dir).collect():
        got.setdefault(r.q_id, []).append((r.rk, r.vec_id))
    got = {q: [v for _, v in sorted(p)] for q, p in got.items()}
    assert got == sf1_truth


def test_lsh_recall_floor_at_sf1(spark, sf1_jitter_dir, sf1_truth):
    r = _recall(sf1_truth, vector_ann_lsh(spark, sf1_jitter_dir).collect())
    assert r >= 0.2, f"sf1 LSH recall {r:.2f} below the fixture floor"


def test_ivf_recall_floor_at_sf1(spark, sf1_jitter_dir, sf1_truth):
    from mapreducego_spark.functions.vector import vector_ann_ivf

    r = _recall(sf1_truth, vector_ann_ivf(spark, sf1_jitter_dir).collect())
    assert r >= 0.4, f"sf1 IVF recall {r:.2f} below the fixture floor"


def test_pq_recall_floor_at_sf1(spark, sf1_jitter_dir, sf1_truth):
    from mapreducego_spark.functions.vector import vector_ann_pq

    r = _recall(sf1_truth, vector_ann_pq(spark, sf1_jitter_dir).collect())
    assert r >= 0.6, f"sf1 PQ recall {r:.2f} below floor"


def test_ivfpq_recall_floor_at_sf1(spark, sf1_jitter_dir, sf1_truth):
    from mapreducego_spark.functions.vector import vector_ann_ivfpq

    r = _recall(sf1_truth, vector_ann_ivfpq(spark, sf1_jitter_dir).collect())
    assert r >= 0.45, f"sf1 IVF-PQ recall {r:.2f} below the fixture floor"
