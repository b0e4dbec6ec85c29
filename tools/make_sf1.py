"""Amplify the sf0.1 fixture 10x into an sf1.0-scale dataset for
scaling measurement (BENCH sf1 block).

The driver ships fixtures only up to sf0.1, so every "survives 100 TB"
claim would otherwise rest on plan-shape reasoning alone; one measured
scaling point (sf0.1 -> sf1.0, 10x rows) makes super-linear behavior
falsifiable. Amplification is key-shifted copying, which preserves
referential integrity exactly (copy k shifts c_custkey/o_custkey
together, o_orderkey/l_orderkey together, etc. — the same disjoint-id
construction TPC-H itself uses across scale factors), so every join
has realistic 10x fan-out instead of degenerate key collisions:

- region/nation stay fixed (TPC-H dims that do not scale),
- customer/orders/part/supplier/lineitem/events: 10 key-shifted
  copies, non-key attributes verbatim,
- documents: copies k>0 interleave a per-copy marker token after
  every 3rd token (plus a per-copy suffix token, which alone keeps
  short docs distinct). The r5 amplifier appended ONLY a suffix
  token, which left cross-copy bigram Jaccard at ~n/(n+2) >= 0.97 —
  every doc's 10 copies were mutual near-dups, so the TRUE pair
  output of any exact similarity join grew ~C(10,2)=45x-100x on 10x
  docs and the sf1 bench misread that output-bound growth as
  algorithmic superlinearity (jaccard_prefix_join was flagged at
  17.3x in r5). Interleaving destroys 1/3 of each copy's original
  bigrams and adds copy-specific ones, pushing cross-copy Jaccard
  to ~1/3 < the 0.5 threshold while within-copy document
  relationships (the thing being scaled) are preserved: 10x docs
  now means ~10x true near-dup pairs, i.e. linear work for a
  linear-work algorithm. n_chars is recomputed to stay consistent,
- embeddings: key-shifted verbatim copies; the vec_id<10 query set
  stays fixed while corpus and (vec_id%20==0) benchmark set grow
  10x — the realistic scaling direction for the cosine kernels.

Output: $SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1), with a
_done marker for idempotence. ~170 MB, regenerates in ~15 s via
DuckDB. Writes NOTHING outside that directory.
"""

from __future__ import annotations

import os

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/spark_graft_sf1"
COPIES = 10
# bump when the amplification recipe changes: a stale on-disk sf1
# (e.g. the r5 suffix-only documents) must regenerate, not be reused
VERSION = 4

# key column -> per-copy shift (disjoint id spaces; all BIGINT)
K_CUST = 10_000_000
K_ORDER = 100_000_000
K_PART = 10_000_000
K_SUPP = 10_000_000
K_EVENT = 1_000_000_000
K_DOC = 10_000_000
K_VEC = 10_000_000


def _amplified_sql(table: str) -> str:
    src = f"read_parquet('{SRC}/{table}.parquet')"
    k = "CAST(k.range AS BIGINT)"
    copies = f"(SELECT * FROM range({COPIES})) k"
    plain = {
        "region": f"SELECT * FROM {src}",
        "nation": f"SELECT * FROM {src}",
        "customer": f"""
            SELECT c_custkey + {k} * {K_CUST} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src}, {copies}""",
        "orders": f"""
            SELECT o_orderkey + {k} * {K_ORDER} AS o_orderkey,
                   o_custkey + {k} * {K_CUST} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src}, {copies}""",
        "lineitem": f"""
            SELECT l_orderkey + {k} * {K_ORDER} AS l_orderkey,
                   l_partkey + {k} * {K_PART} AS l_partkey,
                   l_suppkey + {k} * {K_SUPP} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src}, {copies}""",
        "part": f"""
            SELECT p_partkey + {k} * {K_PART} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src}, {copies}""",
        "supplier": f"""
            SELECT s_suppkey + {k} * {K_SUPP} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {src}, {copies}""",
        "events": f"""
            SELECT event_id + {k} * {K_EVENT} AS event_id, ts,
                   user_id + {k} * {K_CUST} AS user_id,
                   event_type, value, props
            FROM {src}, {copies}""",
        # Copy markers must be (a) LETTERS-ONLY — the engine tokenizer
        # splits on [^a-z]+, so a digit suffix ('copyvariant1')
        # tokenizes identically for every copy and the copies stay
        # token-identical (the r5 bug) — and (b) POSITION-DEPENDENT:
        # a constant per-copy marker ('copyvarianta') forms bigrams
        # keyed by a SINGLE common token ('group copyvarianta',
        # df ~ 2k within a copy), which flooded the rarest-first
        # prefixes of the similarity join with semi-common shingles
        # (sum C(df,2) hit 1.4e9 candidates at sf1). Encoding the
        # insertion ordinal in base-26 letters keeps each marker
        # bigram as rare as the original bigrams it replaces, so the
        # amplified corpus keeps a heavy-tailed shingle-frequency
        # shape — the regime real web corpora are in.
        "documents": f"""
            WITH amp AS (
                SELECT doc_id + {k} * {K_DOC} AS doc_id,
                       CASE WHEN k.range = 0 THEN text
                            ELSE array_to_string(list_transform(
                                     string_split(text, ' '),
                                     (tok, i) -> CASE WHEN i % 3 = 0
                                         THEN tok || ' cv'
                                              || chr(97 + CAST(k.range AS INT))
                                              || chr(97 + CAST((i // 3) % 26 AS INT))
                                              || chr(97 + CAST((i // 78) % 26 AS INT))
                                         ELSE tok END), ' ')
                                 || ' cv' || chr(97 + CAST(k.range AS INT))
                                 || 'zz'
                       END AS text,
                       lang, source
                FROM {src}, {copies}
            )
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM amp""",
        "embeddings": f"""
            SELECT vec_id + {k} * {K_VEC} AS vec_id, embedding, label
            FROM {src}, {copies}""",
    }
    return plain[table]


def ensure_sf1(out_dir: str | None = None) -> str:
    """Generate the amplified dataset if absent; return its path."""
    import duckdb

    out = out_dir or os.environ.get("SPARK_GRAFT_SF1_DIR", DEFAULT_OUT)
    marker = os.path.join(out, "_done")
    stamp = f"v{VERSION}: amplified {COPIES}x from {SRC}\n"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return out
        os.remove(marker)  # recipe changed: regenerate in place
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"COPY ({_amplified_sql(t)}) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
    con.close()
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out


if __name__ == "__main__":
    path = ensure_sf1()
    import duckdb

    for t in ("lineitem", "events", "documents", "embeddings"):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{path}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)
    print("sf1 at", path)
