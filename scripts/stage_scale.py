#!/usr/bin/env python3
"""Stage x2/x4/x8 inflated copies of documents/embeddings/events under
/tmp/graft_scale/ for the empirical scale-curve record (SCALING_r*.json).

Honesty of the inflation matters more than its mechanics: copy k of a
document must be a GENUINELY NEW document, not a near-duplicate of its
base — otherwise every doc gains k near-dup partners and pair-based
dedup queries (d2/d9/d10) see candidate work grow quadratically with
scale, which measures the staging, not the engine. So:

  - documents: copy k rewrites every 3rd word with a copy-tagged variant
    — every 3-word shingle then contains a modified word, so copies mint
    a NOVEL shingle vocabulary (zero cross-copy postings) exactly like
    new real content would. A splice-halves variant was tried first and
    rejected: reusing the base shingle pool makes every shingle's doc
    frequency grow with scale, and the exact pairwise kernels' posting
    self-join then grows quadratically BY WORKLOAD (measured d10 at 15x
    for x4) — that measures the staging, not the engine;
  - embeddings: copy k applies a k-specific ORTHOGONAL transform
    (circular shift by 7k dims + alternating sign flips when k is odd)
    to every vector — within-copy pairwise cosines are EXACTLY the
    base's (the per-copy workload is the base workload), while
    cross-copy similarities decorrelate. A 50/50 two-parent mixture was
    tried first and rejected: mixtures regress toward the centroid and
    the cosine band then catches far MORE pairs at scale (measured d8
    at 8.7x for x2) — again measuring the staging, not the engine;
  - events: ids and user_ids shift into disjoint ranges (the graph gets
    k disconnected components of the same shape — honest for joins and
    sessionization, which key on user).

Ids shift by k * 10^12 so every row is distinct. All other tables
symlink to the base sf so every registered query still runs.
Development tooling only — not part of the shipped library.
"""
import os
import sys

import duckdb

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_scale"
SHIFT = 10 ** 12

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DOCS = """
    WITH base AS (
      SELECT * FROM read_parquet('{base}/documents.parquet')),
    ks AS (SELECT CAST(unnest(range(0, {mult})) AS BIGINT) AS k),
    made AS (
      SELECT b.doc_id + ks.k * {s} AS doc_id,
             CASE WHEN ks.k = 0 THEN b.text
                  ELSE array_to_string(list_transform(
                    string_split(b.text, ' '),
                    (w, i) -> CASE WHEN i % 3 = 0
                              THEN concat(w, 'q', CAST(ks.k AS VARCHAR))
                              ELSE w END), ' ')
             END AS text,
             b.lang, b.source
      FROM ks CROSS JOIN base b)
    SELECT doc_id, text, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM made"""

EMB = """
    WITH base AS (
      SELECT *, row_number() OVER (ORDER BY vec_id) - 1 AS rn,
             count(*) OVER () AS n
      FROM read_parquet('{base}/embeddings.parquet')),
    ks AS (SELECT CAST(unnest(range(0, {mult})) AS BIGINT) AS k),
    shifted AS (
      SELECT b.vec_id + ks.k * {s} AS vec_id, ks.k AS k, b.label,
             CASE WHEN ks.k = 0 THEN b.embedding
                  ELSE list_concat(
                    b.embedding[1 + CAST(ks.k * 7 % len(b.embedding) AS INT):],
                    b.embedding[:CAST(ks.k * 7 % len(b.embedding) AS INT)])
             END AS emb
      FROM ks CROSS JOIN base b)
    SELECT vec_id,
           CASE WHEN k % 2 = 0 THEN emb
                ELSE list_transform(emb,
                  (x, i) -> CAST(CASE WHEN i % 2 = 0 THEN -x ELSE x END
                    AS FLOAT))
           END AS embedding,
           label
    FROM shifted"""

EVENTS = """
    WITH ks AS (SELECT CAST(unnest(range(0, {mult})) AS BIGINT) AS k)
    SELECT event_id + ks.k * {s} AS event_id, ts,
           user_id + ks.k * {s} AS user_id, event_type, value, props
    FROM ks CROSS JOIN read_parquet('{base}/events.parquet')"""

# r14: the TPC-H trade tables inflate too, so the ITERATIVE family
# (g1/g2/g4 over orders x lineitem trade edges, rc1 over per-customer
# order chains) has a real scale curve — before this, their inputs were
# fixed at the base sf and the sweep would have measured a constant
# workload. Id-shifting every key column CONSISTENTLY (orderkey/custkey/
# suppkey all move by k*SHIFT) yields k disconnected copies of the same
# graph: per-iteration edge work grows linearly, the iteration/job count
# does not — exactly the adjudicated claim the sweep now measures. Part
# keys stay shared (no swept query joins part). Customer inflation also
# makes j18's events-to-customer join match every shifted copy, so its
# join output now grows with scale (it previously matched copy 0 only).
ORDERS = """
    WITH ks AS (SELECT CAST(unnest(range(0, {mult})) AS BIGINT) AS k)
    SELECT o_orderkey + ks.k * {s} AS o_orderkey,
           o_custkey + ks.k * {s} AS o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM ks CROSS JOIN read_parquet('{base}/orders.parquet')"""

LINEITEM = """
    WITH ks AS (SELECT CAST(unnest(range(0, {mult})) AS BIGINT) AS k)
    SELECT l_orderkey + ks.k * {s} AS l_orderkey, l_partkey,
           l_suppkey + ks.k * {s} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM ks CROSS JOIN read_parquet('{base}/lineitem.parquet')"""

CUSTOMER = """
    WITH ks AS (SELECT CAST(unnest(range(0, {mult})) AS BIGINT) AS k)
    SELECT c_custkey + ks.k * {s} AS c_custkey,
           c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM ks CROSS JOIN read_parquet('{base}/customer.parquet')"""

SUPPLIER = """
    WITH ks AS (SELECT CAST(unnest(range(0, {mult})) AS BIGINT) AS k)
    SELECT s_suppkey + ks.k * {s} AS s_suppkey,
           s_name, s_nationkey, s_acctbal
    FROM ks CROSS JOIN read_parquet('{base}/supplier.parquet')"""


ALL_INFLATED = (("documents", DOCS), ("embeddings", EMB),
                ("events", EVENTS), ("orders", ORDERS),
                ("lineitem", LINEITEM), ("customer", CUSTOMER),
                ("supplier", SUPPLIER))


def stage(mult: int, only: set | None = None) -> None:
    """Stage scale x`mult`; `only` restricts which tables inflate (the
    rest symlink to the base) — the x16/x32 gram tail inflates DOCUMENTS
    alone so the corpus-token gram shuffles leave the fixed-cost regime
    without paying a 32x trade-table stage the gram queries never read.
    """
    d = os.path.join(OUT, f"x{mult}")
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    for t, sql in ALL_INFLATED:
        if only is not None and t not in only:
            continue
        out = f"{d}/{t}.parquet"
        # A stale SYMLINK here (left by a run that linked this table to the
        # base) would make COPY write THROUGH the link and clobber the
        # canonical dataset while reading it — unlink before generating.
        if os.path.islink(out) or os.path.exists(out):
            os.unlink(out)
        q = sql.format(base=BASE, mult=mult, s=SHIFT)
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
    for t in TABLES:
        link = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
    print(f"staged {d}")


if __name__ == "__main__":
    for m in (1, 2, 4, 8):
        stage(m)
    # r16: the gram-operator tail — d14/d15/d16/d17 measured exp ~0 at
    # x8 (fixed-cost-dominated; VERDICT r15 item 5), so they get x16/x32
    # documents-only points where the gram-count shuffle dominates.
    for m in (16, 32):
        stage(m, only={"documents"})
