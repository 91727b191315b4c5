#!/usr/bin/env python3
"""Stage x2/x4/x8 inflated copies of documents/embeddings/events under
/tmp/graft_scale/ for the empirical scale-curve record (SCALING_r*.json).

Each copy k shifts ids by k * 10^12 and perturbs content (a per-copy text
suffix; a per-copy epsilon on the embedding head; event user_ids shifted
into a disjoint range) so dedup/ANN/graph semantics stay honest: inflated
rows are DISTINCT documents/vectors/users, not byte-duplicates a
content-hash dedup would collapse back to 1x. All other tables symlink to
the base sf so every registered query still runs. Development tooling
only — not part of the shipped library.
"""
import os
import sys

import duckdb

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_scale"
SHIFT = 10 ** 12

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def stage(mult: int) -> None:
    d = os.path.join(OUT, f"x{mult}")
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    copies = {
        "documents": """
            SELECT doc_id + {s} AS doc_id,
                   CASE WHEN {k} = 0 THEN text
                        ELSE text || ' copy{k}' END AS text,
                   lang, source,
                   n_chars + CASE WHEN {k} = 0 THEN 0 ELSE 6 END AS n_chars
            FROM read_parquet('{base}/documents.parquet')""",
        "embeddings": """
            SELECT vec_id + {s} AS vec_id,
                   CASE WHEN {k} = 0 THEN embedding
                        ELSE list_prepend(embedding[1] + {k} * 1e-4,
                                          embedding[2:]) END AS embedding,
                   label
            FROM read_parquet('{base}/embeddings.parquet')""",
        "events": """
            SELECT event_id + {s} AS event_id, ts,
                   user_id + {s} AS user_id, event_type, value, props
            FROM read_parquet('{base}/events.parquet')""",
    }
    for t, sql in copies.items():
        parts = " UNION ALL ".join(
            sql.format(base=BASE, k=k, s=k * SHIFT) for k in range(mult))
        con.execute(
            f"COPY ({parts}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    for t in TABLES:
        link = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
    print(f"staged {d}")


if __name__ == "__main__":
    for m in (1, 2, 4, 8):
        stage(m)
