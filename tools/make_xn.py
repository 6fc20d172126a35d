"""Build an xN replication probe dataset at /tmp/sfx{N} with DISTINCT
content (replica-tagged words, offset keys, rotated/sign-flipped
embeddings) — generalizes make_x10.py so the ×100 probe exists too:
`python tools/make_xn.py 100` → /tmp/sfx100.

Replica 0 keeps the original rows. Embedding replicas use shift
r % 63 + a sign flip for r >= 63, giving 126 distinct directions; the
×100 set therefore has no duplicated embedding direction (note: ANN
probes beyond ×126 would need a different scheme)."""
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
OUT = f"/tmp/sfx{N}"
SRC = "/root/testdata/sf0.1"

import os

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT d.doc_id + r.r * 10000000 AS doc_id,
         CASE WHEN r.r = 0 THEN d.text
              ELSE array_to_string(
                  list_transform(string_split(d.text, ' '),
                                 w -> w || 'x' || CAST(r.r AS VARCHAR)),
                  ' ')
         END AS text,
         d.lang,
         d.source,
         d.n_chars
  FROM '{SRC}/documents.parquet' d,
       (SELECT UNNEST(range({N})) AS r) r
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT e.event_id + r.r * 100000000 AS event_id,
         e.ts,
         e.user_id + r.r * 10000000 AS user_id,
         e.event_type,
         e.value,
         e.props
  FROM '{SRC}/events.parquet' e,
       (SELECT UNNEST(range({N})) AS r) r
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT e.vec_id + r.r * 10000000 AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding
              WHEN r.r >= 63 THEN list_transform(
                  list_concat(e.embedding[(r.r % 63) + 1:],
                              e.embedding[1:(r.r % 63)]),
                  v -> -v)
              ELSE list_concat(e.embedding[r.r + 1:],
                               e.embedding[1:r.r])
         END AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e,
       (SELECT UNNEST(range({N})) AS r) r
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")
for t in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
        f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
    )
con.execute(f"""
COPY (
  SELECT o.o_orderkey + r.r * 100000000 AS o_orderkey,
         o.* EXCLUDE (o_orderkey)
  FROM '{SRC}/orders.parquet' o, (SELECT UNNEST(range({N})) AS r) r
) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT l.l_orderkey + r.r * 100000000 AS l_orderkey,
         l.* EXCLUDE (l_orderkey)
  FROM '{SRC}/lineitem.parquet' l, (SELECT UNNEST(range({N})) AS r) r
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
""")
print("done", OUT)
