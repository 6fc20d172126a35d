"""Rebuild the x10 replication probe dataset at /tmp/sfx10 (distinct
content: replica-tagged words, offset keys — measures engine scaling,
not planted duplicates). Replica 0 keeps the original rows."""
import duckdb

con = duckdb.connect()
SRC = "/root/testdata/sf0.1"

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
       (SELECT UNNEST(range(10)) AS r) r
) TO '/tmp/sfx10/documents.parquet' (FORMAT PARQUET)
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
       (SELECT UNNEST(range(10)) AS r) r
) TO '/tmp/sfx10/events.parquet' (FORMAT PARQUET)
""")
# embeddings: rotate dims per replica (direction-distinct), offset ids
con.execute(f"""
COPY (
  SELECT e.vec_id + r.r * 10000000 AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding
              ELSE list_concat(e.embedding[r.r + 1:],
                               e.embedding[1:r.r])
         END AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e,
       (SELECT UNNEST(range(10)) AS r) r
) TO '/tmp/sfx10/embeddings.parquet' (FORMAT PARQUET)
""")
# small dims pass through so load_table finds every expected file
for t in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
        f"TO '/tmp/sfx10/{t}.parquet' (FORMAT PARQUET)"
    )

con.execute(f"""
COPY (
  SELECT o.o_orderkey + r.r * 100000000 AS o_orderkey,
         o.* EXCLUDE (o_orderkey)
  FROM '{SRC}/orders.parquet' o, (SELECT UNNEST(range(10)) AS r) r
) TO '/tmp/sfx10/orders.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT l.l_orderkey + r.r * 100000000 AS l_orderkey,
         l.* EXCLUDE (l_orderkey)
  FROM '{SRC}/lineitem.parquet' l, (SELECT UNNEST(range(10)) AS r) r
) TO '/tmp/sfx10/lineitem.parquet' (FORMAT PARQUET)
""")
print("done")
