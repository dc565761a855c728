#!/usr/bin/env python3
"""Build a synthetic sf1 stress slice (10x sf0.1) for one-off scale checks.

Local tooling only (like compare.py) -- the engine never depends on this.
The three volume-bearing tables get 10 id-shifted copies; the dimension
tables are copied verbatim:

- events:     event_id shifted by k*14_000_000 -- a multiple of 7, so the
              resolver-chain structure (event_id % 7 roots, id-1 parents)
              survives in every copy; user_id shifted by k*1_000_000 so the
              per-user key space grows 10x like a real scale-up.
- documents:  doc_id shifted by k*1_000_000; text kept verbatim, which makes
              every document a 10-clique of exact+near duplicates -- a
              dup-heavy corpus that stresses the LSH banding and cluster
              fixpoint far harder than sf0.1.
- embeddings: copy 0 keeps its ids; copies k>=1 get (vec_id + k*1e6)*100 + 7,
              which is never ≡ 0 (mod 100) -- the `vec_id % 100` query-side
              contract keeps the ORIGINAL bounded query set while the corpus
              grows 10x (queries must stay bounded independently of corpus
              size at scale; a plain constant shift leaves ~1/100 of every
              copy ≡ 0 mod 100 and silently scales the query side with the
              corpus, turning the brute-force baseline quadratic).

Usage: python3 scripts/make_sf1.py [srcDir] [dstDir]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"

COPIES = 10
VERBATIM = "region nation customer supplier part orders lineitem".split()

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TABLE ks AS SELECT unnest(range({COPIES})) AS k")

con.execute(f"""
  COPY (SELECT event_id + k*14000000 AS event_id, ts,
               user_id + k*1000000 AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', ks)
  TO '{DST}/events.parquet' (FORMAT parquet)""")
con.execute(f"""
  COPY (SELECT doc_id + k*1000000 AS doc_id, text, lang, source, n_chars
        FROM '{SRC}/documents.parquet', ks)
  TO '{DST}/documents.parquet' (FORMAT parquet)""")
con.execute(f"""
  COPY (SELECT CASE WHEN k = 0 THEN vec_id
                    ELSE (vec_id + k*1000000)*100 + 7 END AS vec_id,
               embedding, label
        FROM '{SRC}/embeddings.parquet', ks)
  TO '{DST}/embeddings.parquet' (FORMAT parquet)""")

for t in VERBATIM:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

for t in ["events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
