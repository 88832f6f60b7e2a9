#!/usr/bin/env python3
"""Build a POWER-LAW (Zipfian) duplicate-skew fixture.

Usage: python3 tools/make_zipf_fixture.py [srcDir] [dstDir] [targetRows]
  default: /root/testdata/sf0.1 -> /tmp/sfzipf at ~50k document rows

The uniform Nx fixture (make_scale_fixture.py) duplicates EVERY doc N
times — adversarial for dedup volume, but the duplicate-count
distribution is flat. Real crawls are Zipfian: a handful of documents
(boilerplate pages, licenses, templates) appear tens of thousands of
times while the tail is unique. This generator assigns doc at
duplicate-rank r (ordered by doc_id) a copy count of
max(1, floor(K / r)) with K sized so the total lands near `targetRows`:
the head doc becomes one massive exact-duplicate group (a hot key for
every fingerprint/band/window join), the tail stays single-copy.

Embeddings get the same treatment by vec_id rank (hot LSH buckets /
IVF cells). Events and the TPC-H tables are copied as-is — the skew
experiment targets the dedup/span/similarity family.

Copies are id-shifted exact duplicates (same text/vector), so every
gated query's DuckDB oracle runs unchanged and the full gate stays
comparable to the uniform fixtures.

Then drive both harness surfaces, e.g.:
  SPARK_GRAFT_ONLY=q_dedup_exact,... sbt 'runMain graft.Verify /tmp/sfzipf /tmp/verify_zipf'
  python3 tools/check.py /tmp/sfzipf /tmp/verify_zipf
  SPARK_GRAFT_SF_DIR=/tmp/sfzipf SPARK_GRAFT_RUNS=1 sbt 'runMain graft.Bench'
"""
import sys, os, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfzipf"
target = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
ID_SHIFT = 100_000_000
ROW_GROUP = 10_000

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
con = duckdb.connect()

n_docs = con.sql(
    f"SELECT count(*) FROM read_parquet('{src}/documents.parquet')"
).fetchone()[0]
# total rows ~= K * H(n) (harmonic number); solve K for the target
import math
harmonic = sum(1.0 / r for r in range(1, n_docs + 1))
K = max(1, int((target - n_docs) / harmonic))

def zipf_union(table, id_col):
    # rank docs by id; copy count = max(1, K/rank); emit id-shifted copies
    return f"""
      WITH ranked AS (
        SELECT t.*, row_number() OVER (ORDER BY {id_col}) AS r
        FROM read_parquet('{src}/{table}.parquet') t),
      counted AS (
        SELECT *, greatest(1, CAST(floor({K} / r) AS BIGINT)) AS copies
        FROM ranked),
      expanded AS (
        SELECT c.*, unnest(range(copies)) AS i FROM counted c)
      SELECT e.* EXCLUDE (r, copies, i)
             REPLACE (e.{id_col} + i * {ID_SHIFT} AS {id_col})
      FROM expanded e
    """

con.execute(f"""COPY ({zipf_union('documents', 'doc_id')})
  TO '{dst}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})""")
con.execute(f"""COPY ({zipf_union('embeddings', 'vec_id')})
  TO '{dst}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})""")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

for t in ["documents", "embeddings"]:
    id_col = "doc_id" if t == "documents" else "vec_id"
    n, groups, top = con.sql(f"""
      SELECT sum(cnt), count(*), max(cnt) FROM (
        SELECT {id_col} % {ID_SHIFT} AS o, count(*) AS cnt
        FROM read_parquet('{dst}/{t}.parquet') GROUP BY o)
    """).fetchone()
    print(f"{t}: {n} rows, {groups} distinct originals, "
          f"hottest group {top} copies")
print(f"zipf fixture at {dst} (K={K}, source {src})")
