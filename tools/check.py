#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]
  1. assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran
  2. loads each <outDir>/<name> parquet result
  3. runs the oracle SQL from <outDir>/oracle_sql.json in DuckDB with one
     view per testdata parquet table
  4. compares: columns sorted by name, rows sorted, values hashed
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# Optional cap for huge-fixture sweeps (e.g. the 100x scale point), where a
# single unrolled oracle (ANN distance expansions, Lloyd iterations) can
# otherwise grow past physical RAM. Unset => DuckDB default (80% of RAM),
# identical to the driver's gate.
if os.environ.get("GRAFT_CHECK_MEMLIMIT"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_CHECK_MEMLIMIT']}'")
# Optional spill location/cap for oracles whose intermediates exceed RAM
# (the 100x ANN training unrolls): lets DuckDB page to disk instead of
# dying, while capping the spill so a runaway oracle can't fill the box.
if os.environ.get("GRAFT_CHECK_TMPDIR"):
    td = os.environ["GRAFT_CHECK_TMPDIR"]
    os.makedirs(td, exist_ok=True)
    con.execute(f"SET temp_directory='{td}'")
    con.execute("SET max_temp_directory_size='"
                + os.environ.get("GRAFT_CHECK_TMPMAX", "60GiB") + "'")
# Optional thread cap. DuckDB's per-operator memory scales with thread
# count (each thread keeps its own hash/sort partitions hot), and the
# 100x ANN training oracles were OOM-killed at 55GB memory_limit with the
# default 32 threads — the limit is advisory for some operators. Fewer
# threads trade wall time for a peak-RSS that actually respects the cap.
if os.environ.get("GRAFT_CHECK_THREADS"):
    con.execute(f"SET threads={int(os.environ['GRAFT_CHECK_THREADS'])}")
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def dtype_class(t) -> str:
    """Coarse arrow-type class. The driver's hasher stringifies values, and
    classes that stringify differently (decimal vs int, timestamp vs int)
    must match between Spark and the oracle — pandas to_csv normalizes
    Decimal so a plain value compare can't catch it (bit us in r02 with
    DuckDB HUGEINT -> decimal128(38,0) from uncast sum())."""
    import pyarrow as pa
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + dtype_class(t.value_type) + ">"
    return str(t)

def arrow_type_mismatches(spark_tbl, oracle_tbl):
    s = {f.name: f.type for f in spark_tbl.schema}
    o = {f.name: f.type for f in oracle_tbl.schema}
    bad = []
    for name in sorted(set(s) & set(o)):
        cs, co = dtype_class(s[name]), dtype_class(o[name])
        if cs != co:
            bad.append(f"{name}: spark {s[name]} ({cs}) vs oracle {o[name]} ({co})")
    return bad

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize numerics to plain python for stable stringification
    return df.sort_values(by=list(df.columns), ignore_index=True)

def digest(df: pd.DataFrame) -> str:
    rows = df.to_csv(index=False, float_format="%.10g")
    return hashlib.md5(rows.encode()).hexdigest()

fails, passes, skips = [], [], []
result_dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
for d in result_dirs:
    name = os.path.basename(d)
    got_arrow = pq.read_table(d)
    got = got_arrow.to_pandas()
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    try:
        exp_arrow = con.sql(oracle[name]).arrow()
        exp = exp_arrow.to_pandas()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    tbad = arrow_type_mismatches(got_arrow, exp_arrow)
    if tbad:
        fails.append((name, "arrow dtype drift: " + "; ".join(tbad)))
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"schema mismatch: spark={list(g.columns)} oracle={list(e.columns)}"))
        continue
    if len(g) != len(e):
        fails.append((name, f"row count: spark={len(g)} oracle={len(e)}"))
        continue
    if digest(g) != digest(e):
        # find first differing cell for debugging
        diff_info = "hash mismatch"
        for col in g.columns:
            a, b = g[col].tolist(), e[col].tolist()
            bad = [i for i in range(len(a)) if str(a[i]) != str(b[i])][:3]
            if bad:
                diff_info += f"; col {col} rows {bad}: spark={[a[i] for i in bad]} oracle={[b[i] for i in bad]}"
                break
        fails.append((name, diff_info))
        continue
    passes.append((name, len(g)))

for n, c in passes:
    print(f"PASS  {n} ({c} rows)")
for n, c in skips:
    print(f"SKIP  {n} ({c} rows, no oracle)")
for n, msg in fails:
    print(f"FAIL  {n}: {msg}")
missing = set(oracle) - {os.path.basename(d) for d in result_dirs}
for n in sorted(missing):
    print(f"MISS  {n}: oracle declared but no result parquet")
print(f"\n{len(passes)} pass, {len(skips)} rows-only, {len(fails)} fail, {len(missing)} missing")
sys.exit(1 if fails or missing else 0)
