#!/usr/bin/env python3
"""Self-check harness (builder-side only): replicate the driver's
correctness gate — run each oracle_sql in DuckDB over the same parquet
tables and compare to the Verify.scala parquet dumps (schema, rows,
values). Usage: selfcheck.py <sfDir> <verifyOutDir>."""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ("events", "lineitem", "orders", "customer", "supplier", "part",
          "nation", "region", "documents", "embeddings"):
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result"); fails += 1; continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    try:
        duck_df = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue

    s_cols = sorted(spark_df.column_names)
    d_cols = sorted(duck_df.column_names)
    if s_cols != d_cols:
        print(f"FAIL {name}: cols {s_cols} vs {d_cols}"); fails += 1; continue
    # The driver's hash is representation-sensitive: a DuckDB DECIMAL
    # (window sum(BIGINT) -> DECIMAL(38,0); any decimal output) hashes
    # differently from Spark's int64/double even when values are equal.
    # Treat arrow-type divergence, or any decimal column, as a failure.
    # int-width divergence (int32 vs int64) is provably hash-safe
    # (ts_collapse_month was green in r05 with it); decimals are not.
    type_bad = []
    for c in s_cols:
        st = str(spark_df.schema.field(c).type)
        dt = str(duck_df.schema.field(c).type)
        if st.startswith("decimal") or dt.startswith("decimal"):
            type_bad.append(f"{c}: spark={st} duck={dt} — driver-unsafe decimal")
    if type_bad:
        print(f"FAIL {name}: arrow types {'; '.join(type_bad)}"); fails += 1
        continue
    if spark_df.num_rows != duck_df.num_rows:
        print(f"FAIL {name}: rows {spark_df.num_rows} vs {duck_df.num_rows}")
        fails += 1; continue

    # order-insensitive value compare (mimic driver: sort cols by name,
    # sort rows, compare values)
    import pandas as pd
    sp = spark_df.select(s_cols).to_pandas().sort_values(s_cols).reset_index(drop=True)
    dp = duck_df.select(d_cols).to_pandas().sort_values(d_cols).reset_index(drop=True)
    mismatch = None
    for c in s_cols:
        a, b = sp[c], dp[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            import numpy as np
            bad = ~(np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9)
                    | (a.isna() & b.isna()))
        else:
            bad = ~((a == b) | (a.isna() & b.isna()))
        if bad.any():
            i = bad.idxmax()
            mismatch = f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r} ({int(bad.sum())} diffs)"
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}"); fails += 1
    else:
        print(f"OK   {name}: {spark_df.num_rows} rows")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
