#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads oracle_sql.json, registers each parquet table as a DuckDB view,
runs every oracle, and compares against the Spark-written parquet in
<verifyOutDir>/<name>/ — columns sorted by name, rows sorted, values
compared with exact equality (floats: exact bitwise, since our queries
are designed to be deterministic across engines).
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v) if v is not None else "\x00NULL"

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        s = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        # The driver hashes via pandas .df(): a DuckDB HUGEINT/DECIMAL
        # column lands as float64 there while Spark's int64 stays int64,
        # failing the driver's hash even when every value is equal.
        # Mirror that trap: compare pandas dtypes of both frames.
        # (dtypes.items() pairs each dtype with its own column name —
        # never zip a stale cursor description against a re-executed
        # query, the orders need not match.)
        try:
            ddt = {c: str(t) for c, t in con.execute(sql).df().dtypes.items()}
            sdt = {c: str(t) for c, t in con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
                .df().dtypes.items()}
        except Exception:
            ddt = sdt = None
        if dc != sc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} duck={dc}"
        elif ddt is not None and ddt != sdt:
            diff = {k: (sdt.get(k), ddt.get(k)) for k in ddt
                    if sdt.get(k) != ddt.get(k)}
            results[name] = f"DTYPE_MISMATCH (spark, duck) per col: {diff}"
        elif len(dr) != len(sr):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sr)} duck={len(dr)}"
        elif dr != sr:
            bad = next(i for i in range(len(dr)) if dr[i] != sr[i])
            results[name] = (f"VALUE_MISMATCH at sorted-row {bad}:\n"
                             f"  spark={sr[bad]}\n  duck ={dr[bad]}\n  cols ={dc}")
        else:
            results[name] = f"OK ({len(sr)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'FAIL'} {name}: {v}")
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
