#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name (mirroring the driver), and compares
row-for-row. Exit code 1 on any mismatch.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    all_dirs = {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
    for name in sorted(all_dirs):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_bad += 1; continue
        spark_df = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_bad += 1; continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); n_bad += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_bad += 1; continue
        bad_cols = []
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            if not all(_eq(a, b) for a, b in zip(sv, dv)):
                i = next(i for i, (a, b) in enumerate(zip(sv, dv)) if not _eq(a, b))
                bad_cols.append((c, i, sv[i], dv[i]))
        if bad_cols:
            c, i, a, b = bad_cols[0]
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r} (+{len(bad_cols)-1} more cols)")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(s)} rows, {len(s.columns)} cols)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(all_dirs) - n_ok - n_bad} rows-only")
    sys.exit(1 if n_bad else 0)

def _eq(a, b):
    import math
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la = list(a) if not isinstance(a, (list, tuple)) else a
        lb = list(b) if not isinstance(b, (list, tuple)) else b
        return len(la) == len(lb) and all(_eq(x, y) for x, y in zip(la, lb))
    if isinstance(a, dict) and isinstance(b, dict):
        return sorted(a) == sorted(b) and all(_eq(a[k], b[k]) for k in a)
    try:
        if a != a and b != b:  # NaN-ish (e.g. pd.NA)
            return True
    except Exception:
        pass
    return a == b

if __name__ == "__main__":
    main()
