#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
and compares: column names (sorted), row counts, and exact values after
sorting columns by name and rows lexicographically. Dev-only tool — the
deliverable library never depends on it.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return repr(v)  # full precision
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({pq!r})")
            gcols, grows = norm_rows(got.columns, got.fetchall())
            exp = con.sql(sql)
            ecols, erows = norm_rows(exp.columns, exp.fetchall())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if gcols != ecols:
            print(f"FAIL {name}: cols {gcols} != {ecols}"); n_fail += 1; continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}"); n_fail += 1; continue
        bad = [(a, b) for a, b in zip(grows, erows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first: {bad[0][0]} != {bad[0][1]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(grows)} rows)"); n_pass += 1
    # rows-only checks for oracle-less queries
    for path in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(path)
        if os.path.isdir(path) and name not in oracle:
            pq = glob.glob(os.path.join(path, "*.parquet"))
            n = con.sql(f"SELECT count(*) FROM read_parquet({pq!r})").fetchone()[0] if pq else 0
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n})")
            if n > 0: n_pass += 1
            else: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
