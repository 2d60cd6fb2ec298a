#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
and compares the way the driver does: both results go into pandas frames,
columns are sorted by name, rows are sorted by all columns (pandas
sort_values — this is where raw array cells crash, same as the driver), and
the TYPED values are hashed with pd.util.hash_pandas_object. A DuckDB
DECIMAL/HUGEINT column therefore hash-mismatches a Spark double/bigint even
when the stringified values coincide — the failure class the old
string-compare version of this tool masked. Dev-only tool — the deliverable
library never depends on it.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all columns — driver canonicalization."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    # unify datetime resolution (parquet may be ns, duckdb us) — a pure
    # storage artifact, not a semantic type difference
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def frame_hash(df: pd.DataFrame):
    return pd.util.hash_pandas_object(df, index=False).tolist()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # failures Verify itself recorded: these OVERRIDE any output on disk —
    # the dev loop re-verifies into an existing outDir, so a query that
    # errored this run may still have a stale-but-correct parquet from a
    # previous run, which must not be compared as if it were fresh
    err_path = os.path.join(out_dir, "verify_errors.json")
    verify_errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in verify_errors:
            first = (verify_errors[name].splitlines() or [""])[0]
            print(f"FAIL {name} (verify error: {first[:200]})")
            n_fail += 1; continue
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            # Spark output is read with pandas/pyarrow, NOT through DuckDB:
            # DuckDB's .df() converts DECIMAL to float64, which masked the
            # round-3 q45 failure (driver reads spark parquet typed, so a
            # DECIMAL column hash-mismatches the oracle's DOUBLE there).
            got = canon(pd.concat([pd.read_parquet(p) for p in pq],
                                  ignore_index=True))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        gh, eh = frame_hash(got), frame_hash(exp)
        if gh != eh:
            bad = next(i for i, (a, b) in enumerate(zip(gh, eh)) if a != b)
            print(f"FAIL {name}: value hash differs; first row {bad}: "
                  f"{got.iloc[bad].to_dict()} != {exp.iloc[bad].to_dict()} "
                  f"(dtypes {dict(got.dtypes.astype(str))} vs {dict(exp.dtypes.astype(str))})")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # rows-only checks for oracle-less queries: replicate the driver's probe,
    # which loads + canonicalizes the spark output (so array cells crash here
    # too, by design) and records the row count
    for path in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(path)
        # a name in verify_errors failed THIS run — any dir is stale output
        if os.path.isdir(path) and name not in oracle and name not in verify_errors:
            pq = glob.glob(os.path.join(path, "*.parquet"))
            try:
                n = len(canon(con.sql(f"SELECT * FROM read_parquet({pq!r})").df())) if pq else 0
            except Exception as e:
                print(f"FAIL {name} (rows-only: {e})"); n_fail += 1; continue
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n})")
            if n > 0: n_pass += 1
            else: n_fail += 1
    # verify failures for queries WITHOUT an oracle entry (the oracle'd
    # ones already FAILed in the main loop above)
    for name, msg in sorted(verify_errors.items()):
        if name in oracle:
            continue
        first = (msg.splitlines() or [""])[0]
        print(f"FAIL {name} (verify error: {first[:200]})")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
