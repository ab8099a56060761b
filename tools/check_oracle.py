#!/usr/bin/env python3
"""Dev-only differential checker mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [timingsOut.json]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: column names (sorted), dtypes-ish, row count, and cell values after
sorting rows. NOT part of the shipped library (driver-side python only).

With a third argument, also dumps per-query DuckDB oracle wall times as
{"<query>": median_seconds} JSON with a per-query {"min","max"} spread map —
the per-query denominator for the bench-vs-oracle comparison (commit e.g.
ORACLE_TIMINGS_r10.json so the 2x bar is checkable from artifacts alone).
Timed runs use the bench's own median-of-3 discipline: the first (compare)
execution warms DuckDB's buffers, then three timed re-executions; single-shot
timings on a shared host swing with outside load (a round-8 sweep recorded a
400 s host-load artifact), and the committed spread makes a contended run
machine-detectable from the artifact itself.
"""
import sys, os, json, glob, time
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    timings_out = sys.argv[3] if len(sys.argv) > 3 else None
    timings = {}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf())
            want = con.execute(oracle[name]).fetchdf()
            if timings_out:
                runs = []
                for _ in range(3):
                    t0 = time.time()
                    con.execute(oracle[name]).fetchall()
                    runs.append(round(time.time() - t0, 3))
                runs.sort()
                timings[name] = {"median": runs[1], "min": runs[0],
                                 "max": runs[2]}
            want = canon(want)
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        probs = []
        if list(got.columns) != list(want.columns):
            probs.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
        elif len(got) != len(want):
            probs.append(f"rows spark={len(got)} duck={len(want)}")
        else:
            for c in got.columns:
                bad = [i for i in range(len(got))
                       if not cells_equal(got[c].iloc[i], want[c].iloc[i])]
                if bad:
                    i = bad[0]
                    probs.append(f"col {c}: {len(bad)} mismatches, first@{i}: "
                                 f"spark={got[c].iloc[i]!r} duck={want[c].iloc[i]!r}")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    if timings_out:
        with open(timings_out, "w") as f:
            json.dump({"oracle_secs": {k: v["median"] for k, v in timings.items()},
                       "spread": timings,
                       "total": round(sum(v["median"] for v in timings.values()), 3),
                       "sf": sf_dir}, f, indent=0, sort_keys=True)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
