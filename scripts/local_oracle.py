#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB oracle SQL (from Verify's oracle_sql.json) against the same
parquet tables and compares with the Spark results Verify wrote.
Compare semantics mirror the driver: sort columns by name, sort rows,
hash values. Usage:

  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/local_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM parquet_scan('{spark_path}/*.parquet')"
            ).df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        else:
            # The driver hashes pandas VALUES, so a dtype drift (e.g.
            # DuckDB sum(BIGINT) -> HUGEINT -> float64 vs Spark int64)
            # flips the hash even when every cell compares equal —
            # exactly what sank 4 queries in round 1. Flag it.
            dt = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns if got[c].dtype != want[c].dtype]
            if dt:
                print(f"FAIL {name}: dtype drift {dt}")
                n_fail += 1
                continue
            # value compare: exact, like the driver's hash
            try:
                pd.testing.assert_frame_equal(got, want, check_exact=True)
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            except AssertionError as e:
                msg = str(e).splitlines()[-1]
                # distinguish last-ulp drift from real mismatches
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_exact=False, rtol=0, atol=1e-9)
                    print(f"FAIL {name}: inexact (ulp-level) drift: {msg}")
                except AssertionError:
                    print(f"FAIL {name}: values differ: {msg}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
