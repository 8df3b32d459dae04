#!/usr/bin/env python3
"""Signed-zero sweep (dev tool, not shipped) — the r14 qBQ lesson.

Usage: signzero.py <sfDir> <verifyOutDir>

For every oracle SQL in <verifyOutDir>/oracle_sql.json, runs it in DuckDB
over the sfDir tables and reports any float column containing a NEGATIVE
zero (np.signbit set on a 0.0). Also scans the Spark-side parquet outputs
under <verifyOutDir>. A -0.0 on either side is a deterministic driver
byte-hash mismatch waiting for data to land on it: DuckDB's round()
preserves the IEEE sign bit while Spark's BigDecimal round cannot, so the
two engines disagree on the bytes of zero even when every numeric compare
passes. The gateRound convention (round(x, s) + 0) must cover every
gate-facing rounded float column that can go tiny-negative.

Exit 1 if any -0.0 is found on either side.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import numpy as np


def neg_zero_cols(df):
    bad = []
    for c in df.columns:
        try:
            a = df[c].to_numpy()
        except Exception:
            continue
        if a.dtype.kind != "f":
            continue
        hits = int(((a == 0.0) & np.signbit(a)).sum())
        if hits:
            bad.append((c, hits))
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ERR   {name}: oracle error: {e}")
            n_bad += 1
            continue
        bad = neg_zero_cols(exp)
        if bad:
            n_bad += 1
            print(f"NEGZ  {name} [oracle]: " +
                  ", ".join(f"{c} ({n} rows)" for c, n in bad))
    for d in sorted(glob.glob(f"{out_dir}/*")):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            continue
        got = pq.read_table(files[0]).to_pandas()
        bad = neg_zero_cols(got)
        if bad:
            n_bad += 1
            print(f"NEGZ  {name} [spark]: " +
                  ", ".join(f"{c} ({n} rows)" for c, n in bad))
    print(f"\n{n_bad} negative-zero site(s) across "
          f"{len(oracle)} oracles + spark outputs")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
