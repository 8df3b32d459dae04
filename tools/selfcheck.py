#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped).

Usage: selfcheck.py <sfDir> <verifyOutDir>

For each <name>.parquet dir written by graft.Verify, re-runs the matching
oracle SQL (from oracle_sql.json) in DuckDB over the same testdata tables,
then compares: column names (sorted), row count, and values (rows sorted by
all columns; exact for ints/strings, tiny-eps report for floats).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(d)])
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'ROWS ' if ok else 'FAIL '} {name}: rows-only ({len(got)} rows)")
            n_rowsonly += ok; n_fail += (not ok); continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} vs {ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        g = got[gc].copy(); e = exp[gc].copy()
        # normalize timestamps to ns ints for compare
        for c in gc:
            for df in (g, e):
                if df[c].dtype == object and len(df) and isinstance(
                        df[c].dropna().iloc[0] if df[c].notna().any() else None,
                        __import__("datetime").date):
                    df[c] = df[c].map(lambda d: None if d is None else str(d))
                elif pd.api.types.is_datetime64_any_dtype(df[c]):
                    s = df[c]
                    if getattr(s.dt, "tz", None) is not None:
                        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
                    df[c] = s.astype("datetime64[ns]").astype("int64")
                elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], np.ndarray):
                    df[c] = df[c].map(tuple)
        g = g.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        e = e.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        bad = []
        for c in gc:
            a, b = g[c], e[c]
            # int-vs-float dtype split (e.g. DuckDB HUGEINT -> float64 while
            # Spark emits int64): values may compare equal here but the
            # driver hashes 2 vs 2.0 differently -> flag it as a failure.
            if (np.issubdtype(a.dtype, np.integer) and np.issubdtype(b.dtype, np.floating)) or \
               (np.issubdtype(a.dtype, np.floating) and np.issubdtype(b.dtype, np.integer)):
                bad.append(f"{c}[DTYPE] {a.dtype} vs {b.dtype} (driver hash would differ)")
                continue
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                aa = a.astype(float).to_numpy(); bb = b.astype(float).to_numpy()
                # the driver hashes BYTES: -0.0 == 0.0 numerically but the
                # sign bit differs (the r14 qBQ forensic) -> treat a
                # signbit disagreement as a mismatch, like the driver does
                sz = (aa == 0.0) & (bb == 0.0) & (np.signbit(aa) != np.signbit(bb))
                if sz.any():
                    i = int(np.argmax(sz))
                    bad.append(f"{c}[SIGNZERO] e.g. row {i}: {aa[i]!r} vs "
                               f"{bb[i]!r} ({int(sz.sum())} rows)")
                    continue
                eq = (aa == bb) | (np.isnan(aa) & np.isnan(bb))
                if not eq.all():
                    close = np.isclose(aa, bb, rtol=1e-9, atol=1e-9, equal_nan=True)
                    kind = "float-eps" if close.all() else "VALUE"
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[{kind}] e.g. row {i}: {aa[i]!r} vs {bb[i]!r} ({int((~eq).sum())} diffs)")
            else:
                eq = (a.astype(object).to_numpy() == b.astype(object).to_numpy()) | (a.isna() & b.isna()).to_numpy()
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[VALUE] e.g. row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r} ({int((~eq).sum())} diffs)")
        if bad:
            print(f"FAIL  {name}: " + "; ".join(bad[:4])); n_fail += 1
        else:
            print(f"PASS  {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
