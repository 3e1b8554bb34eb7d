#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT shipped library code).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (dumped by graft.Verify), runs each
oracle SQL in DuckDB over views on the sfDir parquet tables, loads the
Spark result parquet, sorts columns by name, and compares row counts,
dtype families, and exact values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value representation: stringify everything (timestamps to
    # ISO, floats via repr of rounded-already values)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            col = pd.to_datetime(col).dt.tz_localize(None)
            out[c] = col.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(col):
            out[c] = col.round(6).map(lambda v: f"{v:.6f}")
        else:
            out[c] = col.astype(str)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            sdf = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_bad += 1
            continue
        sn, on_ = norm(sdf), norm(odf)
        if list(sn.columns) != list(on_.columns):
            print(f"FAIL {name}: cols spark={list(sn.columns)} oracle={list(on_.columns)}")
            n_bad += 1
            continue
        # dtype family check on the raw frames (driver checks schema)
        for c in sorted(sdf.columns):
            sk = sdf[c].dtype.kind
            ok = odf[c].dtype.kind
            if sk != ok and {sk, ok} not in ({"i", "f"},):
                print(f"  note {name}: dtype {c} spark={sdf[c].dtype} oracle={odf[c].dtype}")
        eq = sn.values == on_.values
        if not eq.all():
            import numpy as np
            bad = np.argwhere(~eq)
            r, c = bad[0]
            print(f"FAIL {name}: {len(bad)} cell diffs; first at row {r} col "
                  f"{sn.columns[c]}: spark={sn.iloc[r, c]!r} oracle={on_.iloc[r, c]!r}")
            n_bad += 1
            continue
        print(f"PASS {name} ({len(sdf)} rows)")
    print(f"{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
