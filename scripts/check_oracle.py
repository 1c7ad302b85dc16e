#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only,
never shipped in the Spark library). Usage:

    python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/vout

Reads each <name>/ parquet dir dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same tables, sorts
columns by name + rows by all columns, and diffs values exactly.
"""
import json
import sys

import duckdb
import numpy as np
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
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failed.append(name)
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failed.append(name)
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failed.append(name)
            continue
        ok = True
        for c in g.columns:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            # The driver hash-compares SERIALIZED values, so a type
            # mismatch (e.g. DuckDB HUGEINT -> float/object vs Spark
            # BIGINT -> int64) fails there even when every value is
            # numerically equal. Fail on dtype-kind mismatch here too so
            # that class of bug can't pass locally and fail the driver.
            if gv.dtype.kind != wv.dtype.kind:
                print(f"  DTYPE-MISMATCH {name}.{c}: "
                      f"spark={gv.dtype} oracle={wv.dtype} "
                      f"(driver hashes serialized values; cast the oracle "
                      f"column to the Spark type, e.g. CAST(... AS BIGINT))")
                ok = False
                continue
            if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                same = np.array_equal(gv.astype(float), wv.astype(float))
                close = same or np.allclose(
                    gv.astype(float), wv.astype(float), rtol=1e-12, equal_nan=True)
                if not same:
                    tag = "CLOSE-BUT-NOT-EXACT" if close else "MISMATCH"
                    idx = np.where(gv.astype(float) != wv.astype(float))[0][:3]
                    print(f"  {tag} {name}.{c} at rows {idx}: "
                          f"spark={gv[idx]} oracle={wv[idx]}")
                    ok = False
            else:
                gs = gv.astype(str) if gv.dtype != wv.dtype else gv
                ws = wv.astype(str) if gv.dtype != wv.dtype else wv
                if not np.array_equal(gs, ws):
                    idx = np.where(gs != ws)[0][:3]
                    print(f"  MISMATCH {name}.{c} at rows {idx}: "
                          f"spark={gv[idx]} oracle={wv[idx]} "
                          f"(dtypes {gv.dtype}/{wv.dtype})")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(g)} rows)")
        else:
            failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} PASS")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
