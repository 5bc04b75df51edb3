#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each parquet table of <sfDir> as a DuckDB view, runs every oracle SQL,
and compares against the Spark result parquet at <verifyOutDir>/<name>/.
Exact comparison after sorting rows, with a float near-miss report so
ulp-level drift is visible before it becomes a driver failure.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # spill instead of "Out of Memory Error" when a concurrent Spark JVM
    # holds most of the box (the heavy unrolled-CTE oracles need a few
    # GB of grouping space); harmless when memory is free
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET max_temp_directory_size='50GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            try:
                want = con.execute(sql).df()
            except Exception as e:
                if "Out of Memory" not in str(e):
                    raise
                # transient: a concurrent Spark JVM (often the Verify run
                # that produced out_dir, still shutting down) can hold the
                # box exactly when the heavy unrolled-CTE oracles run;
                # wait and retry once before declaring failure
                import time
                time.sleep(20)
                want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        bad = []
        worst = 0.0
        for c in g.columns:
            a, b = g[c], w[c]
            # the driver hashes typed values: an int64 Spark column vs a
            # float64/object oracle column (DuckDB HUGEINT leaking out of
            # SUM, un-cast //, etc.) hash-mismatches even when every value
            # is numerically equal — flag the dtype-kind drift itself
            if a.dtype.kind != b.dtype.kind:
                bad.append(f"{c}: dtype kind {a.dtype} (spark) != {b.dtype} (oracle)")
                continue
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                aa = a.astype(float)
                bb = b.astype(float)
                mism = ~((aa == bb) | (aa.isna() & bb.isna()))
                if mism.any():
                    diff = (aa - bb).abs().max()
                    bad.append(f"{c}: {int(mism.sum())} float mismatches, maxdiff={diff}")
                else:
                    rel = ((aa - bb).abs() / aa.abs().clip(lower=1e-300)).max()
                    worst = max(worst, 0.0 if math.isnan(rel) else rel)
            else:
                if not a.equals(b):
                    mism = ~((a == b) | (a.isna() & b.isna()))
                    ex = ""
                    if mism.any():
                        i = mism.idxmax()
                        ex = f" e.g. row {i}: {a[i]!r} != {b[i]!r}"
                    bad.append(f"{c}: {int(mism.sum())} mismatches{ex}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
