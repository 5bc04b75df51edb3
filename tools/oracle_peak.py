#!/usr/bin/env python3
"""Per-oracle DuckDB peak-memory probe.

Usage: python3 tools/oracle_peak.py <sfDir> <verifyOutDir> [limits...]

For every oracle in <verifyOutDir>/oracle_sql.json, finds the smallest
memory_limit (from an ascending ladder, default 64MB..4GB) under which
DuckDB completes the query with NO temp spill directory (so exceeding
the limit hard-fails instead of spilling — the worst-case model of the
driver's checker on a starved box). Writes ORACLE_PEAKS.json sorted by
peak descending, so the heavy tail that can start an OOM cascade is
visible before the driver run does it for us.

Each probe runs in a fresh connection; a per-query wall-time at the
passing limit is recorded too (a slow oracle widens the window in which
an external memory storm can kill the checker).
"""
import json
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
LADDER = ["64MB", "128MB", "256MB", "512MB", "1GB", "2GB", "4GB"]


def probe(sf_dir: str, sql: str, limit: str):
    con = duckdb.connect()
    try:
        con.execute(f"SET memory_limit='{limit}'")
        con.execute("SET threads=4")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        return time.monotonic() - t0
    finally:
        con.close()


def main(sf_dir: str, out_dir: str, ladder) -> int:
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    peaks = {}
    for name, sql in sorted(oracle.items()):
        peak, secs, err = None, None, None
        for limit in ladder:
            try:
                secs = probe(sf_dir, sql, limit)
                peak = limit
                break
            except Exception as e:
                err = str(e)[:200]
        peaks[name] = {"min_limit": peak, "sec": None if secs is None else round(secs, 2),
                       "err": None if peak else err}
        print(f"{name:32s} {peak or 'FAIL':>6s} {'' if secs is None else f'{secs:6.2f}s'}",
              flush=True)
    order = {l: i for i, l in enumerate(ladder)}
    ranked = dict(sorted(peaks.items(),
                         key=lambda kv: (-(order.get(kv[1]["min_limit"], 99)),
                                         -(kv[1]["sec"] or 0))))
    with open(f"{out_dir}/ORACLE_PEAKS.json", "w") as f:
        json.dump(ranked, f, indent=1)
    worst = [n for n, r in peaks.items() if r["min_limit"] not in (ladder[0], ladder[1])]
    print(f"\n{len(worst)} oracles need >{ladder[1]}: {worst}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:] or LADDER))
