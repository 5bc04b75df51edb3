#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each parquet table of <sfDir> as a DuckDB view, runs every oracle SQL,
and compares against the Spark result parquet at <verifyOutDir>/<name>/.
Exact comparison after sorting rows, with a float near-miss report so
ulp-level drift is visible before it becomes a driver failure.

Starved-box hardening (round 8): round 7 lost 79/146 driver rows to an
oracle-process OOM cascade — one allocation failure partway through the
sorted loop killed every query after it. This script now
  * caps DuckDB at a budget derived from /proc/meminfo (never more than
    half of currently-available RAM, floor 2 GB) and threads=4, so a
    concurrent Spark JVM shutdown can't starve it into hard failure;
  * recycles the DuckDB connection every RECYCLE_EVERY queries (and after
    any memory error) so allocator fragmentation / leaked grouping state
    can't accumulate across the suite;
  * appends per-query results incrementally to <verifyOutDir>/oracle_results
    .jsonl as they finish, so a crash preserves the completed prefix;
  * retries memory errors up to 4 times with exponential backoff
    (20/40/80/160 s) on a FRESH connection, which covers the Spark JVM's
    multi-minute shutdown window that the old single 20 s retry missed;
  * (r17, VERDICT r16 item 2) runs a POST-SUITE healing pass: queries
    that still failed on a memory error are re-run once after the whole
    suite finishes — by then any co-resident Spark JVM has exited and
    mem_budget_gb() re-reads the now-idle box, which is exactly the
    condition three judge-adjudicated transient reds (r15 q_ivfbq_search,
    r16 q_ivf_search / q_ivf_search_trained) needed. A healed record
    keeps the original failure text in `first_err` for honesty; a record
    that fails again stays red with the retry's error.

Each oracle_results.jsonl record carries a `kind` telling a genuine
comparison mismatch (oracle rows WERE computed: mismatch_schema /
mismatch_rows / mismatch_values) apart from a checker-side exception
(`err`) — downstream, tools/correctness_artifact.py maps mismatches to
explicit false flags and reserves null for checker exceptions.
"""
import gc
import json
import math
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

RECYCLE_EVERY = 10
MEM_RETRIES = 4
BACKOFF_S = 20


def mem_budget_gb() -> int:
    """Half of currently-available RAM, clamped to [2, 16] GB.
    GRAFT_ORACLE_MEM_GB overrides (still capped at half of available):
    a handful of oracles are state-replay CTEs whose checker memory
    grows super-linearly with scale (q_greedy_sweep's recursive sweep
    needs >16 GB at sf2) -- a scale drive on a big idle box raises the
    cap explicitly instead of failing them.
    """
    override = os.environ.get("GRAFT_ORACLE_MEM_GB")
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) / (1024 * 1024)
                    cap = int(override) if override else 16
                    return max(2, min(cap, int(avail_gb / 2)))
    except (OSError, ValueError):
        pass
    return 8


def is_mem_error(e: Exception) -> bool:
    s = str(e)
    return "Out of Memory" in s or "Failed to allocate" in s or "std::bad_alloc" in s


def fresh_con(sf_dir: str):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem_budget_gb()}GB'")
    con.execute("SET threads=4")
    # spill instead of hard-failing when the budget is hit: the heavy
    # unrolled-CTE oracles need a few GB of grouping space
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET max_temp_directory_size='50GB'")
    for t in TABLES:
        # driver fixtures are single files; GenData scale fixtures are
        # <name>.parquet/ directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def run_with_retry(get_con, recycle, sql: str) -> pd.DataFrame:
    """Run sql; on a memory error, back off and retry on a fresh connection."""
    for attempt in range(MEM_RETRIES + 1):
        try:
            return get_con().execute(sql).df()
        except Exception as e:
            if not is_mem_error(e) or attempt == MEM_RETRIES:
                raise
            wait = BACKOFF_S * (2 ** attempt)
            print(f"  (memory error, retry {attempt + 1}/{MEM_RETRIES} in {wait}s)", flush=True)
            recycle()
            gc.collect()
            time.sleep(wait)
    raise RuntimeError("unreachable")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(g: pd.DataFrame, w: pd.DataFrame):
    """Return (bad: list[str], worst_rel: float) for two normalised frames."""
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
    return bad, worst


def check_one(get_con, recycle, out_dir: str, name: str, sql: str) -> dict:
    """Run one query's spark-vs-oracle comparison and return its record."""
    rec = {"name": name, "ok": False, "err": None, "rows": None,
           "oracle_rows": None, "kind": "err"}
    # test seam for the post-suite healing pass: fail the named query's
    # FIRST attempt with a synthetic DuckDB-style memory error (marker
    # file arms it exactly once) so the heal path is unit-testable
    # without provoking a real allocator failure
    inject = os.environ.get("GRAFT_ORACLE_TEST_OOM_ONCE")
    if inject == name:
        marker = os.path.join(out_dir, f".oom_injected_{name}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            rec["err"] = "Out of Memory Error: injected by GRAFT_ORACLE_TEST_OOM_ONCE"
            return rec
    try:
        got = run_with_retry(get_con, recycle, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        want = run_with_retry(get_con, recycle, sql)
    except Exception as e:
        rec["err"] = str(e)[:500]
        return rec
    g, w = norm(got), norm(want)
    del got, want
    rec["rows"] = len(g)
    rec["oracle_rows"] = len(w)
    if list(g.columns) != list(w.columns):
        rec["err"] = f"columns {list(g.columns)} != {list(w.columns)}"
        rec["kind"] = "mismatch_schema"
    elif len(g) != len(w):
        rec["err"] = f"rows {len(g)} != {len(w)}"
        rec["kind"] = "mismatch_rows"
    else:
        bad, _worst = compare(g, w)
        if bad:
            rec["err"] = "; ".join(bad)[:500]
            rec["kind"] = "mismatch_values"
        else:
            rec["ok"] = True
            rec["kind"] = "ok"
    return rec


def main(sf_dir: str, out_dir: str) -> int:
    state = {"con": None, "since_recycle": 0}

    def recycle():
        if state["con"] is not None:
            try:
                state["con"].close()
            except Exception:
                pass
            state["con"] = None
        state["since_recycle"] = 0

    def get_con():
        if state["con"] is None:
            state["con"] = fresh_con(sf_dir)
        return state["con"]

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # dev-iteration filter, same contract as graft.Verify/Bench
    only = {n.strip() for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if n.strip()}
    if only:
        missing = sorted(only - oracle.keys())
        if missing:
            # a typo'd name would otherwise produce an empty, successful-looking run
            print(f"WARN: SPARK_GRAFT_ONLY names not in oracle_sql.json: {missing}")
        oracle = {k: v for k, v in oracle.items() if k in only}
        if not oracle:
            print("FAIL: SPARK_GRAFT_ONLY matched no queries")
            return 1
    results_path = os.path.join(out_dir, "oracle_results.jsonl")
    # fresh run: truncate any stale partial file
    open(results_path, "w").close()
    records = []
    for name, sql in sorted(oracle.items()):
        if state["since_recycle"] >= RECYCLE_EVERY:
            recycle()
        state["since_recycle"] += 1
        rec = check_one(get_con, recycle, out_dir, name, sql)
        if rec["ok"]:
            print(f"OK   {name} ({rec['rows']} rows)", flush=True)
        else:
            print(f"FAIL {name}: {rec['err']}", flush=True)
            recycle()  # don't let a sick allocator poison the next query
        records.append(rec)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    recycle()

    # post-suite healing pass (VERDICT r16 item 2): a memory error that
    # survived the in-run backoff usually means the drive's Spark JVM
    # was still resident — by now it has exited, so re-run ONLY the
    # mem-failed queries once with the budget recomputed on the idle
    # box. Healed records keep the original failure in first_err.
    healing = [r for r in records
               if not r["ok"] and r["err"] and is_mem_error(RuntimeError(r["err"]))]
    if healing:
        wait = int(os.environ.get("GRAFT_ORACLE_RETRY_WAIT_S", "30"))
        print(f"HEAL: {len(healing)} memory-failed quer{'y' if len(healing) == 1 else 'ies'},"
              f" retrying after {wait}s (budget now {mem_budget_gb()}GB)", flush=True)
        time.sleep(wait)
        for old in healing:
            name = old["name"]
            rec = check_one(get_con, recycle, out_dir, name, oracle[name])
            recycle()
            if rec["ok"] or rec["err"] != old["err"]:
                rec["first_err"] = old["err"]
            records[records.index(old)] = rec
            status = "ok" if rec["ok"] else f"still failing: {rec['err']}"
            print(f"HEAL {name}: {status}", flush=True)
        with open(results_path, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    return sum(1 for r in records if not r["ok"])


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
