#!/usr/bin/env python3
"""Convert a tools/oracle_check.py run into a driver-format correctness
artifact (r15 verdict item 1: the sf2 oracle drive must be COMMITTED in
the same per-query shape as CORRECTNESS_r{N}.json, not cited from a
gitignored scratch dir).

Usage: python3 tools/correctness_artifact.py <verifyOutDir> <outFile.json>

Reads <verifyOutDir>/oracle_results.jsonl (written incrementally by
oracle_check.py) and emits {name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}. oracle_check compares exact values after
sorting rows and columns — the same contract the driver's hash compare
enforces — so ok=true maps to all three match flags; a failure record
keeps the error text and leaves the flags null, mirroring how the driver
records a checker-side exception.
"""
import json
import sys


def main(in_dir: str, out_file: str) -> int:
    recs = [json.loads(l) for l in open(f"{in_dir}/oracle_results.jsonl")]
    art = {}
    for r in recs:
        if r["ok"]:
            art[r["name"]] = {
                "rows_match": True, "schema_match": True, "hash_match": True,
                "spark_rows": r["rows"], "oracle_rows": r["rows"], "err": None,
            }
        else:
            art[r["name"]] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": r["rows"], "oracle_rows": None, "err": r["err"],
            }
    with open(out_file, "w") as f:
        json.dump(dict(sorted(art.items())), f, indent=1)
        f.write("\n")
    ok = sum(1 for v in art.values() if v["hash_match"])
    print(f"{out_file}: {ok}/{len(art)} ok")
    return 0 if ok == len(art) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
