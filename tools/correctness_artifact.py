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
enforces — so ok=true maps to all three match flags.

Failure records are disambiguated by the `kind` oracle_check stamps
(r17, from the r16 ADVICE): a GENUINE comparison mismatch — the oracle
rows WERE computed — sets the corresponding flag(s) explicitly false
(mismatch_schema / mismatch_rows / mismatch_values), while null flags
are reserved for checker-side exceptions (`kind` = "err"), mirroring how
the driver records the two cases differently. A record healed by
oracle_check's post-suite retry carries its original failure in
`first_err`, which is passed through for honesty.
"""
import json
import sys


def main(in_dir: str, out_file: str) -> int:
    recs = [json.loads(l) for l in open(f"{in_dir}/oracle_results.jsonl")]
    art = {}
    for r in recs:
        if r["ok"]:
            a = {
                "rows_match": True, "schema_match": True, "hash_match": True,
                "spark_rows": r["rows"], "oracle_rows": r["rows"], "err": None,
            }
        else:
            kind = r.get("kind", "err")
            orows = r.get("oracle_rows")
            if kind == "mismatch_schema":
                rows = (r["rows"] == orows) if (r["rows"] is not None and orows is not None) else None
                a = {"rows_match": rows, "schema_match": False, "hash_match": False,
                     "spark_rows": r["rows"], "oracle_rows": orows, "err": r["err"]}
            elif kind == "mismatch_rows":
                a = {"rows_match": False, "schema_match": True, "hash_match": False,
                     "spark_rows": r["rows"], "oracle_rows": orows, "err": r["err"]}
            elif kind == "mismatch_values":
                a = {"rows_match": True, "schema_match": True, "hash_match": False,
                     "spark_rows": r["rows"], "oracle_rows": orows, "err": r["err"]}
            else:  # checker-side exception — flags unknown, not false
                a = {"rows_match": None, "schema_match": None, "hash_match": None,
                     "spark_rows": r["rows"], "oracle_rows": orows, "err": r["err"]}
        if r.get("first_err"):
            a["first_err"] = r["first_err"]
        art[r["name"]] = a
    with open(out_file, "w") as f:
        json.dump(dict(sorted(art.items())), f, indent=1)
        f.write("\n")
    ok = sum(1 for v in art.values() if v["hash_match"])
    print(f"{out_file}: {ok}/{len(art)} ok")
    return 0 if ok == len(art) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
