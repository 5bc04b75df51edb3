#!/usr/bin/env bash
# Build a given rev in a throwaway git worktree and run ITS Bench main on
# the current box — the one-command A/B attribution tool (VERDICT r16
# item 6). When a round's totals move, run the previous round's rev here
# back-to-back with the current build: identical box, two binaries — the
# difference is code; the drift vs that rev's committed artifact is box.
# (r16's BENCH_AB_r14code_r16box.json was produced this way by hand.)
#
# Usage: tools/bench_ab.sh <rev> [sf_dir] [only_csv]
#   rev      any git rev (commit sha, tag, branch)
#   sf_dir   fixture dir            (default /root/testdata/sf0.1)
#   only_csv optional SPARK_GRAFT_ONLY query filter
#
# Output: the rev's bench summary JSON line on stdout, copied to
# /tmp/bench_ab_<sha>.json. The rev's BENCH_DETAIL.json is discarded
# with the worktree — pass a narrower sf/only for quick comparisons.
set -euo pipefail
REV="${1:?usage: bench_ab.sh <rev> [sf_dir] [only_csv]}"
SF="${2:-/root/testdata/sf0.1}"
ONLY="${3:-}"
REPO="$(git rev-parse --show-toplevel)"
SHA="$(git -C "$REPO" rev-parse --short "$REV")"
WT="$(mktemp -d /tmp/bench_ab_wt.XXXXXX)"
cleanup() {
  git -C "$REPO" worktree remove --force "$WT" >/dev/null 2>&1 || true
  rm -rf "$WT"
}
trap cleanup EXIT
git -C "$REPO" worktree add --detach "$WT" "$SHA" >/dev/null
cd "$WT"
export SPARK_GRAFT_SF_DIR="$SF"
[ -n "$ONLY" ] && export SPARK_GRAFT_ONLY="$ONLY"
echo "bench_ab: rev $SHA on $SF ${ONLY:+(only=$ONLY)}" >&2
LINE="$(sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -o '^\[info\] {"metric".*' | tail -1 | sed 's/^\[info\] //')"
if [ -z "$LINE" ]; then
  echo "bench_ab: no bench line produced for $SHA" >&2
  exit 1
fi
echo "$LINE" | tee "/tmp/bench_ab_${SHA}.json"
