#!/usr/bin/env bash
# Cross-ENGINE gate on degenerate corpora (r7 ask #6): the Spark-side
# degenerate specs (OperatorInvariantSpec q152-overflow / q154-exhaustion)
# prove OUR semantics; this script proves the DuckDB ORACLE agrees on the
# same fixtures, so a degenerate corpus cannot diverge the engines:
#   dir1  "no-pairs" corpus — every word is one char, so the very first
#         BPE merge argmax (m_1) is EMPTY; the oracle's `LEFT JOIN m_i`
#         NULL-fallback and Spark's `exhausted` short-circuit must both
#         pass tokens through unchanged, all six rounds.
#   dir2  exhaustion corpus ("abab abab ab": merges dry up after round
#         2) PLUS >512-token docs (600/700 words) for q152's overflow
#         bucket (-1, pad to max(n)).
# Usage: tools/degen_gate.sh    (exits non-zero unless all 6 checks PASS)
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=/root/testdata/sf0.001
SUBSET=q152_length_buckets,q154_bpe_train,q156_bpe_encode
out=$(mktemp -d /tmp/graft_degen.XXXXXX)
trap 'rm -rf "$out"' EXIT

python3 - "$out" <<'EOF'
import sys, os, pyarrow as pa, pyarrow.parquet as pq
out = sys.argv[1]
def docs(path, rows):
    os.makedirs(path, exist_ok=True)
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","embeddings"]:
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{path}/{t}.parquet")
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"]*len(rows), pa.string()),
        "source": pa.array(["degen"]*len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(tbl, f"{path}/documents.parquet")
docs(f"{out}/dir1", [(1, "a b c a b"), (2, "x y"), (3, "a")])
docs(f"{out}/dir2", [(1, "abab abab ab"),
                     (2, ("w " * 600).strip()),
                     (3, ("w " * 700).strip()),
                     (4, "a")])
EOF

fail=0
for d in dir1 dir2; do
  echo "=== degen gate: $d ==="
  sbt -batch "runMain graft.Verify $out/$d $out/$d.out $SUBSET" \
    2>&1 | grep -E '\[verify\].*failed' && fail=1
  # check.py exits 1 for every unwritten (non-subset) query; the real
  # verdict is the per-name PASS count below — same policy as gate.sh
  python3 tools/check.py "$out/$d" "$out/$d.out" \
    | grep -E "^(PASS|FAIL) (q152|q154|q156)" | tee "$out/$d.log" || true
  n=$(grep -c "^PASS" "$out/$d.log" || true)
  [[ "$n" -eq 3 ]] || { echo "DEGEN GATE FAIL: $n/3 pass on $d"; fail=1; }
done
[[ "$fail" -eq 0 ]] && echo "DEGEN GATE PASS"
exit $fail
