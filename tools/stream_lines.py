#!/usr/bin/env python3
"""Extract the measured JSON lines from a Scale/soak (or any bench
main) log and emit them as probe-labeled STREAM_r{N}.jsonl lines.

Usage: python3 tools/stream_lines.py <probe> <log> [note]

Takes every line that parses as JSON and carries one of the known
measurement keys ("query", "metric", "stage"), prepends
{"probe": <probe>} (and an optional trailing "note" on query/metric
lines), and prints the result — append to STREAM_r{N}.jsonl. Stage
lines immediately following a query line inherit that query's name as
"of" so a stage row is attributable without counting lines.
"""
import json
import sys
from typing import Optional


def main(probe: str, path: str, note: Optional[str]) -> int:
    cur_query = None
    for raw in open(path, encoding="utf-8", errors="replace"):
        raw = raw.strip()
        if not raw.startswith("{"):
            continue
        try:
            d = json.loads(raw)
        except json.JSONDecodeError:
            continue
        if not isinstance(d, dict):
            continue
        if "query" in d:
            cur_query = d["query"]
        # Seed probe/of first for key order, then re-assign AFTER the
        # update so an input line that already carries "probe"/"of"
        # cannot override the CLI-supplied label (re-assignment keeps
        # the seeded key's leading position).
        out = {"probe": probe}
        is_stage = "stage" in d and "query" not in d and "metric" not in d
        if is_stage and cur_query:
            out["of"] = cur_query
        out.update(d)
        out["probe"] = probe
        if is_stage and cur_query:
            out["of"] = cur_query
        if note and ("query" in d or "metric" in d):
            out["note"] = note
        print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
