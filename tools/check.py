#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and compare row-for-row.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            gcols, wcols = sorted(got.columns), sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} vs oracle {wcols}")
                n_fail += 1
                continue
            grows = sorted(tuple(canon(v) for v in r)
                           for r in got[gcols].itertuples(index=False, name=None))
            wrows = sorted(tuple(canon(v) for v in r)
                           for r in want[wcols].itertuples(index=False, name=None))
            if grows == wrows:
                print(f"PASS {name} ({len(grows)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: {len(grows)} vs {len(wrows)} rows")
                diff_g = [r for r in grows if r not in set(wrows)][:3]
                diff_w = [r for r in wrows if r not in set(grows)][:3]
                for r in diff_g:
                    print(f"  spark-only: {r}")
                for r in diff_w:
                    print(f"  oracle-only: {r}")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
