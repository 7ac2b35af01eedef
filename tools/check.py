#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and compare row-for-row.

Type-strict: fetches raw values (fetchall, not fetchdf — pandas
coerces DECIMAL to float64 and masks output-type divergence) and also
compares the declared DuckDB column types of both sides, so a Spark
DECIMAL(27,6) result can never silently pass against a DOUBLE oracle.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return "DECIMAL:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def type_family(t):
    """Collapse a declared DuckDB type to the family that determines its
    canonical value text. Integer widths all canon identically (str(5)),
    as do FLOAT/DOUBLE (python float repr), so those are one family each
    — matching the driver's value-hash strictness. DECIMAL is its own
    family: Decimal('137291.000000') != repr(137291.0)."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return type_family(t[:-2]) + "[]"
    if t == "HUGEINT":
        # NOT in the INT family: the driver's value-hash canonicalizes
        # HUGEINT differently from BIGINT even for equal values (the
        # r4 q55/q60 failure class — DuckDB widens integer sum() to
        # HUGEINT; oracle SQL must CAST such sums to BIGINT).
        return "HUGEINT"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "FLOAT"
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    return t


def coltypes(con, sql):
    """[(column_name, declared_duckdb_type)] for a query — a LIST, not a
    dict: duplicate output names must stay visible (a dict would
    silently collapse them and under-compare)."""
    return [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            gtypes = coltypes(con, spark_sql)
            wtypes = coltypes(con, sql)
            gnames = sorted(c for c, _ in gtypes)
            wnames = sorted(c for c, _ in wtypes)
            if gnames != wnames:  # multiset compare — dupes count
                print(f"FAIL {name}: columns {gnames} vs oracle {wnames}")
                n_fail += 1
                continue
            gfam = sorted((c, type_family(t)) for c, t in gtypes)
            wfam = sorted((c, type_family(t)) for c, t in wtypes)
            type_mismatch = [(g, w) for g, w in zip(gfam, wfam) if g != w]
            if type_mismatch:
                print(f"FAIL {name}: column type mismatch (spark vs oracle):")
                for (c, g), (_, w) in type_mismatch:
                    print(f"  {c}: {g} vs {w}")
                n_fail += 1
                continue
            cols = sorted(set(gnames))
            collist = ", ".join(f'"{c}"' for c in cols)
            got = con.execute(
                f"SELECT {collist} FROM ({spark_sql})").fetchall()
            want = con.execute(f"SELECT {collist} FROM ({sql})").fetchall()
            grows = sorted(tuple(canon(v) for v in r) for r in got)
            wrows = sorted(tuple(canon(v) for v in r) for r in want)
            if grows == wrows:
                print(f"PASS {name} ({len(grows)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: {len(grows)} vs {len(wrows)} rows")
                wset, gset = set(wrows), set(grows)
                for r in [r for r in grows if r not in wset][:3]:
                    print(f"  spark-only: {r}")
                for r in [r for r in wrows if r not in gset][:3]:
                    print(f"  oracle-only: {r}")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
