#!/usr/bin/env python3
"""Oracle result-type lint: no oracle may produce HUGEINT columns.

DuckDB widens integer SUM()/PRODUCT() to HUGEINT (sometimes surfaced as
DECIMAL(38,0)); the driver's canonicalization stringifies those
differently from Spark's BIGINT, so such an oracle hash-fails on the
driver even when the local Python-int compare is green (round-11
`stats_expectations`).  This lint makes that class structurally
impossible: every oracle SQL is bound in DuckDB and its result column
types are checked.

Usage: python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>
Binding only (no execution), so it is cheap.  Oracles whose SQL
references a landed artifact path that does not exist yet are reported
SKIP — run post-Verify (compare.py applies the same check inline) to
cover those.
Exit 0 = clean, 1 = at least one banned type.
"""
import sys, os, json
import duckdb

BANNED = ("HUGEINT", "UHUGEINT")
# any DECIMAL(38,s): DuckDB widens SUM over DECIMAL(p,s) to DECIMAL(38,s),
# which stringifies differently from Spark's narrower sum type
BANNED_PREFIX = "DECIMAL(38,"

def connect(sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def banned_cols(con, sql):
    """Column names with banned result types, or None if SQL won't bind."""
    try:
        rel = con.sql(sql)
        def bad(t):
            s = str(t).upper().replace(" ", "")
            return s in BANNED or s.startswith(BANNED_PREFIX)
        return [c for c, t in zip(rel.columns, rel.types) if bad(t)]
    except Exception:
        return None

def main(sf_dir, oracle_json):
    con = connect(sf_dir)
    oracle = json.load(open(oracle_json))
    n_bad = n_skip = 0
    for name in sorted(oracle):
        bad = banned_cols(con, oracle[name])
        if bad is None:
            n_skip += 1
            print(f"SKIP {name}: does not bind standalone (landed artifact?)")
        elif bad:
            n_bad += 1
            print(f"BAD  {name}: HUGEINT-class result columns {bad} — "
                  f"CAST(... AS BIGINT) in the oracle SQL")
    print(f"== {len(oracle) - n_bad - n_skip} clean, {n_bad} bad, "
          f"{n_skip} skipped of {len(oracle)}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
