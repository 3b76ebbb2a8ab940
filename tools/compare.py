#!/usr/bin/env python3
"""Dev-only local correctness harness (mirrors the driver's DuckDB compare).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Reads each <name>/ parquet written by graft.Verify, runs the matching SQL from
oracle_sql.json in DuckDB against the same parquet tables, and compares
canonical CSV (columns sorted by name, values stringified).
"""
import sys, os, json, glob
import duckdb

from oracle_lint import banned_cols

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.6g}" if v == v else "NaN")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        bad = banned_cols(con, oracle[name])
        if bad:
            # HUGEINT-class oracle results hash-diverge on the driver even
            # when Python-int compare is green — hard-fail locally too.
            print(f"FAIL {name}: oracle result has HUGEINT-class cols {bad}")
            n_fail += 1
            continue
        try:
            ours_rel = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            ours_cols = [d[0] for d in ours_rel.description]
            ours = canon(ours_rel.fetchall(), ours_cols)
            or_rel = con.execute(oracle[name])
            or_cols = [d[0] for d in or_rel.description]
            theirs = canon(or_rel.fetchall(), or_cols)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(ours_cols) != sorted(or_cols):
            print(f"FAIL {name}: cols {sorted(ours_cols)} vs {sorted(or_cols)}")
            n_fail += 1
        elif ours != theirs:
            n_fail += 1
            diff = [(a, b) for a, b in zip(ours, theirs) if a != b][:3]
            print(f"FAIL {name}: {len(ours)} vs {len(theirs)} rows; first diffs: {diff}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(ours)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
