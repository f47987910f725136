#!/usr/bin/env python3
"""Local pre-verification mimicking the driver's correctness gate:
run each oracle_sql in DuckDB over the same parquet tables and compare
against the Verify-dumped Spark parquet (sorted rows, columns sorted by
name, exact value match).

Usage: sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
       python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            d = con.execute(sql)
            dcols = [c[0] for c in d.description]
            drows = d.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}"); n_fail += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet({files})")
        scols = [c[0] for c in s.description]
        srows = s.fetchall()
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1; continue
        a, b = norm(srows, scols), norm(drows, dcols)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            only_a = [r for r in a[:2000] if r not in set(b)][:3]
            only_b = [r for r in b[:2000] if r not in set(a)][:3]
            if diff: print(f"  first diffs: {diff}")
            if only_a: print(f"  only in spark: {only_a}")
            if only_b: print(f"  only in duck:  {only_b}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
