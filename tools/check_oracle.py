#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and diff values exactly.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb

def norm(v):
    # Normalize for comparison: floats by exact repr, decimals numerically.
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    return v

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            files = ", ".join(f"'{p}'" for p in sorted(pq))
            got = con.execute(f"SELECT * FROM read_parquet([{files}])").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if sorted(map(str.lower, gcols)) != sorted(map(str.lower, ecols)):
            print(f"FAIL {name}: cols {sorted(gcols)} vs {sorted(ecols)}")
            n_bad += 1; continue
        # driver sorts columns by name before hashing values
        gidx = sorted(range(len(gcols)), key=lambda i: gcols[i].lower())
        eidx = sorted(range(len(ecols)), key=lambda i: ecols[i].lower())
        key = lambda row: tuple(repr(v) for v in row)  # total order w/ NULLs
        g = sorted((tuple(norm(r[i]) for i in gidx) for r in got), key=key)
        e = sorted((tuple(norm(r[i]) for i in eidx) for r in exp), key=key)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_bad += 1; continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: {bad[0]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
