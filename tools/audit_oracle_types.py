#!/usr/bin/env python3
"""Type-audit every oracle statement: DESCRIBE each oracle SQL in DuckDB
and flag output columns whose type would NOT round-trip bit-exactly
through a pandas/arrow export in the driver's comparator.

The round-6 postmortem: the 7 driver-red rows (q130/q133/q138/q151/
q154/q156/q161) all shipped a raw integer `sum()` in their final
SELECT. DuckDB types `sum(BIGINT)` as HUGEINT (int128); `fetchall()`
yields a plain Python int (so the local repr-compare in
check_oracle.py passes), but the pandas/arrow export path renders
HUGEINT columns as float64 — `12345.0` vs the Spark parquet's int64
`12345` — hash mismatch with rows/schema still matching. Every green
query (e.g. q86 after its round-5 fix, q131, q152) casts integer
outputs to BIGINT explicitly.

Safe types (158 green-row precedent): BIGINT, INTEGER, DOUBLE,
VARCHAR, DATE, TIMESTAMP, BOOLEAN. Flagged: HUGEINT, DECIMAL, FLOAT,
and anything else.

Usage: python3 tools/audit_oracle_types.py /tmp/oracle_sql.json /root/testdata/sf0.001
"""
import sys, json
import duckdb

SAFE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "VARCHAR",
        "DATE", "TIMESTAMP", "BOOLEAN", "TIMESTAMP_NS"}

def main(oracle_path, sfdir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
            continue
        bad = [(c[0], c[1]) for c in cols
               if c[1].split("(")[0].upper() not in SAFE]
        if bad:
            n_bad += 1
            print(f"FLAG {name}: " + ", ".join(f"{c}:{t}" for c, t in bad))
    print(f"== {n_bad} flagged of {len(oracle)} ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
