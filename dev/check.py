#!/usr/bin/env python3
"""Dev-side mimic of the driver's correctness gate: read Verify output
parquet + oracle_sql.json, run each oracle in DuckDB against the same
fixture tables, compare schemas and row values (sorted columns, sorted
rows)."""
import sys, json, glob, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    if name not in oracles:
        print(f"{name:24s} rows-only: {len(spark.fetchall())} rows")
        continue
    oracle = con.sql(oracles[name])
    scols, ocols = sorted(spark.columns), sorted(oracle.columns)
    if scols != ocols:
        fails.append(name); print(f"{name:24s} COLS-MISMATCH spark={scols} oracle={ocols}")
        continue
    stypes = {c: str(t) for c, t in zip(spark.columns, spark.types)}
    otypes = {c: str(t) for c, t in zip(oracle.columns, oracle.types)}
    if stypes != otypes:
        print(f"{name:24s} type-diff spark={stypes} oracle={otypes}")
    cols = ", ".join(f'"{c}"' for c in scols)
    srows = con.sql(f"SELECT {cols} FROM spark ORDER BY ALL").fetchall()
    orows = con.sql(f"SELECT {cols} FROM oracle ORDER BY ALL").fetchall()
    if srows == orows:
        print(f"{name:24s} OK ({len(srows)} rows)")
    else:
        fails.append(name)
        ndiff = sum(1 for a, b in zip(srows, orows) if a != b) + abs(len(srows) - len(orows))
        print(f"{name:24s} VALUE-MISMATCH rows spark={len(srows)} oracle={len(orows)} diff~{ndiff}")
        for a, b in list(zip(srows, orows))[:2000]:
            if a != b:
                print("   spark :", a); print("   oracle:", b); break
print("FAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
