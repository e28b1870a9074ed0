#!/usr/bin/env python3
"""Run-to-run determinism check: compare two Verify output dirs row by
row (ORDER BY ALL, so file layout / row order are free to differ).
Every registered query must be bit-stable across independent runs or
the driver's hash compare will flake round to round.

Usage: detcheck.py <outDir1> <outDir2>
CAUTION: both dirs must come from FRESH runs of the same build — a
stale dir from an older session compares old schemas and reports
phantom nondeterminism.
"""
import sys, os
import duckdb

d1, d2 = sys.argv[1], sys.argv[2]
con = duckdb.connect()
diffs, checked = [], 0
for name in sorted(os.listdir(d1)):
    p1, p2 = os.path.join(d1, name), os.path.join(d2, name)
    if not os.path.isdir(p1) or not os.path.isdir(p2):
        continue
    a = con.sql(f"SELECT * FROM '{p1}/*.parquet' ORDER BY ALL").fetchall()
    b = con.sql(f"SELECT * FROM '{p2}/*.parquet' ORDER BY ALL").fetchall()
    checked += 1
    if a != b:
        diffs.append(name)
        print(f"{name}: DIFFERS ({len(a)} vs {len(b)} rows)")
print(f"{checked} queries compared; nondeterministic: {diffs if diffs else 'NONE'}")
sys.exit(1 if diffs else 0)
