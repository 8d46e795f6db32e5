#!/usr/bin/env python3
"""Audit DuckDB oracle result types against the driver's Arrow-based hashing.

The driver compares Spark parquet vs DuckDB oracle output after Arrow
conversion, so a DuckDB result column whose type is HUGEINT (arrow
decimal128(38,0)) or DECIMAL hashes differently from Spark's int64/double
even when every value matches (observed round 9: q_phash/q_audio_sig/
q_video_sig). This script runs every oracle from an oracle_sql.json at a
small sf and flags any output column with a driver-hash-unsafe arrow type.

Usage: oracle_type_audit.py <sfDir> <oracle_sql.json>
Exit 1 if any oracle errors or any flagged type is found.
"""
import sys, json, glob, os
import duckdb

sf, oracle_path = sys.argv[1], sys.argv[2]
oracle = json.load(open(oracle_path))
con = duckdb.connect()
for f in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(f)[:-8]
    pat = os.path.join(f, "*.parquet") if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

UNSAFE = ("decimal", "int128", "uint64", "float32", "halffloat")
bad, errs = [], []
for name, sql in sorted(oracle.items()):
    try:
        t = con.execute(sql).arrow()
    except Exception as e:
        errs.append((name, str(e)[:160]))
        continue
    for col, typ in zip(t.column_names, t.schema.types):
        ts = str(typ)
        if any(ts.startswith(u) for u in UNSAFE):
            bad.append((name, col, ts))

print(f"oracles: {len(oracle)}  errors: {len(errs)}  flagged: {len(bad)}")
for n, e in errs:
    print(f"ERR  {n}: {e}")
for n, c, t in bad:
    print(f"FLAG {n}.{c}: {t}")
sys.exit(1 if (bad or errs) else 0)
