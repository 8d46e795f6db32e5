#!/usr/bin/env python3
"""Mimic the driver's DuckDB oracle compare: for each query dir under outDir,
run the oracle SQL from oracle_sql.json against the same sf parquet tables,
sort columns by name, hash values, compare."""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[:-8]
    # driver testdata is single-file parquet; Spark-written tables (e.g. the
    # sf1eq ScaleFixture corpus) are directories of part files
    pat = os.path.join(f, "*.parquet") if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

import datetime, decimal
def norm(v):
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    return repr(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda c: cols[c])
    out = []
    for r in rows:
        out.append(tuple(norm(r[c]) for c in order))
    out.sort()
    h = hashlib.sha256()
    for r in out:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(out)

results = {}
for qdir in sorted(glob.glob(os.path.join(out_dir, "q_*"))):
    name = os.path.basename(qdir)
    pfiles = glob.glob(os.path.join(qdir, "*.parquet"))
    if not pfiles:
        results[name] = {"status": "NO_SPARK_OUTPUT"}
        continue
    t = pq.read_table(pfiles[0])
    scols = [c.lower() for c in t.column_names]
    srows = list(zip(*[t.column(i).to_pylist() for i in range(t.num_columns)])) if t.num_columns else []
    # normalize floats the way repr of python floats does; driver likely compares
    # rounded values -- our queries pre-round so repr should be stable
    shash, sn = canon(srows, scols)
    if name not in oracle:
        results[name] = {"status": "NO_ORACLE", "rows": sn}
        continue
    try:
        res = con.execute(oracle[name])
        ocols = [d[0].lower() for d in res.description]
        orows = res.fetchall()
        ohash, on = canon(orows, ocols)
    except Exception as e:
        results[name] = {"status": "ORACLE_ERROR", "err": str(e)[:200]}
        continue
    if sorted(scols) != sorted(ocols):
        results[name] = {"status": "SCHEMA_MISMATCH", "spark": sorted(scols), "oracle": sorted(ocols)}
    elif sn != on:
        results[name] = {"status": "ROWCOUNT_MISMATCH", "spark": sn, "oracle": on}
    elif shash != ohash:
        results[name] = {"status": "HASH_MISMATCH", "rows": sn}
    else:
        results[name] = {"status": "PASS", "rows": sn}

npass = sum(1 for v in results.values() if v["status"] == "PASS")
print(json.dumps(results, indent=1))
print(f"\n{npass}/{len(results)} PASS")
