"""Targeted driver-style compare for a subset of registered queries.

Usage: python tools/check_queries.py name1 name2 ...  (no names = all)
Same normalization as tools/driver_sim.py, at sf0.01.
"""
import datetime
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from gpdb_spark.session import get_spark
from tools.dtype_parity import dtype_mismatches

spark = get_spark(app_name="check-queries", shuffle_partitions=8)

con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')"
    )

qs, osql = E.queries(), E.oracle_sql()
names = sys.argv[1:] or list(qs)


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            if isinstance(v, datetime.datetime):
                v = v.replace(tzinfo=None)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


bad = 0
for name in names:
    if name not in qs:
        print(f"{name}: NO SUCH QUERY")
        bad += 1
        continue
    try:
        sdf = qs[name](spark, sf)
        srows = sdf.collect()
        scols = [f.name for f in sdf.schema.fields]
        if name not in osql:
            print(f"{name}: rows-only spark={len(srows)}")
            continue
        cur = con.execute(osql[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            bad += 1
            continue
        skew = dtype_mismatches(sdf.schema, con, osql[name])
        if skew:
            print(f"{name}: DTYPE SKEW {'; '.join(skew)}")
            bad += 1
            continue
        a, b = norm(srows, scols), norm(orows, ocols)
        if len(a) != len(b):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
            bad += 1
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"{name}: VALUE MISMATCH rows={len(a)} first_diffs={diffs}")
            bad += 1
        else:
            print(f"{name}: MATCH rows={len(a)}")
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
        bad += 1

print("RESULT:", "FAIL" if bad else "ALL MATCH")
sys.exit(1 if bad else 0)
