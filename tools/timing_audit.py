"""Per-query wall-clock audit at sf0.1 — finds plan outliers among ALL
registered queries, not just bench.py's 18 headliners. Prints one line
per query sorted slowest-first; audit anything that looks quadratic or
shuffle-heavy with .explain() and either fix the plan or document the
bound in SCALE.md.

Usage: python tools/timing_audit.py [sf_dir] [top_n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import gpdb_spark.queries  # noqa: F401, E402
from gpdb_spark.registry import QUERIES  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

spark = (
    SparkSession.builder.master("local[32]")
    .appName("timing-audit")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

times: dict[str, float] = {}
fails: dict[str, str] = {}
for name, fn in sorted(QUERIES.items()):
    t0 = time.monotonic()
    try:
        df = fn(spark, sf)
        n = df.count()
        times[name] = time.monotonic() - t0
    except Exception as exc:  # noqa: BLE001 — audit must cover all
        fails[name] = f"{type(exc).__name__}: {exc}"[:200]

for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:top_n]:
    print(f"{dt:8.3f}s  {name}")
print(f"-- {len(times)} timed, total {sum(times.values()):.1f}s")
for name, err in fails.items():
    print(f"FAIL {name}: {err}")
