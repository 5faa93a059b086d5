#!/usr/bin/env python
"""Isolated noop-sink timing for a named subset of registered queries.

Usage: python tools/time_some.py [--runs 3] name1 name2 ...
Prints per-query all-run times and the best. Same warmups as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gpdb_spark.session import get_spark
    from gpdb_spark.registry import QUERIES as _REG
    import gpdb_spark.queries  # noqa: F401

    spark = get_spark(app_name="gpdb_spark_time_some")
    spark.sparkContext.setLogLevel("ERROR")
    _REG["q01_pricing_summary"](spark, sf_dir).collect()

    def _noop(batches):
        import numpy  # noqa: F401

        for b in batches:
            yield b

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(n_cores, numPartitions=n_cores).mapInPandas(_noop, "id long").collect()

    for name in args.names:
        fn = _REG[name]
        ts = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"time {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"q": name, "runs": ts, "best": min(ts)}), flush=True)


if __name__ == "__main__":
    main()
