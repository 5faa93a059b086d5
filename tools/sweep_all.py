#!/usr/bin/env python
"""Time EVERY registered query at $SPARK_GRAFT_SF_DIR with the noop sink
(guide §1.4) — the optimization round's coverage sweep. Prints one JSON
line per query (best of N runs) and a ranked tail at the end.

Usage: python tools/sweep_all.py [--runs 2] [--out /tmp/sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="/tmp/sweep_all.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gpdb_spark.session import get_spark
    from gpdb_spark.registry import QUERIES as _REG
    import gpdb_spark.queries  # noqa: F401 — populate registry

    spark = get_spark(app_name="gpdb_spark_sweep_all")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmups as bench.py: codegen + python worker pool
    _REG["q01_pricing_summary"](spark, sf_dir).collect()

    def _noop(batches):
        import numpy  # noqa: F401

        for b in batches:
            yield b

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(n_cores, numPartitions=n_cores).mapInPandas(_noop, "id long").collect()

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(_REG):
        fn = _REG[name]
        best = None
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"sweep {name}")
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                errors[name] = traceback.format_exc(limit=1)
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        if best is not None:
            results[name] = round(best, 3)
            print(json.dumps({"q": name, "best": results[name]}), flush=True)

    with open(args.out, "w") as fh:
        json.dump({"sf_dir": sf_dir, "results": results, "errors": errors}, fh, indent=1)
    ranked = sorted(results.items(), key=lambda kv: -kv[1])
    print(json.dumps({"total_best_sum": round(sum(results.values()), 3),
                      "n": len(results), "n_err": len(errors),
                      "top25": ranked[:25]}))
    for name, tb in errors.items():
        print(f"ERROR {name}: {tb.splitlines()[-1]}", file=sys.stderr)


if __name__ == "__main__":
    main()
