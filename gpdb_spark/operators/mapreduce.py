"""gpMapReduce analog: declarative map/reduce pipelines over tables.

Reference: gpcontrib/gpmapreduce/ — YAML documents declare INPUT (a
table/query), MAP (a row->rows function), REDUCE (keyed TRANSITION/
FINALIZE state machine), OUTPUT. gpmapreduce compiles the YAML to SQL +
UDFs and runs it on all segments.

Spark-first mapping: the same declarative spec (a dict — parse YAML
upstream if desired; PyYAML isn't assumed in this container) compiles to
a DataFrame pipeline:

- MAP     -> ``mapInPandas`` (Arrow-batched generator over rows)
- REDUCE  -> ``applyInPandas`` per key group (transition+finalize fused —
  Spark shuffles by key exactly like the reference redistributes by the
  reduce key)
- builtin reducers (SUM/COUNT/MIN/MAX/AVG) -> native ``groupBy().agg()``
  (JVM-side; a Python reducer is only used for custom logic)

Spec shape::

    {
      "input":  dataframe | (spark, sf_dir, table_name),
      "map":    {"fn": callable(pd.DataFrame)->pd.DataFrame,
                 "schema": "k string, v double"},         # optional
      "reduce": {"keys": ["k"],
                 "builtin": {"v": "sum"}}                 # or
                {"keys": ["k"],
                 "fn": callable(pd.DataFrame)->pd.DataFrame,
                 "schema": "k string, out double"},
    }
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUILTIN_REDUCERS: dict[str, Callable] = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
}


def run_mapreduce(df: DataFrame, spec: dict) -> DataFrame:
    """Compile and run a gpmapreduce-style spec against ``df``."""
    out = df
    map_spec = spec.get("map")
    if map_spec:
        fn, schema = map_spec["fn"], map_spec["schema"]

        def gen(batches, _fn=fn):
            for pdf in batches:
                res = _fn(pdf)
                if res is not None and len(res):
                    yield res

        out = out.mapInPandas(gen, schema)

    red = spec.get("reduce")
    if red:
        keys = list(red["keys"])
        if "builtin" in red:
            aggs = [
                _BUILTIN_REDUCERS[op.lower()](c).alias(f"{op.lower()}_{c}")
                for c, op in red["builtin"].items()
            ]
            out = out.groupBy(*keys).agg(*aggs)
        else:
            out = out.groupBy(*keys).applyInPandas(red["fn"], red["schema"])
    return out
