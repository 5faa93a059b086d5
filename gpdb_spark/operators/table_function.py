"""Enhanced table functions over table input with SCATTER BY, and
user-defined aggregates with combine discipline.

Reference:
- TableFunctionScan over ``anytable`` with SCATTER BY
  (nodeTableFunction.c:278, design comment :1-30; gram.y:14056): a
  set-returning function consuming a table, with the user controlling how
  input rows are distributed across segments before the function runs.
- CREATE AGGREGATE with transition + combine functions
  (pg_aggregate.h:35,61): combinefn is what makes an aggregate 2-stage
  (partial on segments, final after motion).

Spark mapping:
- SCATTER BY cols -> repartition(cols) then mapInPandas: the function
  sees Arrow batches of its partition, exactly a QE seeing its scattered
  slice. SCATTER RANDOMLY -> repartition(n).
- CREATE AGGREGATE -> pandas_udf GROUPED_AGG (Spark handles the
  partial/final split; the UDF must be combine-safe, i.e. algebraic).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def table_function(
    df: DataFrame,
    fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    schema: StructType | str,
    scatter_by: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """SELECT * FROM fn(TABLE(SELECT ...) SCATTER BY cols).

    ``fn`` receives an iterator of Arrow-backed pandas batches for one
    partition and yields output batches with ``schema``.
    """
    if scatter_by:
        df = (
            df.repartition(num_partitions, *scatter_by)
            if num_partitions
            else df.repartition(*scatter_by)
        )
    elif num_partitions:
        df = df.repartition(num_partitions)
    return df.mapInPandas(fn, schema)


def grouped_table_function(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """Per-group table function: fn sees the COMPLETE group as one pandas
    frame (the SCATTER BY + 'function consumes whole scatter group'
    pattern from nodeTableFunction.c's design notes)."""
    return df.groupBy(*group_cols).applyInPandas(fn, schema)
