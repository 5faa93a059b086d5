"""AssertOp / RowTrigger-style runtime constraint checks.

The reference enforces NOT NULL and CHECK constraints from ORCA plans with
a dedicated executor node (ExecAssertOp, src/backend/executor/
nodeAssertOp.c:98; row triggers nodeRowTrigger.c:450). Spark analog: a
projection that evaluates the predicate per row and raises on violation —
stays inside whole-stage codegen, fails the task (and therefore the query)
on the first violating row, exactly like the reference's ereport(ERROR).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assert_op(df: DataFrame, condition: Column, message: str) -> DataFrame:
    """Pass rows through unchanged, erroring if any row violates
    ``condition`` (evaluated lazily, per-partition, no driver collect).

    The guard is folded into EVERY output column: rows satisfying the
    condition project the original values, violating rows evaluate
    raise_error. The branch is data-dependent, so Catalyst cannot fold it
    away, and wrapping all columns means any projection that consumes the
    result triggers the check even after column pruning. (A metadata-only
    action like ``count()`` evaluates no columns at all and skips the
    guard — attach assertions on the materializing path, e.g. before a
    write, exactly where the reference plants AssertOp nodes.)"""
    err = F.raise_error(F.lit(f"AssertOp violation: {message}"))
    return df.select(
        *[
            F.when(condition, F.col(c))
            .otherwise(err.cast(df.schema[c].dataType.simpleString()))
            .alias(c)
            for c in df.columns
        ]
    )


def not_null(df: DataFrame, *cols: str) -> DataFrame:
    """NOT NULL table constraint over the given columns."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    return assert_op(df, cond, f"NOT NULL {cols}")
