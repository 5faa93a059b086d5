"""Logistic regression via IRLS — iterative in-database ML in the MADlib
style: each Newton step is ONE distributed aggregation collecting the
O(p^2) weighted-moment scalars (p=2 features + intercept → 9 sums), the
3x3 normal equations are solved on the driver (numpy, O(p^3) on p=3),
and the new coefficients ride back into the next pass as literals.

Scale shape: per iteration a single 2-stage aggregation over the fact
table — partial-aggregatable, no per-row Python (the sigmoid is a JVM
expression), driver traffic is 9 doubles per iteration. Decimal-cast
per-row terms make each pass summation-order-independent, so the fitted
coefficients are reproducible run-to-run regardless of partitioning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpdb_spark.registry import fx, xsum

DEC30 = "decimal(30,15)"


def logistic_irls(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    iterations: int = 8,
) -> tuple[list[float], float, int]:
    """Fit P(y=1) = sigmoid(b0 + b.x). Returns (coefficients
    [b0, b1, ...], final log-likelihood, n_rows). ``y_col`` must be 0/1."""
    if len(x_cols) != 2:
        raise ValueError("this solver is specialized to 2 features + intercept")
    # r11 (guide §2.6 idle capacity): a single-file scan caches as ONE
    # partition, serializing all 9 aggregation passes (8 IRLS + LL) onto
    # one core. spread() fans the 3-column projection out BEFORE the
    # persist — the one-time shuffle of 3 doubles/row is amortized over
    # every pass (unlike single-pass scans, where r11 measured the same
    # fan-out as a net loss). On a many-file production table spread()
    # is a no-op.
    from gpdb_spark.catalog import spread

    feats = spread(
        df.select(
            F.col(y_col).cast("double").alias("y"),
            F.col(x_cols[0]).cast("double").alias("x1"),
            F.col(x_cols[1]).cast("double").alias("x2"),
        )
    ).persist()

    def _moment_row(terms: dict[str, Column], with_count: bool = False):
        # floor-12 each term before the exact decimal sum: removes the
        # double->decimal cast's engine-dependent digit-15 rounding, so
        # the only cross-engine noise left is libm ulp in exp() —
        # O(1e-10) on the summed moments, dwarfed by the floor-6 output
        # granularity. This is what lets DuckDB replay the IRLS fixpoint.
        # r11 (guide §1.2 per-task work): the sum runs as registry.xsum's
        # split-long primitive sums over the floor-12 fixed point —
        # value-identical to sum((floor(c*1e12)/1e12).cast(DECIMAL(30,15)))
        # (|terms| < 1e3 here, so u < 1e15 has <= 15 significant digits;
        # see xsum's docstring) — instead of 9 per-row decimal
        # allocations per IRLS pass. The fixed-point longs are PROJECTED
        # as columns before the aggregation so each sigmoid/working-
        # response subtree is evaluated once per row, not re-expanded
        # inside every slice-sum's update expression (r11 A/B: 0.76 ->
        # 0.65 s per pass at sf0.1). The DuckDB oracle is unchanged.
        proj = feats.select(
            *[fx(c, 12).alias(name) for name, c in terms.items()]
        )
        aggs = [
            xsum(F.col(name), 12).cast("double").alias(name)
            for name in terms
        ]
        if with_count:
            # r12 (guide §2.4 fewer actions): the standalone
            # feats.count() job is folded into the first moment pass —
            # an extra long-count aggregate on an aggregation that runs
            # anyway (and the pass that materializes the persist).
            # Jobs per fit: 10 -> 9; n_rows value unchanged.
            aggs.append(F.count(F.lit(1)).alias("__n"))
        return proj.agg(*aggs).collect()[0]

    n_rows = None
    beta = np.zeros(3)
    for _ in range(iterations):
        b0, b1, b2 = (float(v) for v in beta)
        eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (F.lit(1.0) - mu)
        r = w * eta + F.col("y") - mu  # = W z, z the working response
        x1, x2 = F.col("x1"), F.col("x2")
        row = _moment_row(
            {
                "sw": w,
                "sw1": w * x1,
                "sw2": w * x2,
                "sw11": w * x1 * x1,
                "sw12": w * x1 * x2,
                "sw22": w * x2 * x2,
                "sr": r,
                "sr1": r * x1,
                "sr2": r * x2,
            },
            with_count=n_rows is None,
        )
        if n_rows is None:
            n_rows = row["__n"]
        A = np.array(
            [
                [row["sw"], row["sw1"], row["sw2"]],
                [row["sw1"], row["sw11"], row["sw12"]],
                [row["sw2"], row["sw12"], row["sw22"]],
            ]
        )
        b = np.array([row["sr"], row["sr1"], row["sr2"]])
        beta = np.linalg.solve(A, b)

    b0, b1, b2 = (float(v) for v in beta)
    eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
    # log-likelihood: sum y*eta - log1p(exp(eta)) (stable form via
    # max(eta,0) trick is unnecessary at these magnitudes)
    ll_row = _moment_row(
        {"ll": F.col("y") * eta - F.log(F.lit(1.0) + F.exp(eta))},
        with_count=n_rows is None,  # iterations=0: no moment pass ran
    )
    if n_rows is None:
        n_rows = ll_row["__n"]
    ll = ll_row["ll"]
    feats.unpersist()
    return [b0, b1, b2], float(ll), n_rows
