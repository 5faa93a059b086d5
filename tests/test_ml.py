"""linregr_multi: closed-form OLS must agree with numpy lstsq."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from gpdb_spark.registry import QUERIES
import gpdb_spark.queries  # noqa: F401


def test_linregr_matches_numpy(spark, sf_dir):
    got = {r["l_returnflag"]: r for r in QUERIES["linregr_multi"](spark, sf_dir).collect()}
    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pydict()
    flags = np.array(tbl["l_returnflag"])
    X = np.column_stack([tbl["l_quantity"], tbl["l_discount"]])
    y = np.array(tbl["l_extendedprice"])
    for flag in set(flags):
        m = flags == flag
        A = np.column_stack([np.ones(m.sum()), X[m]])
        coef, *_ = np.linalg.lstsq(A, y[m], rcond=None)
        r = got[flag]
        assert abs(r["b0"] - coef[0]) < 1e-3 * max(1, abs(coef[0]))
        assert abs(r["b_qty"] - coef[1]) < 1e-3 * max(1, abs(coef[1]))
        assert abs(r["b_disc"] - coef[2]) < 1e-3 * max(1, abs(coef[2]))
        pred = A @ coef
        ss_res = ((y[m] - pred) ** 2).sum()
        ss_tot = ((y[m] - y[m].mean()) ** 2).sum()
        assert abs(r["r2"] - (1 - ss_res / ss_tot)) < 1e-4
        assert r["n"] == int(m.sum())
