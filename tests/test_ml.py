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


def test_logregr_matches_numpy_irls(spark, sf_dir):
    import pyarrow.parquet as pq

    got = {
        r["term"]: r["estimate"]
        for r in QUERIES["logregr_irls"](spark, sf_dir).collect()
    }
    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pydict()
    y = (np.array(tbl["l_returnflag"]) == "R").astype(float)
    X = np.column_stack(
        [np.ones(len(y)), tbl["l_quantity"], tbl["l_discount"]]
    )
    beta = np.zeros(3)
    for _ in range(8):
        eta = X @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1 - mu)
        A = X.T @ (X * w[:, None])
        b = X.T @ (w * eta + y - mu)
        beta = np.linalg.solve(A, b)
    assert abs(got["intercept"] - beta[0]) < 1e-4
    assert abs(got["l_quantity"] - beta[1]) < 1e-4
    assert abs(got["l_discount"] - beta[2]) < 1e-4
    # gradient at the optimum ~ 0 (X'(y - mu))
    mu = 1.0 / (1.0 + np.exp(-(X @ beta)))
    grad = X.T @ (y - mu)
    assert np.abs(grad).max() < 1e-3 * len(y)
    ll = float((y * (X @ beta) - np.log1p(np.exp(X @ beta))).sum())
    assert abs(got["log_likelihood"] - ll) < max(1e-3, 1e-6 * abs(ll))


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    """The distributed Lloyd rounds (operators/kmeans.py) must equal a
    serial numpy implementation of the same floored-decimal algorithm."""
    got = {
        r["vec_id"]: r["cluster"]
        for r in QUERIES["kmeans_lloyd"](spark, sf_dir).collect()
    }
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(tbl["vec_id"])
    X = np.array([list(map(float, v)) for v in tbl["embedding"]], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    k = 16
    # init = the k lowest ids (rows already sorted by id above)
    cent = np.floor(X[:k] * 1e9) / 1e9
    cent_ids = ids[:k]
    for _ in range(2):
        # dist with per-element floor-12 terms, summed exactly
        d = np.zeros((len(ids), len(cent_ids)))
        for j in range(len(cent_ids)):
            d[:, j] = (np.floor((X - cent[j]) ** 2 * 1e12) / 1e12).sum(axis=1)
        # argmin with cid tiebreak == argmin over (dist, cid) lexicographic
        assign = cent_ids[np.argmin(d, axis=1)]
        new_ids = np.array(sorted(set(assign)))
        cent = np.array(
            [
                np.floor(X[assign == c].mean(axis=0) * 1e9) / 1e9
                for c in new_ids
            ]
        )
        cent_ids = new_ids
    want = dict(zip(ids.tolist(), assign.tolist()))
    assert got == want


def test_nb_langid_reasonable(spark, sf_dir):
    """Self-scored NB should beat the majority-class baseline by a wide
    margin (langs are deterministic word distributions in the fixture)
    and emit one row per document."""
    out = QUERIES["text_nb_langid"](spark, sf_dir).collect()
    n_docs = pq.read_table(f"{sf_dir}/documents.parquet").num_rows
    assert len(out) == n_docs
    acc = sum(1 for r in out if r["is_correct"]) / len(out)
    langs = [r["lang"] for r in out]
    majority = max(langs.count(x) for x in set(langs)) / len(langs)
    assert acc > majority


def test_ml_plans_have_scale_shapes(spark, sf_dir):
    """Plan gates for the ML operators: the k-means centroid relation and
    the NB model/default relations must join as broadcasts (the fact side
    never shuffles for them), and no plan may contain a cartesian
    product."""
    km = QUERIES["kmeans_lloyd"](spark, sf_dir)
    plan = km._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan

    nb = QUERIES["text_nb_langid"](spark, sf_dir)
    plan = nb._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan  # label cross join is broadcast-nested-loop

    pr = QUERIES["graph_pagerank"](spark, sf_dir)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
