"""gpspark quickstart — the surface a Greenplum user would actually
touch, end to end on local[*]:

    python examples/quickstart.py [sf_dir]       # default sf0.001

Walks: fixture catalog + PG-dialect SQL -> DISTRIBUTED BY table + DML +
always-current views -> PL/pgSQL function -> dblink -> training-data
pipeline ops (dedup, quality, ANN) -> EXPLAIN in Motion vocabulary.
Every API shown here is oracle-checked by the driver harness
(tools/driver_sim.py); this file is a tour, not the test suite.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpdb_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="gpspark-quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    from gpdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)  # registers the 10 fixture tables

    # -- 1. PostgreSQL-dialect SQL, verbatim ------------------------------
    print("== PG-dialect SQL (casts, ~ regex, FILTER, named WINDOW) ==")
    for row in eng.run(
        """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F')::int8 AS done,
               count(*)::int8 AS total
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ):
        print(" ", row)

    # -- 2. DISTRIBUTED BY storage + DML + always-current views ----------
    print("== DDL / DML / views ==")
    with tempfile.TemporaryDirectory(prefix="gpspark_qs_") as d:
        eng.create_table(
            "fact", eng.sql("SELECT * FROM orders LIMIT 1000"),
            f"{d}/fact", distributed_by=["o_orderkey"],
        )
        eng.create_view(
            "open_orders", "SELECT * FROM fact WHERE o_orderstatus = 'O'"
        )
        before = eng.run("SELECT count(*) AS n FROM open_orders")[0].n
        eng.execute_dml("DELETE FROM fact WHERE o_orderstatus = 'O'")
        after = eng.run("SELECT count(*) AS n FROM open_orders")[0].n
        print(f"  open orders before DELETE: {before}, after: {after}")

        # -- 3. PL/pgSQL on the coordinator, SQL dispatched distributed --
        print("== PL/pgSQL ==")
        eng.create_function(
            """
            CREATE FUNCTION order_share(status text) RETURNS double precision AS $$
            DECLARE total bigint; hit bigint;
            BEGIN
              SELECT count(*) INTO total FROM orders;
              SELECT count(*) INTO hit FROM orders WHERE o_orderstatus = status;
              RETURN hit::double precision / total;
            END;
            $$ LANGUAGE plpgsql"""
        )
        print("  share of 'F' orders:", round(eng.call("order_share", "F"), 4))

        # -- 4. dblink: a side database queried in place -----------------
        print("== dblink ==")
        from gpdb_spark.operators.dblink import dblink, dblink_exec
        from gpdb_spark.operators.foreign import create_sqlite_table

        side = f"{d}/side.db"
        create_sqlite_table(
            side, "regions_ext",
            [dict(r_regionkey=i, bonus=i * 10) for i in range(5)],
        )
        dblink_exec(side, "UPDATE regions_ext SET bonus = 99 WHERE r_regionkey = 0")
        remote = dblink(spark, side, "SELECT r_regionkey, bonus FROM regions_ext")
        joined = remote.join(eng.table("region"), "r_regionkey").select(
            "r_name", "bonus"
        )
        for row in joined.collect():
            print(" ", row)

    # -- 5. training-data pipeline --------------------------------------
    print("== datapipe: exact dedup + quality + ANN top-k ==")
    from gpdb_spark.datapipe import dedup as D
    from gpdb_spark.datapipe import text as T
    from gpdb_spark.datapipe import similarity as S

    docs = eng.table("documents")
    groups = D.exact_dedup(docs)  # one row per distinct content
    print("  docs:", docs.count(), "-> distinct contents:", groups.count())
    q = T.quality_features(docs).select(
        "doc_id", "n_tokens", "type_token_ratio", "punct_ratio"
    )
    print("  quality sample:", q.limit(2).collect())
    emb = eng.table("embeddings")
    topk = S.brute_force_topk(emb, emb.limit(2), k=3)
    print("  ANN top-3 for 2 query vectors:", topk.count(), "rows")

    # -- 6. the plan, in Motion vocabulary -------------------------------
    print("== EXPLAIN (Motion vocabulary) ==")
    print(
        eng.explain(
            "SELECT n_name, count(*) FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n_name"
        )[:600]
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
