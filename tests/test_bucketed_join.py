"""Bucketed co-located join: the 100 TB fact-fact join strategy, proven.

shipping_priority's docstring claims that at scale the orders⨝lineitem
shuffle disappears if both tables are bucketed on orderkey. This test pins
that claim: write both sides with bucketBy(orderkey), join, and assert the
physical plan contains NO Exchange — the join reads co-located buckets
directly. Broadcast is disabled so the test exercises the bucketed path,
not the small-table shortcut."""

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import plan_of

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders"))
    (lineitem.write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", str(tmp_path / "b_lineitem")).saveAsTable("b_lineitem"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = (
            bl.join(bo, bl.l_orderkey == bo.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = plan_of(joined)
        # the join itself must be exchange-free: the only allowed exchange is
        # the one feeding the final aggregation on o_orderpriority
        join_section = plan.split("HashAggregate")[-1]  # below the partial agg
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, plan
        assert "bucketed scan" in plan.lower() or "SelectedBucketsCount" in plan, plan

        # and it still returns the right answer (vs the unbucketed join)
        expected = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
