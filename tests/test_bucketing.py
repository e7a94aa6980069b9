"""Bucketed co-located joins — the at-rest layout for repeated big joins.

At 100 TB, joining two fact tables on the same key every day should not
re-shuffle either side every day: bucket both BY THE JOIN KEY at write time
and the join becomes exchange-free (only per-partition sorts). This test
pins that plan property on managed bucketed tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    left = docs.select("doc_id", "text")
    right = docs.select("doc_id", "lang", "n_chars")
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    (
        left.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_left")
    )
    (
        right.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_right")
    )
    try:
        joined = spark.table("b_left").join(spark.table("b_right"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == docs.count()
        # same join WITHOUT bucketing shuffles both sides
        plain = left.join(right, "doc_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert (
            "Exchange hashpartitioning" in plain_plan
            or "BroadcastHashJoin" in plain_plan
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
