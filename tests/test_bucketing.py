"""Bucketed co-located joins (SURVEY §4 / README scale design).

At 100 TB the latest-state ↔ history joins should not shuffle either
side: writing both tables bucketed by the join key lets Spark plan a
SortMergeJoin with NO Exchange. This test proves the engine's storage
layer produces that plan.
"""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.sources.loader import load_table


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")

    (ev.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
       .saveAsTable("buckets.events_hist"))
    latest = (ev.groupBy("user_id")
              .agg(F.max_by("event_type", F.struct("ts", "event_id")).alias("last_type")))
    (latest.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
       .saveAsTable("buckets.events_latest"))

    # disable broadcast + AQE so the co-location is what removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = (spark.table("buckets.events_hist")
                  .join(spark.table("buckets.events_latest"), "user_id")
                  .groupBy("last_type").agg(F.count(F.lit(1)).alias("n")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # no Exchange below the join: bucketing co-located both sides
        assert "Exchange" not in join_section
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS buckets.events_hist")
        spark.sql("DROP TABLE IF EXISTS buckets.events_latest")
