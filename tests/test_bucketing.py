"""Bucketed co-located joins (SURVEY §4 / README scale design).

At 100 TB the latest-state ↔ history joins should not shuffle either
side: writing both tables bucketed by the join key lets Spark plan a
SortMergeJoin with NO Exchange. This test proves the engine's storage
layer produces that plan.
"""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.sources.loader import load_table
from demo_cdc_users_airline_spark.sources.tables import (
    VersionedTable,
    publish_bucketed_state,
)


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


def test_published_bucketed_state_joins_without_shuffle(spark, tmp_path):
    """publish_bucketed_state: the RMT latest snapshot lands bucketed on
    the key, so a state ⋈ history join needs no Exchange on the state
    side when history is bucketed alike."""
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    vt = VersionedTable(spark, str(tmp_path / "vt"), key=["id"],
                        version="ver", tiebreak=[])
    rows = [(i % 50, f"v{i}", i) for i in range(400)]
    vt.merge(spark.createDataFrame(rows, "id INT, val STRING, ver INT"))

    publish_bucketed_state(vt, "buckets.state_snap", n_buckets=8)
    hist = spark.createDataFrame(
        [(i % 50, i, i * 10) for i in range(2000)], "id INT, seq INT, amt INT")
    (hist.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
         .saveAsTable("buckets.hist"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = (spark.table("buckets.hist")
                  .join(spark.table("buckets.state_snap"), "id")
                  .groupBy("val").agg(F.sum("amt").alias("total")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section
        # snapshot semantics: exactly the latest row per key was published
        assert spark.table("buckets.state_snap").count() == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS buckets.state_snap")
        spark.sql("DROP TABLE IF EXISTS buckets.hist")
