"""Live-broker Kafka round-trip (SURVEY §3.1 / DEVIATIONS #6): the one
seam the file-source stand-in cannot cover — real packets through a real
broker into the identical CdcPipeline.

Runs only where the environment provides BOTH:
- a reachable broker, via ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` (e.g.
  ``localhost:9092`` for a single-node redpanda/kafka), and
- the Spark Kafka connector on the session classpath
  (``spark-sql-kafka-0-10``; ship it with ``--packages`` or drop the
  jar into ``$SPARK_HOME/jars``).

Everywhere else (this container has neither) the module SKIPS with the
exact missing prerequisite — the wiring itself stays covered broker-free
by tests/test_streaming.py::test_kafka_source_option_wiring. Reference
parity: users_raw.datasource:20-27 (topic/group/offset-reset settings),
conf.py:23 (continuous consumption)."""

import os
import uuid

import pytest

from fixtures import gen_users_events, users_events_to_json_lines

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="no live broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port")


def _connector_available(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def test_kafka_cdc_round_trip(spark, tmp_path):
    """Produce 100 fixture CDC events through the broker, consume them
    with the REAL kafka_source (earliest offsets, availableNow), and
    assert the pipeline converges to the same latest-state the batch
    replay defines."""
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka-0-10 connector not on the classpath")

    from test_streaming import make_pipeline

    from demo_cdc_users_airline_spark.streaming.upsert import kafka_source

    topic = f"spark_graft_users_{uuid.uuid4().hex[:8]}"
    events, truth = gen_users_events(n=100, seed=55, null_probability=0.0)
    lines = users_events_to_json_lines(events)

    # produce via the connector's batch sink (no extra client library)
    (spark.createDataFrame([(ln,) for ln in lines], "value string")
     .write.format("kafka")
     .option("kafka.bootstrap.servers", BOOTSTRAP)
     .option("topic", topic)
     .save())

    pipeline = make_pipeline(spark, tmp_path)
    stream = kafka_source(spark, BOOTSTRAP, topic,
                          group_id=f"graft_test_{topic}",
                          auto_offset_reset="earliest")
    q = pipeline.start(stream, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive

    assert pipeline.raw_table.read().count() == len(lines)
    state = {r["id"]: r for r in pipeline.latest_table.latest().collect()}
    assert len(state) == len(truth)
    for uid, t in truth.items():
        assert state[uid]["updated_at"] == t["updated_at"]
        assert int(state[uid]["deleted"]) == t["deleted"]
