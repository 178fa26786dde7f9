"""Property-based check of ReplacingMergeTree semantics (SURVEY §5.3).

For ANY event sequence, arrival permutation, and duplication pattern,
the engine's dedup-on-read must equal a trivial dict replay model
(last-writer-wins by (version, arrival_seq)). Hypothesis drives the
event-space; the Spark side evaluates in one batch per example set to
keep runtime bounded.
"""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from demo_cdc_users_airline_spark.sources.tables import (
    MergeOnWriteTable,
    VersionedTable,
)

BASE = datetime.datetime(2026, 1, 1)

# an event: (key 0-4, version 0-9, payload 0-99)
events_strategy = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 9), st.integers(0, 99)),
    min_size=1, max_size=25)
dup_mask = st.lists(st.booleans(), min_size=25, max_size=25)


def model_latest(arrivals):
    """Dict replay: max (version, arrival_seq) wins per key."""
    best = {}
    for seq, (k, v, p) in enumerate(arrivals):
        if k not in best or (v, seq) >= (best[k][0], best[k][1]):
            best[k] = (v, seq, p)
    return {k: p for k, (v, seq, p) in best.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=events_strategy, dups=dup_mask, data=st.data())
def test_latest_matches_replay_model(spark, tmp_path_factory, events, dups, data):
    # duplicate some events, then permute arrival order
    arrivals = list(events) + [e for e, d in zip(events, dups) if d]
    perm = data.draw(st.permutations(range(len(arrivals))))
    arrivals = [arrivals[i] for i in perm]

    rows = [(k, v, p, BASE + datetime.timedelta(seconds=seq))
            for seq, (k, v, p) in enumerate(arrivals)]
    df = spark.createDataFrame(rows, "k INT, ver INT, payload INT, __timestamp TIMESTAMP")
    vt = VersionedTable(spark, str(tmp_path_factory.mktemp("vt")), key=["k"],
                        version="ver", tiebreak=["__timestamp"])
    got = {r["k"]: r["payload"] for r in vt.dedup(df).collect()}
    assert got == model_latest(arrivals)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=events_strategy, dups=dup_mask, data=st.data())
def test_merge_on_write_matches_replay_model(spark, tmp_path_factory, events,
                                             dups, data):
    """The MERGE backend resolves incrementally (state ⊎ batch per merge)
    — for ANY split into two batches it must agree with the one-shot
    replay model, and the stored table must hold exactly one row/key."""
    arrivals = list(events) + [e for e, d in zip(events, dups) if d]
    perm = data.draw(st.permutations(range(len(arrivals))))
    arrivals = [arrivals[i] for i in perm]
    cut = data.draw(st.integers(0, len(arrivals)))

    rows = [(k, v, p, BASE + datetime.timedelta(seconds=seq))
            for seq, (k, v, p) in enumerate(arrivals)]
    vt = MergeOnWriteTable(spark, str(tmp_path_factory.mktemp("mow")), key=["k"],
                           version="ver", tiebreak=["__timestamp"])
    ddl = "k INT, ver INT, payload INT, __timestamp TIMESTAMP"
    for chunk in (rows[:cut], rows[cut:]):
        if chunk:
            vt.merge(spark.createDataFrame(chunk, ddl))
    got = {r["k"]: r["payload"] for r in vt.latest().collect()}
    assert got == model_latest(arrivals)
    assert vt.read().count() == len(got)
