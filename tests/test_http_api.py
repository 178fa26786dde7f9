"""HTTP pipe API: the reference's GET /v0/pipes/<name>.json + READ
tokens (tb_functions.py:264-273 consumer), served by the stdlib shim."""

import datetime
import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.core.clock import Clock
from demo_cdc_users_airline_spark.plans.framework import (
    Context,
    Node,
    Param,
    Pipe,
    Registry,
)
from demo_cdc_users_airline_spark.plans.http_api import (
    PipeApiServer,
    Token,
    TokenRegistry,
)

NOW = datetime.datetime(2026, 1, 2, 12, 0, 0)


@pytest.fixture(scope="module")
def server(spark):
    reg = Registry(spark)
    reg.add_datasource(
        "users_latest",
        spark.createDataFrame(
            [(1, "ada", 10), (2, "bob", 20), (3, "cyd", 30)],
            "id INT, name STRING, score INT"))

    def node(ctx: Context):
        return (ctx.ref("users_latest")
                .filter(F.col("score") >= F.lit(ctx.param("min_score")))
                .orderBy("id"))

    reg.add_pipe(Pipe("users_api", [Node("users_api_0", node)],
                      params=[Param("min_score", "Int32", default=0)]))

    tokens = TokenRegistry([
        Token("users_api_endpoint_read_1234", "secret-users", {"users_api"}),
        Token("Dashboard_Read", "secret-dash", {"*"}),
    ])
    srv = PipeApiServer(reg, tokens, clock=Clock.fixed(NOW)).start()
    yield srv
    srv.stop()


def fetch(url, token=None, bearer=None):
    if token:
        url += ("&" if "?" in url else "?") + f"token={token}"
    req = urllib.request.Request(url)
    if bearer:
        req.add_header("Authorization", f"Bearer {bearer}")
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_endpoint_envelope_and_auth_modes(server):
    # query-param token
    status, body = fetch(f"{server.base_url}/v0/pipes/users_api.json",
                         token="secret-users")
    assert status == 200
    assert body["rows"] == 3
    assert [r["name"] for r in body["data"]] == ["ada", "bob", "cyd"]
    assert {"name": "id", "type": "Int32"} in body["meta"]
    assert "elapsed" in body["statistics"]
    # bearer header (the dashboard's mode) + wildcard-scope token
    status, body = fetch(f"{server.base_url}/v0/pipes/users_api.json",
                         bearer="secret-dash")
    assert status == 200 and body["rows"] == 3


def test_typed_params_reach_the_pipe(server):
    status, body = fetch(
        f"{server.base_url}/v0/pipes/users_api.json?min_score=15",
        token="secret-users")
    assert status == 200
    assert [r["id"] for r in body["data"]] == [2, 3]


def test_auth_failures(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        fetch(f"{server.base_url}/v0/pipes/users_api.json")
    assert e.value.code == 403
    with pytest.raises(urllib.error.HTTPError) as e:
        fetch(f"{server.base_url}/v0/pipes/users_api.json", token="wrong")
    assert e.value.code == 403


def test_not_found_and_bad_path(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        fetch(f"{server.base_url}/v0/pipes/nope.json", token="secret-dash")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        fetch(f"{server.base_url}/v1/other", token="secret-dash")
    assert e.value.code == 404


def test_bad_param_is_a_client_error(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        fetch(f"{server.base_url}/v0/pipes/users_api.json?min_score=abc",
              token="secret-users")
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())


def test_airport_registry_over_http(spark):
    """The reference's actual dashboard queries, served end-to-end over
    the HTTP surface (dash_airport.py consumer parity)."""
    from demo_cdc_users_airline_spark.plans.airport import register_airport_pipes

    from fixtures import (
        BAGGAGE_DDL,
        FLIGHTS_DDL,
        PASSENGERS_DDL,
        gen_airport_events,
    )

    flights, passengers, baggage = gen_airport_events(NOW)
    reg = Registry(spark)
    reg.add_datasource("flights_raw", spark.createDataFrame(flights, FLIGHTS_DDL))
    reg.add_datasource("passengers_raw",
                       spark.createDataFrame(passengers, PASSENGERS_DDL))
    reg.add_datasource("baggage_raw", spark.createDataFrame(baggage, BAGGAGE_DDL))
    register_airport_pipes(reg)
    tokens = TokenRegistry([Token("Dashboard_Read", "dash-secret")])
    srv = PipeApiServer(reg, tokens, clock=Clock.fixed(NOW)).start()
    try:
        for pipe in ("latest_flight_info", "flights_missed_pct_minute",
                     "active_vs_missed_flights"):
            status, body = fetch(f"{srv.base_url}/v0/pipes/{pipe}.json",
                                 bearer="dash-secret")
            assert status == 200, pipe
            assert body["rows"] == len(body["data"])
            assert body["meta"], pipe
        # templated window param through HTTP, like the dashboard's start=:
        # the series stays 61 minutes (reference numbers(61)), but the
        # aggregate only counts events inside [start, end] — minutes
        # before start must read 0.0
        start_dt = NOW - datetime.timedelta(minutes=30)
        status, body = fetch(
            f"{srv.base_url}/v0/pipes/flights_missed_pct_minute.json"
            f"?start={start_dt.isoformat()}",
            bearer="dash-secret")
        assert status == 200
        assert body["rows"] == 61              # series length is fixed
        for row in body["data"]:
            t = datetime.datetime.strptime(row["time_interval"],
                                           "%Y-%m-%d %H:%M:%S.%f")
            if t < start_dt:
                assert row["flights_missed_pct"] == 0.0
    finally:
        srv.stop()


def test_unpublish_revokes_pipe_and_tokens(spark):
    """Delete-with-pipe token lifecycle (tb_functions.py:321-354 parity):
    unpublishing a pipe 404s the endpoint, its single-scope token 403s
    everywhere, a multi-scope token merely loses the pipe, and wildcard
    tokens survive."""
    from demo_cdc_users_airline_spark.plans.http_api import unpublish_pipe

    reg = Registry(spark)
    reg.add_datasource("t", spark.createDataFrame([(1,)], "id INT"))

    def node_a(ctx):
        return ctx.ref("t")

    reg.add_pipe(Pipe("pipe_a", [Node("a0", node_a)]))
    reg.add_pipe(Pipe("pipe_b", [Node("b0", node_a)]))
    tokens = TokenRegistry([
        Token("a_read", "secret-a", {"pipe_a"}),
        Token("ab_read", "secret-ab", {"pipe_a", "pipe_b"}),
        Token("Dashboard_Read", "secret-dash", {"*"}),
    ])
    srv = PipeApiServer(reg, tokens, clock=Clock.fixed(NOW)).start()
    try:
        status, _ = fetch(f"{srv.base_url}/v0/pipes/pipe_a.json", token="secret-a")
        assert status == 200

        assert unpublish_pipe(reg, tokens, "pipe_a") == 1  # a_read deleted

        with pytest.raises(urllib.error.HTTPError) as e:   # pipe gone: 404
            fetch(f"{srv.base_url}/v0/pipes/pipe_a.json", token="secret-dash")
        assert e.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as e:   # token gone: 403
            fetch(f"{srv.base_url}/v0/pipes/pipe_b.json", token="secret-a")
        assert e.value.code == 403
        # the multi-scope token lost pipe_a but keeps pipe_b
        status, _ = fetch(f"{srv.base_url}/v0/pipes/pipe_b.json", token="secret-ab")
        assert status == 200
        # wildcard untouched
        status, _ = fetch(f"{srv.base_url}/v0/pipes/pipe_b.json", token="secret-dash")
        assert status == 200
    finally:
        srv.stop()
