"""Graphite events store: Engine.add_event/get_events, the events() render
function (per-bucket annotation counts), and the /events/ HTTP API —
graphite-web parity surface the reference never had."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from cassabon_spark.api import CassabonAPI
from cassabon_spark.config import RollupConfig
from cassabon_spark.engine import Engine

CFG = RollupConfig.from_dict(
    {"default": {"method": "average", "windows": ["10s:1h"]}}
)
BASE = 1_700_000_000 - (1_700_000_000 % 10)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_store")
    eng = Engine(spark, CFG, str(d / "store"), str(d / "idx"))
    lines = [f"svc.api.latency {v} {BASE + i * 10}" for i, v in enumerate([1, 2, 3, 4])]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    eng.add_event("deploy v1", tags=["deploy", "api"], when_s=BASE + 5)
    eng.add_event("deploy v2", tags=["deploy", "api"], when_s=BASE + 12)
    eng.add_event("incident", tags="outage api", when_s=BASE + 15, data="sev2")
    return eng


def test_get_events_filters(eng):
    all_ev = eng.get_events()
    assert [e["what"] for e in all_ev] == ["deploy v1", "deploy v2", "incident"]
    # tag filter requires ALL listed tags
    deploys = eng.get_events(tags=["deploy", "api"])
    assert [e["what"] for e in deploys] == ["deploy v1", "deploy v2"]
    # window filter
    win = eng.get_events(from_s=BASE + 10, to_s=BASE + 20)
    assert [e["what"] for e in win] == ["deploy v2", "incident"]
    # string tags split on whitespace at ingest
    assert eng.get_events(tags=["outage"])[0]["data"] == "sev2"


def test_events_render_function(eng):
    # counts per 10s bucket, from-aligned, zero-filled empty buckets
    resp = eng.render_target("events('deploy')", BASE, BASE + 30)
    (name,) = resp["series"].keys()
    assert name == "events(deploy)"
    assert resp["series"][name] == [1.0, 1.0, 0.0, 0.0]
    # composes with the normal function chain
    resp = eng.render_target(
        "alias(drawAsInfinite(events('deploy', 'api')), 'deploys')",
        BASE,
        BASE + 30,
    )
    assert resp["series"]["deploys"] == [1.0, 1.0, 0.0, 0.0]


def test_events_and_metrics_in_one_render(eng):
    resp = eng.render_target(
        "group(svc.api.latency, scale(events('api'), 10))", BASE, BASE + 30
    )
    assert resp["series"]["svc.api.latency"][:2] == [1.0, 2.0]
    assert resp["series"]["events(api)"] == [10.0, 20.0, 0.0, 0.0]


def test_events_without_store_is_400(eng, spark, tmp_path):
    bare = Engine(spark, CFG, str(tmp_path / "nostore"))
    resp = bare.render_target("events('deploy')", BASE, BASE + 30)
    assert resp["series"] == {}  # empty engine: graceful empty response


def test_events_http_api(eng):
    with CassabonAPI(eng) as srv:
        body = json.dumps(
            {"what": "rollout", "tags": ["deploy", "web"], "when": BASE + 25}
        ).encode()
        req = urllib.request.Request(
            srv.url + "/events/", data=body, method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            created = json.loads(r.read())
        assert created["what"] == "rollout" and created["id"] > 0

        with urllib.request.urlopen(
            srv.url + f"/events/get_data?from={BASE}&until={BASE + 30}&tags=deploy",
            timeout=60,
        ) as r:
            evs = json.loads(r.read())
        assert [e["what"] for e in evs] == ["deploy v1", "deploy v2", "rollout"]
        assert all("deploy" in e["tags"] for e in evs)


def test_render_formats(eng):
    # graphite-web render formats: raw / csv / pickle (remote-fetch protocol)
    import pickle as _pickle

    with CassabonAPI(eng) as srv:
        url = srv.url + f"/render?target=svc.api.latency&from={BASE}&to={BASE + 30}"
        with urllib.request.urlopen(url + "&format=raw", timeout=60) as r:
            raw = r.read().decode()
        assert raw.startswith("svc.api.latency,")
        header, values = raw.strip().split("|")
        assert header.split(",")[3] == "10"  # step
        assert values.split(",")[0] == "1.0"

        with urllib.request.urlopen(url + "&format=csv", timeout=60) as r:
            csv_rows = r.read().decode().strip().split("\n")
        assert csv_rows[0].startswith("svc.api.latency,2023-")
        assert csv_rows[0].endswith(",1.0")

        with urllib.request.urlopen(url + "&format=pickle", timeout=60) as r:
            series = _pickle.loads(r.read())
        assert series[0]["name"] == "svc.api.latency"
        assert series[0]["step"] == 10
        assert series[0]["values"][0] == 1.0

        # unknown format is a 400, not a crash
        try:
            urllib.request.urlopen(url + "&format=bogus", timeout=60)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
