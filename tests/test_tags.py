"""Graphite 1.1 tagged metrics: parse, inverted index, seriesByTag
resolution, and the engine end-to-end (the reference predates tags)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from cassabon_spark.operators.tags import (
    TagExprError,
    build_tag_index,
    parse_tag_expr,
    series_by_tag,
    tags_map_expr,
)


def test_tags_map_and_base(spark):
    df = spark.createDataFrame(
        [("disk.used;host=web1;dc=east",), ("cpu.idle",), ("m;bad;x=1",)],
        "path string",
    )
    out = {r["path"]: r["m"] for r in df.select("path", tags_map_expr("path").alias("m")).collect()}
    assert out["disk.used;host=web1;dc=east"] == {
        "name": "disk.used", "host": "web1", "dc": "east",
    }
    assert out["cpu.idle"] == {"name": "cpu.idle"}
    # malformed ';bad' segment dropped, valid one kept
    assert out["m;bad;x=1"] == {"name": "m", "x": "1"}


def test_build_tag_index(spark):
    df = spark.createDataFrame(
        [("disk.used;host=web1",), ("disk.used;host=web2",), ("cpu.idle",)],
        "path string",
    )
    idx = build_tag_index(df)
    rows = {(r["series"], r["tag"], r["value"]) for r in idx.collect()}
    assert rows == {
        ("disk.used;host=web1", "name", "disk.used"),
        ("disk.used;host=web1", "host", "web1"),
        ("disk.used;host=web2", "name", "disk.used"),
        ("disk.used;host=web2", "host", "web2"),
    }


def test_parse_tag_expr_forms():
    assert parse_tag_expr("host=web1") == ("host", "=", "web1")
    assert parse_tag_expr("host!=web1") == ("host", "!=", "web1")
    assert parse_tag_expr("host=~web.*") == ("host", "=~", "web.*")
    assert parse_tag_expr("host!=~web.*") == ("host", "!=~", "web.*")
    with pytest.raises(TagExprError):
        parse_tag_expr("nonsense")


def test_series_by_tag_matrix(spark):
    df = spark.createDataFrame(
        [
            ("disk.used;dc=east;host=web1",),
            ("disk.used;dc=east;host=web2",),
            ("disk.used;dc=west;host=web3",),
            ("disk.free;dc=east;host=web1",),
        ],
        "path string",
    )
    idx = build_tag_index(df)

    def q(*exprs):
        return {r["series"] for r in series_by_tag(idx, *exprs).collect()}

    assert q("name=disk.used") == {
        "disk.used;dc=east;host=web1",
        "disk.used;dc=east;host=web2",
        "disk.used;dc=west;host=web3",
    }
    assert q("name=disk.used", "dc=east") == {
        "disk.used;dc=east;host=web1",
        "disk.used;dc=east;host=web2",
    }
    assert q("name=disk.used", "host!=web2") == {
        "disk.used;dc=east;host=web1",
        "disk.used;dc=west;host=web3",
    }
    assert q("name=~disk.*", "host=~web[12]") == {
        "disk.used;dc=east;host=web1",
        "disk.used;dc=east;host=web2",
        "disk.free;dc=east;host=web1",
    }
    assert q("name=disk.used", "host!=~web[12]") == {
        "disk.used;dc=west;host=web3",
    }
    with pytest.raises(TagExprError, match="non-negated"):
        q("host!=web1")


BASE = 1_700_000_000 - (1_700_000_000 % 10)


def test_engine_tagged_end_to_end(spark, tmp_path):
    from cassabon_spark.config import RollupConfig
    from cassabon_spark.engine import Engine

    cfg = RollupConfig.from_dict({"default": {"method": "sum", "windows": ["10s:1h"]}})
    eng = Engine(spark, cfg, str(tmp_path / "store"), str(tmp_path / "index"))
    lines = [
        f"disk.used;host=web1;dc=east 10 {BASE}",
        f"disk.used;host=web2;dc=east 20 {BASE}",
        f"disk.used;host=web3;dc=west 30 {BASE}",
        f"cpu.idle 99 {BASE}",
    ]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    # the dot-tree index holds ONLY the untagged path (graphite keeps
    # tagged series out of the tree)
    tree = {p["path"] for p in eng.get_paths("*") } | {
        p["path"] for p in eng.get_paths("*.*")
    }
    assert "cpu.idle" in tree
    assert not any(";" in p for p in tree)
    # tag resolution
    assert eng.get_tagged_series("name=disk.used", "dc=east") == [
        "disk.used;host=web1;dc=east",
        "disk.used;host=web2;dc=east",
    ]
    # render a tag target end-to-end through the read path
    out = eng.render_target(
        "sumSeries(seriesByTag('name=disk.used', 'dc=east'))",
        BASE - 10,
        BASE + 20,
        now_s=BASE + 30,
    )
    vals = [v for v in out["series"]["sumSeries"] if v is not None]
    assert vals == [30.0]
    # aliasByTags renames with tag values off the serialized path
    out2 = eng.render_target(
        "aliasByTags(seriesByTag('name=disk.used', 'dc=east'), 'host')",
        BASE - 10,
        BASE + 20,
        now_s=BASE + 30,
    )
    assert set(out2["series"]) == {"web1", "web2"}


def test_streaming_ingest_routes_tagged_to_tag_index(spark, tmp_path):
    from cassabon_spark.config import RollupConfig
    from cassabon_spark.engine import Engine
    from cassabon_spark.streaming.ingest import ingest_stream

    cfg = RollupConfig.from_dict({"default": {"method": "sum", "windows": ["10s:1h"]}})
    lines_dir = tmp_path / "lines"
    lines_dir.mkdir()
    (lines_dir / "f.txt").write_text(
        f"disk.used;host=web1 5 {BASE}\ncpu.idle 1 {BASE}\n"
    )
    eng = Engine(spark, cfg, str(tmp_path / "store"), str(tmp_path / "index"))
    q = ingest_stream(
        spark, cfg, str(lines_dir), eng.store_dir, str(tmp_path / "ck"),
        available_now=True, index_dir=eng.index_dir,
    )
    q.awaitTermination()
    tree = {p["path"] for p in eng.get_paths("*")} | {
        p["path"] for p in eng.get_paths("*.*")
    }
    assert tree == {"cpu", "cpu.idle"}  # no tagged entries in the dot tree
    assert eng.get_tagged_series("name=disk.used") == ["disk.used;host=web1"]


def _tagged_engine(spark, tmp_path):
    from cassabon_spark.config import RollupConfig
    from cassabon_spark.engine import Engine

    cfg = RollupConfig.from_dict({"default": {"method": "sum", "windows": ["10s:1h"]}})
    eng = Engine(spark, cfg, str(tmp_path / "store"), str(tmp_path / "index"))
    lines = [
        f"disk.used;host=web1;dc=east 10 {BASE}",
        f"disk.used;host=web2;dc=west 20 {BASE}",
        f"cpu.idle 99 {BASE}",
    ]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    return eng


def test_delete_metrics_purges_tag_index(spark, tmp_path):
    """VERDICT r2 gap #1: deleting a tagged series' data must retire its
    tag-index rows so seriesByTag stops resolving it."""
    eng = _tagged_engine(spark, tmp_path)
    victim = "disk.used;host=web1;dc=east"
    assert victim in eng.get_tagged_series("name=disk.used")
    rep = eng.delete_metrics([victim], 0, 2_000_000_000, dry_run=False)
    assert rep and rep[0]["path"] == victim
    assert eng.get_tagged_series("name=disk.used") == [
        "disk.used;host=web2;dc=west"
    ]
    # partial-range delete keeps the series resolvable (data remains)
    eng2_victim = "disk.used;host=web2;dc=west"
    eng.delete_metrics([eng2_victim], 0, BASE - 100, dry_run=False)
    assert eng.get_tagged_series("name=disk.used") == [eng2_victim]


def test_delete_tag_series_engine_and_route(spark, tmp_path):
    """delSeries edits only the tag database: series stops resolving but
    stored points survive (graphite semantics)."""
    import json
    from urllib.request import Request, urlopen

    from cassabon_spark.api import CassabonAPI

    eng = _tagged_engine(spark, tmp_path)
    victim = "disk.used;host=web1;dc=east"
    with CassabonAPI(eng, port=0) as api:
        req = Request(
            f"{api.url}/tags/delSeries",
            data=f"path={victim.replace(';', '%3B')}".encode(),
            method="POST",
        )
        out = json.loads(urlopen(req).read())
    assert out == {"deleted": 1}
    assert eng.get_tagged_series("name=disk.used") == [
        "disk.used;host=web2;dc=west"
    ]
    # data untouched: the full-path fetch still sees the point
    got = eng.get_metrics([victim], BASE - 10, BASE + 10)
    assert any(v is not None for v in got["series"].get(victim, []))


def test_delete_paths_glob_hits_tagged_base(spark, tmp_path):
    """A dot-glob delete also retires tagged series whose BASE name
    matches, across both finders."""
    eng = _tagged_engine(spark, tmp_path)
    n = eng.delete_paths("disk.*")
    assert n >= 2  # two tagged series purged (dot tree holds only cpu.idle)
    assert eng.get_tagged_series("name=disk.used") == []
    assert {p["path"] for p in eng.get_paths("*.*")} == {"cpu.idle"}


def test_retention_sweep_gcs_tag_index(spark, tmp_path):
    """Tagged series fully expired by retention stop resolving."""
    eng = _tagged_engine(spark, tmp_path)
    # retention 1h; sweep far in the future expires every partition
    dropped = eng.sweep_retention(BASE + 90 * 24 * 3600)
    assert dropped
    assert eng.get_tagged_series("name=disk.used") == []


def test_tags_autocomplete_routes(spark, tmp_path):
    """graphite-web tag autocomplete: /tags/autoComplete/tags (tagPrefix,
    limit) and /tags/autoComplete/values (tag, valuePrefix, limit)."""
    import json
    from urllib.request import urlopen

    from cassabon_spark.api import CassabonAPI

    eng = _tagged_engine(spark, tmp_path)
    with CassabonAPI(eng, port=0) as api:
        tags = json.loads(urlopen(f"{api.url}/tags/autoComplete/tags").read())
        assert "dc" in tags and "host" in tags and "name" in tags
        pref = json.loads(
            urlopen(f"{api.url}/tags/autoComplete/tags?tagPrefix=h").read()
        )
        assert pref == ["host"]
        lim = json.loads(
            urlopen(f"{api.url}/tags/autoComplete/tags?limit=1").read()
        )
        assert len(lim) == 1
        vals = json.loads(
            urlopen(
                f"{api.url}/tags/autoComplete/values?tag=host&valuePrefix=web"
            ).read()
        )
        assert vals == ["web1", "web2"]
        # missing tag param is a 400
        import urllib.error

        try:
            urlopen(f"{api.url}/tags/autoComplete/values")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
