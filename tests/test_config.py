"""Rollup-config semantics ported from the reference's hostile config corpus
(config/config_test.yaml:44-107 via FIXTURES.md §1.3)."""

from __future__ import annotations

import pytest

from cassabon_spark.config import (
    DEFAULT_ROLLUP,
    ConfigError,
    RollupConfig,
    parse_duration_s,
)


def test_duration_parse():
    assert parse_duration_s("10s") == 10
    assert parse_duration_s("1m") == 60
    assert parse_duration_s("1h") == 3600
    assert parse_duration_s("30d") == 2592000
    assert parse_duration_s("1y") == 31536000
    for bad in ["10q", "15ms", "1h:3z", "3z", "", "h", "10"]:
        with pytest.raises(ConfigError):
            parse_duration_s(bad)


def test_hostile_entries_rejected_rest_kept():
    cfg = RollupConfig.from_dict(
        {
            "^a.*": {"method": "garbage", "windows": ["10s:1h"]},  # bad method
            "^bar.(zoom2.*": {"method": "max", "windows": ["10s:1h"]},  # unbalanced regex
            "^c.*": {"method": "max", "windows": ["15s-1d"]},  # malformed couplet
            "^d.*": {"method": "max", "windows": ["10s:1h", "15s:2h"]},  # non-multiple
            "^e.*": {"method": "max", "windows": ["10s:1h", "60s:1h"]},  # dup retention
            "^ok.*": {"method": "sum", "windows": ["6s:30m", "1m:30d"]},
        }
    )
    assert len(cfg.errors) == 5
    assert [d.expression for d in cfg.rollups] == ["^ok.*", "default"]


def test_all_invalid_falls_back_to_default():
    cfg = RollupConfig.from_dict({"^a.*": {"method": "garbage", "windows": ["10s:1h"]}})
    assert [d.expression for d in cfg.rollups] == ["default"]
    d = cfg.rollups[0]
    assert d.method == DEFAULT_ROLLUP.method
    assert [(w.window_s, w.retention_s) for w in d.windows] == [(10, 3600), (60, 2592000)]


def test_priority_longer_regex_first_then_lexical_default_last():
    cfg = RollupConfig.from_dict(
        {
            "^foo.*": {"method": "sum", "windows": ["10s:1h"]},
            "^bar.*": {"method": "sum", "windows": ["10s:1h"]},
            "^bar.baz.*": {"method": "sum", "windows": ["10s:1h"]},
            "default": {"method": "average", "windows": ["15s:1d"]},
        }
    )
    assert [d.expression for d in cfg.rollups] == [
        "^bar.baz.*",  # longest first
        "^bar.*",  # same length as ^foo.*: lexical
        "^foo.*",
        "default",  # catchall always last
    ]
    assert cfg.route("bar.baz.x").expression == "^bar.baz.*"
    assert cfg.route("bar.other").expression == "^bar.*"
    assert cfg.route("nothing").expression == "default"


def test_tier_selection_finest_covering():
    cfg = RollupConfig.from_dict(
        {"default": {"method": "average", "windows": ["10s:1h", "60s:1d"]}}
    )
    now = 1_000_000
    # recent range -> finest tier
    assert cfg.select_tier("default", now - 100, now).window_s == 10
    # older than 1h retention -> coarser tier
    assert cfg.select_tier("default", now - 7200, now).window_s == 60
    # older than everything -> coarsest
    assert cfg.select_tier("default", now - 10 * 86400, now).window_s == 60


def test_table_name_encodes_retention():
    cfg = RollupConfig.from_dict({"default": {"method": "average", "windows": ["10s:1h"]}})
    assert cfg.rollups[0].windows[0].table == "rollup_000003600"


def test_from_yaml_reference_template_shape():
    """Parses the reference's YAML layout (cassabon.yaml.template:58-83):
    rollups -> {expr: {retention: [...], aggregation: m}}."""
    from cassabon_spark.config import RollupConfig

    cfg = RollupConfig.from_yaml(
        """
rollups:
  ^foo.*:
    retention:
      - 6s:30m
      - 1m:30d
    aggregation: sum
  default:
    retention:
      - 10s:1h
    aggregation: average
"""
    )
    assert [d.expression for d in cfg.rollups] == ["^foo.*", "default"]
    foo = cfg.by_expression("^foo.*")
    assert foo.method == "sum"
    assert [w.window_s for w in foo.windows] == [6, 60]
    assert cfg.route("foo.bar").method == "sum"
    assert cfg.route("other").method == "average"


def test_from_yaml_invalid_entries_dropped_with_default_fallback():
    from cassabon_spark.config import RollupConfig

    cfg = RollupConfig.from_yaml(
        """
rollups:
  ^bad.*:
    retention: ["10q:1h"]
    aggregation: garbage
"""
    )
    # hostile entry dropped, catchall default injected (config_parser.go:438-455)
    assert cfg.errors
    assert cfg.rollups[-1].is_default
