"""Multi-format source/sink coverage (SURVEY §2 Part B, scans/sinks rows):
parquet <-> csv / json / orc round trips preserve values, and the parquet
scan path gets pushdown + pruning (the properties the engine relies on)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _nation(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_csv")
    src.write.option("header", True).csv(out)
    back = spark.read.option("header", True).schema(src.schema).csv(out)
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_json")
    src.write.json(out)
    back = spark.read.schema(src.schema).json(out)
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_orc")
    src.write.orc(out)
    back = spark.read.orc(out)
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_parquet_scan_pushdown_and_pruning(spark, sf_dir):
    """Filter + projection must reach the parquet scan: PushedFilters
    non-empty and ReadSchema pruned to the selected columns."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # pruned
