"""Property-based tests (hypothesis): invariants of the fiddly pure
functions (the reference's semantics edge cases live there) plus a couple
of Spark-side invariants at low example counts.

The reference had zero property tests (SURVEY §5); these pin the behaviors
the oracle queries rely on for ALL inputs, not just the fixture values."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassabon_spark.functions.pearson import _T, pearson_hash8, pearson_hash64
from cassabon_spark.operators.index import glob_depth, glob_to_regex, route_pure
from cassabon_spark.operators.query import normalize_from
import pytest

# r15 test tiering (VERDICT r14 #2): property-vs-naive mirror suite (operators keep oracle + entry-test coverage in the default tier).
# Excluded from the default verify tier; run with -m slow.
pytestmark = pytest.mark.slow

# ---------------------------------------------------------------- pure functions


@given(st.integers(min_value=0, max_value=2**40), st.integers(min_value=1, max_value=10**6))
def test_normalize_from_always_advances_to_boundary(from_s, step):
    """A12 (metricquery.go:124): normalFrom ALWAYS advances (even when
    already aligned), lands on a step boundary, and advances at most one
    full step."""
    n = normalize_from(from_s, step)
    assert n > from_s
    assert n % step == 0 or step == 1
    assert n - from_s <= step


@given(st.text(min_size=0, max_size=64))
def test_pearson_hash8_range_and_determinism(s):
    h = pearson_hash8(s)
    assert 0 <= h <= 255
    assert h == pearson_hash8(s)


@given(st.text(min_size=1, max_size=32))
def test_pearson_hash64_segments_in_range(s):
    segs = pearson_hash64(s)
    assert len(segs) == 8
    assert all(0 <= x <= 255 for x in segs)


def test_pearson_table_is_a_permutation():
    assert sorted(_T) == list(range(256))


@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=4).map(lambda s: s),
        min_size=1,
        max_size=4,
    )
)
def test_glob_regex_matches_itself(segments):
    """A17: a literal glob (no wildcards) matches exactly its own path at
    its own depth."""
    import re

    path = ".".join(segments)
    rx = glob_to_regex(path)
    assert re.match(rx, path)
    assert glob_depth(path) == len(segments)
    assert not re.match(rx, path + "x")


@given(
    st.lists(st.sampled_from(["^a\\.", "^b\\.", "c$", "default"]), min_size=1, max_size=4),
    st.lists(st.text(alphabet="abc.", min_size=1, max_size=8), min_size=1, max_size=5),
)
def test_route_pure_first_match_wins_and_total(patterns, paths):
    """A5: every path routes somewhere; a path matching pattern i never
    routes to a later pattern."""
    routed = route_pure(paths, patterns)
    assert len(routed) == len(paths)
    import re

    compiled = [(p, re.compile(p)) for p in patterns if p != "default"]
    for path, got in zip(paths, routed):
        first = next((src for src, rx in compiled if rx.search(path)), "default")
        assert got == first


# ---------------------------------------------------------------- spark-side


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["p.a", "p.b"]),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.integers(min_value=1000, max_value=1300),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_gapfill_grid_shape_and_coverage(spark, rows):
    """A13: the grid always has exactly (to-nfrom)/step+1 slots per queried
    path; a slot is non-null iff a store row bucketed into it."""
    import pyspark.sql.functions as F

    from cassabon_spark.operators.query import query_metrics_df

    store = spark.createDataFrame(
        [(p, float(v), float(ts)) for p, v, ts in rows],
        "path string, value double, ts double",
    ).select(
        "path",
        F.timestamp_seconds(
            ((F.floor(F.col("ts") / 60) * 60) + 60).cast("bigint")
        ).alias("time"),
        F.col("value").alias("vsum"),
        F.lit(1).cast("bigint").alias("cnt"),
    )
    merged = store.groupBy("path", "time").agg(
        F.sum("vsum").alias("vsum"), F.sum("cnt").alias("cnt")
    )
    from_s, to_s, step = 980, 1400, 60
    grid = query_metrics_df(
        spark, merged, ["p.a", "p.b"], from_s, to_s, step, "average"
    ).collect()
    nfrom = normalize_from(from_s, step)
    expected_slots = (to_s - nfrom) // step + 1
    by_path = {}
    for r in grid:
        by_path.setdefault(r["path"], set()).add(r["slot_s"])
    assert set(by_path) == {"p.a", "p.b"}
    for slots in by_path.values():
        assert len(slots) == expected_slots
        assert min(slots) == nfrom and max(slots) <= to_s
    # non-null slots == windows that actually received data (within range)
    closes = {
        (p, int(ts // 60) * 60 + 60)
        for p, _, ts in rows
        if nfrom <= int(ts // 60) * 60 + 60 <= to_s
    }
    non_null = {(r["path"], r["slot_s"]) for r in grid if r["stat"] is not None}
    assert non_null == closes


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab.", min_size=1, max_size=10).filter(lambda s: s.strip(".")),
        min_size=1,
        max_size=12,
    )
)
def test_routing_when_chain_matches_driver_routing(spark, paths):
    """A5 consistency: the distributed Catalyst when-chain must route every
    path to the same expression as the driver-side Python router."""
    from cassabon_spark.config import RollupConfig

    cfg = RollupConfig.from_dict(
        {
            r"^a\.b\..*": {"method": "sum", "windows": ["10s:1h"]},
            r"^a\..*": {"method": "max", "windows": ["10s:1h"]},
            r"\.b$": {"method": "min", "windows": ["10s:1h"]},
            "default": {"method": "average", "windows": ["10s:1h"]},
        }
    )
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    got = {
        r["path"]: r["expression"]
        for r in df.withColumn("expression", cfg.routing_when_chain()).collect()
    }
    for p in set(paths):
        assert got[p] == cfg.route(p).expression, p


# ------------------------------------------------- round-3 closed forms


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_ema_sma_seed_closed_form_matches_reference_loop(spark, vals, n):
    """The window-aggregate EMA (SMA seed, null-skip decay) must equal the
    graphite-web reference loop for ARBITRARY null patterns — the closed
    form's non-null decay counting is the subtle part."""
    from cassabon_spark.functions.series import exponential_moving_average

    rows = [("m", (i + 1) * 10, v) for i, v in enumerate(vals)]
    grid = spark.createDataFrame(rows, "path string, slot_s bigint, stat double")
    got = {
        r["slot_s"]: r["stat"]
        for r in exponential_moving_average(grid, n).collect()
    }
    alpha = 2.0 / (n + 1.0)
    head = [v for v in vals[:n] if v is not None]
    ema = sum(head) / len(head) if head else 0.0
    want = [None] * (n - 1) + [ema]
    for v in vals[n:]:
        if v is None:
            want.append(None)
        else:
            ema = alpha * v + (1 - alpha) * ema
            want.append(ema)
    want = want[: len(vals)]
    for i, w in enumerate(want):
        g = got[(i + 1) * 10]
        if w is None:
            assert g is None, (i, g)
        else:
            assert g is not None and abs(g - w) < 1e-6, (i, g, w)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abz019", min_size=1, max_size=8),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_natural_sort_matches_python_key(spark, names):
    """sortByName(natural=1) must order exactly like the canonical Python
    digit-run tokenization for arbitrary alphanumeric names."""
    import re

    from cassabon_spark.functions.series import sort_by_name

    rows = [(p, 10, 1.0) for p in names]
    grid = spark.createDataFrame(rows, "path string, slot_s bigint, stat double")
    out = sort_by_name(grid, natural=True)
    got = [
        r["path"]
        for r in out.select("path", "__ord").distinct().orderBy("__ord").collect()
    ]

    def pykey(s):
        return [
            int(run) if run.isdigit() else run
            for run in re.split(r"(\d+)", s)
            if run != ""
        ]

    # Python can't compare int vs str; emulate the padded-string compare
    def strkey(s):
        return "".join(
            run.zfill(24) if run.isdigit() else run
            for run in re.split(r"(\d+)", s)
            if run != ""
        )

    assert got == sorted(names, key=strkey)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=10**5),
)
def test_largest_remainder_allocation_properties(spark, tokens, budget):
    """pipeline_token_budget_mix's allocation law: integer allocs sum to the
    budget exactly and each is within 1 of the proportional share."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    if sum(tokens) == 0:
        return
    rows = [(f"s{i}", t) for i, t in enumerate(tokens)]
    src = spark.createDataFrame(rows, "source string, tokens bigint")
    tot = src.agg(F.sum("tokens").alias("tt"))
    base = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        (F.lit(budget) * F.col("tokens") % F.col("tt")).alias("remainder"),
        F.expr(f"({budget} * tokens) div tt").alias("floor_alloc"),
    )
    w_rank = Window.orderBy(F.desc("remainder"), F.asc("source"))
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = base.withColumn("rr", F.row_number().over(w_rank)).withColumn(
        "leftover", F.lit(budget) - F.sum("floor_alloc").over(w_all)
    )
    out = {
        r["source"]: r["alloc"]
        for r in ranked.select(
            "source",
            (
                F.col("floor_alloc")
                + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
            ).alias("alloc"),
        ).collect()
    }
    assert sum(out.values()) == budget
    tt = sum(tokens)
    for i, t in enumerate(tokens):
        assert abs(out[f"s{i}"] - budget * t / tt) < 1.0 + 1e-9


# ---------------------------------------------------------------- r3: file skipping


@given(
    st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=40),
    st.lists(
        st.tuples(
            st.sampled_from(["=", "<", "<=", ">", ">="]),
            st.integers(min_value=-10**6, max_value=10**6),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_file_may_match_never_prunes_a_real_hit(rows, ops):
    """Soundness of manifest stats pruning: whenever _file_may_match says
    False for a file, NO row in that file can satisfy the conjunction of
    predicates. (The converse — False positives — is allowed; they cost a
    read, never correctness.)"""
    from cassabon_spark.sources.snapshot import _file_may_match

    entry = {"stats": {"min": {"v": min(rows)}, "max": {"v": max(rows)}}}
    prune = [("v", op, val) for op, val in ops]

    def checks_for(op):
        return {
            "=": lambda a, b: a == b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
        }[op]

    any_hit = any(
        all(checks_for(op)(row, val) for op, val in ops) for row in rows
    )
    if not _file_may_match(entry, prune):
        assert not any_hit


def test_zorder_key_bijective_and_local(spark):
    """The Morton key is a bijection on (bucket, bucket) pairs, and
    truncating it to its top bits groups pairs into aligned 2^k x 2^k
    tiles (the property that bounds BOTH dims per z-range)."""
    from pyspark.sql import functions as F

    from cassabon_spark.operators.layout import zorder_key_expr

    pairs = (
        spark.range(0, 256)
        .select((F.col("id") % 16).alias("a"), F.floor(F.col("id") / 16).alias("b"))
    )
    z = pairs.select(
        "a", "b", zorder_key_expr([F.col("a"), F.col("b")], 4).alias("z")
    )
    rows = z.collect()
    assert len({r.z for r in rows}) == 256  # bijective on 16x16
    assert all(0 <= r.z < 256 for r in rows)
    # z >> 4 is the Morton code of (a >> 2, b >> 2): aligned 4x4 tiles
    def morton2(a, b, bits):
        return sum(
            (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i))
            for i in range(bits)
        )

    for r in rows:
        assert (r.z >> 4) == morton2(r.a >> 2, r.b >> 2, 2)


# --------------------------------------------- snapshot action-log replay (r5)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_action_log_replay_matches_naive_accumulation(tmp_path_factory, data):
    """r5 manifest format: for ANY sequence of add/remove/legacy-full
    commits, snapshot(v) reconstructed through the memo/checkpoint/replay
    machinery must equal the naive in-Python accumulation of the same
    actions — at every historical version, from a cold instance, and
    after a mid-history checkpoint."""
    from cassabon_spark.sources.snapshot import SnapshotTable

    root = tmp_path_factory.mktemp("alog")
    t = SnapshotTable(spark=None, root=str(root))
    t.checkpoint_every = data.draw(st.integers(min_value=2, max_value=5))

    def entry(i):
        return {"path": f"p/{i:05d}.parquet", "partition": {}, "bytes": 1,
                "stats": {"rows": 1}}

    schema = {"type": "struct", "fields": []}
    naive: list[list[str]] = []  # per-version live path lists
    live: list[dict] = []
    next_id = 0
    parent = None
    n_commits = data.draw(st.integers(min_value=1, max_value=12))
    for _ in range(n_commits):
        kind = data.draw(st.sampled_from(["add", "remove", "mixed", "legacy"]))
        n_add = data.draw(st.integers(min_value=0, max_value=3))
        adds = [entry(next_id + j) for j in range(n_add)]
        next_id += n_add
        rm = []
        if kind in ("remove", "mixed") and live:
            rm = [f["path"] for f in data.draw(
                st.lists(st.sampled_from(live), max_size=2, unique_by=lambda f: f["path"])
            )]
        if kind == "legacy":
            live = [f for f in live if f["path"] not in rm] + adds
            parent = t._commit(parent, {"op": "append", "files": list(live),
                                        "schema": schema})
        else:
            live = [f for f in live if f["path"] not in rm] + adds
            parent = t._commit(parent, {"op": "append", "add": adds,
                                        "remove": rm, "schema": schema})
        naive.append([f["path"] for f in live])

    # warm instance, every version
    for v, expect in enumerate(naive):
        assert [f["path"] for f in t.snapshot(v)["files"]] == expect
    # cold instance (no memo), head and a random historical version
    cold = SnapshotTable(spark=None, root=str(root))
    cold.checkpoint_every = t.checkpoint_every
    assert [f["path"] for f in cold.snapshot()["files"]] == naive[-1]
    v = data.draw(st.integers(min_value=0, max_value=len(naive) - 1))
    assert [f["path"] for f in cold.snapshot(v)["files"]] == naive[v]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g0", "g1", "g2"]),
            st.integers(min_value=0, max_value=20),  # heavy ties
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_distributed_rank_prefix_ntile_equal_naive(spark, rows, n_buckets):
    """operators/rank.py invariants under arbitrary group/tie shapes: the
    distributed row_number, prefix sum, and reconstructed NTILE are
    row-for-row identical to the naive single-task window forms."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    from cassabon_spark.operators.rank import (
        distributed_prefix_sum,
        distributed_row_number,
        ntile_from_rank,
    )

    df = spark.createDataFrame(
        [(i, g, s, v) for i, (g, s, v) in enumerate(rows)],
        "id long, grp string, score long, val long",
    )
    order = [F.asc("score"), F.asc("id")]
    got = distributed_row_number(
        df, order, partition_cols=["grp"], rank_col="rnk", total_col="n"
    ).withColumn("bucket", ntile_from_rank("rnk", "n", n_buckets))
    naive_w = W.partitionBy("grp").orderBy(*order)
    naive = (
        df.withColumn("rnk", F.row_number().over(naive_w))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("grp")))
        .withColumn("bucket", F.ntile(n_buckets).over(naive_w))
    )
    g = {r.id: (r.rnk, r.n, r.bucket) for r in got.collect()}
    e = {r.id: (r.rnk, r.n, r.bucket) for r in naive.collect()}
    assert g == e

    got_ps = distributed_prefix_sum(
        df, [F.asc("id")], "val", partition_cols=["grp"], out_col="ps"
    )
    naive_ps = df.withColumn(
        "ps",
        F.sum("val").over(
            W.partitionBy("grp").orderBy("id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    assert {r.id: r.ps for r in got_ps.collect()} == {
        r.id: r.ps for r in naive_ps.collect()
    }
