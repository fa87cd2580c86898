"""Rollup configuration model: regex routing + windowed retention tiers.

Replicates the reference's config semantics (jeffpierce/cassabon):
  - methods: average | max | min | sum | last
    (reference: config/config_parser.go:331-343)
  - window:retention couplets like "10s:1h", windows >= 1s
    (config/config_parser.go:345-349)
  - every window must be an exact multiple of the shortest window of its
    expression (config/config_parser.go:401-434) — this is what makes coarse
    tiers derivable from the finest tier by re-aggregation
  - first-match-wins routing priority: longer regex first, equal length
    lexical, the literal catchall "default" last (config/util.go:18-46,
    config/config_parser.go:458)
  - invalid entries are rejected with a warning while the rest of the config
    is kept; a fully-invalid config falls back to the default rollup
    10s:1h + 1m:30d, average (config/config_parser.go:438-455)
  - tier id string encodes retention seconds: rollup_%09d
    (config/config_parser.go:286-288)

All of this is plain driver-side Python; the compiled artifact consumed by the
Spark plan is `routing_when_chain()` — a single Catalyst expression, so routing
constant-folds and stays inside whole-stage codegen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

METHODS = ("average", "max", "min", "sum", "last")

_DUR_UNITS = {
    "s": 1,
    "m": 60,
    "h": 3600,
    "d": 86400,
    "w": 604800,
    "y": 31536000,
}

_DUR_RE = re.compile(r"^(\d+)(s|m|h|d|w|y)$")


class ConfigError(ValueError):
    pass


def parse_duration_s(text: str) -> int:
    """'10s' -> 10, '1h' -> 3600. Raises ConfigError on junk ('10q', '15ms'<1s, '3z')."""
    m = _DUR_RE.match(text.strip())
    if not m:
        raise ConfigError(f"unparseable duration {text!r}")
    return int(m.group(1)) * _DUR_UNITS[m.group(2)]


@dataclass(frozen=True)
class RollupWindow:
    window_s: int
    retention_s: int

    @property
    def table(self) -> str:
        # reference: config/config_parser.go:286-288
        return f"rollup_{self.retention_s:09d}"


@dataclass
class RollupDef:
    expression: str  # anchored regex source, or the literal "default"
    method: str
    windows: list[RollupWindow] = field(default_factory=list)
    _compiled: re.Pattern | None = field(default=None, repr=False, compare=False)

    @property
    def is_default(self) -> bool:
        return self.expression == "default"

    @property
    def regex(self) -> re.Pattern:
        if self._compiled is None:
            object.__setattr__(self, "_compiled", re.compile(self.expression))
        return self._compiled

    @property
    def finest(self) -> RollupWindow:
        return min(self.windows, key=lambda w: w.window_s)


DEFAULT_ROLLUP = RollupDef(
    expression="default",
    method="average",
    windows=[RollupWindow(10, 3600), RollupWindow(60, 2592000)],
)  # reference fallback: config/config_parser.go:438-455


def _validate_def(expr: str, method: str, couplets: list[str]) -> RollupDef:
    method = method.lower().strip()
    if method not in METHODS:
        raise ConfigError(f"{expr!r}: invalid aggregation method {method!r}")
    if expr != "default":
        try:
            re.compile(expr)
        except re.error as e:
            raise ConfigError(f"{expr!r}: invalid regex: {e}") from e
    windows: list[RollupWindow] = []
    for c in couplets:
        parts = c.split(":")
        if len(parts) != 2:
            raise ConfigError(f"{expr!r}: malformed couplet {c!r} (want window:retention)")
        w, r = parse_duration_s(parts[0]), parse_duration_s(parts[1])
        if w < 1:
            raise ConfigError(f"{expr!r}: window {c!r} below 1s minimum")
        if r <= w:
            raise ConfigError(f"{expr!r}: retention must exceed window in {c!r}")
        windows.append(RollupWindow(w, r))
    if not windows:
        raise ConfigError(f"{expr!r}: no windows")
    if len({w.retention_s for w in windows}) != len(windows):
        raise ConfigError(f"{expr!r}: duplicate retention tiers")
    shortest = min(w.window_s for w in windows)
    for w in windows:
        if w.window_s % shortest != 0:
            # reference: config/config_parser.go:401-434
            raise ConfigError(
                f"{expr!r}: window {w.window_s}s is not a multiple of shortest {shortest}s"
            )
    windows.sort(key=lambda w: w.window_s)
    return RollupDef(expression=expr, method=method, windows=windows)


def _priority_key(expr: str) -> tuple:
    # longer regex first, same length lexical, "default" always last
    # reference: config/util.go:18-46
    if expr == "default":
        return (1, 0, "")
    return (0, -len(expr), expr)


@dataclass
class RollupConfig:
    rollups: list[RollupDef]  # priority-sorted, catchall last
    errors: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, raw: dict[str, dict]) -> "RollupConfig":
        """raw: {expression: {"method": str, "windows": ["6s:30m", ...]}}.

        Invalid entries are dropped (collected in .errors) and the rest kept;
        an empty valid set falls back to DEFAULT_ROLLUP — both per the
        reference's forgiving parse (config/config_parser.go:270-464).
        """
        defs: list[RollupDef] = []
        errors: list[str] = []
        for expr, spec in raw.items():
            try:
                defs.append(_validate_def(expr, spec.get("method", ""), list(spec.get("windows", []))))
            except ConfigError as e:
                errors.append(str(e))
        if not any(d.is_default for d in defs):
            defs.append(DEFAULT_ROLLUP)
        defs.sort(key=lambda d: _priority_key(d.expression))
        return cls(rollups=defs, errors=errors)

    @classmethod
    def from_yaml(cls, text_or_path: str) -> "RollupConfig":
        """Parse the reference's YAML config shape
        (config/cassabon.yaml.template:58-83, parsed at
        config/config_parser.go:270-324):

            rollups:
              ^foo.*:
                retention: ["6s:30m", "1m:30d"]
                aggregation: sum

        Accepts a path or a YAML string; a document without a top-level
        `rollups` key is treated as the rollups mapping itself. Field names
        map retention->windows, aggregation->method onto from_dict.
        """
        import os

        import yaml

        if os.path.exists(text_or_path):
            with open(text_or_path) as f:
                doc = yaml.safe_load(f)
        else:
            doc = yaml.safe_load(text_or_path)
        doc = doc or {}
        rollups = doc.get("rollups", doc) or {}
        raw = {
            expr: {
                "method": (spec or {}).get("aggregation", ""),
                "windows": list((spec or {}).get("retention", [])),
            }
            for expr, spec in rollups.items()
        }
        return cls.from_dict(raw)

    def route(self, path: str) -> RollupDef:
        """First-match-wins routing (reference: datastore/metricstore.go:11-22)."""
        for d in self.rollups:
            if d.is_default or d.regex.search(path):
                return d
        return self.rollups[-1]

    def routing_when_chain(self):
        """Compile routing into one Catalyst expression:
        F.when(path rlike e1, e1).when(...).otherwise('default').

        Priority order is preserved by when-chain order; Catalyst constant-folds
        the literal patterns, so this is pure JVM-side regex — no Python UDF.
        """
        from pyspark.sql import functions as F

        expr = None
        for d in self.rollups:
            if d.is_default:
                continue
            cond = F.col("path").rlike(d.expression)
            expr = F.when(cond, F.lit(d.expression)) if expr is None else expr.when(cond, F.lit(d.expression))
        if expr is None:
            return F.lit("default")
        return expr.otherwise(F.lit("default"))

    def by_expression(self, expr: str) -> RollupDef:
        for d in self.rollups:
            if d.expression == expr:
                return d
        raise KeyError(expr)

    def tiers(self) -> list[int]:
        return sorted({w.window_s for d in self.rollups for w in d.windows})

    def select_tier(self, expr: str, from_s: int, now_s: int) -> RollupWindow:
        """Read-time tier pruning: the first (finest) window whose retention
        still covers `now - from` (reference: datastore/metricquery.go:102-121).
        Falls back to the coarsest tier when the range is older than everything.
        """
        d = self.by_expression(expr)
        delta = now_s - from_s
        for w in d.windows:  # sorted finest-first
            if delta < w.retention_s:
                return w
        return d.windows[-1]


# The template config from the reference, used by tests
# (reference: config/cassabon.yaml.template:58-107).
TEMPLATE_CONFIG = RollupConfig.from_dict(
    {
        r"^foo\..*\.average$": {"method": "average", "windows": ["6s:30m", "1m:30d", "1h:1y"]},
        r"^foo\..*\.max$": {"method": "max", "windows": ["6s:30m", "1m:30d", "1h:1y"]},
        r"^foo\..*\.min$": {"method": "min", "windows": ["6s:30m", "1m:30d", "1h:1y"]},
        r"^foo\..*\.sum$": {"method": "sum", "windows": ["6s:30m", "1m:30d", "1h:1y"]},
        r"^foo\..*": {"method": "sum", "windows": ["6s:30m", "1m:30d", "1h:1y"]},
        r"^bar\.baz\..*": {"method": "last", "windows": ["10s:1h", "1m:30d"]},
        r"^bar\..*": {"method": "max", "windows": ["10s:1h", "1m:30d"]},
        "default": {"method": "average", "windows": ["15s:1d", "1h:30d"]},
    }
)
