"""Physical layout helpers: Z-order (Morton) clustering keys.

Z-ordering interleaves the bits of several rank-bucketed sort dimensions so
that sorting by the single z key keeps EVERY dimension locally bounded —
the multi-column file-skipping layout (Delta/Iceberg `OPTIMIZE ZORDER BY`):
after clustering, per-file min/max ranges are narrow on all z dimensions at
once, so predicates on any of them prune files. A plain 1-D sort bounds
only its own column.

All pure Catalyst bit arithmetic (shiftleft/shiftright/bitwiseAND) —
portable to the DuckDB oracle via `(x >> i) & 1` / `<<`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def linear_bucket_expr(v: Column, mn: Column, mx: Column, bits: int = 8) -> Column:
    """Rank-bucket a value against a [mn, mx] envelope to 2^bits levels
    (clamped; degenerate mn == mx maps to 0). The envelope is a tiny
    global aggregate broadcast to the scan — at 100 TB use a sampled or
    sketched envelope instead; the interleave below is unchanged."""
    levels = 1 << bits
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(
            F.least(
                F.lit(levels - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((v.cast("double") - mn) / (mx - mn) * levels).cast("int"),
                ),
            )
        )
        .cast("long")
    )


def zorder_key_expr(bucketed: list[Column], bits: int = 8) -> Column:
    """Morton interleave of pre-bucketed integer columns (each in
    [0, 2^bits)): bit i of column c lands at output bit i*len + (len-1-c).
    With 2 columns at 8 bits this is the classic 16-bit z curve."""
    n = len(bucketed)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for c, col in enumerate(bucketed):
            out_bit = i * n + (n - 1 - c)
            z = z + F.shiftleft(
                F.shiftrightunsigned(col.cast("long"), i).bitwiseAND(F.lit(1)),
                out_bit,
            )
    return z


def zorder_sql(cols: list[str], bits: int = 8) -> str:
    """DuckDB mirror of zorder_key_expr over pre-bucketed column names."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for c, col in enumerate(cols):
            out_bit = i * n + (n - 1 - c)
            terms.append(f"((({col} >> {i}) & 1) << {out_bit})")
    return " + ".join(terms)
