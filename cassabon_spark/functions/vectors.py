"""Vector math over ARRAY<FLOAT> embedding columns — all built-in Catalyst
higher-order functions (zip_with / aggregate), no Python in the hot path.

Everything computes in DOUBLE regardless of the storage element type so
results are deterministic and oracle-comparable (DuckDB list functions also
compute in double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a, b) -> Column:
    """Σ a[i]*b[i] via zip_with + aggregate (JVM-side, vectorizable)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_expr(a) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_sim_expr(a, b) -> Column:
    """Cosine similarity = dot/(||a||*||b||), matching DuckDB's
    list_cosine_similarity term order."""
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))

