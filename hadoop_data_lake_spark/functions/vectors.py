"""Vector math over `array<float>` embedding columns — JVM-side only.

Dot product / norm / cosine are expressed with higher-order functions
(zip_with + aggregate), which run inside Catalyst — no Python worker hop, no
Arrow transfer. Elements are cast to double *before* accumulation so the
accumulation is IEEE-double left-to-right in array order: deterministic and
reproducible by the DuckDB oracle with the same element order.

For 100 TB similarity search these scalar kernels are the inner loop of the
brute-force baseline; the scale path (LSH / IVF bucketing in
operators/similarity.py) bounds how many pairs ever reach them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero (never NaN/null)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


# --- DuckDB-oracle SQL fragments (identical accumulation order) -----------

def dot_sql(a: str, b: str) -> str:
    """DuckDB fragment: left-to-right double dot product (list_reduce keeps
    list order, matching Spark's aggregate())."""
    return (
        f"list_reduce(list_prepend((0.0)::double, "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::double * {b}[i]::double)), (acc, x) -> acc + x)"
    )


def cosine_sql(a: str, b: str) -> str:
    d = dot_sql(a, b)
    na = f"sqrt({dot_sql(a, a)})"
    nb = f"sqrt({dot_sql(b, b)})"
    return f"(case when {na} > 0 and {nb} > 0 then {d} / ({na} * {nb}) else 0.0 end)"
