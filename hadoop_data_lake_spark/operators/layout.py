"""Data-layout clustering: Z-order (Morton) codes for multi-dimensional
data skipping.

A sort on one column gives parquet min/max pruning on that column only.
Interleaving the bits of two quantized dimensions into one Morton code and
range-partitioning + sorting on it clusters rows so that EVERY file covers a
small rectangle of the (a, b) space — per-file min/max footers then prune
scans filtered on either or both dimensions. This is the standard lakehouse
layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) built from primitives
Spark already has: pure bit arithmetic (whole-stage codegen, no UDF),
repartitionByRange, sortWithinPartitions.

The bit-spread uses the classic shift-and-mask sequence; inputs must be
quantized to at most 31 bits so the interleaved code never reaches the sign
bit of a 64-bit long (which would invert the order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits(col: Column) -> Column:
    """Spread the low 32 bits of `col` onto the even bit positions 0,2,..,62."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD_MASKS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_code(a: Column, b: Column) -> Column:
    """64-bit Morton (Z-order) code of two non-negative <=31-bit ints:
    bits of `a` on even positions, bits of `b` on odd."""
    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))


def spread_bits_sql(expr: str) -> str:
    """DuckDB SQL equivalent of `spread_bits` (same shift/mask pipeline)."""
    x = f"({expr} & 4294967295)"
    for shift, mask in _SPREAD_MASKS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def morton_code_sql(a: str, b: str) -> str:
    return f"({spread_bits_sql(a)} | ({spread_bits_sql(b)} << 1))"


def zorder_write(
    df: DataFrame,
    a: Column,
    b: Column,
    path: str,
    num_files: int = 16,
) -> None:
    """Write `df` as `num_files` parquet files clustered by the Morton code
    of (a, b): range-partition on the code (balanced files via sampled range
    bounds), sort within each partition (tight per-row-group min/max), one
    file per partition. Quantize a and b BEFORE calling (<=31 bits each)."""
    z = morton_code(a, b).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def collect_file_stats(spark, root: str, cols: list[str]) -> DataFrame:
    """Per-file min/max footer stats for `cols` — the data-skipping index
    zorder_write lays files out for. One distributed scan builds it;
    output is one row per file (tiny — persist it next to the dataset).
    This is what Delta/Iceberg keep in their metadata layer, built from
    primitives: input_file_name + groupBy."""
    df = spark.read.parquet(root).select(
        F.input_file_name().alias("file"), *cols
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy("file").agg(*aggs)


def prune_files(stats: DataFrame, bounds: dict[str, tuple]) -> list[str]:
    """Files whose [min, max] ranges overlap every queried bound — the
    candidate list a skipping scan reads. `stats` has one row per file, so
    this driver-side filter is O(#files), not O(rows)."""
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        cond = cond & (F.col(f"{c}_max") >= F.lit(lo)) & (F.col(f"{c}_min") <= F.lit(hi))
    return [r["file"] for r in stats.where(cond).select("file").collect()]


def read_skipping(spark, root: str, stats: DataFrame, bounds: dict[str, tuple]) -> DataFrame:
    """Scan only the files that can contain rows in `bounds`, then apply
    the residual row filter. Semantically identical to a full scan +
    filter; IO is proportional to the matched files."""
    files = prune_files(stats, bounds)
    if not files:
        df = spark.read.parquet(root)
        return df.where(F.lit(False))
    df = spark.read.parquet(*files)
    for c, (lo, hi) in bounds.items():
        df = df.where((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)))
    return df


def hilbert_xy2d(x: int, y: int, bits: int = 16) -> int:
    """Serial reference Hilbert distance (Wikipedia xy2d): the pytest oracle
    for the distributed column version below."""
    n1 = (1 << bits) - 1
    d = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n1 - x, n1 - y
            x, y = y, x
    return d


def with_hilbert_code(
    df: DataFrame, a: Column, b: Column, out: str = "hcode", bits: int = 16
) -> DataFrame:
    """Append the Hilbert-curve distance of two quantized <=`bits`-bit
    dimensions — the locality-superior alternative to Morton codes for
    layout clustering (a Hilbert walk never makes the long diagonal jumps
    Z-order takes at quadrant boundaries, so per-file bounding rectangles
    are tighter and data skipping prunes more).

    Returns a DataFrame (not a Column) deliberately: the xy2d recurrence
    rewrites (x, y) at every bit level with each referenced twice, so a
    single inlined Column expression grows ~4^bits nodes (the janino 64 KB
    trap). Materializing each level as NAMED projection columns keeps the
    plan linear in `bits` — Spark's CollapseProject declines to inline
    multi-referenced non-cheap expressions, so the 16 stacked projections
    survive into one codegen stage of linear size. Pure JVM bit arithmetic;
    no UDF."""
    n1 = (1 << bits) - 1
    res = df.withColumn("__hx", a.cast("long")).withColumn(
        "__hy", b.cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        rx = F.shiftright("__hx", i).bitwiseAND(F.lit(1))
        ry = F.shiftright("__hy", i).bitwiseAND(F.lit(1))
        res = (
            res.withColumn(
                out,
                F.col(out) + F.lit(1 << (2 * i)) * (rx * F.lit(3)).bitwiseXOR(ry),
            )
            .withColumn(
                "__hx2",
                F.when(ry == F.lit(1), F.col("__hx")).otherwise(
                    F.when(rx == F.lit(1), F.lit(n1) - F.col("__hy")).otherwise(
                        F.col("__hy")
                    )
                ),
            )
            .withColumn(
                "__hy2",
                F.when(ry == F.lit(1), F.col("__hy")).otherwise(
                    F.when(rx == F.lit(1), F.lit(n1) - F.col("__hx")).otherwise(
                        F.col("__hx")
                    )
                ),
            )
            .withColumn("__hx", F.col("__hx2"))
            .withColumn("__hy", F.col("__hy2"))
            .drop("__hx2", "__hy2")
        )
    return res.drop("__hx", "__hy")


def hilbert_sql_ctes(src: str, keep: str, x: str, y: str, bits: int = 16) -> str:
    """DuckDB replay of `with_hilbert_code`: one chained CTE per bit level
    (named columns keep the SQL linear in `bits`, the same trick as the
    stacked projections). `src` is the input CTE exposing `keep` columns
    plus quantized `x`/`y`; the final CTE is named h0 with columns
    (keep..., d)."""
    n1 = (1 << bits) - 1
    prev = src
    parts = []
    for i in range(bits - 1, -1, -1):
        xi, yi = ("x", "y") if prev != src else (x, y)
        di = "d" if prev != src else "0::BIGINT"
        parts.append(f"""h{i} AS (
  SELECT {keep},
    CASE WHEN (({yi} >> {i}) & 1) = 1 THEN {xi}
         WHEN (({xi} >> {i}) & 1) = 1 THEN {n1} - {yi} ELSE {yi} END AS x,
    CASE WHEN (({yi} >> {i}) & 1) = 1 THEN {yi}
         WHEN (({xi} >> {i}) & 1) = 1 THEN {n1} - {xi} ELSE {xi} END AS y,
    {di} + {1 << (2 * i)} * xor(3 * (({xi} >> {i}) & 1), ({yi} >> {i}) & 1) AS d
  FROM {prev}
)""")
        prev = f"h{i}"
    return ",\n".join(parts)
