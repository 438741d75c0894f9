"""Shared building blocks for the data-pipeline operators.

The cross-engine portable hash is the key enabler for DuckDB-checkable
dedup/LSH operators: both Spark and DuckDB compute md5 identically, so
``int(md5(s)[:8], 16)`` is a deterministic 32-bit hash either engine
can reproduce (Spark's xxhash64/hash and DuckDB's hash() differ).

Everything here is built-in-function composition — JVM-side in Spark
(whole-stage codegen), no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def widen(df, spark=None):
    """Repartition up to the default parallelism when the source scan
    produced fewer partitions than cores.

    Small single-row-group parquet files scan as ONE partition, which
    serializes the per-row compute these operators do (shingling,
    hashing, regex) onto one core. At 100 TB the scan is naturally
    wide and this is a no-op — the check costs nothing and never
    shrinks a wide input.
    """
    spark = spark or df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def portable_hash32(col: Column) -> Column:
    """32-bit hash identical across Spark and DuckDB (md5-hex prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str) -> str:
    """DuckDB rendering of :func:`portable_hash32`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"


def seeded_hash(seed: int, col: Column) -> Column:
    """Seed-s member of a portable hash family."""
    return portable_hash32(F.concat(F.lit(f"{seed}:"), col))


def seeded_hash_sql(seed: int, expr: str) -> str:
    return portable_hash32_sql(f"concat('{seed}:', {expr})")


def tokens(col: Column) -> Column:
    """Whitespace tokens (documents.text is single-space separated)."""
    return F.split(col, " ")


def word_shingles(tok: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array column.

    transform(sequence(...)) keeps the whole computation inside
    whole-stage codegen — no explode needed until aggregation time.
    """
    n = F.size(tok)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.array_distinct(gram)


def word_shingles_sql(tok_name: str = "t", k: int = 3) -> str:
    """DuckDB rendering of :func:`word_shingles`.

    ``tok_name`` must be a plain column name holding the token list
    (1-based indexing; ``range`` has an exclusive stop, so the stop of
    ``len - (k-2)`` matches Spark's inclusive ``n - (k-1)``).
    """
    parts = " || ' ' || ".join(f"{tok_name}[i+{j}]" for j in range(k))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({tok_name}) - {k - 2}, 2)), i -> {parts}))"
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, fully JVM-side
    (zip_with product + aggregate fold; sequential sum matches DuckDB's
    list_cosine_similarity evaluation order)."""
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
