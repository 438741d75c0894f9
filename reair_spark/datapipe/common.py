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
    would produce fewer partitions than cores.

    Small single-row-group parquet files scan as ONE partition, which
    serializes the per-row compute these operators do (shingling,
    hashing, regex) onto one core. At 100 TB the scan is naturally
    wide and this is a no-op.

    The width estimate comes from the scan relation's plan statistics
    (sizeInBytes / files.maxPartitionBytes) — pure metadata already on
    the driver. The old form asked ``df.rdd.getNumPartitions()``,
    which forces plan→RDD materialization per query just to read a
    number the optimizer already knows.
    """
    spark = spark or df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        size_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        max_split = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20))
        )
    except Exception:
        return df.repartition(target)
    est_parts = max(1, -(-size_bytes // max_split))
    if est_parts < target:
        return df.repartition(target)
    return df


_BYTE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    s = str(v).strip().lower()
    for suf in ("kb", "mb", "gb", "tb", "k", "m", "g", "t", "b"):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * _BYTE_SUFFIX[suf[0]])
    return int(s)


def portable_hash32(col: Column) -> Column:
    """32-bit hash identical across Spark and DuckDB (md5-hex prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str) -> str:
    """DuckDB rendering of :func:`portable_hash32`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"


def seeded_hash(seed: int, col: Column) -> Column:
    """Seed-s member of a portable hash family (one md5 PER SEED —
    prefer :func:`hash_family_ab` + :func:`derived_hash` for k-member
    families; this remains for single-seed uses)."""
    return portable_hash32(F.concat(F.lit(f"{seed}:"), col))


def seeded_hash_sql(seed: int, expr: str) -> str:
    return portable_hash32_sql(f"concat('{seed}:', {expr})")


# One-md5 k-member hash family (Broder's derived permutations):
# md5 gives 128 bits; words a = bits[0:32], b = bits[32:64] feed the
# 2-universal family h_s = (a + s*b) mod P32. ONE md5 per input row
# replaces k of them — at 100 TB the hash is the dominant per-row cost
# of MinHash, so this is a k-fold cut on the hot path. Both operands
# are < 2^32 and s < ~2^6, so a + s*b < 2^39: exact in BIGINT/long in
# both engines, and both engines' % on non-negative values agree.
P32 = 4294967291  # largest prime < 2^32


def hash_family_ab(md5_col: Column) -> tuple[Column, Column]:
    """(a, b) words of the derived family, given a column ALREADY
    holding the md5 hex (materialize ``F.md5(x)`` in a prior select so
    it is computed exactly once per row)."""
    a = F.conv(F.substring(md5_col, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(md5_col, 9, 8), 16, 10).cast("long")
    return a, b


def derived_hash(a: Column, b: Column, seed: int) -> Column:
    """Seed-s member of the derived family: (a + s*b) mod P32."""
    return (a + F.lit(seed) * b) % F.lit(P32)


def hash_family_ab_sql(expr: str) -> tuple[str, str]:
    """DuckDB rendering of :func:`hash_family_ab` over ``md5(expr)``.

    Returns SQL for (a, b) given ``expr`` names a column holding the
    md5 hex string.
    """
    a = f"CAST(concat('0x', substr({expr}, 1, 8)) AS BIGINT)"
    b = f"CAST(concat('0x', substr({expr}, 9, 8)) AS BIGINT)"
    return a, b


def derived_hash_sql(a_expr: str, b_expr: str, seed: int) -> str:
    return f"(({a_expr}) + {seed} * ({b_expr})) % {P32}"


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


def word_bigrams(tok: Column) -> Column:
    """Adjacent-word bigrams of a token-array column, via zip_with
    over two slices so the tokenization is evaluated ONCE per row —
    the transform(sequence(...), i -> element_at(split(text), i))
    formulation re-evaluates the split per element (O(n²) per doc:
    lambda bodies sit outside whole-stage subexpression elimination).
    Single-token rows yield [token], matching concat_ws's null-skip
    in the index formulation (and the DuckDB oracles' range form)."""
    n = F.size(tok)
    z = F.zip_with(
        F.slice(tok, 1, n - 1),
        F.slice(tok, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(n >= 2, z).otherwise(F.slice(tok, 1, 1))


def round_like_duckdb(c: Column, digits: int = 4) -> Column:
    """Round a DOUBLE exactly the way DuckDB's round() does:
    sign(x)·floor(|x|·10^d + 0.5)/10^d (float-multiply, half away from
    zero). Spark's F.round goes through BigDecimal of the EXACT binary
    double, so the two disagree on tie-prone rationals (e.g. weights
    k/1000: F.round saw …249999… and emitted -0.0562 where DuckDB's
    multiply landed on -562.5 → -0.0563 — a real engine mismatch at
    sf0.001). Verified equal to DuckDB round over 21k signed samples
    including the tie-prone classes. Use for oracle-compared DOUBLE
    outputs whose values can sit on decimal ties; plain F.round is
    fine for DECIMAL arithmetic and irrational-valued scores."""
    p = 10.0 ** digits
    return F.signum(c) * F.floor(F.abs(c) * p + F.lit(0.5)) / p


def dot(x: Column, y: Column) -> Column:
    """Dot product of two array<double> columns, fully JVM-side
    (zip_with product + aggregate fold; sequential sum matches DuckDB's
    list evaluation order)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def unit_norm(a: Column) -> Column:
    """L2-normalize an array<double> column. Pre-normalizing a corpus
    ONCE turns every later cosine into a single dot fold (1/3 the
    per-pair work) — the lever behind kmeans_fit and semdedup.

    An all-zero vector normalizes to itself (norm coerced to 1) instead
    of NaN — the same guard kmeans_fit's Python-side centroid
    normalization applies (`or 1.0`), so zero vectors flow through dot
    products as sim=0 rather than poisoning every downstream argmax."""
    nrm = F.sqrt(dot(a, a))
    nrm = F.when(nrm == 0.0, F.lit(1.0)).otherwise(nrm)
    return F.transform(a, lambda x: x / nrm)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, fully JVM-side
    (zip_with product + aggregate fold; sequential sum matches DuckDB's
    list_cosine_similarity evaluation order)."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
