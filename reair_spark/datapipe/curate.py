"""Dataset-curation operators: the selection/packaging half of a
training-data pipeline (the reference stops at replication; these are
the ops a 100 TB corpus needs between "replicated" and "trainable").

- stratified sampling: deterministic hash-threshold per stratum — no
  rand(), so the sample is reproducible across runs/engines and
  re-executable on a changed cluster (same property the portable
  md5 hash family gives the dedup ops).
- decontamination: n-gram overlap between the train split and a held-
  out eval split, the standard train/test-leakage check. The eval side
  is tiny → broadcast; the train side streams through one shuffle-free
  map + one broadcast-hash join, which is the only shape that survives
  100 TB (shuffling train-side shingles would not).
- sequence packing: concat-and-chunk into fixed context windows via a
  window cumsum — the deterministic equivalent of greedy packing, one
  shuffle on the stratum key.
- PII masking: pseudonymize identifiers (md5), mask digit runs except
  a suffix — pure built-ins, trivially vectorized.

All four are DuckDB-oracle-checkable (queries() + oracle_sql()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reair_spark.datapipe.common import portable_hash32, portable_hash32_sql, widen
from reair_spark.io import load_table as _t

# per-language keep-rate (percent) — en-heavy corpora downsample the
# head language; rates are data, not code, in a real pipeline
SAMPLE_RATES = {"en": 30, "de": 80, "es": 80, "fr": 80, "zh": 80}
DECON_SHINGLE_K = 3  # tiny synthetic vocabulary ≈ 13-gram on web text
DECON_MIN_OVERLAP = 3
PACK_CTX = 128  # tokens per packed context window


def _sample_hash(doc_id_col):
    return portable_hash32(F.concat(F.lit("sample:"), doc_id_col.cast("string"))) % 100


def curate_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language deterministic sample: keep doc iff
    md5-hash(doc_id) mod 100 < rate(lang). Equivalent to sampleBy()
    but reproducible byte-for-byte on any engine; selection is a
    map-only predicate, so it pushes into the scan and never shuffles."""
    d = _t(spark, sf, "documents")
    rate_expr = None
    for lang, r in SAMPLE_RATES.items():
        rate_expr = (
            F.when(F.col("lang") == lang, r)
            if rate_expr is None
            else rate_expr.when(F.col("lang") == lang, r)
        )
    rate = rate_expr.otherwise(0)
    return (
        d.where(_sample_hash(F.col("doc_id")) < rate)
        .select("doc_id", "lang", _sample_hash(F.col("doc_id")).alias("bucket"))
    )


def _sample_hash_sql() -> str:
    return (
        portable_hash32_sql("concat('sample:', CAST(doc_id AS VARCHAR))") + " % 100"
    )


def _sample_rate_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE 0 END"


def curate_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Train/eval overlap: eval split = doc_id % 97 == 0 (a stand-in
    for a benchmark set); a train doc is contaminated when it shares
    ≥ DECON_MIN_OVERLAP distinct word-k-grams with ANY eval doc.

    Plan shape for scale: eval shingles are tiny → F.broadcast; the
    train side is map + broadcast-join + partial agg — the 100 TB
    train corpus is never shuffled, only the (doc_id, n) partial
    counts are."""
    from reair_spark.datapipe.common import word_shingles

    d = widen(_t(spark, sf, "documents"), spark)
    grams = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.explode(word_shingles(F.split("text", " "), k=DECON_SHINGLE_K)).alias("g"),
    )
    ev = grams(d.where(F.col("doc_id") % 97 == 0)).select(
        F.col("g").alias("eg")
    ).distinct()
    tr = grams(d.where(F.col("doc_id") % 97 != 0))
    return (
        tr.join(F.broadcast(ev), tr.g == ev.eg)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= DECON_MIN_OVERLAP)
        .select("doc_id", F.col("n_shared").cast("long").alias("n_shared"))
    )


PACK_CHUNK = 4096  # rows of the order key per cumsum chunk


# chunked_running_sum moved to reair_spark.operators (round 3): the
# compaction planner needs the same two-level cumsum, and a generic
# window-decomposition operator belongs in the operator library.
# Re-exported here because round-2 docs/tests reference this path.
from reair_spark.operators import chunked_running_sum  # noqa: E402,F401


def curate_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk packing: docs ordered by doc_id within each
    language are concatenated and cut into PACK_CTX-token windows; a
    doc's bin is the window its first token lands in. The running token
    sum uses :func:`chunked_running_sum` over (lang, doc_id-range
    chunks), so parallelism scales with corpus size instead of being
    capped at the language count. Emits per-bin occupancy, the
    packing-efficiency metric."""
    d = _t(spark, sf, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
    )
    binned = chunked_running_sum(
        toks,
        ["lang"],
        F.floor(F.col("doc_id") / PACK_CHUNK),
        ["doc_id"],
        "n_tok",
        "cum_tok",
    ).withColumn(
        "bin", F.floor((F.col("cum_tok") - F.col("n_tok")) / PACK_CTX).cast("long")
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
        )
    )


TOKEN_BUDGET = 400  # tokens per source


def curate_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget selection: each source contributes its best
    documents until a per-source token budget is exhausted — the data-
    mixing step that turns corpus weights into an actual document
    pick. 'Best' here is (longest, then doc_id) as the deterministic
    quality proxy; a production run substitutes its quality score in
    the ORDER BY and nothing else changes.

    The per-source running sum uses :func:`chunked_running_sum` with
    descending n_chars range buckets as the chunk key (ties share a
    bucket, so the key is monotone along the sort) — parallelism
    scales with corpus size, not source count."""
    d = _t(spark, sf, "documents")
    toks = d.select(
        "doc_id", "source", "n_chars",
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    # -floor(n_chars/64): ascending chunk order == descending n_chars
    chunk = -F.floor(F.col("n_chars") / 64)
    return (
        chunked_running_sum(
            toks, ["source"], chunk, [F.desc("n_chars"), "doc_id"],
            "n_tok", "cum_raw",
        )
        .withColumn("cum_tok", F.col("cum_raw").cast("long"))
        .where(F.col("cum_tok") <= TOKEN_BUDGET)
        .select("source", "doc_id", F.col("n_tok").cast("long").alias("n_tok"),
                "cum_tok")
    )


def curate_pii_mask(spark: SparkSession, sf: str) -> DataFrame:
    """PII-style masking over customer identities: stable pseudonym
    (md5 of the identifier), digit runs masked except the last 4.
    Built-in regexp functions only — vectorized JVM-side, no UDF."""
    c = _t(spark, sf, "customer")
    digits = F.regexp_extract(F.col("c_name"), r"([0-9]+)$", 1)
    keep4 = F.substring(digits, -4, 4)
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.md5(F.col("c_name")).alias("pseudonym"),
        F.concat(
            F.regexp_replace(F.regexp_replace("c_name", r"[0-9]+$", ""), r"[0-9]", "*"),
            F.lit("****"),
            keep4,
        ).alias("masked_name"),
    )


def curate_pipeline(
    spark: SparkSession,
    sf: str,
    work_dir: str | None = None,
    pack_chunk: int = PACK_CHUNK,
) -> DataFrame:
    """The canonical corpus-curation DAG as ONE composed DataFrame
    program: quality filter → exact-dedup keep-list → stratified
    sample → sequence packing, reporting per-language yield (docs,
    bins, tokens). Each stage is the already-gated operator logic;
    composing them declaratively lets Catalyst pipeline the map-only
    stages (filter, dedup hash, sample predicate are ONE codegen stage
    over the scan) and keeps the only shuffles at the dedup groupBy
    and the pack window — the same plan a 100 TB curation run wants.

    ``work_dir``: the production path (VERDICT r3 #5). When set, the
    stage-3 output (the narrow (doc_id, lang, n_tok) survivor set) is
    materialized to parquet there and stage 4 packs with
    :func:`chunked_running_sum` — window-key cardinality scales with
    the corpus (languages × doc_id ranges), not the language count.
    When unset (the oracle-gate default), stage 4 keeps the per-lang
    window: the chunked form forks the plan and Spark would recompute
    the un-materialized dedup branch once per fork — a full extra
    corpus pass that costs more than the stratum-width window saves.
    Same result either way (integer cumsum is associative; identical
    oracle hash, asserted in tests/test_curate.py)."""
    from pyspark.sql import Window as W

    d = _t(spark, sf, "documents")
    tok = F.split("text", " ")

    # stage 1: quality (inline the filter's keep predicate)
    from reair_spark.datapipe.common import word_bigrams

    n_words = F.size(tok)
    grams2 = word_bigrams(tok)
    dup2 = 1.0 - F.size(F.array_distinct(grams2)) / F.size(grams2).cast("double")
    alpha = F.regexp_count(F.col("text"), F.lit("[a-zA-Z]")) / F.length(
        "text"
    ).cast("double")
    quality_ok = (
        (n_words >= 10) & (n_words <= 1000) & (dup2 <= 0.60) & (alpha >= 0.60)
    )
    kept = d.where(quality_ok)

    # stage 2: exact dedup — canonical fingerprint, min doc_id survives
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tok)))
    fp = kept.select("doc_id", "lang", F.size(tok).alias("n_tok"), F.md5(canon).alias("fp"))
    wdup = W.partitionBy("fp").orderBy("doc_id")
    surv = fp.withColumn("rn", F.row_number().over(wdup)).where(F.col("rn") == 1)

    # stage 3: deterministic stratified sample
    rate_expr = None
    for lang, r in SAMPLE_RATES.items():
        rate_expr = (
            F.when(F.col("lang") == lang, r)
            if rate_expr is None
            else rate_expr.when(F.col("lang") == lang, r)
        )
    sampled = surv.where(_sample_hash(F.col("doc_id")) < rate_expr.otherwise(0))

    # stage 4: pack into PACK_CTX-token windows per language (see the
    # work_dir paragraph in the docstring for why the default keeps
    # the per-lang window while the materialized path goes chunked).
    if work_dir is not None:
        path = f"{work_dir}/curate_stage3_survivors"
        sampled.select("doc_id", "lang", "n_tok").write.mode(
            "overwrite"
        ).parquet(path)
        sampled = spark.read.parquet(path)
        binned = chunked_running_sum(
            sampled,
            ["lang"],
            F.floor(F.col("doc_id") / pack_chunk),
            ["doc_id"],
            "n_tok",
            "cum_tok",
            materialize=False,  # input is the parquet we just wrote
        ).withColumn(
            "bin", F.floor((F.col("cum_tok") - F.col("n_tok")) / PACK_CTX)
        )
    else:
        wp = W.partitionBy("lang").orderBy("doc_id")
        binned = sampled.withColumn(
            "bin", F.floor((F.sum("n_tok").over(wp) - F.col("n_tok")) / PACK_CTX)
        )
    return binned.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("bin").cast("long").alias("n_bins"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )


N_SHARDS = 16


def curate_shard_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic shard assignment + manifest — the export step a
    training run reads: every doc lands in portable_hash(doc_id) mod
    N_SHARDS (stable across engines, reruns, and cluster sizes — no
    round-robin, no rand()), and the manifest reports per-shard doc /
    token / byte totals plus an order-independent content digest
    (bit_xor of per-doc content hashes), which is how a loader
    verifies a shard set without re-reading payloads. One map-side-
    combined aggregation; the actual shard write is
    `sources.write_partitioned(df.withColumn('shard', ...),
    partition_cols=['shard'])` — same expression, zero extra
    shuffle beyond the write's own partitioning."""
    d = widen(_t(spark, sf, "documents"), spark)
    shard = portable_hash32(F.col("doc_id").cast("string")) % N_SHARDS
    return (
        d.select(
            shard.alias("shard"),
            F.size(F.split("text", " ")).alias("n_tok"),
            F.length("text").alias("n_chars"),
            portable_hash32(F.col("text")).alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
            F.expr("bit_xor(h)").cast("long").alias("content_digest"),
        )
        .orderBy("shard")
    )


# per-language epoch weights for the mixing step: >1 upsamples
# (repeat the doc across epochs), <1 downsamples. Fractional parts
# resolve per-document via the portable hash, so the realized mix
# converges to the weights without any RNG.
MIX_EPOCHS = {"en": 1.0, "de": 2.5, "es": 2.0, "fr": 0.5, "zh": 1.25}


def curate_mix_epochs(spark: SparkSession, sf: str) -> DataFrame:
    """Epoch-weighted corpus mixing (the standard LLM data-recipe step
    that turns "web×1, books×2.5" weights into an actual replicated
    document stream): each doc repeats floor(w) times, plus one more
    epoch iff hash(doc_id) mod 100 < 100·frac(w) — deterministic
    fractional upsampling, and w<1 becomes plain downsampling.

    Scale shape: repeat-count is a map-side expression and the
    replication is one `explode(sequence(...))` — no shuffle, no RNG,
    and the output inherits the input's partitioning with a bounded
    ≤⌈max(w)⌉× row amplification. Emits (doc_id, lang, epoch) with
    epoch 1..n so downstream shuffles can salt on it."""
    d = _t(spark, sf, "documents")
    w = None
    for lang, wt in MIX_EPOCHS.items():
        w = F.when(F.col("lang") == lang, wt) if w is None else w.when(
            F.col("lang") == lang, wt
        )
    w = w.otherwise(1.0)
    frac_hash = portable_hash32(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
    ) % 100
    n_rep = (
        F.floor(w).cast("int")
        + (frac_hash < F.round((w - F.floor(w)) * 100)).cast("int")
    )
    return (
        d.select("doc_id", "lang", n_rep.alias("n_rep"))
        .where(F.col("n_rep") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("n_rep"))).alias("epoch"),
        )
    )


def _mix_epochs_sql() -> str:
    from reair_spark.datapipe.common import portable_hash32_sql

    whens = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in MIX_EPOCHS.items())
    h = portable_hash32_sql("concat('mix:', CAST(doc_id AS VARCHAR))") + " % 100"
    return f"""
WITH w AS (
  SELECT doc_id, lang, CASE {whens} ELSE 1.0 END AS wt FROM documents
),
r AS (
  SELECT doc_id, lang,
         CAST(floor(wt) AS INT)
           + CASE WHEN {h} < round((wt - floor(wt)) * 100) THEN 1 ELSE 0 END
           AS n_rep
  FROM w
)
SELECT doc_id, lang, CAST(unnest(range(1, n_rep + 1)) AS INT) AS epoch
FROM r WHERE n_rep > 0
"""


# integer ticket counts per language for weighted sampling: a doc with
# w tickets competes w times in the uniform draw, so its min ticket key
# is Beta(1, w)-distributed — smaller keys for heavier languages.
WRS_TICKETS = {"en": 1, "de": 4, "es": 3, "fr": 2, "zh": 2}
WRS_KEEP = 200


def curate_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling via ticket replication: each
    doc gets w integer tickets (per-language weight), its sort key is
    the MIN of w portable hashes, and the global top-K by key is the
    sample — upweighted languages win proportionally more slots. The
    integer-hash formulation sidesteps the float-pow ranking of
    classic A-Res (u^(1/w)), whose last-ulp differences across engines
    would make the selected set nondeterministic at the boundary.

    Scale shape: the w hashes are a map-side transform over a
    sequence literal (no explode, no per-ticket rows through any
    shuffle) and the global top-K is TakeOrderedAndProject — per-
    partition partial top-K, then K rows to the driver; at 100 TB the
    full sort never happens."""
    d = _t(spark, sf, "documents")
    w = None
    for lang, t in WRS_TICKETS.items():
        w = F.when(F.col("lang") == lang, t) if w is None else w.when(
            F.col("lang") == lang, t
        )
    w = w.otherwise(1)
    key = F.array_min(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda r: portable_hash32(
                F.concat(
                    F.lit("wrs:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    r.cast("string"),
                )
            ),
        )
    )
    return (
        d.select("doc_id", "lang", key.alias("skey"))
        .orderBy("skey", "doc_id")
        .limit(WRS_KEEP)
    )


def _weighted_sample_sql() -> str:
    from reair_spark.datapipe.common import portable_hash32_sql

    whens = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in WRS_TICKETS.items())
    h = portable_hash32_sql(
        "concat('wrs:', CAST(doc_id AS VARCHAR), ':', CAST(r AS VARCHAR))"
    )
    return f"""
WITH t AS (
  SELECT doc_id, lang, CASE {whens} ELSE 1 END AS w FROM documents
)
SELECT doc_id, lang,
       list_min(list_transform(range(1, w + 1), r -> {h})) AS skey
FROM t
ORDER BY skey, doc_id LIMIT {WRS_KEEP}
"""


TEMP_SCALE = 1000       # fixed-point scale for sqrt(n_tokens)
TEMP_BUDGET = 1_000_000  # tokens per training epoch to allocate


def curate_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-LLM recipe:
    XLM-R / mT5 sample sources ∝ p^(1/τ) so head sources shrink and
    tail sources grow; τ=2 → weights ∝ √p, and since
    √(n/T)/Σ√(m/T) = √n/Σ√m the corpus total cancels — weights come
    straight from per-source token counts).

    Cross-engine determinism by INTEGER arithmetic end to end: the
    weight numerator is q = floor(√n_tokens · 1000) (identical IEEE
    sqrt+multiply in both engines, then floored to an exact BIGINT),
    Σq is an integer sum (order-free, unlike float sums whose
    partial-aggregation order differs between engines), and the token
    allocation is TRUE integer division — Spark's ``div`` / DuckDB's
    ``//`` on BIGINTs — so no float ever crosses the comparison
    boundary and exactness does not depend on q·budget staying under
    2^53 (q·TEMP_BUDGET does stay far inside int64: q ≤ √n·1000 ≤
    ~3·10^10 even at a 10^15-token source, ·10^6 ≈ 3·10^16 < 2^63).

    Scale: one map-side-combined per-source aggregate (|sources|
    keys) + a broadcast 1-row Σ — nothing else touches the corpus."""
    d = _t(spark, sf, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    q = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * TEMP_SCALE).cast(
        "long"
    )
    per = per.select("source", "n_docs", "n_tokens", q.alias("q"))
    # Σq as a global window over the |sources|-row aggregate — a
    # broadcast scalar here would FORK the plan and re-scan the whole
    # corpus for the second agg (plan-shape test asserts one scan);
    # the single-partition window is metadata-sized by construction
    from pyspark.sql import Window as W

    q_sum = F.sum("q").over(W.partitionBy())
    return per.select(
        "source", "n_docs", "n_tokens", "q", q_sum.alias("q_sum")
    ).select(
        "source",
        "n_docs",
        "n_tokens",
        "q",
        # BIGINT `div` BIGINT — exact integer division, no IEEE double
        F.expr(f"(q * CAST({TEMP_BUDGET} AS BIGINT)) div q_sum")
        .cast("long")
        .alias("alloc_tokens"),
    )


def _temperature_mix_sql() -> str:
    return f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
q AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * {TEMP_SCALE})
                 AS BIGINT) AS q
  FROM per
),
tot AS (SELECT sum(q) AS q_sum FROM q)
SELECT source, n_docs, n_tokens, q,
       CAST((q * CAST({TEMP_BUDGET} AS BIGINT)) // q_sum AS BIGINT)
         AS alloc_tokens
FROM q, tot
"""


DOMAIN_CAP = 30  # max docs kept per source


def curate_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source frequency capping — the head-domain guard every web
    corpus applies (C4/RefinedWeb cap documents per registered domain
    so a few crawl-heavy sites can't dominate training): keep the
    first DOMAIN_CAP docs per source in deterministic doc_id order,
    emit every doc with its rank and verdict so the drop set is
    auditable.

    Scale: one rank window per source (single shuffle on the source
    key; skewed head domains are exactly what AQE skew splitting
    handles) — no sampling RNG, rerun-stable."""
    from pyspark.sql import Window as W

    d = _t(spark, sf, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    return d.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("rk"),
    ).withColumn("kept", F.col("rk") <= DOMAIN_CAP)


def _domain_cap_sql() -> str:
    return f"""
SELECT doc_id, source,
       CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
            AS BIGINT) AS rk,
       row_number() OVER (PARTITION BY source ORDER BY doc_id)
         <= {DOMAIN_CAP} AS kept
FROM documents
"""


QUANTILE_KEEP = 0.30  # keep the top 30% by quality within each source


def curate_quality_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source quality-percentile cut: keep each source's top
    QUANTILE_KEEP fraction by quality score — the adaptive sibling of
    the fixed-count domain cap (a uniform global threshold
    over-prunes clean sources and under-prunes noisy ones; a
    per-source percentile prunes each distribution at the same
    relative depth, the CCNet/RefinedWeb bucketing idea).

    Determinism: the percentile is the exact integer ratio
    (rank−1)/(n−1) over (rounded quality DESC, doc_id) — no float
    boundary beyond the already-gated quality rounding. doc_id makes
    the order total, so rank == row_number and the running count of
    ones IS percent_rank's rank.

    Scale shape (the DSIR discipline — no within-source window): a
    naive ``percent_rank() OVER (PARTITION BY source)`` puts each
    source through ONE task, so a 100 TB corpus with a handful of
    sources serializes on the window sort. Instead the per-source rank
    is a chunked running sum (level-1 windows over (source,
    quality-range chunk) — cardinality tracks data; level-2 prefix
    offsets on the strata×chunks totals table — metadata-sized,
    broadcast back), and n−1 arrives from a per-source count joined as
    a broadcast. (rank−1)/(n−1) then reproduces percent_rank EXACTLY —
    same division, same keep boundary — with parallelism bounded by
    |sources × chunks|, not |sources|. The scored projection is
    persisted eagerly: three consumers (local ranks, chunk offsets,
    per-source counts), one tokenize/regexp pass."""
    from pyspark import StorageLevel

    from reair_spark.operators import chunked_running_sum

    d = _t(spark, sf, "documents")
    n = F.length("text").cast("double")
    words = F.size(F.split("text", " ")).cast("double")
    alpha_ratio = F.regexp_count(F.col("text"), F.lit(r"[a-zA-Z]")) / n
    avg_word_len = (n - (words - 1)) / words
    quality = F.round(
        alpha_ratio * 0.7 + F.least(avg_word_len / 10.0, F.lit(1.0)) * 0.3, 4
    )
    scored = (
        d.select("doc_id", "source", quality.alias("quality"))
        .withColumn("one", F.lit(1))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    scored.count()  # eager: one regexp pass feeds all three branches
    ranked = chunked_running_sum(
        scored,
        ["source"],
        # monotone non-decreasing along quality DESC within a source;
        # quality is 4-decimal rounded so ×1000 buckets are stable
        F.floor(-F.col("quality") * 1000),
        [F.desc("quality"), "doc_id"],
        "one",
        "rk",
        materialize=False,  # scored is already persisted above
    )
    counts = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_src")
    )
    pr = F.when(F.col("n_src") == 1, F.lit(0.0)).otherwise(
        (F.col("rk") - 1).cast("double") / (F.col("n_src") - 1)
    )
    return (
        ranked.join(F.broadcast(counts), "source")
        .select(
            "doc_id", "source", "quality",
            F.round(pr, 4).alias("pctile"),
            (pr <= QUANTILE_KEEP).alias("keep"),
        )
    )


def _quality_percentile_sql() -> str:
    quality = (
        "round(len(regexp_extract_all(text, '[a-zA-Z]'))"
        " / CAST(length(text) AS DOUBLE) * 0.7"
        " + least((length(text) - (len(string_split(text, ' ')) - 1))"
        "   / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0)"
        " * 0.3, 4)"
    )
    return f"""
WITH q AS (SELECT doc_id, source, {quality} AS quality FROM documents),
r AS (SELECT *, percent_rank() OVER (PARTITION BY source
                                     ORDER BY quality DESC, doc_id) AS pr
      FROM q)
SELECT doc_id, source, quality, round(pr, 4) AS pctile,
       pr <= {QUANTILE_KEEP} AS keep
FROM r
"""


DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")  # "wiki-like" proxy
DSIR_KEEP_QUARTILE = 1  # ntile(4) == 1 → keep the top 25 % of the pool


def curate_importance_resample(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, Data Selection via
    Importance Resampling): fit unigram LMs on a target domain (the
    DSIR paper uses hashed n-gram features; the engine's synthetic
    corpus has a closed vocabulary, so plain unigrams ARE the feature
    space) and on the raw pool, score each pool document by its mean
    token log-likelihood ratio ln p_target(w) − ln p_pool(w), and keep
    the top quartile — documents that "read like" the target domain.

    Scale shape: ONE conditional-aggregation pass builds both LMs
    (groupBy(token) with filtered sums — no second corpus scan for the
    target side), the add-1-smoothed per-token score table is
    vocabulary-sized (broadcast join; at web-scale vocab it becomes an
    ordinary shuffle join on token), scoring is one join + one
    groupBy(doc), and the quartile cut is a global running RANK via
    chunked_running_sum over score-range chunks (no unpartitioned
    window — the same no-global-sort discipline as
    curate_token_budget) compared against ceil(n/4), which equals
    ntile(4)==1 exactly (the first tile takes the ceiling share).
    Nothing is ever pairwise; the corpus moves through exactly two
    shuffles (token agg, doc agg) plus the metadata-sized chunk-offset
    pass. Rounding at 4 decimals makes the cross-engine float sums
    exact (same discipline as text_perplexity_unigram)."""
    d = widen(_t(spark, sf, "documents"), spark)
    is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
    tok = d.select(
        "doc_id", is_target.alias("is_target"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("cp"),
    )
    totals = counts.agg(
        F.sum("ct").alias("nt"), F.sum("cp").alias("np"),
        F.count(F.lit(1)).alias("v"),
    )
    scores = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + F.col("v")))
            - F.log((F.col("cp") + 1) / (F.col("np") + F.col("v")))
        ).alias("s"),
    )
    pool_scored = (
        tok.where(~F.col("is_target"))
        .join(F.broadcast(scores), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("s"), 4).alias("log_ratio"),
        )
    )
    # top-quartile cut WITHOUT a global window (an unpartitioned
    # ntile puts the whole pool through one task): global running
    # RANK via chunked_running_sum — chunk key floor(−score·16) is
    # monotone along the descending score order — then rank ≤
    # ceil(n/4), which equals ntile(4) == 1 exactly (the first tile
    # takes the ceiling share)
    from reair_spark.operators import chunked_running_sum

    n_pool = pool_scored.agg(F.count(F.lit(1)).alias("n_pool"))
    ranked = chunked_running_sum(
        pool_scored.withColumn("one", F.lit(1)),
        [],
        F.floor(-F.col("log_ratio") * 16),
        [F.desc("log_ratio"), "doc_id"],
        "one",
        "rk",
    )
    return ranked.crossJoin(F.broadcast(n_pool)).select(
        "doc_id", "n_tokens", "log_ratio",
        (F.col("rk") <= F.ceil(F.col("n_pool") / 4)).alias("keep"),
    )


def _importance_resample_sql() -> str:
    targets = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)
    return f"""
WITH tok AS (
  SELECT doc_id, source IN ({targets}) AS is_target,
         unnest(string_split(text, ' ')) AS token
  FROM documents),
counts AS (
  SELECT token,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS cp
  FROM tok GROUP BY token),
totals AS (SELECT SUM(ct) AS nt, SUM(cp) AS np, COUNT(*) AS v FROM counts),
scores AS (
  SELECT token,
         ln((ct + 1) / CAST(nt + v AS DOUBLE))
         - ln((cp + 1) / CAST(np + v AS DOUBLE)) AS s
  FROM counts, totals),
pool AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         round(AVG(s.s), 4) AS log_ratio
  FROM tok t JOIN scores s USING (token)
  WHERE NOT t.is_target
  GROUP BY t.doc_id)
SELECT doc_id, n_tokens, log_ratio,
       ntile(4) OVER (ORDER BY log_ratio DESC, doc_id)
         <= {DSIR_KEEP_QUARTILE} AS keep
FROM pool
"""


CURATE_QUERIES = {
    "curate_importance_resample": curate_importance_resample,
    "curate_quality_percentile": curate_quality_percentile,
    "curate_temperature_mix": curate_temperature_mix,
    "curate_domain_cap": curate_domain_cap,
    "curate_weighted_sample": curate_weighted_sample,
    "curate_mix_epochs": curate_mix_epochs,
    "curate_shard_manifest": curate_shard_manifest,
    "curate_pipeline": curate_pipeline,
    "curate_token_budget": curate_token_budget,
    "curate_sample_stratified": curate_sample_stratified,
    "curate_decontaminate": curate_decontaminate,
    "curate_pack_sequences": curate_pack_sequences,
    "curate_pii_mask": curate_pii_mask,
}


def _decon_sql() -> str:
    from reair_spark.datapipe.common import word_shingles_sql

    sh = word_shingles_sql("t", k=DECON_SHINGLE_K)
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (SELECT doc_id, unnest({sh}) AS g FROM toks),
ev AS (SELECT DISTINCT g AS eg FROM grams WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM tr JOIN ev ON tr.g = ev.eg
GROUP BY tr.doc_id HAVING count(*) >= {DECON_MIN_OVERLAP}
"""


def _pipeline_sql() -> str:
    return f"""
WITH toks AS (SELECT doc_id, lang, text, string_split(text, ' ') AS t
              FROM documents),
feats AS (
  SELECT doc_id, lang, t,
         len(t) AS n_words,
         1.0 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE) AS dup2,
         len(regexp_extract_all(text, '[a-zA-Z]'))
           / CAST(length(text) AS DOUBLE) AS alpha
  FROM (SELECT *, list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                                 i -> t[i] || ' ' || t[i + 1]) AS g2
        FROM toks) b
),
kept AS (SELECT doc_id, lang, t FROM feats
         WHERE n_words >= 10 AND n_words <= 1000
           AND dup2 <= 0.60 AND alpha >= 0.60),
fp AS (SELECT doc_id, lang, len(t) AS n_tok,
              md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp
       FROM kept),
surv AS (SELECT doc_id, lang, n_tok FROM
         (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM fp) r WHERE rn = 1),
sampled AS (SELECT * FROM surv
            WHERE {_sample_hash_sql()} < {_sample_rate_sql()}),
binned AS (SELECT lang, n_tok,
                  floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
                         - n_tok) / {PACK_CTX}) AS bin
           FROM sampled)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM binned GROUP BY lang
"""


CURATE_ORACLES = {
    "curate_importance_resample": _importance_resample_sql(),
    "curate_quality_percentile": _quality_percentile_sql(),
    "curate_temperature_mix": _temperature_mix_sql(),
    "curate_domain_cap": _domain_cap_sql(),
    "curate_weighted_sample": _weighted_sample_sql(),
    "curate_mix_epochs": _mix_epochs_sql(),
    "curate_shard_manifest": f"""
SELECT {portable_hash32_sql("CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_bytes,
       CAST(bit_xor({portable_hash32_sql("text")}) AS BIGINT) AS content_digest
FROM documents GROUP BY 1 ORDER BY shard
""",
    "curate_pipeline": _pipeline_sql(),
    "curate_token_budget": f"""
WITH toks AS (SELECT doc_id, source, n_chars,
                     len(string_split(text, ' ')) AS n_tok
              FROM documents),
c AS (SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum_tok
      FROM toks)
SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum_tok AS BIGINT) AS cum_tok
FROM c WHERE cum_tok <= {TOKEN_BUDGET}
""",
    "curate_sample_stratified": (
        f"SELECT doc_id, lang, {_sample_hash_sql()} AS bucket FROM documents "
        f"WHERE {_sample_hash_sql()} < {_sample_rate_sql()}"
    ),
    "curate_decontaminate": _decon_sql(),
    "curate_pack_sequences": f"""
WITH toks AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
              FROM documents),
binned AS (SELECT lang,
                  CAST(floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
                              - n_tok) / {PACK_CTX}) AS BIGINT) AS bin,
                  n_tok
           FROM toks)
SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS bin_tokens
FROM binned GROUP BY lang, bin
""",
    "curate_pii_mask": (
        "SELECT c_custkey AS custkey, md5(c_name) AS pseudonym, "
        "concat(regexp_replace(regexp_replace(c_name, '[0-9]+$', ''), "
        "'[0-9]', '*', 'g'), '****', "
        "substr(regexp_extract(c_name, '([0-9]+)$', 1), -4)) AS masked_name "
        "FROM customer"
    ),
}
