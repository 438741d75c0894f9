"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline primitives: token counting, quality scoring,
language ID, content fingerprinting. Everything is built-in-function
composition (JVM-side, codegen'd) — these run per-row with no shuffle
except the final aggregation-free scan, so they scale linearly and
pipeline with downstream filters at 100 TB.

Each operator has an exact DuckDB oracle (same formula, same aliases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reair_spark.datapipe.common import portable_hash32, portable_hash32_sql, widen
from reair_spark.io import load_table as _t

# word-boundary stopword patterns per language; the CASE ladder makes
# the argmax deterministic (priority order on ties)
_LANG_PATTERNS = {
    "en": r"\b(the|and|of|a|to)\b",
    "es": r"\b(el|la|los|de|y)\b",
    "fr": r"\b(le|la|les|et|des)\b",
    "de": r"\b(der|die|das|und|ist)\b",
}


def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (word pieces = letter runs, digit runs, or single punctuation)."""
    d = widen(_t(spark, sf, "documents"), spark)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))
        .cast("long")
        .alias("re_tokens"),
    )


def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: alpha ratio, mean word length, and a composite
    score — the standard cheap pre-filter before expensive pipeline
    stages (dedup, embedding)."""
    d = widen(_t(spark, sf, "documents"), spark)
    n = F.length("text").cast("double")
    alpha = F.regexp_count(F.col("text"), F.lit(r"[a-zA-Z]")).cast("double")
    words = F.size(F.split("text", " ")).cast("double")
    alpha_ratio = alpha / n
    avg_word_len = (n - (words - 1)) / words  # chars excluding separators
    quality = F.round(alpha_ratio * 0.7 + F.least(avg_word_len / 10.0, F.lit(1.0)) * 0.3, 4)
    return d.select(
        "doc_id",
        alpha_ratio.alias("alpha_ratio"),
        avg_word_len.alias("avg_word_len"),
        quality.alias("quality"),
    )


def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language ID by stopword-hit argmax (n-gram-heuristic family).
    Deterministic tie-break: en > es > fr > de > unknown."""
    d = widen(_t(spark, sf, "documents"), spark)
    hits = {
        lang: F.regexp_count(F.col("text"), F.lit(pat)).alias(f"h_{lang}")
        for lang, pat in _LANG_PATTERNS.items()
    }
    best = F.greatest(*hits.values())
    pred = F.when(best == 0, "unknown")
    for lang in _LANG_PATTERNS:  # insertion order = tie-break priority
        pred = pred.when(hits[lang] == best, lang)
    return d.select("doc_id", pred.alias("lang_pred"))


def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprinting: order-insensitive content fingerprint
    (md5 of the sorted distinct token set) + a 32-bit shard hash of it.
    The shard hash is the partitioning key a 100 TB dedup would
    repartition on."""
    d = widen(_t(spark, sf, "documents"), spark)
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    return d.select(
        "doc_id",
        F.md5(canon).alias("fp"),
        portable_hash32(canon).alias("shard_hash"),
    )


TOP_TERMS = 3
TOP_TOKENS = 20


def text_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide top-N token frequencies — the vocabulary profile a
    tokenizer/quality pipeline starts from. Exact two-stage count (map-
    side combine on (token) then one small shuffle) + driver-merged
    top-N; at 100 TB the candidate set after partial aggregation is
    |vocab|, not |corpus|, and the sketch path (count-min) only matters
    when vocab itself won't fit — not the case for word-level."""
    d = widen(_t(spark, sf, "documents"), spark)
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(TOP_TOKENS)
    )


def text_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-k terms by tf-idf (tf = in-doc count, idf =
    ln((N+1)/(df+1))): the standard salient-term extraction. Two
    shuffles total — (doc, token) counts, then token → df join — with
    the df table broadcast (|vocab| rows). Ordering uses the rounded
    score + token tie-break so ranks are reproducible cross-engine."""
    from pyspark.sql import Window as W

    d = widen(_t(spark, sf, "documents"), spark)
    # N rides the plan as a broadcast 1-row scalar instead of a
    # separate d.count() driver action (VERDICT r5 ask #8: one fewer
    # Spark job + one fewer corpus scan per run)
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 4
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_TERMS)
        .select("doc_id", "token", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


# quality-rule bounds (Gopher-style): docs outside any bound are
# dropped with the FIRST failing rule as the reason
MIN_WORDS, MAX_WORDS = 10, 1000
MAX_DUP_2GRAM = 0.60  # fraction of repeated word-bigrams
MIN_ALPHA_RATIO = 0.60


def text_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Rule-based quality filter with per-doc verdicts: word-count
    bounds, duplicate-bigram ratio (boilerplate/repetition signal),
    and alpha ratio — the cheap rule chain every corpus pass runs
    before expensive dedup/scoring. One map-only pass: every feature
    is array/regexp arithmetic on the row, so the filter runs at scan
    speed and pushes nothing to a shuffle."""
    from reair_spark.datapipe.common import word_bigrams

    d = widen(_t(spark, sf, "documents"), spark)
    tok = F.split("text", " ")
    n_words = F.size(tok)
    grams2 = word_bigrams(tok)
    dup2 = F.round(
        1.0 - F.size(F.array_distinct(grams2)) / F.size(grams2).cast("double"), 4
    )
    alpha = F.round(
        F.regexp_count(F.col("text"), F.lit("[a-zA-Z]"))
        / F.length("text").cast("double"),
        4,
    )
    reason = (
        F.when(n_words < MIN_WORDS, "too_short")
        .when(n_words > MAX_WORDS, "too_long")
        .when(dup2 > MAX_DUP_2GRAM, "repetitive")
        .when(alpha < MIN_ALPHA_RATIO, "low_alpha")
        .otherwise("ok")
    )
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        dup2.alias("dup_2gram"),
        alpha.alias("alpha_ratio"),
        reason.alias("verdict"),
        (reason == "ok").alias("keep"),
    )


CHUNK_W = 10


def text_dedup_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition removal — the CCNet/RefinedWeb
    'drop duplicated lines/paragraphs per page' step. The synthetic
    docs are single-line, so the dedup unit is a fixed CHUNK_W-word
    window; on real data the identical expression runs over
    split(text, '\\n') instead. Keeps each chunk's FIRST occurrence
    (order-preserving) and reassembles the text.

    Planted self-repeats (first CHUNK_W words twice, doc_id+1e6 —
    same convention as the corpus-level dedup gates) prove the drop
    path on data whose natural chunks never align.

    Map-only at any scale: chunking, the per-doc first-occurrence
    filter (O(chunks²) within one row), and reassembly are all array
    built-ins inside one codegen stage — no shuffle, no Python."""
    d = widen(_t(spark, sf, "documents"), spark)
    words = F.split("text", " ")
    planted = d.where(
        (F.size(words) >= CHUNK_W) & (F.col("doc_id") % 7 == 0)
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.concat(F.slice(words, 1, CHUNK_W), F.slice(words, 1, CHUNK_W)),
            " ",
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").union(planted)

    w = F.split("text", " ")
    n_chunks = F.ceil(F.size(w) / CHUNK_W).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(w, i * CHUNK_W + 1, CHUNK_W), " "),
    )
    kept = F.filter(
        chunks,
        lambda c, i: F.array_position(F.slice(chunks, F.lit(1), i), c) == 0,
    )
    return corpus.select(
        "doc_id",
        F.size(chunks).cast("long").alias("n_chunks"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, " ").alias("text_deduped"),
    )


CORPUS_DUP_MIN_DOCS = 3


def text_line_dedup_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-level repeated-passage removal — the C4 'three-sentence
    span occurring in multiple pages' / CCNet cross-shard line dedup
    step, complementing text_dedup_chunks' WITHIN-document pass. A
    CHUNK_W-word chunk is boilerplate when it appears in >=
    CORPUS_DUP_MIN_DOCS distinct documents; every occurrence is
    removed and each doc's survivors reassemble in order. Docs whose
    chunks are all boilerplate survive with empty text (they're
    exactly what a downstream quality filter should see and drop).

    Scale shape: explode chunks WITH position, one map-side-combined
    count-distinct-docs per chunk, join the (chunk, n_docs) table
    back, one groupBy(doc) to reassemble — two shuffles total, both
    on keys that can't skew past chunk frequency itself. A production
    run shuffles xxhash64(chunk) instead of the chunk text (8-byte
    keys, strings never shuffle twice); the string form here keeps
    the DuckDB oracle exact."""
    d = widen(_t(spark, sf, "documents"), spark)
    w = F.split("text", " ")
    n_chunks = F.ceil(F.size(w) / CHUNK_W).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(w, i * CHUNK_W + 1, CHUNK_W), " "),
    )
    ex = d.select(
        "doc_id",
        F.size(chunks).cast("long").alias("n_chunks"),
        F.posexplode(chunks).alias("pos", "chunk"),
    )
    freq = ex.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("__n_docs")
    )
    kept = (
        ex.join(freq, "chunk")
        .where(F.col("__n_docs") < CORPUS_DUP_MIN_DOCS)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s.chunk,
                ),
                " ",
            ).alias("text_deduped"),
        )
    )
    base = d.select("doc_id", n_chunks.cast("long").alias("n_chunks"))
    return base.join(kept, "doc_id", "left_outer").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
    )


def text_perplexity_unigram(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM perplexity scoring — the SQL-expressible stand-in
    for CCNet's KenLM quality gate: train token probabilities on the
    corpus itself (count/total), score each doc by the mean negative
    log-likelihood of its tokens, report ppl = exp(nll). Low-ppl docs
    read like the corpus; high-ppl docs are outliers — same decision
    axis as the real 5-gram model, one corpus pass instead of an
    external model.

    Scale shape: one map-side-combined token count (the LM 'fit'),
    one token→prob join (vocabulary-sized build side — broadcastable
    until web-scale vocab, then an ordinary shuffle join), one
    groupBy(doc) for the mean. The log/exp algebra stays in codegen;
    rounding at 4 decimals makes the cross-engine float sums exact."""
    d = widen(_t(spark, sf, "documents"), spark)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    probs = counts.crossJoin(total).select(
        "token", (F.col("cnt") / F.col("total")).alias("p")
    )
    return (
        tok.join(probs, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(-F.log("p")), 4).alias("nll"),
            F.round(F.exp(F.avg(-F.log("p"))), 4).alias("ppl"),
        )
    )


CMS_D = 4  # hash rows
CMS_W = 256  # counters per row


def sketch_countmin_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Portable count-min sketch over the token stream, queried for
    the exact top-20 tokens: d×w = 4×256 counters built in ONE
    map-side-combined aggregation (the entire shuffle is ≤1024 partial
    counter rows regardless of corpus size — the frequency-sketch
    analog of the HLL shuffle bound), estimates = min over rows of the
    token's counter, with the CM guarantee est ≥ exact surfaced as an
    explicit overcount column. The d hash rows come from the one-md5
    derived family (a + s·b mod P32 — same family MinHash uses), so
    DuckDB builds the IDENTICAL sketch and the gate hash-checks
    estimates exactly. Production path: this sketch IS the mergeable
    per-partition state a streaming heavy-hitters pipeline keeps."""
    from reair_spark.datapipe.common import derived_hash, hash_family_ab

    d = widen(_t(spark, sf, "documents"), spark)
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    tokh = tok.select("token", F.md5("token").alias("m"))
    a, b = hash_family_ab(F.col("m"))
    pairs = tokh.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        (derived_hash(a, b, s) % CMS_W).alias("bucket"),
                    )
                    for s in range(CMS_D)
                ]
            )
        ).alias("sb")
    ).select(F.col("sb.s").alias("s"), F.col("sb.bucket").alias("bucket"))
    counters = pairs.groupBy("s", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )
    ta, tb = hash_family_ab(F.md5("token"))
    queries = top.select(
        "token",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        (derived_hash(ta, tb, s) % CMS_W).alias("bucket"),
                    )
                    for s in range(CMS_D)
                ]
            )
        ).alias("sb"),
    ).select("token", "n", F.col("sb.s").alias("s"), F.col("sb.bucket").alias("bucket"))
    return (
        queries.join(F.broadcast(counters), ["s", "bucket"])
        .groupBy("token", "n")
        .agg(F.min("cnt").alias("est"))
        .select(
            "token",
            F.col("n").cast("long").alias("n"),
            F.col("est").cast("long").alias("est"),
            (F.col("est") - F.col("n")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("n"), "token")
    )


CHUNK_WIN = 64  # tokens per retrieval chunk
CHUNK_STRIDE = 48  # 25% overlap between consecutive chunks


def text_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    """RAG-style overlapping chunking: each document explodes into
    CHUNK_WIN-token windows every CHUNK_STRIDE tokens (25% overlap so
    a fact straddling a boundary lands whole in some chunk) — the
    retrieval-index preprocessing step between "curated" and
    "embedded".

    Pure built-ins: split → sequence of starts → slice per start →
    one explode. Map-only (no shuffle), ~n/stride row amplification,
    and the chunk text itself stays inside codegen — only the digest
    and token count leave the row, so 100 TB of text never moves."""
    d = widen(_t(spark, sf, "documents"), spark)
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
    chunks = F.transform(
        starts, lambda st: F.struct(
            (st / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.slice(toks, st + 1, CHUNK_WIN).alias("ctoks"),
        )
    )
    return d.select(
        "doc_id", F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.ctoks").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "c.ctoks")).alias("chunk_digest"),
    )


_CHUNK_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks) - 1, 0) + 1, {CHUNK_STRIDE})) AS st
  FROM t
)
SELECT doc_id,
       CAST(st // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(toks[st + 1 : st + {CHUNK_WIN}]) AS BIGINT) AS n_tokens,
       md5(array_to_string(toks[st + 1 : st + {CHUNK_WIN}], ' ')) AS chunk_digest
FROM s
"""


QL_DIM = 64          # hashed feature buckets
QL_MIX = 2654435761  # Knuth multiplicative constant, derives w[j]


def text_quality_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality scoring with hashed features — the linear
    (fasttext-style) classifier shape a production pipeline runs after
    the rule-based gate: score = mean over tokens of w[h(token) mod D].
    The weight table here is derived deterministically from the bucket
    id (w[j] = (j·KNUTH mod 1000)/1000 − 0.5) so both engines compute
    the identical model without shipping an artifact; a real deployment
    swaps in trained weights as a broadcast map and nothing else
    changes.

    Scale shape: map-only — per-token hash + weight lookup fold
    entirely inside JVM higher-order functions; no explode, no
    shuffle, no UDF. 100 TB of text scores in one pass."""
    d = widen(_t(spark, sf, "documents"), spark)
    tok = F.split("text", " ")
    wexpr = F.transform(
        tok,
        lambda t: (
            ((portable_hash32(t) % QL_DIM) * QL_MIX % 1000) / 1000.0 - 0.5
        ),
    )
    score = F.aggregate(wexpr, F.lit(0.0), lambda acc, x: acc + x) / F.size(
        tok
    ).cast("double")
    from reair_spark.datapipe.common import round_like_duckdb

    return d.select(
        "doc_id",
        # scores are sums of k/1000 rationals — decimal-tie-prone, so
        # round with DuckDB's exact float-multiply convention
        round_like_duckdb(score, 4).alias("score"),
        (score > 0).alias("keep"),
    )


def _quality_linear_sql() -> str:
    h = portable_hash32_sql("t")
    return f"""
SELECT doc_id,
       round(list_aggregate(
         list_transform(string_split(text, ' '),
           t -> (({h} % {QL_DIM}) * {QL_MIX} % 1000) / 1000.0 - 0.5),
         'sum') / len(string_split(text, ' ')), 4) AS score,
       list_aggregate(
         list_transform(string_split(text, ' '),
           t -> (({h} % {QL_DIM}) * {QL_MIX} % 1000) / 1000.0 - 0.5),
         'sum') / len(string_split(text, ' ')) > 0 AS keep
FROM documents
"""


def text_bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide adjacent-symbol pair statistics — the inner loop of
    BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909):
    the merge chosen at each step is the argmax of exactly this table.
    One iteration is the expensive, corpus-shaped part (later
    iterations operate on the collapsed vocab), so this is the
    operator a distributed tokenizer-training pipeline needs.

    Scale shape — the word-frequency collapse IS the algorithm's
    distributed trick: corpus tokens groupBy-collapse to (word, freq)
    first (shuffle carries |vocab| keys with map-side combine, not
    corpus tokens), then char pairs explode over the VOCAB (metadata-
    scale) weighted by freq, and a second tiny agg sums pair counts.
    100 TB of text costs one token-level map + combine; everything
    after is vocabulary-sized."""
    d = widen(_t(spark, sf, "documents"), spark)
    words = d.select(F.explode(F.split("text", " ")).alias("w"))
    freq = words.groupBy("w").agg(F.count("*").alias("f"))
    pairs_arr = F.when(
        F.length("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.struct(
                F.col("w").substr(i, F.lit(1)).alias("l"),
                F.col("w").substr(i + 1, F.lit(1)).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        freq.select("f", F.explode(pairs_arr).alias("p"))
        .groupBy(F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym"))
        .agg(F.sum("f").cast("long").alias("cnt"))
    )


_BPE_PAIRS_SQL = """
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
freq AS (SELECT w, count(*) AS f FROM words GROUP BY w),
pairs AS (
  SELECT substr(w, s.i, 1) AS left_sym, substr(w, s.i + 1, 1) AS right_sym, f
  FROM freq, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS s(i)
)
SELECT left_sym, right_sym, CAST(sum(f) AS BIGINT) AS cnt
FROM pairs GROUP BY 1, 2
"""


BPE_ROUNDS = 3


def _bpe_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """(word, freq, s) with s the sentinel-wrapped symbol string
    ('small' → '<s><m><a><l><l>'). The wrapping makes greedy leftmost
    BPE merging EXPRESSIBLE as plain string replace(): the pattern
    '<l><r>' can only match whole adjacent symbols (mid-symbol
    alignment would need a '<' inside a symbol, and corpus words are
    plain lowercase), and replace()'s leftmost non-overlapping scan IS
    the BPE greedy rule — verified identical in Spark and DuckDB
    including the '<a><a><a><a>' → '<aa><aa>' repeat case."""
    d = widen(_t(spark, sf, "documents"), spark)
    words = d.select(F.explode(F.split("text", " ")).alias("w"))
    return words.groupBy("w").agg(F.count("*").alias("f")).select(
        "w", "f", F.expr("regexp_replace(w, '(.)', '<$1>')").alias("s")
    )


def _bpe_round(vocab: DataFrame) -> DataFrame:
    """One BPE training round, fully declarative: adjacent-pair counts
    over the (vocab-sized) symbol strings → 1-row argmax merge →
    broadcast-applied replace. No driver collect; the argmax rides the
    plan as a broadcast scalar."""
    syms = F.split(F.expr("trim(BOTH '<>' FROM s)"), "><")
    pairs_arr = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    best = (
        vocab.select("f", F.explode(pairs_arr).alias("p"))
        .groupBy(F.col("p.l").alias("ml"), F.col("p.r").alias("mr"))
        .agg(F.sum("f").alias("cnt"))
        .orderBy(F.desc("cnt"), "ml", "mr")
        .limit(1)
    )
    return vocab.crossJoin(F.broadcast(best)).select(
        "w",
        "f",
        F.expr(
            "replace(s, concat('<', ml, '><', mr, '>'), "
            "concat('<', ml, mr, '>'))"
        ).alias("s"),
    )


def text_bpe_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Full BPE tokenizer TRAIN + APPLY (Sennrich et al. 2016,
    arXiv:1508.07909), fixed BPE_ROUNDS merges, end to end in ONE
    declarative plan — the step beyond text_bpe_pair_counts' single
    pair table.

    Scale shape: the corpus collapses to (word, freq) first (the one
    token-level shuffle, map-side combined), so every training round —
    pair explode, argmax, merge-apply — runs at VOCABULARY scale, and
    each round's chosen merge rides the plan as a broadcast 1-row
    scalar (no driver collect, no Python in the loop; the greedy merge
    application is a JVM string replace thanks to the sentinel
    wrapping, see _bpe_vocab). The apply stage is a broadcast
    vocab-map join onto the exploded corpus, aggregated per doc.

    Output: (doc_id, n_words, n_bpe_tokens) — token counts under the
    trained tokenizer; the DuckDB oracle re-trains with 3 unrolled
    materialized CTE rounds and must pick the same merges."""
    vocab = _bpe_vocab(spark, sf)
    for _ in range(BPE_ROUNDS):
        vocab = _bpe_round(vocab)
    # symbols per word = count of '<' openers in the merged string
    vmap = vocab.select(
        "w",
        ((F.length("s") - F.length(F.expr("replace(s, '<', '')"))))
        .cast("long")
        .alias("n_sym"),
    )
    d = widen(_t(spark, sf, "documents"), spark)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    return (
        tok.join(F.broadcast(vmap), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
        )
    )


def _bpe_apply_sql() -> str:
    rounds = []
    prev = "v0"
    for i in range(1, BPE_ROUNDS + 1):
        rounds.append(f"""
p{i} AS MATERIALIZED (
  SELECT sy[s.i] AS ml, sy[s.i + 1] AS mr, sum(f) AS cnt
  FROM (SELECT f, string_split(trim(s, '<>'), '><') AS sy FROM {prev}) t,
       unnest(generate_series(1, greatest(len(sy) - 1, 0))) AS s(i)
  GROUP BY 1, 2 ORDER BY cnt DESC, ml, mr LIMIT 1
),
v{i} AS MATERIALIZED (
  SELECT w, f, replace(s, '<' || ml || '><' || mr || '>',
                       '<' || ml || mr || '>') AS s
  FROM {prev}, p{i}
)""")
        prev = f"v{i}"
    return f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
v0 AS MATERIALIZED (
  SELECT w, count(*) AS f, regexp_replace(w, '(.)', '<\\1>', 'g') AS s
  FROM words GROUP BY w
),{','.join(rounds)},
vmap AS (
  SELECT w, CAST(length(s) - length(replace(s, '<', '')) AS BIGINT) AS n_sym
  FROM {prev}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) dw
JOIN vmap USING (w)
GROUP BY doc_id
"""


# BM25 retrieval constants (Robertson/Okapi defaults)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 5
# fixed query set: one rare term (high idf: "dup" appears in ~0.5% of
# docs) + common terms, so scores spread across idf regimes
BM25_QUERIES = [("q_dup_hash", ["dup", "hash"]),
                ("q_spark_fast", ["spark", "query", "fast"])]


def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 top-k retrieval over the corpus for a fixed query
    set — the IR scoring half of a retrieval/RAG data pipeline.

    Plan shape for scale: ONE (doc, term) aggregation builds tf, the
    |vocab|-row df/idf table and the 1-row avgdl both ride as
    broadcasts, and only rows matching query terms (an isin filter on
    the broadcast-small term list) reach the scoring join — the corpus
    shuffles once, by (doc_id, token), nothing else is corpus-sized.
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (always-positive variant);
    ranks order by the ROUNDED score + doc_id so ranking is
    reproducible cross-engine (same discipline as tfidf)."""
    from pyspark.sql import Window as W

    d = widen(_t(spark, sf, "documents"), spark)
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    tok = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("double").alias("dl"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    all_terms = sorted({t for _, terms in BM25_QUERIES for t in terms})
    tf = (
        tok.where(F.col("token").isin(all_terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"),
             F.first("dl").alias("dl"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    from reair_spark.io import rows_df

    qdf = rows_df(
        spark,
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id string, token string",
    )  # |queries|×|terms| rows — broadcast metadata, not data
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score_term = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(F.broadcast(qdf), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(score_term), 4).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", "score",
                F.col("rank").cast("long").alias("rank"))
    )


BM25_INDEX_SHARDS = 8  # token-range shards; a knob at warehouse scale


def build_bm25_index(
    spark: SparkSession, docs: DataFrame, index_dir: str,
    n_shards: int = BM25_INDEX_SHARDS,
) -> None:
    """Build and PERSIST the BM25 inverted index — the build half of
    the build-once/search-many lifecycle (the ann_ivf_persisted_topk
    shape applied to lexical retrieval; the reference's S7
    plan-sink/re-source pattern). One (doc, token) aggregation over
    the FULL vocabulary, written as:

      postings.parquet  (token, doc_id, tf, dl) — range-sharded AND
                        sorted by token, so a serve-time term filter
                        prunes at the row-group level (parquet min/max
                        on the sort key) instead of scanning the
                        corpus-sized postings list;
      df.parquet        (token, df) — vocabulary-sized;
      stats.parquet     one row (n_docs, avgdl).

    At 100 TB the postings build is the one corpus shuffle; serving
    never touches the corpus again — the index-free text_bm25_topk
    re-pays that shuffle per query batch, which is the gap this
    closes."""
    tok = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("double").alias("dl"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    postings = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").alias("dl"),
    )
    (
        postings.repartitionByRange(n_shards, "token")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/postings.parquet")
    )
    # df/stats from the PERSISTED postings: one cheap scan of the
    # already-shuffled table, and the artifacts are self-consistent
    # even if docs changes under a rebuild race
    p = spark.read.parquet(f"{index_dir}/postings.parquet")
    p.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    ).write.mode("overwrite").parquet(f"{index_dir}/df.parquet")
    docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    ).write.mode("overwrite").parquet(f"{index_dir}/stats.parquet")


def bm25_search(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[str, list[str]]],
    topk: int = BM25_TOPK,
) -> DataFrame:
    """Serve BM25 top-k from a persisted index: the only inputs are
    the index artifacts and the (broadcast-small) query set. The term
    filter reaches the postings parquet scan as a pushed predicate
    over the sort key — per-query work is bounded by matching
    postings, not corpus size. Identical scoring arithmetic to
    text_bm25_topk, so both paths share one oracle."""
    from pyspark.sql import Window as W

    postings = spark.read.parquet(f"{index_dir}/postings.parquet")
    df_ = spark.read.parquet(f"{index_dir}/df.parquet")
    stats = spark.read.parquet(f"{index_dir}/stats.parquet")
    all_terms = sorted({t for _, terms in queries for t in terms})
    tf = postings.where(F.col("token").isin(all_terms))
    from reair_spark.io import rows_df

    qdf = rows_df(
        spark,
        [(qid, t) for qid, terms in queries for t in terms],
        "query_id string, token string",
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score_term = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_.where(F.col("token").isin(all_terms))), "token")
        .join(F.broadcast(qdf), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(score_term), 4).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "doc_id", "score",
                F.col("rank").cast("long").alias("rank"))
    )


_BM25_INDEX_CACHE: dict = {}


def bm25_index_dir(spark: SparkSession, sf: str) -> str:
    """Session-memoized index build per (app, sf) — build once, serve
    every gate/bench call from the reloaded artifacts (the lifecycle
    under test; also what keeps the gate's cost serving-sized)."""
    import atexit
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, "bm25_index", sf)
    if key not in _BM25_INDEX_CACHE:
        idx = tempfile.mkdtemp(prefix="reair_bm25_index_")
        atexit.register(shutil.rmtree, idx, ignore_errors=True)
        build_bm25_index(
            spark, widen(_t(spark, sf, "documents"), spark), idx
        )
        _BM25_INDEX_CACHE[key] = idx
    return _BM25_INDEX_CACHE[key]


def text_bm25_persisted_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Gate: the SAME fixed query set as text_bm25_topk answered from
    the persisted inverted index. Parquet round-trips doubles exactly,
    so the result is bit-identical to the index-free form
    (pytest-asserted) and both share _bm25_sql()'s oracle."""
    return bm25_search(spark, bm25_index_dir(spark, sf), BM25_QUERIES)


# Gopher-style repetition thresholds (Rae et al. 2021, Table A1 —
# adapted to token granularity for this whitespace corpus)
REP_TOP_WORD_MAX = 0.20
REP_TOP_BIGRAM_MAX = 0.18
REP_DUP_TRIGRAM_MAX = 0.60


def text_repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition signals — the Gopher/MassiveText
    repetition rules (fraction of content in the most common word /
    2-gram, fraction of tokens inside duplicated 3-grams) that every
    large-scale corpus pass runs to drop degenerate generations and
    boilerplate.

    Scale shape: ENTIRELY row-local — one scan, zero shuffles,
    pipelines with any downstream filter (contrast with the
    explode+groupBy formulation whose (doc, gram) shuffle is
    corpus-sized). Per-row cost is O(m log m): each gram array is
    SORTED once, group sizes fall out of the boundary-index
    differences (runs), and every signal is an arithmetic over the
    runs array — max run for the top-fractions, Σ(runs ≥ 2) for the
    duplicated-trigram tokens. The naive count-per-distinct form is
    O(m·|distinct|) per row, quadratic on long documents whose grams
    are mostly unique — exactly the 100 TB input. Fractions are exact
    integer ratios, so the doubles agree bit-for-bit cross-engine
    before the round."""
    from reair_spark.datapipe.common import word_bigrams

    d = widen(_t(spark, sf, "documents"), spark)
    tok = F.split("text", " ")
    n = F.size(tok)

    g2 = word_bigrams(tok)
    g3 = F.when(
        n >= 3,
        F.zip_with(
            F.slice(tok, 1, n - 2),  # all three slices length n-2:
            F.zip_with(              # zip_with null-pads mismatches
                F.slice(tok, 2, n - 2),
                F.slice(tok, 3, n - 2),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            lambda a, bc: F.concat(a, F.lit(" "), bc),
        ),
    ).otherwise(F.slice(tok, 1, 1))

    # group sizes of a sorted array via boundary indices: runs =
    # diffs of [0, {i | s[i] != s[i+1]}, m] — O(m log m), no pairwise
    # counting. Sorted arrays land in their own projection so the
    # lambdas' element_at references a materialized column, not a
    # re-evaluated sort.
    base = d.select(
        "doc_id",
        F.array_sort(tok).alias("st"),
        F.array_sort(g2).alias("s2"),
        F.array_sort(g3).alias("s3"),
    )

    def runs_of(col: str):
        s = F.col(col)
        m = F.size(s)
        # guard: Spark's sequence(1, 0) DESCENDS instead of returning
        # empty, so single-element arrays need the explicit branch
        idx = F.when(m >= 2, F.sequence(F.lit(1), m - 1)).otherwise(
            F.array().cast("array<int>")
        )
        bounds = F.filter(
            F.transform(
                idx,
                lambda i: F.when(
                    F.element_at(s, i) != F.element_at(s, i + 1), i
                ),
            ),
            lambda x: x.isNotNull(),
        )
        full = F.concat(F.array(F.lit(0)), bounds, F.array(m))
        return F.zip_with(
            F.slice(full, 1, F.size(full) - 1),
            F.slice(full, 2, F.size(full) - 1),
            lambda a, b: b - a,
        )

    r_t, r_2, r_3 = runs_of("st"), runs_of("s2"), runs_of("s3")
    top_word = F.array_max(r_t) / F.size("st").cast("double")
    top_bigram = F.array_max(r_2) / F.size("s2").cast("double")
    dup_tri = F.aggregate(
        F.filter(r_3, lambda c: c >= 2), F.lit(0), lambda acc, c: acc + c
    ) / F.size("s3").cast("double")

    return base.select(
        "doc_id",
        F.round(top_word, 4).alias("top_word_frac"),
        F.round(top_bigram, 4).alias("top_bigram_frac"),
        F.round(dup_tri, 4).alias("dup_trigram_frac"),
        (
            (top_word <= REP_TOP_WORD_MAX)
            & (top_bigram <= REP_TOP_BIGRAM_MAX)
            & (dup_tri <= REP_DUP_TRIGRAM_MAX)
        ).alias("keep"),
    )


TEXT_QUERIES = {
    "text_bm25_topk": text_bm25_topk,
    "text_bm25_persisted_topk": text_bm25_persisted_topk,
    "text_repetition_signals": text_repetition_signals,
    "text_bpe_apply": text_bpe_apply,
    "text_bpe_pair_counts": text_bpe_pair_counts,
    "text_quality_linear": text_quality_linear,
    "text_chunk_windows": text_chunk_windows,
    "text_token_count": text_token_count,
    "text_dedup_chunks": text_dedup_chunks,
    "text_line_dedup_corpus": text_line_dedup_corpus,
    "text_perplexity_unigram": text_perplexity_unigram,
    "sketch_countmin_tokens": sketch_countmin_tokens,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_heavy_hitters": text_heavy_hitters,
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "text_quality_filter": text_quality_filter,
}


def _lang_case_sql() -> str:
    hit = {
        lang: f"len(regexp_extract_all(text, '{pat}'))"
        for lang, pat in _LANG_PATTERNS.items()
    }
    best = "greatest(" + ", ".join(hit.values()) + ")"
    whens = "".join(f" WHEN {hit[lang]} = best THEN '{lang}'" for lang in _LANG_PATTERNS)
    return (
        f"SELECT doc_id, CASE WHEN best = 0 THEN 'unknown'{whens} END AS lang_pred "
        f"FROM (SELECT doc_id, text, {best} AS best FROM documents) s"
    )


_CANON_SQL = "array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')"

_DEDUP_CHUNKS_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(
           list_slice(string_split(text, ' '), 1, 10)
             || list_slice(string_split(text, ' '), 1, 10), ' ') AS text
  FROM documents
  WHERE len(string_split(text, ' ')) >= 10 AND doc_id % 7 = 0
),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
c AS (SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(words)/10.0) AS INT)),
                            i -> array_to_string(list_slice(words, i*10+1, i*10+10), ' ')) AS chunks
      FROM w),
k AS (SELECT doc_id, chunks,
             list_filter(chunks,
                         (x, i) -> coalesce(list_position(chunks[1:i-1], x), 0) = 0) AS kept
      FROM c)
SELECT doc_id, CAST(len(chunks) AS BIGINT) AS n_chunks,
       CAST(len(kept) AS BIGINT) AS n_kept,
       array_to_string(kept, ' ') AS text_deduped
FROM k
"""

_LINE_DEDUP_CORPUS_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c AS (SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(words)/10.0) AS INT)),
                            i -> array_to_string(list_slice(words, i*10+1, i*10+10), ' ')) AS chunks
      FROM w),
ex AS (SELECT doc_id, len(chunks) AS n_chunks,
              unnest(chunks) AS chunk,
              generate_subscripts(chunks, 1) AS pos
       FROM c),
freq AS (SELECT chunk, count(DISTINCT doc_id) AS n_docs FROM ex GROUP BY 1),
kept AS (
  SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         array_to_string(list_transform(
           list_sort(list(ROW(ex.pos, ex.chunk))), r -> r[2]), ' ')
           AS text_deduped
  FROM ex JOIN freq USING (chunk)
  WHERE freq.n_docs < 3
  GROUP BY ex.doc_id
)
SELECT c.doc_id, CAST(len(c.chunks) AS BIGINT) AS n_chunks,
       coalesce(k.n_kept, 0) AS n_kept,
       coalesce(k.text_deduped, '') AS text_deduped
FROM c LEFT OUTER JOIN kept k ON c.doc_id = k.doc_id
"""

_PPL_UNIGRAM_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
total AS (SELECT sum(cnt) AS total FROM counts),
probs AS (SELECT token, cnt / CAST(total AS DOUBLE) AS p
          FROM counts CROSS JOIN total)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(p)), 4) AS nll,
       round(exp(avg(-ln(p))), 4) AS ppl
FROM tok JOIN probs USING (token)
GROUP BY doc_id
"""

def _countmin_sql() -> str:
    from reair_spark.datapipe.common import derived_hash_sql, hash_family_ab_sql

    a, b = hash_family_ab_sql("m")
    pair_rows = " UNION ALL ".join(
        f"SELECT token, {s} AS s, ({derived_hash_sql(a, b, s)}) % {CMS_W} AS bucket FROM h"
        for s in range(CMS_D)
    )
    return f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
h AS (SELECT token, md5(token) AS m FROM tok),
pairs AS ({pair_rows}),
counters AS (SELECT s, bucket, CAST(count(*) AS BIGINT) AS cnt
             FROM pairs GROUP BY 1, 2),
top AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok
        GROUP BY 1 ORDER BY n DESC, token LIMIT 20),
th AS (SELECT token, n, md5(token) AS m FROM top),
q AS ({" UNION ALL ".join(
    f"SELECT token, n, {s} AS s, ({derived_hash_sql(a, b, s)}) % {CMS_W} AS bucket FROM th"
    for s in range(CMS_D))})
SELECT q.token, q.n, min(c.cnt) AS est,
       CAST(min(c.cnt) - q.n AS BIGINT) AS overcount
FROM q JOIN counters c ON q.s = c.s AND q.bucket = c.bucket
GROUP BY q.token, q.n
ORDER BY n DESC, token
"""


def _bm25_sql() -> str:
    terms = sorted({t for _, ts in BM25_QUERIES for t in ts})
    in_list = ", ".join(f"'{t}'" for t in terms)
    q_rows = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in BM25_QUERIES for t in ts
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(len(t)) AS avgdl FROM d),
tok AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
               unnest(t) AS token FROM d),
tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf,
              any_value(dl) AS dl
       FROM tok WHERE token IN ({in_list}) GROUP BY 1, 2),
dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
q(query_id, token) AS (VALUES {q_rows}),
scored AS (
  SELECT query_id, doc_id,
         round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf
                   * ({BM25_K1} + 1.0)
                   / (tf + {BM25_K1} * (1.0 - {BM25_B}
                                        + {BM25_B} * dl / avgdl))), 4)
           AS score
  FROM tf JOIN dfreq USING (token) JOIN q USING (token), stats
  GROUP BY 1, 2)
SELECT query_id, doc_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS rank
  FROM scored) WHERE rank <= {BM25_TOPK}
"""


def _repetition_sql() -> str:
    # sorted-array boundary runs mirror the Spark formulation: group
    # sizes = diffs of [0, {i | s[i] != s[i+1]}, len]; fractions are
    # exact integer ratios so the doubles agree exactly

    def runs_for(col: str) -> str:
        full = (
            f"(([0::BIGINT] || "
            f"list_filter(range(1, len({col})), "
            f"i -> {col}[i] != {col}[i + 1])) || [len({col})::BIGINT])"
        )
        return (
            f"list_transform(range(1, len({full})), "
            f"i -> ({full})[i + 1] - ({full})[i])"
        )

    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, list_sort(t) AS st,
         list_sort(CASE WHEN len(t) >= 2 THEN list_transform(
             range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
           ELSE t[1:1] END) AS s2,
         list_sort(CASE WHEN len(t) >= 3 THEN list_transform(
             range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
           ELSE t[1:1] END) AS s3
  FROM d),
c AS (
  SELECT doc_id,
         list_max({runs_for('st')}) / CAST(len(st) AS DOUBLE) AS twf,
         list_max({runs_for('s2')}) / CAST(len(s2) AS DOUBLE) AS tbf,
         coalesce(list_sum(list_filter({runs_for('s3')}, c -> c >= 2)), 0)
           / CAST(len(s3) AS DOUBLE) AS dtf
  FROM g)
SELECT doc_id,
       round(twf, 4) AS top_word_frac,
       round(tbf, 4) AS top_bigram_frac,
       round(dtf, 4) AS dup_trigram_frac,
       twf <= {REP_TOP_WORD_MAX} AND tbf <= {REP_TOP_BIGRAM_MAX}
         AND dtf <= {REP_DUP_TRIGRAM_MAX} AS keep
FROM c
"""


TEXT_ORACLES = {
    "text_bm25_topk": _bm25_sql(),
    # the persisted index serves the same query set with the same
    # arithmetic — double round-trip ⇒ one oracle for both paths
    "text_bm25_persisted_topk": _bm25_sql(),
    "text_repetition_signals": _repetition_sql(),
    "text_bpe_apply": _bpe_apply_sql(),
    "text_bpe_pair_counts": _BPE_PAIRS_SQL,
    "text_quality_linear": _quality_linear_sql(),
    "text_chunk_windows": _CHUNK_SQL,
    "text_dedup_chunks": _DEDUP_CHUNKS_SQL,
    "text_line_dedup_corpus": _LINE_DEDUP_CORPUS_SQL,
    "text_perplexity_unigram": _PPL_UNIGRAM_SQL,
    "sketch_countmin_tokens": _countmin_sql(),
    "text_token_count": (
        "SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens, "
        r"len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS re_tokens "
        "FROM documents"
    ),
    "text_quality_score": (
        "SELECT doc_id, "
        "len(regexp_extract_all(text, '[a-zA-Z]')) / CAST(length(text) AS DOUBLE) "
        "  AS alpha_ratio, "
        "(length(text) - (len(string_split(text, ' ')) - 1)) "
        "  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_word_len, "
        "round(len(regexp_extract_all(text, '[a-zA-Z]')) / CAST(length(text) AS DOUBLE) * 0.7 "
        " + least((length(text) - (len(string_split(text, ' ')) - 1)) "
        "   / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0) * 0.3, 4) AS quality "
        "FROM documents"
    ),
    "text_lang_id": _lang_case_sql(),
    "text_quality_filter": f"""
WITH feats AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         round(1.0 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE), 4)
           AS dup_2gram,
         round(len(regexp_extract_all(text, '[a-zA-Z]'))
               / CAST(length(text) AS DOUBLE), 4) AS alpha_ratio
  FROM (SELECT doc_id, text,
               list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
                              i -> string_split(text, ' ')[i] || ' ' ||
                                   string_split(text, ' ')[i + 1]) AS g2
        FROM documents) b
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, dup_2gram, alpha_ratio,
       CASE WHEN n_words < {MIN_WORDS} THEN 'too_short'
            WHEN n_words > {MAX_WORDS} THEN 'too_long'
            WHEN dup_2gram > {MAX_DUP_2GRAM} THEN 'repetitive'
            WHEN alpha_ratio < {MIN_ALPHA_RATIO} THEN 'low_alpha'
            ELSE 'ok' END AS verdict,
       (CASE WHEN n_words < {MIN_WORDS} THEN 'too_short'
             WHEN n_words > {MAX_WORDS} THEN 'too_long'
             WHEN dup_2gram > {MAX_DUP_2GRAM} THEN 'repetitive'
             WHEN alpha_ratio < {MIN_ALPHA_RATIO} THEN 'low_alpha'
             ELSE 'ok' END) = 'ok' AS keep
FROM feats
""",
    "text_heavy_hitters": (
        "SELECT token, CAST(count(*) AS BIGINT) AS n FROM "
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) t "
        "GROUP BY token ORDER BY n DESC, token LIMIT 20"
    ),
    "text_tfidf_top_terms": """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln((n.n_docs + 1.0) / (dfx.df + 1.0)), 4) AS tfidf
  FROM tf JOIN dfx ON tf.token = dfx.token CROSS JOIN n
)
SELECT doc_id, token, tfidf, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rnk
      FROM scored) s
WHERE rnk <= 3
""",
    "text_fingerprint": (
        f"SELECT doc_id, md5({_CANON_SQL}) AS fp, "
        f"{portable_hash32_sql(_CANON_SQL)} AS shard_hash FROM documents"
    ),
}


KN_D = 0.75  # absolute discount (exact in binary: 3/4 — no float seam)


def text_perplexity_kn(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser–Ney BIGRAM perplexity — the canonical
    n-gram quality score (what KenLM computes for CCNet-style
    filtering), upgrading the unigram gate: P(w|v) =
    max(c(v,w)−D,0)/c(v) + D·N1+(v,·)/c(v) · N1+(·,w)/N1+(·,·), with
    the continuation probability ranking words by how many CONTEXTS
    they follow rather than raw frequency (the insight that makes KN
    the standard). Trained on the corpus itself and scored per doc as
    exp(mean −log P) over its bigrams (docs need ≥ 2 tokens).

    Scale shape: ONE bigram count shuffle (map-side combined) is the
    only corpus-sized exchange; every KN statistic (context totals,
    follower/predecessor type counts, the type total) derives from the
    bigram-TYPE table, which is vocabulary²-bounded — broadcast-sized
    here and an ordinary dimension join at web scale. The per-doc
    scoring join is bigram-keyed against that table; log/exp algebra
    stays in codegen, rounded at 4 like the unigram gate (the proven
    cross-engine float discipline). D = 0.75 is exactly representable,
    so discount arithmetic is seam-free."""
    d = widen(_t(spark, sf, "documents"), spark)
    t = d.select("doc_id", F.split("text", " ").alias("t"))
    n = F.size("t")
    # guarded sequence: Spark's sequence(1, 0) DESCENDS, so short docs
    # must take the empty branch explicitly
    grams = t.select(
        "doc_id",
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.element_at("t", i.cast("int")).alias("v"),
                        F.element_at("t", (i + 1).cast("int")).alias("w"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("g"),
    ).select("doc_id", "g.v", "g.w")
    types = grams.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    ctx = types.groupBy("v").agg(
        F.sum("c_vw").alias("c_v"),
        F.count(F.lit(1)).alias("n1_fwd"),  # N1+(v,·)
    )
    cont = types.groupBy("w").agg(F.count(F.lit(1)).alias("n1_bwd"))
    total_types = types.agg(F.count(F.lit(1)).alias("tt"))
    probs = (
        types.join(ctx, "v")
        .join(cont, "w")
        .crossJoin(total_types)
        .select(
            "v",
            "w",
            (
                F.greatest(F.col("c_vw") - KN_D, F.lit(0.0)) / F.col("c_v")
                + (KN_D * F.col("n1_fwd") / F.col("c_v"))
                * (F.col("n1_bwd") / F.col("tt"))
            ).alias("p"),
        )
    )
    return (
        grams.join(probs, ["v", "w"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log("p")), 4).alias("nll"),
            F.round(F.exp(F.avg(-F.log("p"))), 4).alias("ppl"),
        )
    )


_PPL_KN_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, t[i] AS v, t[i + 1] AS w
  FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS s(i)),
types AS (
  SELECT v, w, count(*) AS c_vw FROM grams GROUP BY v, w),
ctx AS (
  SELECT v, sum(c_vw) AS c_v, count(*) AS n1_fwd FROM types GROUP BY v),
cont AS (
  SELECT w, count(*) AS n1_bwd FROM types GROUP BY w),
tt AS (SELECT count(*) AS tt FROM types),
probs AS (
  SELECT types.v, types.w,
         greatest(c_vw - {KN_D}, 0.0) / c_v
           + ({KN_D} * n1_fwd / c_v) * (n1_bwd / tt) AS p
  FROM types JOIN ctx USING (v) JOIN cont USING (w), tt)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln(p)), 4) AS nll,
       round(exp(avg(-ln(p))), 4) AS ppl
FROM grams JOIN probs USING (v, w)
GROUP BY doc_id
"""

TEXT_QUERIES["text_perplexity_kn"] = text_perplexity_kn
TEXT_ORACLES["text_perplexity_kn"] = _PPL_KN_SQL
