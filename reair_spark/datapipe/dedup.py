"""Deduplication operators over the ``documents`` table.

Four dedup strategies a training-data pipeline needs, all expressed as
DataFrame programs with exact DuckDB oracles (the portable md5-based
hash family makes even MinHash/SimHash cross-engine deterministic):

- exact: hash-groupBy on content digest (one shuffle on the digest)
- MinHash+LSH: shingle → k minhashes → band → bucket self-join
- SimHash: per-shingle bit votes → 48-bit signature → byte-band join
- n-gram Jaccard: char-4-gram sets, prefix-blocked candidate pairs

The test corpus is derived deterministically from the input: every
doc_id % 10 == 0 document gets a planted duplicate (exact copy for
exact dedup; last-3-words-truncated copy for the near-dup operators)
at doc_id + 1_000_000, so each operator has real positives to find.

Scale notes (100 TB): every operator is shuffle-minimal — exact dedup
shuffles digests (not text) once; MinHash shuffles (doc_id, shingle)
once for the signature agg and band signatures (16 longs/doc) for the
bucket join; candidate verification joins only the candidate set, not
all pairs. Skewed band buckets (boilerplate docs) are handled by AQE
skew-join splitting.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reair_spark.datapipe.common import (
    widen,
    portable_hash32,
    portable_hash32_sql,
    hash_family_ab,
    hash_family_ab_sql,
    derived_hash,
    derived_hash_sql,
    word_shingles,
    word_shingles_sql,
)
from reair_spark.io import load_table as _t

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS
SIMHASH_BITS = 48
SIMHASH_MAX_HAMMING = 6
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 12  # bands * band_bits == SIMHASH_BITS
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1
JACCARD_THRESHOLD = 0.5
NGRAM_THRESHOLD = 0.6
PREFIX_BLOCK_LEN = 24


# ---------------------------------------------------------------------------
# derived corpus with planted duplicates
# ---------------------------------------------------------------------------


def _corpus(spark: SparkSession, sf: str, exact: bool) -> DataFrame:
    """documents ∪ planted duplicates (doc_id % 10 == 0 → +1_000_000)."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 10 == 0)
    if exact:
        dup_text = F.col("text")
    else:
        tok = F.split("text", " ")
        dup_text = F.concat_ws(
            " ", F.slice(tok, F.lit(1), F.greatest(F.size(tok) - 3, F.lit(1)))
        )
    dups = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), dup_text.alias("text")
    )
    # widen: the tiny parquet scans as 1 partition, serializing the
    # per-row shingle/hash compute downstream
    return widen(d.union(dups))


def _corpus_sql(exact: bool) -> str:
    dup_text = (
        "text"
        if exact
        else "array_to_string(t[1:greatest(len(t)-3, 1)], ' ')"
    )
    return (
        "SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT doc_id + 1000000 AS doc_id, {dup_text} AS text FROM "
        "(SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) b "
        "WHERE doc_id % 10 = 0"
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via content-digest groupBy. Shuffles 32-byte digests
    instead of document bodies — at 100 TB the shuffle is ~0.03% of the
    data. keep_id = min(doc_id) is the canonical-survivor rule."""
    c = _corpus(spark, sf, exact=True)
    return (
        c.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _band_sig(cols: list[Column]) -> Column:
    return F.concat_ws("_", *[c.cast("string") for c in cols])


def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs: word-3-gram shingles → 16 portable
    minhashes → 4 bands of 4 → band-bucket self-join → exact-Jaccard
    verify of candidates only.

    One shuffle computes all 16 signature mins (single groupBy with 16
    min aggs); the LSH join shuffles 4 short strings per doc; exact
    verification touches only candidate pairs.
    """
    c = _corpus(spark, sf, exact=False)
    tok = F.split("text", " ")
    sh = c.select("doc_id", F.explode(word_shingles(tok)).alias("sh"))
    # ONE md5 per shingle; all 16 family members derived as
    # (a + s*b) mod P32 (exact long arithmetic, DuckDB-identical).
    hx = sh.select("doc_id", F.md5("sh").alias("m"))
    a, b = hash_family_ab(F.col("m"))
    ab = hx.select("doc_id", a.alias("a"), b.alias("b"))
    sig = ab.groupBy("doc_id").agg(
        *[
            F.min(derived_hash(F.col("a"), F.col("b"), s)).alias(f"mh{s}")
            for s in range(N_MINHASH)
        ]
    )
    # both sides of the band self-join derive from sig (16 longs/doc);
    # eager persist stops the shingle-explode + 16-min shuffle running
    # twice
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_sig(
                            [F.col(f"mh{b * ROWS_PER_BAND + j}") for j in range(ROWS_PER_BAND)]
                        ).alias("sig"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(y, ["band", "sig"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )

    # the verify stage reads the shingle sets for BOTH pair members —
    # persist so the corpus scan + shingle transform runs once
    sets = c.select("doc_id", word_shingles(tok).alias("shset")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sets.count()
    a, b = sets.alias("a"), sets.alias("b")
    jac = F.size(F.array_intersect("a.shset", "b.shset")).cast("double") / F.size(
        F.array_union("a.shset", "b.shset")
    ).cast("double")
    return (
        cand.join(a, cand.id_a == F.col("a.doc_id"))
        .join(b, cand.id_b == F.col("b.doc_id"))
        .select("id_a", "id_b", F.round(jac, 3).alias("jac"))
        .where(F.col("jac") >= JACCARD_THRESHOLD)
    )


def _minhash_sql() -> str:
    shingles = word_shingles_sql("t")
    a_sql, b_sql = hash_family_ab_sql("m")
    mins = ", ".join(
        f"min({derived_hash_sql('a', 'b', s)}) AS mh{s}" for s in range(N_MINHASH)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS sig FROM sig".format(
            b=b,
            cols=", ".join(
                f"CAST(mh{b * ROWS_PER_BAND + j} AS VARCHAR)"
                for j in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""
WITH corpus AS ({_corpus_sql(exact=False)}),
tokd AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
shd AS (SELECT doc_id, unnest({shingles}) AS sh FROM tokd),
hx AS (SELECT doc_id, md5(sh) AS m FROM shd),
ab AS (SELECT doc_id, {a_sql} AS a, {b_sql} AS b FROM hx),
sig AS (SELECT doc_id, {mins} FROM ab GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig
         WHERE x.doc_id < y.doc_id),
sets AS (SELECT doc_id, {shingles} AS shset FROM tokd)
SELECT id_a, id_b,
       round(len(list_intersect(a.shset, b.shset))
             / CAST(len(list_distinct(list_concat(a.shset, b.shset))) AS DOUBLE), 3) AS jac
FROM cand JOIN sets a ON cand.id_a = a.doc_id JOIN sets b ON cand.id_b = b.doc_id
WHERE round(len(list_intersect(a.shset, b.shset))
            / CAST(len(list_distinct(list_concat(a.shset, b.shset))) AS DOUBLE), 3)
      >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs: per-distinct-token hash, per-bit majority
    vote → 48-bit signature; candidates share ≥1 of 4 12-bit signature
    bands; keep pairs with hamming distance ≤ 6. Votes come from
    word-3-gram shingles, not tokens: the synthetic corpus has a tiny
    vocabulary, so token SETS barely differ between unrelated docs —
    shingle sets do.

    Band width is the scale lever: expected bucket size is N / 2^width,
    and candidate pairs grow with sum(bucket²). 8-bit bands (256
    values) produced 30M candidate pairs from a 5.5k-doc corpus and
    would be O(N²/256) at 100 TB; 12-bit bands cut that ~16× per band
    while still guaranteeing recall for hamming ≤ 3 (4 bands, 3 flipped
    bits can't touch all of them) — real near-dups sit at hamming 0-2.

    The 48 bit-vote sums run in ONE aggregation (48 agg exprs, still a
    single shuffle of (doc_id, token-hash))."""
    c = _corpus(spark, sf, exact=False)
    tokw = c.select(
        "doc_id", F.explode(word_shingles(F.split("text", " "))).alias("w")
    )
    tokh = tokw.select("doc_id", portable_hash32(F.col("w")).alias("h"))
    votes = tokh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    simhash = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
                for j in range(SIMHASH_BITS)
            ],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    # both sides of the band self-join derive from simhash; an eager
    # persist of the (doc_id, signature) pairs — 16 bytes/doc — stops
    # Spark recomputing the shingle-explode + 48-agg vote shuffle twice
    simhash = simhash.persist(StorageLevel.MEMORY_AND_DISK)
    simhash.count()
    bands = simhash.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", SIMHASH_BAND_BITS * b)
                        .bitwiseAND(F.lit(SIMHASH_BAND_MASK))
                        .alias("bv"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.bv").alias("bv"))

    x, y = bands.alias("x"), bands.alias("y")
    ham = F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
    return (
        x.join(y, ["band", "bv"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            ham.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


def _simhash_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    sh_expr = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"(simhash >> {SIMHASH_BAND_BITS * b}) & {SIMHASH_BAND_MASK} AS bv FROM sh"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH corpus AS ({_corpus_sql(exact=False)}),
tokh AS (SELECT doc_id, {portable_hash32_sql('w')} AS h FROM
         (SELECT doc_id, unnest({word_shingles_sql('t')}) AS w FROM
          (SELECT doc_id, string_split(text, ' ') AS t FROM corpus) tk) u),
votes AS (SELECT doc_id, {votes} FROM tokh GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({sh_expr} AS BIGINT) AS simhash FROM votes),
bands AS ({band_selects})
SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv
WHERE x.doc_id < y.doc_id
  AND bit_count(xor(x.simhash, y.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Char-4-gram Jaccard with prefix blocking: candidate pairs share
    a 24-char prefix (cheap equality join — near-dups from truncation/
    suffix edits share prefixes), then exact set Jaccard ≥ 0.6.

    Blocking keeps the pair space linear in bucket sizes instead of
    quadratic in corpus size; the gram arrays are built per-row inside
    codegen (transform over a sequence), no explode."""
    c = _corpus(spark, sf, exact=False)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 3, F.lit(1))),
            lambda i: F.col("text").substr(i, F.lit(4)),
        )
    )
    g = c.select(
        "doc_id",
        F.substring("text", 1, PREFIX_BLOCK_LEN).alias("prefix"),
        grams.alias("grams"),
    )
    a, b = g.alias("a"), g.alias("b")
    jac = F.size(F.array_intersect("a.grams", "b.grams")).cast("double") / F.size(
        F.array_union("a.grams", "b.grams")
    ).cast("double")
    return (
        a.join(b, "prefix")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(jac, 3).alias("jac"),
        )
        .where(F.col("jac") >= NGRAM_THRESHOLD)
    )


def _ngram_sql() -> str:
    grams = (
        "list_distinct(list_transform(range(1, greatest(length(text) - 2, 2)), "
        "i -> substr(text, i, 4)))"
    )
    return f"""
WITH corpus AS ({_corpus_sql(exact=False)}),
g AS (SELECT doc_id, substr(text, 1, {PREFIX_BLOCK_LEN}) AS prefix, {grams} AS grams
      FROM corpus)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.grams, b.grams))
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE), 3) AS jac
FROM g a JOIN g b ON a.prefix = b.prefix AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.grams, b.grams))
            / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE), 3)
      >= {NGRAM_THRESHOLD}
"""


RARE_KEYS = 2  # rarest grams folded into the canopy signature
BLOCK_CAP = 16  # canopy grams must have df <= cap: rare by construction


def dedup_jaccard_rareblock(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram Jaccard with a rarest-gram CANOPY SIGNATURE — the
    scale-bounded alternative to prefix blocking
    (`dedup_ngram_jaccard`), whose blocks are populous on templated
    corpora.

    Candidate generator:
    1. gram document-frequencies — one map-side-combined aggregate
       (|gram vocab| rows);
    2. canopy-eligible grams are those with df ≤ BLOCK_CAP (the
       "stop blocking key" rule applied at the GRAM level: a gram
       shared by many documents carries no discriminative signal, and
       keeping it would regrow quadratic pairs — this synthetic
       corpus has a 31-word vocabulary, so without the cap every
       canopy saturates). The eligible set is broadcast, so the
       explode → filter runs map-side with no shuffle;
    3. each doc's canopy key = its 2 lowest-(df, gram) eligible
       grams, concatenated. Every member of a signature block
       contains the key's first gram, so block size ≤ cap BY
       CONSTRUCTION — candidate volume is ≤ |keys|·C(cap,2) at any
       corpus size, the property prefix blocking lacks. Documents
       whose every gram is hot get no canopy key and fall through to
       the other dedup ops (minhash LSH's banded AND-amplification
       stays selective exactly where canopies saturate);
    4. exact char-4-gram Jaccard ≥ 0.6 verifies candidates only.

    Near-dup recall: copies share almost all grams, hence their rare
    ones, hence their canopy key. NOTE the scale behavior on THIS
    synthetic corpus: its generator draws from a 31-word vocabulary,
    so the 980-gram space saturates as the corpus grows — at sf0.01
    most docs still own a df≤cap gram (planted dups collide at
    ~70-85%), while at sf0.1 almost no gram stays rare and the
    operator correctly degrades to a handful of candidates rather
    than regrowing quadratic pairs. On real text the gram space is
    effectively unbounded and rarity persists at any scale — the
    degradation is a property of bounded-vocabulary corpora, and
    minhash LSH (banded AND-amplification) is the op that stays
    selective there. The rare-gram window's input
    is only the df≤cap rows (thousands, not the 22M exploded grams),
    so the whole generator costs one scan + one tiny window."""
    c = _corpus(spark, sf, exact=False)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 3, F.lit(1))),
            lambda i: F.col("text").substr(i, F.lit(4)),
        )
    )
    # g is consumed FOUR times (df aggregate, signature build, and both
    # sides of the verify join); without materialization Spark re-runs
    # the per-char gram transform once per consumer — measured 7.4 s →
    # 3.0 s at sf0.1 with the eager persist. Materializing the gram
    # signature set is the standard signature-store step; spill-safe.
    g = c.select("doc_id", grams.alias("grams")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    g.count()
    gx = g.select("doc_id", F.explode("grams").alias("gr"))
    rare_grams = (
        gx.groupBy("gr")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= BLOCK_CAP)
    )
    wr = W.partitionBy("doc_id").orderBy("df", "gr")
    sigkey = (
        gx.join(F.broadcast(rare_grams), "gr")
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= RARE_KEYS)
        .groupBy("doc_id")
        .agg(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.lpad("rn", 2, "0"), "gr")))).alias("sig"))
    )
    # per-doc signature rows feed both sides of the self-join —
    # materialize once instead of building the window+groupBy twice
    sigkey = sigkey.persist(StorageLevel.MEMORY_AND_DISK)
    sigkey.count()
    cand = (
        sigkey.alias("ka")
        .join(sigkey.alias("kb"), "sig")
        .where(F.col("ka.doc_id") < F.col("kb.doc_id"))
        .select(
            F.col("ka.doc_id").alias("id_a"), F.col("kb.doc_id").alias("id_b")
        )
        .distinct()
    )
    jac = F.size(F.array_intersect("ga.grams", "gb.grams")).cast("double") / F.size(
        F.array_union("ga.grams", "gb.grams")
    ).cast("double")
    return (
        cand.join(g.alias("ga"), cand.id_a == F.col("ga.doc_id"))
        .join(g.alias("gb"), cand.id_b == F.col("gb.doc_id"))
        .select("id_a", "id_b", F.round(jac, 3).alias("jac"))
        .where(F.col("jac") >= NGRAM_THRESHOLD)
    )


def _rareblock_sql() -> str:
    grams = (
        "list_distinct(list_transform(range(1, greatest(length(text) - 2, 2)), "
        "i -> substr(text, i, 4)))"
    )
    return f"""
WITH corpus AS MATERIALIZED ({_corpus_sql(exact=False)}),
g AS MATERIALIZED (SELECT doc_id, {grams} AS grams FROM corpus),
gx AS MATERIALIZED (SELECT doc_id, unnest(grams) AS gr FROM g),
rare_grams AS MATERIALIZED (
  SELECT gr, count(*) AS df FROM gx GROUP BY 1 HAVING count(*) <= {BLOCK_CAP}
),
sigkey AS MATERIALIZED (
  SELECT doc_id,
         array_to_string(list_sort(list(concat_ws(':', lpad(CAST(rn AS VARCHAR), 2, '0'), gr))), '|') AS sig
  FROM (
    SELECT gx.doc_id, gx.gr,
           row_number() OVER (PARTITION BY gx.doc_id
                              ORDER BY rg.df, gx.gr) AS rn
    FROM gx JOIN rare_grams rg ON gx.gr = rg.gr) r
  WHERE rn <= {RARE_KEYS}
  GROUP BY doc_id
),
cand AS MATERIALIZED (
  SELECT DISTINCT ka.doc_id AS id_a, kb.doc_id AS id_b
  FROM sigkey ka JOIN sigkey kb ON ka.sig = kb.sig AND ka.doc_id < kb.doc_id
)
SELECT id_a, id_b,
       round(len(list_intersect(ga.grams, gb.grams))
             / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE), 3)
         AS jac
FROM cand
JOIN g ga ON ga.doc_id = id_a
JOIN g gb ON gb.doc_id = id_b
WHERE round(len(list_intersect(ga.grams, gb.grams))
            / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE), 3)
      >= {NGRAM_THRESHOLD}
"""


DEDUP_CC_ITERS = 2


def dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs → connected components → canonical keep-list:
    the decision step of the dedup pipeline (pairs alone don't tell
    you which copies to drop). Component id = min doc_id reachable in
    ≤ DEDUP_CC_ITERS hops of label propagation over the MinHash pair
    graph; keep = (doc_id == component).

    Fixed iteration count keeps the operator closed-form (mechanically
    unrolled in the oracle — hash-identical by construction) and is
    sufficient for near-dup graphs, whose components are tiny by
    nature (a dup cluster of diameter > 2 means transitive-only
    near-dups, which the Jaccard verify already filtered). A general
    graph would use alternating large-star/small-star instead. Each
    hop is one join + one map-side-combined min-agg on the edge list —
    edges ≈ dup pairs ≪ corpus."""
    c = _corpus(spark, sf, exact=False).select("doc_id")
    pairs = dedup_minhash_lsh(spark, sf).select("id_a", "id_b")
    # one explode instead of union-of-two-subplans (would run the whole
    # MinHash lineage twice), then cache: each propagation hop re-joins
    # the edge list, and edges ≈ dup pairs — tiny even at 100 TB —
    # while their lineage is the full shingle/LSH pipeline
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst").cache()
    edges.count()  # eager: the hops' branch jobs must not race the fill
    labels = c.select("doc_id", F.col("doc_id").alias("comp"))
    for _ in range(DEDUP_CC_ITERS):
        nb = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("comp").alias("nb_comp"))
        )
        labels = (
            labels.join(nb, labels.doc_id == nb.src, "left")
            .select(
                labels.doc_id,
                F.least(
                    F.col("comp"), F.coalesce("nb_comp", F.col("comp"))
                ).alias("comp"),
            )
        )
    return labels.select(
        "doc_id",
        F.col("comp").cast("long").alias("component"),
        (F.col("doc_id") == F.col("comp")).alias("keep"),
    )


def _components_sql() -> str:
    prop = """
l{o} AS (
  SELECT l{i}.doc_id,
         least(l{i}.comp, coalesce(min(lx.comp), l{i}.comp)) AS comp
  FROM l{i}
  LEFT JOIN edges e ON e.src = l{i}.doc_id
  LEFT JOIN l{i} lx ON lx.doc_id = e.dst
  GROUP BY l{i}.doc_id, l{i}.comp
)"""
    iters = ",".join(prop.format(i=i, o=i + 1) for i in range(DEDUP_CC_ITERS))
    return f"""
WITH pairs AS ({_minhash_sql()}),
cdocs AS ({_corpus_sql(exact=False)}),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
l0 AS (SELECT doc_id, doc_id AS comp FROM cdocs),
{iters}
SELECT doc_id, CAST(comp AS BIGINT) AS component, doc_id = comp AS keep
FROM l{DEDUP_CC_ITERS}
"""


def dedup_against_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-corpus dedup: drop candidate documents already present in
    a REFERENCE corpus — the 'dedup the new crawl against the existing
    training set' step, distinct from within-corpus dedup. Reference =
    even doc_ids; candidates = odd doc_ids ∪ planted exact copies of
    reference docs (doc_id + 1_000_001, proving the drop path).

    Anti-join on the content digest: the reference side collapses to
    DISTINCT 16-byte digests before the join (partial aggregation →
    shuffle carries |unique digests|, not documents), candidates
    shuffle digests not bodies. When the reference digest set fits an
    executor (it usually does — digests are ~0.03% of corpus bytes)
    AQE turns this into a broadcast anti-join with zero candidate
    shuffle."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    ref = d.where(F.col("doc_id") % 2 == 0)
    planted = ref.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_001).alias("doc_id"), "text"
    )
    cand = d.where(F.col("doc_id") % 2 == 1).union(planted)
    ref_fp = ref.select(F.md5("text").alias("fp")).distinct()
    return (
        widen(cand, spark)
        .select("doc_id", F.md5("text").alias("fp"))
        .join(ref_fp, "fp", "left_anti")
        .select("doc_id")
    )


PREFIX_TOKENS = 16


def dedup_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix dedup: documents sharing their first PREFIX_TOKENS words
    collapse to one survivor — the boilerplate/template pass an LLM
    corpus runs alongside full-content dedup (crawled pages and
    generated text repeat openings verbatim while tails drift, so
    exact dedup misses them and MinHash pays a full-document shingle
    pass to find them).

    Scale shape: identical to :func:`dedup_exact` — the only shuffle
    moves a 32-byte prefix digest per doc (~0.03% of a 100 TB corpus),
    map-side combined; the `n_docs > 1` filter emits only dup groups.
    Runs over the near-dup corpus (tail-truncated plants), which full
    exact dedup cannot collapse — the case this operator exists for."""
    c = _corpus(spark, sf, exact=False)
    tok = F.split("text", " ")
    pfx = F.md5(F.concat_ws(" ", F.slice(tok, 1, PREFIX_TOKENS)))
    return (
        c.select("doc_id", pfx.alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
    )


SPAN_K = 8  # minimum verbatim span length, in tokens
DECON_K = 8          # contamination n-gram length, in tokens
DECON_THRESHOLD = 4  # eval-gram hits at/above which a train doc is contaminated


def _gram_table(
    c: DataFrame, k: int, hash_chars: int = 15, confirm: bool = False
) -> DataFrame:
    """(doc_id, pos, h[, h2]) for every k-token gram of every doc —
    built JVM-side (transform+slice over the token array, zero
    shuffle), keyed by a 60-bit portable hash so downstream shuffles
    move 8-byte keys, never gram text.

    Collision math (birthday bound): among N distinct grams the
    expected number of falsely-equal pairs is ≈ N²/2^61 — negligible
    at gate scale (N=10^9 → 0.4 expected pairs) but routine at
    extreme scale (N=10^12 → ~4×10^5), where span-merging dilutes but
    does not remove false "shared gram" positives. ``confirm=True``
    adds ``h2``, an INDEPENDENT second 60-bit key from the other half
    of the same md5 (hex chars 17-31 vs 1-15 — one digest, no extra
    hashing cost); keying on (h, h2) is a 120-bit key with expected
    false pairs ≈ N²/2^121 (N=10^12 → 4×10^-13, i.e. never). The
    confirm column stays OFF the oracle path — DuckDB BIGINT
    portability fixes the gate key at 60 bits — and is the documented
    production remedy (PLANS.md round-6). ``hash_chars`` narrows the
    primary key (test hook: forcing collisions demonstrably removed
    by confirm)."""
    d = c.select("doc_id", F.split("text", " ").alias("t"))
    grams_arr = F.when(
        F.size("t") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - k + 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    md5 = F.md5(F.col("gram"))
    h = F.conv(F.substring(md5, 1, hash_chars), 16, 10).cast("long")
    cols = [F.col("doc_id"), (F.col("p0") + 1).alias("pos"), h.alias("h")]
    if confirm:
        cols.append(
            F.conv(F.substring(md5, 17, 15), 16, 10).cast("long").alias("h2")
        )
    return d.select("doc_id", F.posexplode(grams_arr).alias("p0", "gram")).select(
        *cols
    )


def _gram_table_sql(src: str, k: int) -> str:
    """DuckDB rendering of :func:`_gram_table` over subquery ``src``."""
    return f"""
SELECT doc_id, s.pos AS pos,
       CAST(concat('0x', substr(md5(
           array_to_string(t[s.pos:s.pos + {k} - 1], ' ')), 1, 15))
         AS BIGINT) AS h
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM ({src}) src_q) tt,
     unnest(generate_series(1, greatest(len(t) - {k} + 1, 0))) AS s(pos)
"""


def dedup_decontaminate(
    spark: SparkSession, sf: str, hash_chars: int = 15, confirm: bool = False
) -> DataFrame:
    """Train/eval decontamination — the benchmark-leakage pass every
    LLM training pipeline runs before training (GPT-3 appendix C /
    The Pile §6: drop or flag training docs sharing verbatim n-grams
    with evaluation sets). Eval set = doc_id % 17 == 0 (a held-out
    slice standing in for the benchmark suite); train = the rest ∪ the
    planted near-dups (which contaminate whenever their source doc is
    an eval member — real positives at any sf).

    Scale shape: the eval side collapses to DISTINCT gram hashes
    BEFORE the join (an eval suite is MBs against a 100 TB corpus, so
    the distinct set broadcasts; AQE picks that automatically), and
    the train side aggregates per doc AFTER a semi-join-shaped inner
    join on the 8-byte hash — train text never shuffles, only (doc_id,
    hash) pairs for matched grams. Output per train doc: distinct
    eval-gram hits and the contamination flag at DECON_THRESHOLD.
    Ints only, hash-stable.

    Sibling of :func:`curate.curate_decontaminate` (gram-STRING
    broadcast join, hits-only output): this variant is the audit form
    — hashed 8-byte keys instead of gram text on the wire, a verdict
    row for EVERY train doc (clean docs included, so downstream
    filters are one join), and planted positives (near-dups of eval
    members) proving the detection path at every sf."""
    c = _corpus(spark, sf, exact=False)
    is_eval = (F.col("doc_id") % 17 == 0) & (F.col("doc_id") < 1_000_000)
    ev = c.where(is_eval)
    tr = c.where(~is_eval)
    # confirm=True: 120-bit (h, h2) join key — the anti-collision
    # production remedy (birthday math in _gram_table's docstring);
    # off the oracle path, which stays at the 60-bit portable key
    key = ["h", "h2"] if confirm else ["h"]
    eval_grams = (
        _gram_table(ev, DECON_K, hash_chars=hash_chars, confirm=confirm)
        .select(*key)
        .distinct()
    )
    hits = (
        _gram_table(tr, DECON_K, hash_chars=hash_chars, confirm=confirm)
        .join(eval_grams, key)
        .groupBy("doc_id")
        .agg(F.count_distinct(*key).cast("long").alias("n_eval_grams"))
    )
    return (
        tr.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_eval_grams", F.lit(0)).cast("long").alias("n_eval_grams"),
            (F.coalesce("n_eval_grams", F.lit(0)) >= DECON_THRESHOLD).alias(
                "contaminated"
            ),
        )
    )


def _decontaminate_sql() -> str:
    k, thr = DECON_K, DECON_THRESHOLD
    corpus = _corpus_sql(exact=False)
    return f"""
WITH c AS ({corpus}),
ev AS (SELECT * FROM c WHERE doc_id % 17 = 0 AND doc_id < 1000000),
tr AS (SELECT * FROM c WHERE NOT (doc_id % 17 = 0 AND doc_id < 1000000)),
eg AS (SELECT DISTINCT h FROM ({_gram_table_sql('SELECT * FROM ev', k)}) g),
hits AS (
  SELECT doc_id, CAST(count(DISTINCT h) AS BIGINT) AS n_eval_grams
  FROM ({_gram_table_sql('SELECT * FROM tr', k)}) g
  WHERE h IN (SELECT h FROM eg)
  GROUP BY doc_id
)
SELECT tr.doc_id,
       CAST(coalesce(hits.n_eval_grams, 0) AS BIGINT) AS n_eval_grams,
       coalesce(hits.n_eval_grams, 0) >= {thr} AS contaminated
FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id
"""


def dedup_span_kgram(
    spark: SparkSession, sf: str, hash_chars: int = 15, confirm: bool = False
) -> DataFrame:
    """Substring-level (span) dedup — the Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) pass: find verbatim runs of ≥ SPAN_K tokens that
    appear in MORE THAN ONE document, merge overlapping/contiguous
    runs into maximal spans per document, and report per-doc span
    coverage — the actionable signal for span-trimming or dropping
    high-boilerplate docs that document-level dedup cannot see
    (VERDICT r4 ask #9; approximated until now by
    text_line_dedup_corpus's fixed chunks).

    Spark-first shape (suffix arrays are the paper's single-machine
    construction; the distributed equivalent is a k-gram table):
      1. per doc, build all SPAN_K-grams JVM-side (transform+slice
         over the token array — zero shuffle, whole-stage codegen),
         keyed by a 60-bit portable hash so the shuffle moves 8-byte
         keys, never gram text;
      2. grams held by ≥2 distinct docs are found with ONE
         hash-keyed groupBy (distinct-gram level, linear — no doc-pair
         join anywhere, so boilerplate grams shared by thousands of
         docs cost their row count, not its square: the same
         saturation discipline as dedup_jaccard_rareblock);
      3. per doc, duplicated gram start positions merge into maximal
         spans with a gaps-and-islands window (break when the next
         start clears the running max end by >1).

    Output: (doc_id, n_tok, n_spans, dup_tokens) for every corpus doc
    — ints only, hash-stable. The planted tail-truncated near-dups
    share their whole prefix with their source doc, so both sides of
    each plant must show dup_tokens ≥ n_tok - 3 (pytest-asserted)."""
    c = _corpus(spark, sf, exact=False)
    d = c.select("doc_id", F.split("text", " ").alias("t"))
    # confirm=True keys gram identity on the 120-bit (h, h2) pair —
    # see _gram_table's birthday-bound docstring; off the oracle path
    key = ["h", "h2"] if confirm else ["h"]
    g = _gram_table(c, SPAN_K, hash_chars=hash_chars, confirm=confirm)
    shared = (
        g.groupBy(*key)
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select(*key)
    )
    dup = g.join(shared, key).select(
        "doc_id", "pos", (F.col("pos") + SPAN_K - 1).alias("fin")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("fin").over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    marked = dup.withColumn(
        "brk",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
    )
    isl = marked.withColumn("grp", F.sum("brk").over(w))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"), F.max("fin").alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"),
    )
    return (
        d.select("doc_id", F.size("t").cast("long").alias("n_tok"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )


def _span_sql() -> str:
    k = SPAN_K
    return f"""
WITH c AS ({_corpus_sql(exact=False)}),
tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM c),
g AS (
  SELECT doc_id, s.pos AS pos, s.pos + {k} - 1 AS fin,
         CAST(concat('0x', substr(md5(
             array_to_string(t[s.pos:s.pos + {k} - 1], ' ')), 1, 15))
           AS BIGINT) AS h
  FROM tt, unnest(generate_series(1, greatest(len(t) - {k} + 1, 0))) AS s(pos)
),
shared AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
dup AS (SELECT doc_id, pos, fin FROM g WHERE h IN (SELECT h FROM shared)),
marked AS (
  SELECT doc_id, pos, fin,
         CASE WHEN max(fin) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) IS NULL
                OR pos > max(fin) OVER (PARTITION BY doc_id ORDER BY pos
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS brk
  FROM dup
),
isl AS (
  SELECT doc_id, pos, fin,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM marked
),
spans AS (SELECT doc_id, grp, min(pos) AS s, max(fin) AS e
          FROM isl GROUP BY doc_id, grp),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT tt.doc_id, CAST(len(t) AS BIGINT) AS n_tok,
       CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM tt LEFT JOIN per_doc ON tt.doc_id = per_doc.doc_id
"""


def span_trim(
    c: DataFrame, k: int = SPAN_K, hash_chars: int = 15, confirm: bool = False
) -> DataFrame:
    """Span TRIMMING — the actionable Lee et al. 2022 pass (VERDICT r5
    ask #5): every verbatim ≥ k-token run that repeats anywhere in the
    corpus keeps only its FIRST occurrence (ordered by doc_id, then
    position); all later occurrences are removed and the surviving
    token ranges are re-concatenated into trimmed text.

    Occurrence-level first-keeper: one row_number window over the
    8-byte gram hash (total order on (doc_id, pos) — deterministic in
    both engines), so within-doc repeats trim too. Rank ≥ 2
    occurrences merge into maximal disjoint spans per doc
    (gaps-and-islands), and reconstruction is a JVM-side
    transform+filter over the token array against the doc's span list
    — no Python UDF, no doc-pair join anywhere; everything is linear
    in corpus tokens, same saturation discipline as dedup_span_kgram.

    Output: (doc_id, n_tok, kept_tokens, trimmed_md5) where
    trimmed_md5 hashes the space-joined surviving tokens — the gate
    therefore verifies the reconstructed TEXT, not just counts.

    ``confirm=True`` keys occurrence identity on the 120-bit (h, h2)
    pair instead of the 60-bit h — the production anti-collision
    remedy documented in :func:`_gram_table` (off the oracle path;
    ``hash_chars`` is the test hook that forces collisions)."""
    d = c.select("doc_id", F.split("text", " ").alias("t"))
    g = _gram_table(c, k, hash_chars=hash_chars, confirm=confirm)
    key = ["h", "h2"] if confirm else ["h"]
    w_h = W.partitionBy(*key).orderBy("doc_id", "pos")
    dup = (
        g.withColumn("rn", F.row_number().over(w_h))
        .where(F.col("rn") >= 2)
        .select("doc_id", "pos", (F.col("pos") + k - 1).alias("fin"))
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("fin").over(w.rowsBetween(W.unboundedPreceding, -1))
    marked = dup.withColumn(
        "brk",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
    )
    isl = marked.withColumn("grp", F.sum("brk").over(w))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"), F.max("fin").alias("e")
    )
    spans_per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("spans")
    )
    joined = d.join(spans_per_doc, "doc_id", "left").select(
        "doc_id",
        "t",
        F.coalesce(
            "spans", F.array().cast("array<struct<s:int,e:int>>")
        ).alias("spans"),
    )
    # spans are disjoint + few per doc; the exists() probe is O(n_tok ×
    # n_spans) whole-stage codegen — no shuffle, no UDF
    indexed = F.transform(
        "t", lambda x, i: F.struct(x.alias("tok"), (i + 1).alias("p"))
    )
    kept = F.filter(
        indexed,
        lambda st: ~F.exists(
            "spans", lambda sp: (st["p"] >= sp["s"]) & (st["p"] <= sp["e"])
        ),
    )
    return joined.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tok"),
        F.size(kept).cast("long").alias("kept_tokens"),
        F.md5(
            F.array_join(F.transform(kept, lambda st: st["tok"]), " ")
        ).alias("trimmed_md5"),
    )


def dedup_span_trim(spark: SparkSession, sf: str) -> DataFrame:
    """Gate entry: :func:`span_trim` over the planted-duplicate corpus
    — each planted near-dup IS a shared prefix of its source doc, so
    it trims to (nearly) nothing while the lower-doc_id source keeps
    its first occurrences (pytest asserts the exact-prefix property on
    a controlled corpus)."""
    return span_trim(_corpus(spark, sf, exact=False), SPAN_K)


def _span_trim_sql() -> str:
    k = SPAN_K
    return f"""
WITH c AS ({_corpus_sql(exact=False)}),
tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM c),
g AS ({_gram_table_sql('SELECT * FROM c', k)}),
r AS (
  SELECT doc_id, pos, pos + {k} - 1 AS fin,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM g
),
dup AS (SELECT doc_id, pos, fin FROM r WHERE rn >= 2),
marked AS (
  SELECT doc_id, pos, fin,
         CASE WHEN max(fin) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) IS NULL
                OR pos > max(fin) OVER (PARTITION BY doc_id ORDER BY pos
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS brk
  FROM dup
),
isl AS (
  SELECT doc_id, pos, fin,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM marked
),
spans AS (SELECT doc_id, grp, min(pos) AS s, max(fin) AS e
          FROM isl GROUP BY doc_id, grp),
toks AS (
  SELECT tt.doc_id AS doc_id, u.p AS p, t[u.p] AS tok
  FROM tt, unnest(generate_series(1, len(t))) AS u(p)
),
kept AS (
  SELECT toks.doc_id AS doc_id, p, tok
  FROM toks LEFT JOIN spans sp
    ON sp.doc_id = toks.doc_id AND p BETWEEN sp.s AND sp.e
  WHERE sp.s IS NULL
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         md5(string_agg(tok, ' ' ORDER BY p)) AS trimmed_md5
  FROM kept GROUP BY doc_id
)
SELECT tt.doc_id, CAST(len(t) AS BIGINT) AS n_tok,
       CAST(coalesce(kept_tokens, 0) AS BIGINT) AS kept_tokens,
       coalesce(trimmed_md5, md5('')) AS trimmed_md5
FROM tt LEFT JOIN per ON tt.doc_id = per.doc_id
"""


def dedup_gram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    k-grams whose FIRST corpus occurrence (lowest doc_id) is this doc
    — the contribution-scoring signal curation uses to order or
    down-weight late near-copies (a doc that introduces nothing new
    scores 0 even when no single neighbor crosses a dedup threshold;
    the additive complement of the pairwise dedup family).

    Scale shape: one distinct-gram table (8-byte hashes), one groupBy
    h → min(doc_id) (map-side combined, |distinct grams| keys), one
    join back, one per-doc agg — all linear, no doc pairs. Output is
    integer counts (novel, total) so the gate compares exact ints;
    novelty = novel/total is one map away for consumers."""
    c = _corpus(spark, sf, exact=False)
    g = _gram_table(c, SPAN_K).select("doc_id", "h").distinct()
    # first-occurrence attribution as a window min over h: one shuffle
    # replaces the former groupBy(h) + join-back pair (VERDICT r5 ask
    # #8 — two fewer jobs, same linear |distinct grams| key space)
    first_doc = F.min("doc_id").over(W.partitionBy("h"))
    per_doc = (
        g.withColumn("is_novel", (F.col("doc_id") == first_doc).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("is_novel").cast("long").alias("n_novel"),
        )
    )
    return (
        c.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
    )


def _gram_novelty_sql() -> str:
    return f"""
WITH c AS ({_corpus_sql(exact=False)}),
g AS (SELECT DISTINCT doc_id, h
      FROM ({_gram_table_sql('SELECT * FROM c', SPAN_K)}) t),
first AS (SELECT h, min(doc_id) AS first_doc FROM g GROUP BY h),
per_doc AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN g.doc_id = first.first_doc THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM g JOIN first ON g.h = first.h
  GROUP BY g.doc_id
)
SELECT c.doc_id,
       CAST(coalesce(per_doc.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(per_doc.n_novel, 0) AS BIGINT) AS n_novel
FROM c LEFT JOIN per_doc ON c.doc_id = per_doc.doc_id
"""


CONTAIN_CAP = 16  # blocking shingles must have df <= cap (rareblock rule)


def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """CONTAINMENT detection — doc-in-doc near-dups (quote expansions,
    prefix copies, boilerplate wrappers) that Jaccard-based dedup
    structurally misses: a small doc fully embedded in a big one has
    |A∩B|/|A∪B| ≈ |A|/|B| (arbitrarily low) while containment
    |A∩B|/|A| = 1. Jaccard-LSH is therefore the WRONG candidate
    generator here; this uses rare-shingle blocking instead — if
    A ⊆ B then A's rarest shingle is in B BY DEFINITION, so probing
    each doc's rarest df≤cap shingle against the full inverted index
    has perfect recall for true containments whose anchor shingle
    stays rare. Block size ≤ cap by construction (the
    dedup_jaccard_rareblock saturation discipline: hot-shingle docs
    fall through rather than regrowing quadratic pairs — on this
    31-word synthetic corpus that happens at high sf; on real text
    rarity persists).

    Integer-only output — (id_contained, id_container, n_shared,
    n_contained_sh) with the ≥0.9 threshold as 10·n_shared ≥ 9·n_a —
    no float rounding anywhere, so cross-engine ties are impossible.

    Scale: one shingle-df aggregate (|shingle vocab| keys, map-side
    combined), one rarest-per-doc window over the df≤cap subset only,
    one bounded probe join, exact verification on candidates only."""
    c = _corpus(spark, sf, exact=False)
    sets = c.select(
        "doc_id", word_shingles(F.split("text", " ")).alias("sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sets.count()  # materialize-at-fork: df agg + probe + both verify sides
    inv = sets.select("doc_id", F.explode("sh").alias("g"))
    rare = (
        inv.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= CONTAIN_CAP)
    )
    ri = inv.join(F.broadcast(rare), "g")
    w = W.partitionBy("doc_id").orderBy("df", "g")
    key = (
        ri.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "g")
    )
    cand = (
        key.alias("a")
        .join(inv.alias("b"), "g")
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa, sb = sets.alias("sa"), sets.alias("sb")
    n_shared = F.size(F.array_intersect("sa.sh", "sb.sh"))
    return (
        cand.join(sa, cand.id_a == F.col("sa.doc_id"))
        .join(sb, cand.id_b == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            n_shared.cast("long").alias("n_shared"),
            F.size("sa.sh").cast("long").alias("na"),
            F.size("sb.sh").cast("long").alias("nb"),
        )
        .where(10 * F.col("n_shared") >= 9 * F.col("na"))
        .where(
            (F.col("na") < F.col("nb"))
            | ((F.col("na") == F.col("nb")) & (F.col("id_a") > F.col("id_b")))
        )
        .select(
            F.col("id_a").alias("id_contained"),
            F.col("id_b").alias("id_container"),
            "n_shared",
            F.col("na").alias("n_contained_sh"),
        )
    )


def _containment_sql() -> str:
    sh = word_shingles_sql("t")
    return f"""
WITH c AS ({_corpus_sql(exact=False)}),
sets AS (
  SELECT doc_id, {sh} AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM c) q
),
inv AS (SELECT doc_id, unnest(sh) AS g FROM sets),
dfr AS (SELECT g, count(*) AS df FROM inv GROUP BY g
        HAVING count(*) <= {CONTAIN_CAP}),
ri AS (SELECT inv.doc_id, inv.g, dfr.df FROM inv JOIN dfr USING (g)),
k AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, g,
           row_number() OVER (PARTITION BY doc_id ORDER BY df, g) AS rn
    FROM ri) r
  WHERE rn = 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM k a JOIN inv b USING (g)
  WHERE a.doc_id <> b.doc_id
),
v AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.sh, sb.sh)) AS n_shared,
         len(sa.sh) AS na, len(sb.sh) AS nb
  FROM cand
  JOIN sets sa ON sa.doc_id = cand.id_a
  JOIN sets sb ON sb.doc_id = cand.id_b
)
SELECT id_a AS id_contained, id_b AS id_container,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST(na AS BIGINT) AS n_contained_sh
FROM v
WHERE 10 * n_shared >= 9 * na
  AND (na < nb OR (na = nb AND id_a > id_b))
"""


def dedup_canonical_best(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup
    component, keep the HIGHEST-QUALITY copy instead of the min-id
    copy — the policy real pipelines want (the near-dup cluster of a
    page usually contains one clean extraction and several truncated
    or boilerplate-wrapped ones; min-id keeps an arbitrary one).

    Composition of two already-gated stages: the label-propagation
    components over the MinHash pair graph (dedup_components) and the
    row-local quality score (text_quality_score's formula, computed
    over the SAME planted corpus). Ranking orders by the ROUNDED
    quality then doc_id, so the keeper choice is reproducible
    cross-engine. Scale shape: components add edge-sized joins, the
    quality score is scan-local, and the final window partitions by
    component — dup clusters are tiny by nature, so no skewed key."""
    from pyspark.sql import Window as W

    labels = dedup_components(spark, sf).select("doc_id", "component")
    c = _corpus(spark, sf, exact=False)
    n = F.length("text").cast("double")
    words = F.size(F.split("text", " ")).cast("double")
    alpha_ratio = F.regexp_count(F.col("text"), F.lit(r"[a-zA-Z]")) / n
    avg_word_len = (n - (words - 1)) / words
    quality = F.round(
        alpha_ratio * 0.7 + F.least(avg_word_len / 10.0, F.lit(1.0)) * 0.3, 4
    )
    q = c.select("doc_id", quality.alias("quality"))
    w = W.partitionBy("component").orderBy(F.desc("quality"), "doc_id")
    return (
        labels.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            F.col("component").cast("long").alias("component"),
            "quality",
            (F.col("rn") == 1).alias("keep_best"),
        )
    )


def _canonical_best_sql() -> str:
    quality = (
        "round(len(regexp_extract_all(text, '[a-zA-Z]'))"
        " / CAST(length(text) AS DOUBLE) * 0.7"
        " + least((length(text) - (len(string_split(text, ' ')) - 1))"
        "   / CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0, 1.0)"
        " * 0.3, 4)"
    )
    return f"""
WITH comp AS ({_components_sql()}),
q AS (SELECT doc_id, {quality} AS quality
      FROM ({_corpus_sql(exact=False)})),
ranked AS (
  SELECT comp.doc_id, comp.component, q.quality,
         row_number() OVER (PARTITION BY comp.component
                            ORDER BY q.quality DESC, comp.doc_id) AS rn
  FROM comp JOIN q ON q.doc_id = comp.doc_id)
SELECT doc_id, component, quality, rn = 1 AS keep_best FROM ranked
"""


BLOOM_M = 2048  # bloom bits (gate-sized; production: 2^30+ — see docstring)
BLOOM_K = 3     # hash functions per key


def dedup_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter dedup prefilter — the two-stage membership check a
    100 TB ingestion pipeline runs BEFORE the exact anti-join: a fixed
    m-bit Bloom filter built from the reference corpus's digests
    answers "definitely novel" locally (no false negatives), so only
    the bloom-positive sliver — true duplicates plus an
    (m,k)-controlled false-positive fraction — ever reaches the exact
    digest join. Same scenario as dedup_against_corpus (reference =
    even doc_ids, candidates = odds ∪ planted exact copies), emitting
    per candidate (bloom_positive, is_dup) so false positives are
    visible and countable.

    Representation: the filter is the DISTINCT-set-bits table
    (≤ min(k·|ref|, m) rows, bounded by the CONSTANT m) broadcast to
    the candidate side; a serving deployment would collect it into a
    real bitset broadcast variable, but the distinct-bit relational
    form keeps the whole thing declarative and oracle-checkable. Bit
    positions come from the one-md5 derived hash family ((a + s·b)
    mod P32 mod m over the digest's own hex words — no extra hash per
    k). m here is gate-sized so the arithmetic is visible at sf
    scales; production sizes m ≈ 10·|ref| bits (2^30 bits = 128 MB
    broadcast for 10^8 reference docs, fp ≈ 1%% at k=3).

    Scale shape: candidates shuffle NOTHING for the negative majority
    — the bloom probe is a broadcast join + per-doc bool_and; the
    exact confirmation join's build side is the reference digest set
    and its probe side only bloom-positives."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    ref = d.where(F.col("doc_id") % 2 == 0)
    planted = ref.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_001).alias("doc_id"), "text"
    )
    cand = d.where(F.col("doc_id") % 2 == 1).unionByName(planted)

    ref_fp = ref.select(F.md5("text").alias("fp")).distinct()
    a, b = hash_family_ab(F.col("fp"))
    hashes = [
        (derived_hash(a, b, s) % BLOOM_M).cast("long")
        for s in range(1, BLOOM_K + 1)
    ]
    bits = (
        ref_fp.select(F.explode(F.array(*hashes)).alias("bit"))
        .distinct()
        .withColumn("present", F.lit(True))
    )
    cand_fp = widen(cand, spark).select("doc_id", F.md5("text").alias("fp"))
    cand_bits = cand_fp.select(
        "doc_id", "fp",
        F.explode(F.array_distinct(F.array(*hashes))).alias("bit"),
    )
    flags = (
        cand_bits.join(F.broadcast(bits), "bit", "left")
        .groupBy("doc_id", "fp")
        .agg(F.min(F.coalesce("present", F.lit(False))).alias(
            "bloom_positive"
        ))
    )
    pos = (
        flags.where(F.col("bloom_positive"))
        .join(F.broadcast(ref_fp.withColumn("dup", F.lit(True))), "fp", "left")
        .select(
            "doc_id", "bloom_positive",
            F.coalesce("dup", F.lit(False)).alias("is_dup"),
        )
    )
    neg = flags.where(~F.col("bloom_positive")).select(
        "doc_id", "bloom_positive", F.lit(False).alias("is_dup")
    )
    return pos.unionByName(neg)


def _bloom_sql() -> str:
    a_sql, b_sql = hash_family_ab_sql("fp")
    seeds = ", ".join(f"({s})" for s in range(1, BLOOM_K + 1))
    return f"""
WITH ref AS (
  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0),
cand AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000001, md5(text) FROM documents
  WHERE doc_id % 2 = 0 AND doc_id % 10 = 0),
refbits AS (
  SELECT DISTINCT {derived_hash_sql(a_sql, b_sql, 's')} % {BLOOM_M} AS bit
  FROM ref, (VALUES {seeds}) seeds(s)),
candbits AS (
  SELECT DISTINCT doc_id, fp,
         {derived_hash_sql(a_sql, b_sql, 's')} % {BLOOM_M} AS bit
  FROM cand, (VALUES {seeds}) seeds(s)),
flags AS (
  SELECT doc_id, fp,
         bool_and(bit IN (SELECT bit FROM refbits)) AS bloom_positive
  FROM candbits GROUP BY 1, 2)
SELECT doc_id, bloom_positive,
       bloom_positive AND fp IN (SELECT fp FROM ref) AS is_dup
FROM flags
"""


_LSH_INDEX_CACHE: dict = {}


def _signatures(df: DataFrame):
    """(bands, sets) for a (doc_id, text) frame: 16 portable minhashes
    → 4 banded signature strings per doc, plus the shingle sets the
    exact-verify stage needs. The same pipeline as dedup_minhash_lsh's
    front half, reused by the index build AND the query side."""
    tok = F.split("text", " ")
    hx = df.select(
        "doc_id", F.explode(word_shingles(tok)).alias("sh")
    ).select("doc_id", F.md5("sh").alias("m"))
    a, b = hash_family_ab(F.col("m"))
    sig = hx.select("doc_id", a.alias("a"), b.alias("b")).groupBy(
        "doc_id"
    ).agg(
        *[
            F.min(derived_hash(F.col("a"), F.col("b"), s)).alias(f"mh{s}")
            for s in range(N_MINHASH)
        ]
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bb).alias("band"),
                        _band_sig([
                            F.col(f"mh{bb * ROWS_PER_BAND + j}")
                            for j in range(ROWS_PER_BAND)
                        ]).alias("sig"),
                    )
                    for bb in range(N_BANDS)
                ]
            )
        ).alias("bs"),
    ).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    sets = df.select("doc_id", word_shingles(tok).alias("shset"))
    return bands, sets


def _lsh_index_dir(spark: SparkSession, sf: str) -> str:
    """Session-memoized persisted LSH index over the documents table:
    band-bucket rows (range-sharded and sorted by sig — serve-time
    bucket joins co-locate) + the shingle sets for exact verification.
    Build-once/search-many, the near-dup sibling of the persisted IVF
    and BM25 indexes."""
    import atexit
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, "lsh_index", sf)
    if key not in _LSH_INDEX_CACHE:
        base = tempfile.mkdtemp(prefix="reair_lsh_index_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        docs = widen(_t(spark, sf, "documents").select("doc_id", "text"))
        bands, sets = _signatures(docs)
        (
            bands.repartitionByRange(8, "sig")
            .sortWithinPartitions("sig")
            .write.mode("overwrite")
            .parquet(f"{base}/bands.parquet")
        )
        sets.write.mode("overwrite").parquet(f"{base}/sets.parquet")
        _LSH_INDEX_CACHE[key] = base
    return _LSH_INDEX_CACHE[key]


def dedup_minhash_persisted(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup lookup against a PERSISTED MinHash-LSH index — the
    continuous-ingestion serving shape: the corpus's band-bucket index
    and shingle sets are built once and written to parquet
    (_lsh_index_dir); each incoming batch computes ONLY ITS OWN
    signatures, probes the index by (band, sig) equi-join, and
    exact-Jaccard-verifies the candidates against the persisted
    shingle sets. Queries: planted tail-truncated near-dups of
    doc_id%10==0 (+1_000_000 — must match their base) and planted
    word-REVERSED texts of doc_id%10==5 (+2_000_000 — 3-gram shingles
    break, must NOT match), so both hit and miss paths pin the hash.

    Scale shape: per-batch work ∝ batch size — the query side's
    signature pass is batch-sized and broadcast into the index join;
    the index side is touched only via the (band, sig) join (sorted,
    range-sharded buckets) and the candidate-keyed sets lookup. The
    corpus-sized shingle shuffle is paid ONCE at build, exactly like
    ann_ivf_persisted_topk / text_bm25_persisted_topk."""
    idx = _lsh_index_dir(spark, sf)
    d = _t(spark, sf, "documents").select("doc_id", "text")
    tok = F.split("text", " ")
    near = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(tok, F.lit(1), F.greatest(F.size(tok) - 3, F.lit(1)))
        ).alias("text"),
    )
    miss = d.where(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(tok)).alias("text"),
    )
    q_bands, q_sets = _signatures(widen(near.unionByName(miss), spark))

    bands_idx = spark.read.parquet(f"{idx}/bands.parquet")
    sets_idx = spark.read.parquet(f"{idx}/sets.parquet")
    cand = (
        bands_idx.join(
            F.broadcast(
                q_bands.select(
                    F.col("doc_id").alias("query_id"), "band", "sig"
                )
            ),
            ["band", "sig"],
        )
        .select("query_id", F.col("doc_id").alias("match_id"))
        .distinct()
    )
    jac = F.size(F.array_intersect("q.shset", "i.shset")).cast(
        "double"
    ) / F.size(F.array_union("q.shset", "i.shset")).cast("double")
    return (
        cand.join(
            F.broadcast(q_sets.alias("q")),
            cand.query_id == F.col("q.doc_id"),
        )
        .join(sets_idx.alias("i"), cand.match_id == F.col("i.doc_id"))
        .select("query_id", "match_id", F.round(jac, 3).alias("jac"))
        .where(F.col("jac") >= JACCARD_THRESHOLD)
    )


def seed_lsh_stream_index(
    spark: SparkSession, reference: DataFrame, index_dir: str
) -> None:
    """Initial state of a STREAMING near-dup index: the reference
    corpus's band rows + shingle sets under ``batch_id=-1`` (candidate
    batches land at batch_id ≥ 0). The LSH twin of
    streaming.seed_digest_corpus."""
    bands, sets = _signatures(reference)
    bands.write.mode("overwrite").parquet(
        f"{index_dir}/bands/batch_id=-1"
    )
    sets.write.mode("overwrite").parquet(f"{index_dir}/sets/batch_id=-1")


def lsh_dedup_sink(
    spark: SparkSession, index_dir: str,
    threshold: float = JACCARD_THRESHOLD,
):
    """foreachBatch body for streaming NEAR-dup dedup: each
    micro-batch computes its own signatures, probes every band row the
    index already holds (seed + previously accepted batches), verifies
    candidates by exact Jaccard against the persisted shingle sets,
    and appends the ACCEPTED documents' bands + sets so they suppress
    later batches.

    Semantics are first-arrival-wins ACROSS batches (the online-dedup
    contract: an accepted document immediately joins the corpus);
    batch-mates do NOT suppress each other — near-duplicate
    canonicalization inside one batch is a batch-local concern the
    caller can run first (dedup_canonical_best) if wanted, and unlike
    exact dedup there is no order-free min-id canonicalization for
    near-dups, so the cross-batch outcome for candidate-vs-candidate
    near-dups legitimately depends on arrival order. Replay-safe the
    same way as the digest corpus sink: the index read EXCLUDES the
    batch's own partitions.

    Scale shape: per-batch work is batch-sized (signatures) + the
    (band, sig) probe join + candidate-keyed set lookups; the index
    grows by accepted rows only and is never rescanned beyond the
    bucket join."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        q_bands, q_sets = _signatures(batch_df)
        q_bands = q_bands.persist(StorageLevel.MEMORY_AND_DISK)
        q_sets = q_sets.persist(StorageLevel.MEMORY_AND_DISK)
        q_sets.count()
        idx_bands = spark.read.parquet(f"{index_dir}/bands").where(
            F.col("batch_id") != batch_id
        )
        idx_sets = spark.read.parquet(f"{index_dir}/sets").where(
            F.col("batch_id") != batch_id
        )
        cand = (
            idx_bands.join(
                F.broadcast(
                    q_bands.select(
                        F.col("doc_id").alias("query_id"), "band", "sig"
                    )
                ),
                ["band", "sig"],
            )
            .select("query_id", F.col("doc_id").alias("match_id"))
            .distinct()
        )
        jac = F.size(F.array_intersect("q.shset", "i.shset")).cast(
            "double"
        ) / F.size(F.array_union("q.shset", "i.shset")).cast("double")
        dup_ids = (
            cand.join(
                F.broadcast(q_sets.alias("q")),
                cand.query_id == F.col("q.doc_id"),
            )
            .join(idx_sets.alias("i"), cand.match_id == F.col("i.doc_id"))
            .where(F.round(jac, 3) >= threshold)
            .select(F.col("query_id").alias("doc_id"))
            .distinct()
        )
        accepted = q_sets.join(dup_ids, "doc_id", "left_anti").select(
            "doc_id"
        )
        q_bands.join(accepted, "doc_id", "left_semi").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/bands/batch_id={batch_id}")
        q_sets.join(accepted, "doc_id", "left_semi").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/sets/batch_id={batch_id}")
        q_bands.unpersist()
        q_sets.unpersist()

    return sink


def stream_dedup_neardup(
    spark: SparkSession,
    candidates: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
) -> None:
    """Run the checkpointed near-dup dedup stream to exhaustion
    (availableNow; a real bus swaps the reader, not the sink)."""
    q = (
        candidates.writeStream.foreachBatch(
            lsh_dedup_sink(spark, index_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def accepted_neardup(spark: SparkSession, index_dir: str) -> DataFrame:
    """The stream's survivors with their shingle-set sizes (batch_id ≥
    0 — the seed partition is the reference corpus)."""
    return (
        spark.read.parquet(f"{index_dir}/sets")
        .where(F.col("batch_id") >= 0)
        .select(
            "doc_id",
            F.size("shset").cast("long").alias("n_shingles"),
        )
    )


def _stream_neardup_queries(spark: SparkSession, sf: str) -> DataFrame:
    """The dedup_minhash_persisted query set (tail-truncated plants of
    doc_id%10==0 at +1M — near-dups that must be DROPPED; word-reversed
    plants of doc_id%10==5 at +2M — novel, must be ACCEPTED)."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    tok = F.split("text", " ")
    near = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(tok, F.lit(1), F.greatest(F.size(tok) - 3, F.lit(1)))
        ).alias("text"),
    )
    miss = d.where(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(tok)).alias("text"),
    )
    return near.unionByName(miss)


_NEARDUP_STREAM_CANDS: dict = {}


def stream_dedup_neardup_q(spark: SparkSession, sf: str) -> DataFrame:
    """Gate: the near-dup query set through the checkpointed stream
    against an index seeded from the documents table; survivors must
    equal the batch probe-and-filter semantics (single availableNow
    batch — candidates are checked against the SEED; the cross-batch
    suppression path is pytest-pinned in controlled order, and the
    first-arrival-wins contract is documented on the sink)."""
    import atexit
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, "neardup_stream", sf)
    if key not in _NEARDUP_STREAM_CANDS:
        base = tempfile.mkdtemp(prefix="reair_ndstream_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        path = f"{base}/candidates"
        _stream_neardup_queries(spark, sf).repartition(4).write.parquet(path)
        _NEARDUP_STREAM_CANDS[key] = path
    path = _NEARDUP_STREAM_CANDS[key]

    # the seed index is immutable per (session, sf); the STREAM mutates
    # its copy (appends accepted batches), so each run clones the
    # memoized seed template — same discipline as the e2e dest templates
    seed_key = (spark.sparkContext.applicationId, "neardup_seed", sf)
    if seed_key not in _NEARDUP_STREAM_CANDS:
        tmpl = tempfile.mkdtemp(prefix="reair_ndstream_seed_")
        atexit.register(shutil.rmtree, tmpl, ignore_errors=True)
        seed_lsh_stream_index(
            spark,
            widen(_t(spark, sf, "documents").select("doc_id", "text")),
            tmpl,
        )
        _NEARDUP_STREAM_CANDS[seed_key] = tmpl
    run = tempfile.mkdtemp(prefix="reair_ndstream_run_")
    atexit.register(shutil.rmtree, run, ignore_errors=True)
    idx = f"{run}/index"
    shutil.copytree(_NEARDUP_STREAM_CANDS[seed_key], idx)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    stream_dedup_neardup(spark, stream, idx, f"{run}/_ckpt")
    return accepted_neardup(spark, idx)


def _stream_neardup_sql() -> str:
    shingles = word_shingles_sql("t")
    a_sql, b_sql = hash_family_ab_sql("m")
    mins = ", ".join(
        f"min({derived_hash_sql('a', 'b', s)}) AS mh{s}"
        for s in range(N_MINHASH)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS sig"
        " FROM sig".format(
            b=b,
            cols=", ".join(
                f"CAST(mh{b * ROWS_PER_BAND + j} AS VARCHAR)"
                for j in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""
WITH queries AS (
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(t[1:greatest(len(t)-3, 1)], ' ') AS text
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, array_to_string(list_reverse(t), ' ')
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE doc_id % 10 = 5),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM queries),
tokd AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
shd AS (SELECT doc_id, unnest({shingles}) AS sh FROM tokd),
hx AS (SELECT doc_id, md5(sh) AS m FROM shd),
ab AS (SELECT doc_id, {a_sql} AS a, {b_sql} AS b FROM hx),
sig AS (SELECT doc_id, {mins} FROM ab GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT q.doc_id AS query_id, i.doc_id AS match_id
  FROM bands q JOIN bands i ON q.band = i.band AND q.sig = i.sig
  WHERE q.doc_id >= 1000000 AND i.doc_id < 1000000),
sets AS (SELECT doc_id, {shingles} AS shset FROM tokd),
dups AS (
  SELECT DISTINCT query_id
  FROM cand JOIN sets q ON cand.query_id = q.doc_id
            JOIN sets i ON cand.match_id = i.doc_id
  WHERE round(len(list_intersect(q.shset, i.shset))
              / CAST(len(list_distinct(list_concat(q.shset, i.shset)))
                     AS DOUBLE), 3) >= {JACCARD_THRESHOLD})
SELECT doc_id, CAST(len(shset) AS BIGINT) AS n_shingles
FROM sets
WHERE doc_id >= 1000000
  AND doc_id NOT IN (SELECT query_id FROM dups)
"""


def _minhash_persisted_sql() -> str:
    shingles = word_shingles_sql("t")
    a_sql, b_sql = hash_family_ab_sql("m")
    mins = ", ".join(
        f"min({derived_hash_sql('a', 'b', s)}) AS mh{s}"
        for s in range(N_MINHASH)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS sig"
        " FROM sig".format(
            b=b,
            cols=", ".join(
                f"CAST(mh{b * ROWS_PER_BAND + j} AS VARCHAR)"
                for j in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""
WITH queries AS (
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(t[1:greatest(len(t)-3, 1)], ' ') AS text
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, array_to_string(list_reverse(t), ' ')
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE doc_id % 10 = 5),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM queries),
tokd AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
shd AS (SELECT doc_id, unnest({shingles}) AS sh FROM tokd),
hx AS (SELECT doc_id, md5(sh) AS m FROM shd),
ab AS (SELECT doc_id, {a_sql} AS a, {b_sql} AS b FROM hx),
sig AS (SELECT doc_id, {mins} FROM ab GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT q.doc_id AS query_id, i.doc_id AS match_id
  FROM bands q JOIN bands i ON q.band = i.band AND q.sig = i.sig
  WHERE q.doc_id >= 1000000 AND i.doc_id < 1000000),
sets AS (SELECT doc_id, {shingles} AS shset FROM tokd)
SELECT query_id, match_id,
       round(len(list_intersect(q.shset, i.shset))
             / CAST(len(list_distinct(list_concat(q.shset, i.shset)))
                    AS DOUBLE), 3) AS jac
FROM cand JOIN sets q ON cand.query_id = q.doc_id
          JOIN sets i ON cand.match_id = i.doc_id
WHERE round(len(list_intersect(q.shset, i.shset))
            / CAST(len(list_distinct(list_concat(q.shset, i.shset)))
                   AS DOUBLE), 3) >= {JACCARD_THRESHOLD}
"""


DEDUP_QUERIES = {
    "stream_dedup_neardup": stream_dedup_neardup_q,
    "dedup_minhash_persisted": dedup_minhash_persisted,
    "dedup_bloom_prefilter": dedup_bloom_prefilter,
    "dedup_canonical_best": dedup_canonical_best,
    "dedup_span_kgram": dedup_span_kgram,
    "dedup_span_trim": dedup_span_trim,
    "dedup_containment": dedup_containment,
    "dedup_gram_novelty": dedup_gram_novelty,
    "dedup_decontaminate": dedup_decontaminate,
    "dedup_prefix": dedup_prefix,
    "dedup_jaccard_rareblock": dedup_jaccard_rareblock,
    "dedup_exact": dedup_exact,
    "dedup_against_corpus": dedup_against_corpus,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_components": dedup_components,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
}

_AGAINST_CORPUS_SQL = """
WITH ref AS (
  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0
),
cand AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000001 AS doc_id, text FROM documents
  WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
)
SELECT doc_id FROM cand
WHERE md5(text) NOT IN (SELECT fp FROM ref)
"""

DEDUP_ORACLES = {
    "stream_dedup_neardup": _stream_neardup_sql(),
    "dedup_minhash_persisted": _minhash_persisted_sql(),
    "dedup_bloom_prefilter": _bloom_sql(),
    "dedup_canonical_best": _canonical_best_sql(),
    "dedup_span_kgram": _span_sql(),
    "dedup_span_trim": _span_trim_sql(),
    "dedup_containment": _containment_sql(),
    "dedup_gram_novelty": _gram_novelty_sql(),
    "dedup_decontaminate": _decontaminate_sql(),
    "dedup_jaccard_rareblock": _rareblock_sql(),
    "dedup_against_corpus": _AGAINST_CORPUS_SQL,
    "dedup_exact": (
        f"SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies "
        f"FROM ({_corpus_sql(exact=True)}) corpus GROUP BY 1"
    ),
    "dedup_prefix": (
        f"SELECT md5(array_to_string(t[1:{PREFIX_TOKENS}], ' ')) AS prefix_fp, "
        "min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_docs "
        f"FROM (SELECT doc_id, string_split(text, ' ') AS t "
        f"FROM ({_corpus_sql(exact=False)}) corpus) s "
        "GROUP BY 1 HAVING count(*) > 1"
    ),
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_components": _components_sql(),
    "dedup_simhash": _simhash_sql(),
    "dedup_ngram_jaccard": _ngram_sql(),
}
