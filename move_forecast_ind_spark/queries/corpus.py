"""Training-corpus preparation operators (round 4 additions).

The large-scale-pipeline surface beyond the dedup/similarity/text families
already registered in :mod:`northstar`: C4-style span-level dedup, Gopher-
style repetition quality, token-length distribution, deterministic corpus
mixture weighting, and per-label embedding centroids. Reference parity:
the reference (satya-dataengineer/move-forecast-IND) has no corpus surface
at all — these implement the LLM-data-pipeline mandate, with each op
expressed as built-in-function DataFrame plans (no Python in the hot path)
and a DuckDB oracle.

Scale notes live on each function: every shuffle is keyed on content
hashes or dimension ids with map-side combinable aggregates; nothing here
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import r2, r4, r6
from ..functions.text import sql_hashed_windows, tokens
from ..functions.vectors import as_double
from ..session import tune
from ..sources import load_table
from .registry import fmt_doc, register
from ..operators.dedup import fanout

# C4-style chunk width (words per span). 10 ≈ the C4 paper's three-sentence
# granularity on a corpus with no sentence delimiters.
_CHUNK_W = 10
# keeper-key packing: doc_id * 2^20 + chunk_pos (pos < 2^20 ⟺ docs under
# ~10M tokens — far above any real document; packing keeps the windowed
# MIN a plain BIGINT in both engines).
_POS_BITS = 20


@register(
    "corpus_chunk_dedup",
    tags=("corpus", "dedup", "window"),
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    ch AS (
      SELECT doc_id, i AS pos,
             array_to_string(w[i * {_CHUNK_W} + 1 : i * {_CHUNK_W} + {_CHUNK_W}], ' ') AS chunk
      FROM t, LATERAL (
        SELECT unnest(generate_series(0, CAST(CEIL(len(w) / {_CHUNK_W}.0) AS INT) - 1)) AS i
      ) s
    ),
    k AS (
      SELECT doc_id, pos,
             MIN(doc_id * {1 << _POS_BITS} + pos) OVER (PARTITION BY chunk) AS keeper
      FROM ch
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN doc_id * {1 << _POS_BITS} + pos = keeper THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept_chunks,
           CAST(SUM(CASE WHEN doc_id * {1 << _POS_BITS} + pos = keeper THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dup_chunks
    FROM k
    GROUP BY 1
    """,
)
def corpus_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span-level exact dedup: split every document into
    10-word chunks, keep each distinct chunk's FIRST corpus
    occurrence (ordered by doc_id, then position), report per-doc
    kept/dropped counts.

    Plan: one Generate (chunks packed inside the transform — the generator
    over a raw lazy chain evaluates per OUTPUT row, see operators/dedup.py)
    then ONE shuffle keyed on chunk text for the windowed keeper MIN.
    At 100 TB this is exactly the C4 dedup shuffle: the window partition
    for a chunk is its duplicate set, the aggregate is a keyed MIN over a
    packed BIGINT, and hot chunks (boilerplate) are bounded by the
    duplicate count itself — the rows being removed."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), F.ceil(n / F.lit(float(_CHUNK_W))).cast("int") - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice("toks", i * _CHUNK_W + 1, _CHUNK_W)).alias(
                "chunk"
            ),
        ),
    )
    ch = toks.select("doc_id", F.explode(chunk_arr).alias("c")).select(
        "doc_id", F.col("c.pos").alias("pos"), F.col("c.chunk").alias("chunk")
    )
    key = F.col("doc_id") * (1 << _POS_BITS) + F.col("pos")
    keeper = F.min(key).over(Window.partitionBy("chunk"))
    kept = (key == keeper).cast("long")
    return (
        ch.select("doc_id", kept.alias("kept"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("kept").alias("n_kept_chunks"),
            (F.count(F.lit(1)) - F.sum("kept")).alias("n_dup_chunks"),
        )
    )


@register(
    "corpus_repetition_quality",
    tags=("corpus", "text", "quality"),
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    b AS (
      SELECT doc_id, len(w) AS n_toks, len(list_distinct(w)) AS n_distinct,
             w[i] || ' ' || w[i + 1] AS bg
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) s
      WHERE len(w) >= 2
    ),
    c AS (
      SELECT doc_id, n_toks, n_distinct, bg, COUNT(*) AS c
      FROM b GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_bigram_n,
           FLOOR(CAST(MAX(c) AS DOUBLE) / SUM(c) * 1e4 + 0.5) / 1e4 AS top_bigram_frac,
           FLOOR(CAST(MAX(n_distinct) AS DOUBLE) / MAX(n_toks) * 1e4 + 0.5) / 1e4
             AS distinct_word_ratio
    FROM c
    GROUP BY 1
    """,
)
def corpus_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: total/most-frequent
    bigram counts, top-bigram fraction, distinct-word ratio. The standard
    quality gate against degenerate repetitive text, as two map-side
    combinable aggregations (doc×bigram counts, then per-doc max/sum) —
    no windows, no joins; scales as a word-count."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    base = toks.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        "toks",
    ).filter(F.col("n_toks") >= 2)
    bi_arr = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.slice("toks", i, 2)),
    )
    bigrams = base.select(
        "doc_id", "n_toks", "n_distinct", F.explode(bi_arr).alias("bg")
    )
    cnt = bigrams.groupBy("doc_id", "n_toks", "n_distinct", "bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    return cnt.groupBy("doc_id", "n_toks", "n_distinct").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_n"),
        r4(F.max("c") / F.sum("c")).alias("top_bigram_frac"),
        r4(F.col("n_distinct") / F.col("n_toks")).alias("distinct_word_ratio"),
    ).select(
        "doc_id",
        "n_bigrams",
        "top_bigram_n",
        "top_bigram_frac",
        "distinct_word_ratio",
    )


@register(
    "corpus_length_histogram",
    tags=("corpus", "aggregate"),
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_toks
      FROM documents
    ),
    h AS (
      SELECT CAST(FLOOR(n_toks / 16.0) AS BIGINT) AS bucket,
             COUNT(*) AS n_docs,
             FLOOR(AVG(CAST(n_toks AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS avg_tokens
      FROM t GROUP BY 1
    )
    SELECT bucket, bucket * 16 AS bucket_lo, n_docs, avg_tokens,
           FLOOR(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () * 1e4 + 0.5) / 1e4
             AS share
    FROM h
    """,
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution in 16-token buckets with corpus share —
    the sequence-length profile a batching/packing scheduler needs. One
    map-side-combinable aggregate plus a scalar-total window."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text")))
    h = (
        docs.select(F.floor(n_toks / F.lit(16.0)).alias("bucket"),
                    n_toks.alias("n_toks"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            r4(F.avg(F.col("n_toks").cast("double"))).alias("avg_tokens"),
        )
    )
    return h.select(
        "bucket",
        (F.col("bucket") * 16).alias("bucket_lo"),
        "n_docs",
        "avg_tokens",
        r4(F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy())).alias(
            "share"
        ),
    )


# Deterministic training-mixture weights by language (the "upsample the
# high-resource-quality slice" epoch-weighting pattern).
_MIX_WEIGHTS: dict[str, int] = {"en": 3, "de": 2, "fr": 2, "es": 1, "zh": 1}


@register(
    "corpus_mix_weighted",
    tags=("corpus", "sampling"),
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             CASE {" ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())}
                  ELSE 1 END AS weight
      FROM documents
    ),
    rep AS (
      SELECT doc_id, lang, weight
      FROM w, LATERAL (SELECT unnest(generate_series(1, weight)) AS r) s
    ),
    g AS (
      SELECT lang, weight, COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_upsampled
      FROM rep GROUP BY 1, 2
    )
    SELECT lang, weight, n_docs, n_upsampled,
           FLOOR(CAST(n_upsampled AS DOUBLE) / SUM(n_upsampled) OVER () * 1e4 + 0.5)
             / 1e4 AS pct_of_mix
    FROM g
    """,
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixture weighting: replicate each document
    ``weight(lang)`` times (sequence-explode — the epoch-upsampling unit of
    a training mix), then report the realized mixture. The replication is
    a Generate (no shuffle, no rand()); only the small summary aggregates."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    weight = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in _MIX_WEIGHTS.items() for x in kv]
        )[F.col("lang")],
        F.lit(1),
    )
    rep = docs.select(
        "doc_id", "lang", weight.alias("weight")
    ).select(
        "doc_id", "lang", "weight",
        F.explode(F.sequence(F.lit(1), F.col("weight"))).alias("r"),
    )
    g = rep.groupBy("lang", "weight").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_upsampled"),
    )
    return g.select(
        "lang",
        "weight",
        "n_docs",
        "n_upsampled",
        r4(
            F.col("n_upsampled") / F.sum("n_upsampled").over(Window.partitionBy())
        ).alias("pct_of_mix"),
    )


@register(
    "emb_centroid_by_label",
    tags=("corpus", "similarity", "aggregate"),
    oracle="""
    WITH d AS (
      SELECT label, ord AS dim, (embedding::DOUBLE[])[ord] AS x
      FROM embeddings, LATERAL (
        SELECT unnest(generate_series(1, len(embedding))) AS ord
      ) s
    ),
    c AS (
      SELECT label, dim, AVG(x) AS mu, COUNT(*) AS n FROM d GROUP BY 1, 2
    )
    SELECT label,
           CAST(MAX(n) AS BIGINT) AS n_vecs,
           FLOOR(sqrt(SUM(mu * mu)) * 1e6 + 0.5) / 1e6 AS centroid_norm,
           FLOOR(AVG(ABS(mu)) * 1e6 + 0.5) / 1e6 AS avg_abs_component
    FROM c
    GROUP BY 1
    """,
)
def emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid statistics (cluster hygiene / drift
    monitoring): posexplode dimensions → per-(label, dim) mean — a shuffle
    of (label, dim) scalar pairs with map-side combine, never whole
    vectors — then fold the centroid back to its norm. The 100 TB shape
    for any per-group vector mean."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("dim0", "x")
    ).select("label", (F.col("dim0") + 1).alias("dim"), "x")
    cen = dims.groupBy("label", "dim").agg(
        F.avg("x").alias("mu"), F.count(F.lit(1)).alias("n")
    )
    return cen.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        r6(F.sqrt(F.sum(F.col("mu") * F.col("mu")))).alias("centroid_norm"),
        r6(F.avg(F.abs(F.col("mu")))).alias("avg_abs_component"),
    )


@register(
    "corpus_stratified_sample",
    tags=("corpus", "sampling", "window"),
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang, rk FROM r WHERE rk <= 20
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly 20 docs per language,
    ranked by md5 of the id — reproducible across engines, partitionings
    and cluster sizes (unlike seeded engine RNG sampling, whose sequence
    is partitioning-specific). The per-stratum top-k is a single windowed
    rank; at scale, per-stratum partitions are language-sized and the
    hash ranking needs no global sort."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        docs.select("doc_id", "lang", rk.alias("rk")).filter(F.col("rk") <= 20)
    )


@register(
    "corpus_split_assign",
    tags=("corpus", "sampling"),
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
               % 100 AS bucket
      FROM documents
    ),
    s AS (
      SELECT lang,
             CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT split, lang, COUNT(*) AS n_docs
    FROM s GROUP BY 1, 2
    """,
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5 hash bucket
    (90/5/5) — the standard leakage-safe split at corpus scale: membership
    is a pure function of the id, so re-runs, engine changes, and corpus
    growth never reshuffle existing assignments. Map-side bucket + one
    summary aggregate; the md5-hex idiom is bit-identical in both engines
    (same as the SimHash token hash)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "corpus_unigram_lm_score",
    tags=("corpus", "text", "quality"),
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1
    ),
    tot AS (SELECT SUM(c) AS n FROM vocab),
    scored AS (
      SELECT t.doc_id, ln(CAST(v.c AS DOUBLE) / tot.n) AS lp
      FROM tok t JOIN vocab v ON t.tok = v.tok CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           FLOOR(AVG(lp) * 1e6 + 0.5) / 1e6 AS avg_logprob,
           FLOOR(EXP(-AVG(lp)) * 1e2 + 0.5) / 1e2 AS unigram_ppl
    FROM scored
    GROUP BY 1
    """,
)
def corpus_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy: score each document by its average
    corpus-unigram log-probability (and the implied unigram perplexity).
    Two aggregations and one broadcast join: the vocabulary frame is
    token-distinct (vanishing vs the corpus; explicitly broadcast — at
    web scale swap for the standard pruned-vocab + shuffle join), the
    token stream is scored map-side, and the per-doc average is map-side
    combinable. No Python in the plan."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    scored = (
        tok.join(F.broadcast(vocab), on="tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("c").cast("double") / F.col("n")).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        r6(F.avg("lp")).alias("avg_logprob"),
        r2(F.exp(-F.avg("lp"))).alias("unigram_ppl"),
    )


@register(
    "dedup_containment_pairs",
    tags=("corpus", "dedup", "join"),
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents
    ),
    sh_all AS (
      SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS sh
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) t
    ),
    sh AS (
      SELECT doc_id, sh FROM sh_all
      QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 1000
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           FLOOR(CAST(n_common AS DOUBLE) / na.n * 1e4 + 0.5) / 1e4
             AS containment_a,
           FLOOR(CAST(n_common AS DOUBLE) / nb.n * 1e4 + 0.5) / 1e4
             AS containment_b
    FROM common
    JOIN sizes na ON doc_a = na.doc_id
    JOIN sizes nb ON doc_b = nb.doc_id
    WHERE CAST(n_common AS DOUBLE) / LEAST(na.n, nb.n) >= 0.8
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT similarity (|A∩B| / |A|): the asymmetric near-dup
    measure that catches sub-document duplication — a short doc quoted
    whole inside a longer one has low Jaccard but containment ≈ 1. Pairs
    where the smaller side is ≥ 80% contained. Reuses the jaccard_pairs
    inverted-index topology (its n_common/n_a/n_b output IS the
    containment numerator/denominators)."""
    tune(spark)
    from ..operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.0, max_df=1000)
    # threshold=0: containment>=0.8 implies no useful Jaccard lower bound
    # when the size ratio is extreme (the exact case containment exists
    # for), so no pair may be pre-dropped; the size prefilter correctly
    # self-disables at t=0 and max_df still bounds the expansion.
    cont = F.col("n_common") / F.least("n_a", "n_b")
    return pairs.filter(cont >= 0.8).select(
        "doc_a",
        "doc_b",
        "n_common",
        r4(F.col("n_common") / F.col("n_a")).alias("containment_a"),
        r4(F.col("n_common") / F.col("n_b")).alias("containment_b"),
    )


@register(
    "corpus_dup_rate_by_source",
    tags=("corpus", "dedup", "aggregate"),
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents
    ),
    sh_all AS (
      SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS sh
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) t
    ),
    sh AS (
      SELECT doc_id, sh FROM sh_all
      QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 1000
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes na ON doc_a = na.doc_id
      JOIN sizes nb ON doc_b = nb.doc_id
      WHERE n_common / (na.n + nb.n - n_common) >= 0.5
    ),
    dup_docs AS (
      SELECT doc_a AS doc_id FROM pairs
      UNION
      SELECT doc_b AS doc_id FROM pairs
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(COUNT(dd.doc_id) AS BIGINT) AS n_in_dup_pair,
           FLOOR(CAST(COUNT(dd.doc_id) AS DOUBLE) / COUNT(*) * 1e4 + 0.5)
             / 1e4 AS dup_rate
    FROM documents d LEFT JOIN dup_docs dd ON d.doc_id = dd.doc_id
    GROUP BY 1
    """,
)
def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication analytics by provenance: which sources contribute
    near-duplicate documents (doc appears in a ≥0.5-Jaccard pair), as a
    per-source rate — the triage view that decides which feeds get
    down-weighted or re-crawled. Composes the exact-Jaccard cascade with
    a metadata join: the dup-doc id set is tiny (∝ near-dups), broadcast
    against the corpus."""
    tune(spark)
    from ..operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5, max_df=1000)
    dup_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        docs.join(F.broadcast(dup_docs), on="doc_id", how="left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("is_dup").alias("n_in_dup_pair"),
            r4(F.count("is_dup") / F.count(F.lit(1))).alias("dup_rate"),
        )
    )


@register(
    "corpus_ngram_novelty",
    tags=("corpus", "text", "dedup"),
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) s
      WHERE len(w) >= 3
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
    firsts AS (SELECT sh, MIN(doc_id) AS d FROM sh GROUP BY 1),
    novel AS (SELECT d AS doc_id, COUNT(*) AS n_novel FROM firsts GROUP BY 1)
    SELECT tot.doc_id, n_shingles,
           COALESCE(n_novel, 0) AS n_novel,
           FLOOR(CAST(COALESCE(n_novel, 0) AS DOUBLE) / n_shingles * 1e4 + 0.5)
             / 1e4 AS novelty_ratio
    FROM tot LEFT JOIN novel ON tot.doc_id = novel.doc_id
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty / contamination score: the fraction of a document's
    distinct 3-shingles whose FIRST corpus occurrence (min doc_id) is this
    document. Low novelty = the content already exists earlier in the
    corpus (the dedup-adjacent contamination check). No per-shingle join
    back: first-occurrence counts aggregate directly to their owning doc
    (two map-combinable aggregates + one tiny doc-keyed join)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    # Shingle IDENTITY without shingle strings (r11, the
    # corpus_source_overlap finding): novelty consumes only distinct
    # counts and per-shingle min-doc — never the text — so hash each
    # 3-token window directly (3-arg xxhash64) and dedupe the LONG array
    # in-row; no concat_ws string per window, long-keyed aggregates
    # (whitespace tokens keep window <-> string bijective; 2^-64
    # collision doctrine, oracle-diffed at sf0.001/0.01).
    postings = (
        fanout(docs, F.col("doc_id"))
        .select(F.col("doc_id"), tokens(F.col("text")).alias("toks"))
        .selectExpr("doc_id", f"{sql_hashed_windows('toks', 3)} AS hs")
        .selectExpr(
            "explode(transform(hs, x -> struct(x AS sh, doc_id AS d))) AS p"
        )
        .select(F.col("p.sh").alias("sh"), F.col("p.d").alias("doc_id"))
    )
    tot = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    novel = (
        postings.groupBy("sh")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0))
    return (
        tot.join(novel, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_shingles",
            n_novel.cast("long").alias("n_novel"),
            r4(n_novel.cast("double") / F.col("n_shingles")).alias(
                "novelty_ratio"
            ),
        )
    )


@register(
    "q10_returned_items",
    tags=("join", "aggregate", "topk", "classic"),
    oracle="""
    SELECT c_custkey, c_name,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 1e2 + 0.5) / 1e2
             AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking — quarter-filtered
    orders ⋈ R-flagged lineitem ⋈ customer ⋈ broadcast nation, top 20 by
    revenue (c_custkey tie-break so the LIMIT is deterministic in both
    engines). Plans as TakeOrderedAndProject: per-task top-k heap +
    driver merge, no global sort at any scale."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "text_tfidf_keywords",
    tags=("corpus", "text", "window"),
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, tok, tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, tok
             ) AS rk
      FROM scored
    )
    SELECT doc_id, tok AS keyword, rk,
           FLOOR(tfidf * 1e6 + 0.5) / 1e6 AS tfidf
    FROM ranked WHERE rk <= 3
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf·ln(N/df), deterministic tie-break on the term. The classic text
    featurization: term-frequency aggregate, document-frequency aggregate
    (broadcast — vocabulary-sized), score map-side, per-doc top-k
    window."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), on="tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias(
                "tfidf"
            ),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            F.col("tok").alias("keyword"),
            "rk",
            r6(F.col("tfidf")).alias("tfidf"),
        )
    )


@register(
    "dedup_incremental_against_base",
    tags=("corpus", "dedup", "join"),
    oracle=r"""
    WITH base AS (
      SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id < 250
    ),
    incoming AS (
      SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id >= 250
    )
    SELECT i.doc_id, i.fp,
           CASE WHEN b.fp IS NULL THEN 0 ELSE 1 END AS dup_of_base
    FROM incoming i LEFT JOIN base b ON i.fp = b.fp
    """,
)
def dedup_incremental_against_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: flag INCOMING documents (doc_id ≥ 250 here —
    the daily-crawl slice) whose canonical fingerprint already exists in
    the BASE corpus (doc_id < 250). The production shape for rolling
    ingestion: the base side reduces to a distinct-fingerprint set — at
    scale a bucketed/Bloom-backed table — and the incoming batch left
    semi-probes it; no pairwise work ever happens."""
    tune(spark)
    from ..functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.filter(F.col("doc_id") < 250)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    incoming = docs.filter(F.col("doc_id") >= 250).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    return incoming.join(F.broadcast(base), on="fp", how="left").select(
        "doc_id",
        "fp",
        F.coalesce(F.col("hit"), F.lit(0)).cast("int").alias("dup_of_base"),
    )


@register(
    "corpus_sequence_pack",
    tags=("corpus", "window", "sampling"),
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\\s+')) AS n_toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_toks,
             SUM(n_toks) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) - n_toks AS start_off
      FROM t
    ),
    b AS (
      SELECT lang, CAST(FLOOR(start_off / 512.0) AS BIGINT) AS bin,
             doc_id, n_toks
      FROM c
    )
    SELECT lang, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS tokens_started,
           MIN(doc_id) AS first_doc_id
    FROM b GROUP BY 1, 2
    """,
)
def corpus_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing manifest: concatenate each language's documents in
    id order and chunk the token stream into 512-token training bins —
    each doc is assigned the bin its START offset falls in (the standard
    concat-then-chunk prep). One running-sum window per language; the
    manifest aggregate is map-side combinable. At scale the window
    partitions by (lang, shard) with per-shard offsets re-based by a
    second tiny aggregate."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_toks")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.select(
        "doc_id",
        "lang",
        "n_toks",
        (F.sum("n_toks").over(w) - F.col("n_toks")).alias("start_off"),
    )
    return (
        c.select(
            "lang",
            F.floor(F.col("start_off") / F.lit(512.0)).alias("bin"),
            "doc_id",
            "n_toks",
        )
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("tokens_started"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


@register(
    "s_table_stats",
    tags=("scan", "stats"),
    oracle="""
    SELECT 'l_returnflag' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_returnflag) AS n_nulls,
           COUNT(DISTINCT l_returnflag) AS n_distinct
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', COUNT(*), COUNT(*) - COUNT(l_suppkey),
           COUNT(DISTINCT l_suppkey) FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
           COUNT(DISTINCT l_shipdate) FROM lineitem
    UNION ALL
    SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
           COUNT(DISTINCT l_quantity) FROM lineitem
    """,
)
def s_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (row count, null count, exact NDV)
    for the optimizer-relevant lineitem columns — the statistics
    collection pass a cost-based optimizer feeds on. One scan: the four
    distinct-counts plan as a single multi-distinct aggregate (Expand),
    then unpivoted to (col, stats) rows. At 100 TB swap the exact NDVs
    for approx_count_distinct — kept exact here so the oracle
    value-hashes."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_returnflag", "l_suppkey", "l_shipdate", "l_quantity"]
    agg = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(c).alias(f"cnt_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"ndv_{c}") for c in cols],
    )
    stack = ", ".join(
        f"'{c}', n_rows - cnt_{c}, ndv_{c}" for c in cols
    )
    return agg.selectExpr(
        "n_rows", f"stack({len(cols)}, {stack}) AS (col, n_nulls, n_distinct)"
    ).select("col", "n_rows", "n_nulls", "n_distinct")


def _zorder_oracle() -> str:
    from ..functions.zorder import z_value_sql

    return f"""
    SELECT l_suppkey, l_partkey,
           {z_value_sql('l_suppkey', 'l_partkey')} AS z
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """


@register(
    "s_zorder_key",
    tags=("scan", "layout"),
    oracle=_zorder_oracle(),
)
def s_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_suppkey, l_partkey) — the
    S9 layout operator: writes sorted by this key put BOTH dimensions'
    ranges into each parquet row group, so min/max statistics prune
    filters on either key (functions/zorder.py; the layout win is
    asserted quantitatively in tests/test_plans.py). Pure shift/mask
    column arithmetic, bit-identical in both engines."""
    tune(spark)
    from ..functions.zorder import z_value

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    return li.select(
        "l_suppkey", "l_partkey",
        z_value(F.col("l_suppkey"), F.col("l_partkey")).alias("z"),
    )


@register(
    "q5_local_supplier_volume",
    tags=("join", "aggregate", "classic"),
    oracle="""
    SELECT n_name,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 1e2 + 0.5) / 1e2
             AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY 1
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join with the customer-supplier same-nation
    equality, region filter pushed to the two-row dim, year-range filter
    pushed to the orders scan. nation/region/supplier broadcast; the only
    shuffle joins are lineitem⋈orders⋈customer on their keys."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ))
    )


@register(
    "corpus_dsir_importance",
    tags=("corpus", "curation", "sampling"),
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    b AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) % 512 AS bucket
      FROM tok
    ),
    tgt AS (SELECT bucket, COUNT(*) AS c FROM b WHERE lang = 'en' GROUP BY 1),
    src AS (SELECT bucket, COUNT(*) AS c FROM b WHERE lang <> 'en' GROUP BY 1),
    tot AS (SELECT (SELECT SUM(c) FROM tgt) AS nt,
                   (SELECT SUM(c) FROM src) AS ns),
    w AS (
      SELECT b.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(  ln((COALESCE(t.c, 0) + 1.0) / (tot.nt + 512))
                 - ln((COALESCE(s.c, 0) + 1.0) / (tot.ns + 512))) AS lw
      FROM b
      CROSS JOIN tot
      LEFT JOIN tgt t USING (bucket)
      LEFT JOIN src s USING (bucket)
      GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           FLOOR(lw * 1e6 + 0.5) / 1e6 AS log_importance
    FROM w
    """,
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the log-likelihood ratio of a TARGET unigram distribution (here the
    'en' slice, standing in for the high-quality target domain) over the
    SOURCE distribution (the rest of the crawl), with features hashed
    into 512 buckets exactly as the paper does — the weights that drive
    importance resampling of a raw crawl toward the target domain.
    Scale: both distributions reduce to 512-row frames (broadcast; the
    hashed-feature trick is precisely what makes DSIR tractable at
    web scale), and the token stream is aggregated map-side; resampling
    itself is corpus_quality_resample's keep-prob pattern with
    exp(log_importance) as the weight."""
    from ..functions.text import tokens

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    b = tok.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 7), 16, 10).cast("long")
            % 512
        ).alias("bucket"),
    )
    tgt = b.filter(F.col("lang") == "en").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("ct")
    )
    src = b.filter(F.col("lang") != "en").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cs")
    )
    tot = tgt.agg(F.sum("ct").alias("nt")).crossJoin(
        src.agg(F.sum("cs").alias("ns"))
    )
    scored = (
        b.crossJoin(F.broadcast(tot))
        .join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(src), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("nt") + F.lit(512))
                )
                - F.log(
                    (F.coalesce(F.col("cs"), F.lit(0)) + F.lit(1.0))
                    / (F.col("ns") + F.lit(512))
                )
            ).alias("lw"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        (F.floor(F.col("lw") * 1e6 + F.lit(0.5)) / 1e6).alias("log_importance"),
    )


@register(
    "corpus_bpe_merge_candidates",
    tags=("corpus", "text", "tokenizer"),
    oracle=r"""
    WITH wf AS (
      SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents)
      GROUP BY 1
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INT), 1) AS left_sym,
             substr(w, CAST(i AS INT) + 1, 1) AS right_sym,
             c
      FROM wf, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
      WHERE len(w) >= 2
    )
    SELECT left_sym, right_sym,
           CAST(SUM(c) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY 1, 2
    ORDER BY pair_count DESC, left_sym, right_sym
    LIMIT 20
    """,
)
def corpus_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First round of BPE tokenizer TRAINING: adjacent-symbol pair counts
    over the character-initialized vocabulary, weighted by word frequency
    — the exact statistic byte-pair encoding maximizes at every merge
    step (Sennrich et al. 2016). Top-20 merge candidates with
    deterministic tie-breaks. Later merge rounds iterate this same
    aggregate over the re-segmented vocabulary (the ml_kmeans /
    ml_pca_power_iteration driver-loop doctrine: per-round state is the
    merge table, frame-sized). Scale: the pair stream is one row per
    (word-type, position) — proportional to the VOCABULARY, not the
    corpus; the corpus-scale work is the word-frequency aggregate, which
    is map-side combinable."""
    tune(spark)
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.length("w") >= 2)
    )
    pairs = wf.select(
        "c",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        "w",
    ).select(
        F.expr("substring(w, i, 1)").alias("left_sym"),
        F.expr("substring(w, i + 1, 1)").alias("right_sym"),
        "c",
    )
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("c").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(20)
    )


@register(
    "corpus_mix_temperature",
    tags=("corpus", "sampling"),
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT SUM(n_chars) AS t FROM counts),
    p AS (
      SELECT lang, n_docs, n_chars,
             CAST(n_chars AS DOUBLE) / tot.t AS share
      FROM counts CROSS JOIN tot
    ),
    q AS (
      SELECT lang, n_docs, n_chars, share,
             pow(share, 0.7) / SUM(pow(share, 0.7)) OVER () AS q
      FROM p
    )
    SELECT lang, n_docs, n_chars,
           FLOOR(share * 1e6 + 0.5) / 1e6 AS natural_share,
           FLOOR(q * 1e6 + 0.5) / 1e6 AS sampled_share,
           FLOOR(q / share * 1e4 + 0.5) / 1e4 AS upsample_factor
    FROM q
    """,
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling weights, α = 0.7
    (qₗ ∝ pₗ^α — the exponential-smoothing rule mBERT/XLM-R/mT5 use to
    lift low-resource languages without drowning the head): per language,
    the natural byte share, the α-sampled share, and the implied
    up/down-sampling factor that corpus_mix_weighted would execute.
    One aggregate to a 5-row frame; windows over it only."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = counts.agg(F.sum("n_chars").alias("t"))
    p = counts.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_chars").cast("double") / F.col("t")
    )
    q = p.withColumn(
        "q",
        F.pow(F.col("share"), 0.7)
        / F.sum(F.pow(F.col("share"), 0.7)).over(Window.partitionBy()),
    )
    r6_ = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return q.select(
        "lang",
        "n_docs",
        "n_chars",
        r6_(F.col("share")).alias("natural_share"),
        r6_(F.col("q")).alias("sampled_share"),
        (F.floor(F.col("q") / F.col("share") * 1e4 + F.lit(0.5)) / 1e4).alias(
            "upsample_factor"
        ),
    )


@register(
    "corpus_heaps_law",
    tags=("corpus", "text", "statistics"),
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    first_seen AS (
      SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY 1
    ),
    per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tok,
             COUNT(DISTINCT CASE WHEN f.first_doc = t.doc_id
                                 THEN t.tok END) AS n_new_types
      FROM tok t JOIN first_seen f ON t.tok = f.tok
      GROUP BY 1
    ),
    curve AS (
      SELECT SUM(n_tok) OVER (ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens,
             SUM(n_new_types) OVER (ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_types
      FROM per_doc
    )
    SELECT CAST(MAX(cum_tokens) AS BIGINT) AS n_tokens,
           CAST(MAX(cum_types) AS BIGINT) AS vocab_size,
           FLOOR(regr_slope(ln(CAST(cum_types AS DOUBLE)),
                            ln(CAST(cum_tokens AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS heaps_beta,
           FLOOR(exp(regr_intercept(ln(CAST(cum_types AS DOUBLE)),
                                    ln(CAST(cum_tokens AS DOUBLE))))
                 * 1e4 + 0.5) / 1e4 AS heaps_k
    FROM curve
    """,
)
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(n) ≈ K·n^β estimated by OLS
    on the ln-ln cumulative (tokens seen, distinct types seen) curve in
    doc_id order — natural text sits at β ≈ 0.4-0.6, and the fitted
    (K, β) extrapolates vocabulary (hence tokenizer and embedding-table
    cost) to corpus scales you haven't crawled yet; the growth-curve
    complement of text_zipf_slope's static rank law. New-type counting
    uses the first-occurrence trick (each type counts once, at its first
    doc — the w_cumulative_distinct_users pattern), so the running
    distinct needs no distinct-in-window. Scale: one token aggregate ∝
    vocabulary + one window over the per-doc frame."""
    tune(spark)
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    first_seen = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        tok.join(first_seen, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            # DISTINCT: a type repeating inside its first doc still adds
            # exactly ONE new vocabulary entry
            F.countDistinct(
                F.when(F.col("first_doc") == F.col("doc_id"), F.col("tok"))
            ).alias("n_new_types"),
        )
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    curve = per_doc.select(
        F.sum("n_tok").over(w).alias("cum_tokens"),
        F.sum("n_new_types").over(w).alias("cum_types"),
    )
    lnty = F.log(F.col("cum_types").cast("double"))
    lnto = F.log(F.col("cum_tokens").cast("double"))
    return curve.agg(
        F.max("cum_tokens").cast("long").alias("n_tokens"),
        F.max("cum_types").cast("long").alias("vocab_size"),
        (F.floor(F.regr_slope(lnty, lnto) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "heaps_beta"
        ),
        (
            F.floor(F.exp(F.regr_intercept(lnty, lnto)) * 1e4 + F.lit(0.5))
            / 1e4
        ).alias("heaps_k"),
    )


@register(
    "text_good_turing_unseen",
    tags=("corpus", "text", "statistics"),
    oracle=r"""
    WITH tf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS r
      FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents)
      GROUP BY 1
    ),
    freq_of_freq AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tf GROUP BY 1
    ),
    agg AS (
      SELECT SUM(r * n_r) AS n_total,
             SUM(n_r) AS vocab,
             COALESCE(MAX(CASE WHEN r = 1 THEN n_r END), 0) AS n1,
             COALESCE(MAX(CASE WHEN r = 2 THEN n_r END), 0) AS n2
      FROM freq_of_freq
    )
    SELECT CAST(n_total AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab_size,
           CAST(n1 AS BIGINT) AS hapax_count,
           FLOOR(CAST(n1 AS DOUBLE) / n_total * 1e6 + 0.5) / 1e6
             AS unseen_mass,
           FLOOR(2.0 * n2 / GREATEST(n1, 1) * 1e6 + 0.5) / 1e6
             AS r1_discounted,
           FLOOR(CAST(n1 AS DOUBLE) / vocab * 1e6 + 0.5) / 1e6
             AS hapax_ratio
    FROM agg
    """,
)
def text_good_turing_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency estimation over the corpus unigrams: the
    unseen-event mass P₀ = N₁/N (hapax count over tokens), the
    discounted count r* = (r+1)·N_{r+1}/N_r at r=1, and the hapax ratio
    N₁/V — the smoothing numbers every n-gram LM needs (corpus_unigram/
    bigram_lm_score use additive smoothing; Good-Turing says how much
    mass additive smoothing SHOULD be reserving) and, as a data-quality
    signal, a hapax ratio spike flags OCR noise or boilerplate floods.
    One token aggregate ∝ vocabulary, then a ≤max-count frequency-of-
    frequency frame — trivially map-combinable at any scale."""
    tune(spark)
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    fof = tf.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    agg = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).alias("n_total"),
        F.sum("n_r").alias("vocab"),
        F.coalesce(
            F.max(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0)
        ).alias("n1"),
        F.coalesce(
            F.max(F.when(F.col("r") == 2, F.col("n_r"))), F.lit(0)
        ).alias("n2"),
    )
    r6_ = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return agg.select(
        F.col("n_total").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab_size"),
        F.col("n1").cast("long").alias("hapax_count"),
        r6_(F.col("n1").cast("double") / F.col("n_total")).alias("unseen_mass"),
        r6_(
            F.lit(2.0) * F.col("n2") / F.greatest(F.col("n1"), F.lit(1))
        ).alias("r1_discounted"),
        r6_(F.col("n1").cast("double") / F.col("vocab")).alias("hapax_ratio"),
    )


@register(
    "corpus_weighted_sample",
    tags=("corpus", "sampling"),
    oracle="""
    WITH w AS (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) AS wt,
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) + 1.0) / 1152921504606846977.0 AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, wt,
             FLOOR(pow(u, 1.0 / wt) * 1e12 + 0.5) / 1e12 AS k
      FROM w
    )
    SELECT doc_id, CAST(wt AS BIGINT) AS weight
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT 50
    """,
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k=50 (Efraimidis &
    Spirakis 2006, algorithm A-ES): each doc draws u from its md5 hash
    (deterministic, engine-reproducible) and survives by the key u^(1/w)
    with w = doc length — the one-pass, merge-friendly way to take a
    length-weighted corpus sample (longer docs proportionally likelier,
    no replacement, no rand()); the exactly-k counterpart of
    corpus_quality_resample's Bernoulli thinning. Keys round to 1e-12
    before ranking (doc_id tie-break) so the engines' pow ulp cannot
    reorder the boundary. Scale: a map stage + one top-k — no shuffle
    beyond TakeOrdered; A-ES keys merge across partitions by
    construction (that is the algorithm's point)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        + 1.0
    ) / 1152921504606846977.0
    k = (
        F.floor(
            F.pow(u, 1.0 / F.col("n_chars").cast("double")) * 1e12 + F.lit(0.5)
        )
        / 1e12
    )
    return (
        docs.select(
            "doc_id", F.col("n_chars").cast("long").alias("weight"), k.alias("k")
        )
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(50)
        .select("doc_id", "weight")
    )


# --- RAG chunking: overlapping token windows ---------------------------------

_CHUNK_TOKENS = 64   # window size in tokens
_CHUNK_STRIDE = 48   # window stride (overlap = 16 tokens)


@register(
    "corpus_chunk_windows",
    tags=("corpus", "curation", "text"),
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(k AS BIGINT) AS chunk_id,
             CAST(1 + k * {_CHUNK_STRIDE} AS BIGINT) AS start_tok,
             array_to_string(
               w[1 + k * {_CHUNK_STRIDE} :
                 LEAST(1 + k * {_CHUNK_STRIDE} + {_CHUNK_TOKENS - 1}, len(w))],
               ' ') AS chunk_text,
             CAST(LEAST(1 + k * {_CHUNK_STRIDE} + {_CHUNK_TOKENS - 1}, len(w))
                  - (1 + k * {_CHUNK_STRIDE}) + 1 AS BIGINT) AS n_tok
      FROM t, LATERAL (
        SELECT unnest(generate_series(0,
          CAST(CEIL(GREATEST(len(w) - {_CHUNK_TOKENS}, 0)
                    / CAST({_CHUNK_STRIDE} AS DOUBLE)) AS BIGINT))) AS k
      ) s
    )
    SELECT doc_id, chunk_id, start_tok, n_tok,
           md5(chunk_text) AS chunk_hash
    FROM c
    """,
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking — the retrieval-corpus preparation
    step (RAG indexing): each document splits into {w}-token windows at
    stride {s} (overlap {o} tokens, so a fact straddling a boundary is
    fully inside at least one chunk), emitting per-chunk offsets, sizes,
    and an md5 fingerprint the downstream chunk-dedup and embedding
    stages key on. Window count = ceil(max(n-{w},0)/{s}) + 1, so every
    short doc yields exactly one chunk and the final window is allowed
    to be partial. Complements corpus_chunk_dedup (fixed disjoint
    C4 spans for dedup) and corpus_pack_sequences (budget packing for
    training): this is the OVERLAPPING read-side layout. Engine shape:
    tokenize once per doc (projected column — the CSE trap), windows
    expand IN-ROW via transform over a sequence, one explode; a pure
    map stage with no shuffle at any scale (plan-asserted)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    t = fanout(docs, F.col("doc_id")).select(
        "doc_id", tokens(F.col("text")).alias("w")
    )
    k_max = F.expr(
        f"CAST(CEIL(GREATEST(size(w) - {_CHUNK_TOKENS}, 0) "
        f"/ CAST({_CHUNK_STRIDE} AS DOUBLE)) AS BIGINT)"
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), k_max),
        lambda k: F.struct(
            k.cast("long").alias("chunk_id"),
            (k * _CHUNK_STRIDE + 1).cast("long").alias("start_tok"),
            F.concat_ws(
                " ", F.slice(F.col("w"), (k * _CHUNK_STRIDE + 1).cast("int"), _CHUNK_TOKENS)
            ).alias("chunk_text"),
        ),
    )
    c = t.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.start_tok").alias("start_tok"),
        F.size(F.split(F.col("c.chunk_text"), " ")).cast("long").alias("n_tok"),
        F.md5(F.col("c.chunk_text")).alias("chunk_hash"),
    )
    return c


fmt_doc(corpus_chunk_windows, 
    w=_CHUNK_TOKENS, s=_CHUNK_STRIDE, o=_CHUNK_TOKENS - _CHUNK_STRIDE
)


# --- cross-modal: cluster term profiles ------------------------------------------

_CTP_STOPS = ("the", "and", "of", "is", "a")
_CTP_MIN_C = 3
_CTP_TOPK = 3


@register(
    "corpus_cluster_term_profile",
    tags=("corpus", "embedding", "text"),
    oracle=f"""
    WITH lab AS (
      SELECT d.doc_id, e.label,
             lower(unnest(string_split_regex(trim(d.text), '\\s+'))) AS tok
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    kept AS (SELECT * FROM lab WHERE tok NOT IN {_CTP_STOPS!r}),
    lt AS (
      SELECT label, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM kept GROUP BY 1, 2
    ),
    tl AS (SELECT label, CAST(SUM(c) AS BIGINT) AS tlab FROM lt GROUP BY 1),
    gt AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ct FROM lt GROUP BY 1),
    tt AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM lt),
    lift AS (
      SELECT l.label, l.tok, l.c,
             CAST(FLOOR(CAST(l.c AS DOUBLE) * tt.tot
                        / (tl.tlab * CAST(gt.ct AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT) AS liftq
      FROM lt l
      JOIN tl ON tl.label = l.label
      JOIN gt ON gt.tok = l.tok
      CROSS JOIN tt
      WHERE l.c >= {_CTP_MIN_C}
    ),
    ranked AS (
      SELECT label, tok, c, liftq,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY liftq DESC, tok) AS rk
      FROM lift
    )
    SELECT label, tok AS term, c AS n_in_cluster,
           liftq / 1e6 AS lift, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_CTP_TOPK}
    """,
)
def corpus_cluster_term_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal cluster labeling: for every EMBEDDING label (the
    semantic cluster), the top {k} distinguishing TERMS of its documents
    by lift = P(term|cluster)/P(term) — the step that turns an opaque
    cluster id into a human-readable topic, joining the text and vector
    modalities through the doc_id == vec_id key. Terms under {mc}
    in-cluster occurrences are fenced out (lift is unstable on
    singletons). Exactness: all four count frames are BIGINT; lift is
    one IEEE expression quantized at 1e6 BEFORE ranking (ties to the
    alphabetical term). Engine shape: one broadcast label join onto the
    token explode, then three schema-sized aggregates — at 100 TB only
    tokenization touches data volume."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    lab = (
        docs.join(F.broadcast(emb), "doc_id")
        .select(
            "label",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok0"),
        )
        .select("label", F.lower(F.col("tok0")).alias("tok"))
        .filter(~F.col("tok").isin(*_CTP_STOPS))
    )
    lt = lab.groupBy("label", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tl = lt.groupBy("label").agg(F.sum("c").cast("long").alias("tlab"))
    gt = lt.groupBy("tok").agg(F.sum("c").cast("long").alias("ct"))
    tt = lt.agg(F.sum("c").cast("long").alias("tot"))
    lift = (
        lt.filter(F.col("c") >= _CTP_MIN_C)
        .join(F.broadcast(tl), "label")
        .join(gt, "tok")
        .crossJoin(F.broadcast(tt))
        .select(
            "label",
            "tok",
            "c",
            F.floor(
                F.col("c").cast("double")
                * F.col("tot")
                / (F.col("tlab") * F.col("ct").cast("double"))
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("liftq"),
        )
    )
    wrk = Window.partitionBy("label").orderBy(F.col("liftq").desc(), "tok")
    return (
        lift.withColumn("rk", F.row_number().over(wrk).cast("int"))
        .filter(F.col("rk") <= _CTP_TOPK)
        .select(
            "label",
            F.col("tok").alias("term"),
            F.col("c").alias("n_in_cluster"),
            (F.col("liftq") / 1e6).alias("lift"),
            "rk",
        )
    )


fmt_doc(corpus_cluster_term_profile, 
    k=_CTP_TOPK, mc=_CTP_MIN_C
)


# --- cross-modal: lexical-semantic agreement audit --------------------------------


@register(
    "corpus_modal_agreement",
    tags=("corpus", "embedding", "dedup", "dq"),
    oracle="""
    WITH lab AS (
      SELECT d.doc_id, e.label, d.text
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    bg AS (
      SELECT doc_id, label,
             list_distinct(list_transform(
               generate_series(1, len(string_split_regex(trim(text),
                                                         '\\s+')) - 1),
               i -> array_to_string(
                 (string_split_regex(trim(text), '\\s+'))[i:i+1], ' ')))
               AS hs
      FROM lab
    ),
    intra AS (
      SELECT label, doc_id, hs,
             LAG(doc_id) OVER (PARTITION BY label ORDER BY doc_id) AS pid,
             LAG(hs) OVER (PARTITION BY label ORDER BY doc_id) AS phs
      FROM bg
    ),
    inter AS (
      SELECT label, doc_id, hs,
             LAG(label) OVER (ORDER BY doc_id) AS plab,
             LAG(hs) OVER (ORDER BY doc_id) AS phs
      FROM bg
    ),
    ij AS (
      SELECT label,
             CAST(FLOOR(CAST(len(list_intersect(hs, phs)) AS DOUBLE)
                  / (len(hs) + len(phs) - len(list_intersect(hs, phs)))
                  * 1e9 + 0.5) AS BIGINT) AS jq
      FROM intra WHERE pid IS NOT NULL
    ),
    xj AS (
      SELECT CAST(FLOOR(CAST(len(list_intersect(hs, phs)) AS DOUBLE)
                  / (len(hs) + len(phs) - len(list_intersect(hs, phs)))
                  * 1e9 + 0.5) AS BIGINT) AS jq
      FROM inter WHERE plab IS NOT NULL AND plab <> label
    ),
    intra_m AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(jq) AS BIGINT) AS sq
      FROM ij GROUP BY 1
    ),
    inter_m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(jq) AS BIGINT) AS sq
      FROM xj
    )
    SELECT 'intra' AS scope, CAST(label AS INT) AS label, n_pairs,
           FLOOR(CAST(sq AS DOUBLE) / n_pairs / 1e9 * 1e6 + 0.5) / 1e6
             AS mean_jaccard
    FROM intra_m
    UNION ALL
    SELECT 'inter', CAST(NULL AS INT), n_pairs,
           FLOOR(CAST(sq AS DOUBLE) / n_pairs / 1e9 * 1e6 + 0.5) / 1e6
    FROM inter_m
    """,
)
def corpus_modal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-semantic agreement audit across modalities: mean word-
    bigram Jaccard of id-consecutive document pairs WITHIN each
    embedding label (semantic cluster) vs ACROSS labels — if the
    embedding space means anything lexically, intra-cluster pairs
    should beat the inter baseline. Chain pairing (each doc with its
    label-order predecessor) keeps the audit at exactly n-1 pairs per
    group — deterministic and volume-linear, never the O(cluster²)
    grind (the SemDeDup fence lesson applied to an audit). Exactness:
    bigram sets are distinct lists, per-pair Jaccard is an integer
    ratio quantized at 1e9, group means exact BIGINT sums. At 100 TB:
    one label broadcast join, one lag window per ordering — the
    set-intersection work is bounded by pairs x bigrams/doc."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    lab = docs.join(F.broadcast(emb), "doc_id").select(
        "doc_id", "label", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    # size guard: Spark's sequence() counts DOWN for a negative span
    # (the shingles_from_tokens trap), so a single-token/empty doc (r12
    # degenerate-document sweep) must short-circuit to an empty bigram
    # set — the oracle's ascending generate_series does this for free
    bg = lab.select(
        "doc_id",
        "label",
        F.expr(
            "CASE WHEN size(w) >= 2 THEN array_distinct("
            "transform(sequence(1, size(w) - 1),"
            " i -> concat_ws(' ', slice(w, i, 2)))) "
            "ELSE CAST(array() AS array<string>) END"
        ).alias("hs"),
    )
    # a pair of two empty bigram sets is 0/0: NULL like the oracle, not
    # an ANSI divide-by-zero; SUM skips the NULL on both engines while
    # COUNT keeps the pair — identical semantics
    denom = (
        F.size("hs")
        + F.size("phs")
        - F.size(F.array_intersect("hs", "phs"))
    )
    jacq = (
        F.when(
            denom > 0,
            F.floor(
                F.size(F.array_intersect("hs", "phs")).cast("double")
                / denom
                * 1e9
                + F.lit(0.5)
            ),
        )
        .cast("long")
        .alias("jq")
    )
    wl = Window.partitionBy("label").orderBy("doc_id")
    intra = bg.select(
        "label",
        "hs",
        F.lag("doc_id").over(wl).alias("pid"),
        F.lag("hs").over(wl).alias("phs"),
    ).filter(F.col("pid").isNotNull())
    wg = Window.orderBy("doc_id")
    inter = bg.select(
        "label",
        "hs",
        F.lag("label").over(wg).alias("plab"),
        F.lag("hs").over(wg).alias("phs"),
    ).filter(F.col("plab").isNotNull() & (F.col("plab") != F.col("label")))
    intra_m = intra.select("label", jacq).groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("jq").cast("long").alias("sq"),
    )
    inter_m = inter.select(jacq).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("jq").cast("long").alias("sq"),
    )
    mean6 = (
        F.floor(
            F.col("sq").cast("double") / F.col("n_pairs") / 1e9 * 1e6
            + F.lit(0.5)
        )
        / 1e6
    ).alias("mean_jaccard")
    return intra_m.select(
        F.lit("intra").alias("scope"),
        F.col("label").cast("int").alias("label"),
        "n_pairs",
        mean6,
    ).unionAll(
        inter_m.select(
            F.lit("inter").alias("scope"),
            F.lit(None).cast("int").alias("label"),
            "n_pairs",
            mean6,
        )
    )
