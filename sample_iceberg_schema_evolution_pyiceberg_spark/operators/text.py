"""Tier C text-analysis operators over the ``documents`` table:
language ID, quality scoring, token counting, fingerprinting
(SURVEY.md §2 Tier C / north-star extensions).

Everything is built-in Catalyst expressions — at 100 TB these run
entirely inside whole-stage codegen with no Python in the row path,
and every query is a single scan + narrow projection (no shuffle except
the final small aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import rolling_hash, words
from .registry import query, t

# marker stopwords for the n-gram/stopword language heuristic — English
# function words; deterministic and SQL-expressible on both engines
_EN_MARKERS = ("the", "a", "of", "and", "to", "in", "is", "for")

_BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
_BPE_UDF = None  # built lazily: pandas_udf needs an active session


def _bpe_segment_count(col):  # type: ignore[no-untyped-def]
    """Count BPE-ish segments (letter runs / digit runs / single
    punctuation) per document via PyArrow's RE2 regex kernel — see
    c09_token_count for the measured rationale. Null text stays null
    (matches size(regexp_extract_all) semantics under sum()). The
    DuckDB oracle is RE2-backed too, so \\s semantics now agree with it
    exactly — the old java.util.regex path was the divergent one
    (java's \\s includes \\x0B, RE2's does not)."""
    global _BPE_UDF  # noqa: PLW0603
    if _BPE_UDF is None:

        def _count(s):  # type: ignore[no-untyped-def]
            import pyarrow as pa  # noqa: PLC0415
            import pyarrow.compute as pc  # noqa: PLC0415

            arr = pa.Array.from_pandas(s)
            counts = pc.count_substring_regex(
                pc.utf8_lower(arr), pattern=_BPE_PATTERN
            )
            return counts.to_pandas()

        _BPE_UDF = F.pandas_udf(_count, "long")
    return _BPE_UDF(col)


@query(
    "c07_text_langid",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             LEN(LIST_FILTER(STR_SPLIT(LOWER(text), ' '),
                             w -> LIST_CONTAINS(
                               ['the','a','of','and','to','in','is','for'], w)))
               AS en_hits,
             LEN(STR_SPLIT(LOWER(text), ' ')) AS n_words
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN en_hits * 10 >= n_words THEN 'en' ELSE 'unknown' END
             AS predicted_lang,
           en_hits, n_words
    FROM scored
    """,
)
def c07_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-density language ID heuristic: share of English function
    words >= 10% -> 'en'. (A real system adds per-language marker sets;
    the operator shape — filter+size over the token array, zero
    shuffles — is the scale-relevant part.)"""
    d = t(spark, sf, "documents")
    ws = words("text")
    en_hits = F.size(
        F.filter(ws, lambda w: w.isin(*_EN_MARKERS))
    )
    return d.select(
        "doc_id",
        "lang",
        F.when(en_hits * 10 >= F.size(ws), "en")
        .otherwise("unknown")
        .alias("predicted_lang"),
        en_hits.alias("en_hits"),
        F.size(ws).alias("n_words"),
    )


@query(
    "c08_text_quality",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars_actual,
           LEN(STR_SPLIT(text, ' ')) AS n_words,
           ROUND(CAST(LENGTH(text) AS DOUBLE)
                 / LEN(STR_SPLIT(text, ' ')), 6) AS avg_word_len,
           ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[a-zA-Z0-9 ]', '', 'g'))
                      AS DOUBLE) / LENGTH(text), 6) AS punct_ratio,
           ROUND(CAST(LEN(LIST_FILTER(STR_SPLIT(LOWER(text), ' '),
                 w -> LIST_CONTAINS(
                   ['the','a','of','and','to','in','is','for'], w)))
                 AS DOUBLE) / LEN(STR_SPLIT(text, ' ')), 6) AS stopword_ratio,
           CASE WHEN LENGTH(text) BETWEEN 100 AND 5000
                 AND LEN(STR_SPLIT(text, ' ')) >= 20 THEN 1 ELSE 0 END
             AS passes_quality
    FROM documents
    """,
)
def c08_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: length, word stats, punctuation + stopword
    ratios, and a pass/fail gate — the standard pre-training corpus
    filter shape."""
    d = t(spark, sf, "documents")
    n_chars = F.length("text")
    ws_raw = F.split(F.col("text"), " ")
    n_words = F.size(ws_raw)
    stop_hits = F.size(F.filter(words("text"), lambda w: w.isin(*_EN_MARKERS)))
    punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
    return d.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars_actual"),
        n_words.cast("bigint").alias("n_words"),
        F.round(n_chars.cast("double") / n_words, 6).alias("avg_word_len"),
        F.round(punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(stop_hits.cast("double") / n_words, 6).alias("stopword_ratio"),
        F.when((n_chars.between(100, 5000)) & (n_words >= 20), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


@query(
    "c09_token_count",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(STR_SPLIT(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(LEN(REGEXP_EXTRACT_ALL(LOWER(text),
                                           '[a-z]+|[0-9]+|[^a-z0-9\\s]')))
                AS BIGINT) AS bpe_ish_tokens,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
)
def c09_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting per source: whitespace tokens + a BPE-ish regex
    segmentation (letters / digits / single punctuation) — the cheap
    first-pass corpus estimate. For sizing with the TRAINED tokenizer
    (what a real pipeline budgets against) use c09b_token_count_exact
    (per doc) / c36b_bpe_apply_tokens (per source), which apply the
    learned c36 merge table.

    The segment count uses an Arrow-batched pandas UDF over PyArrow's
    RE2 kernel (count_substring_regex) rather than Catalyst's
    regexp_count: java.util.regex pays per-position alternation
    backtracking that RE2's DFA doesn't, and regexp_count compiles to
    size(regexp_extract_all(...)) — it still materializes every match.
    Measured at sf10 (500k docs): Catalyst 6.4 s vs Arrow/RE2 1.25 s,
    at parity with DuckDB (1.47 s, itself RE2-backed). The UDF is
    per-row independent (no shuffle, no state), so it scales exactly
    like the scan; the JVM->Arrow transfer is the known cost and is
    five times smaller than the java-regex penalty."""
    # (no repartition ahead of the UDF: measured at sf0.1, an extra
    # shuffle + N Python-worker spin-ups costs more than the serial
    # RE2 pass over a tiny input; at cluster scale the input's own
    # splits parallelize the per-row UDF for free)
    d = t(spark, sf, "documents")
    ws_tokens = F.size(F.split(F.col("text"), " "))
    bpe = _bpe_segment_count(F.col("text"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_tokens).alias("ws_tokens"),
        F.sum(bpe).alias("bpe_ish_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
    )


@query(
    "c15_tfidf_top_terms",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    WITH w AS (
      SELECT doc_id, UNNEST(STR_SPLIT(LOWER(text), ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf,
           ROUND(tf * LN((1.0 + n.n_docs) / (1.0 + df)), 6) AS tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY doc_id
      ORDER BY tf * LN((1.0 + n.n_docs) / (1.0 + df)) DESC, term) <= 3
    """,
)
def c15_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf * ln((1+N)/(1+df)) (smoothed idf), term-lexicographic
    tie-break.

    Plan shape (2 shuffles + 1 broadcast, down from 4 shuffles + a
    countDistinct Expand):
    - one explode, repartitioned by doc_id — HashPartitioning(doc_id)
      satisfies ClusteredDistribution for BOTH the (doc_id, term)
      aggregate and the per-doc window, so tf and the ranking run with
      no further exchange;
    - df derived FROM tf (tf rows are already distinct (doc_id, term),
      so COUNT(*) per term == COUNT(DISTINCT doc_id)) — the exchange
      under tf is reused, no Expand;
    - r17 (guide §2.3, the c39/c04 digest move): the df aggregation
      and the join back to tf key on xxhash64(term) LONGS, not term
      strings — df only needs term EQUALITY, and the term text rides
      the doc_id-partitioned tf side into the final output, so the
      vocabulary exchange and the join hash carry 8-byte keys. Two
      distinct terms colliding (~|vocab|^2/2^65) would merge df counts
      and fail the value gate loudly at any gated scale;
    - the |vocabulary|-sized df table joins back as a broadcast, so
      the corpus-sized tf side never reshuffles on term. At extreme
      vocab (>~broadcast threshold) drop the hint and AQE falls back
      to a digest-keyed shuffle join — semantics unchanged."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    d = t(spark, sf, "documents")
    # repartition BEFORE the explode: the shuffle moves |docs| text
    # rows, not |tokens| exploded rows (300x the row count, same
    # bytes + per-row overhead — and with a single-split input the
    # whole tokenize would also run in the lone scan task). Generate
    # preserves the doc_id hash partitioning, so the (doc_id, term)
    # aggregate and the per-doc window below still need no further
    # exchange.
    w = d.repartition("doc_id").select(
        "doc_id", F.explode(words("text")).alias("term")
    )
    tf = w.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tfd = tf.withColumn("td", F.xxhash64("term"))
    dfreq = tfd.groupBy("td").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.col("tf") * F.log(
        (F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))
    )
    win = Window.partitionBy("doc_id").orderBy(tfidf.desc(), "term")
    return (
        # no forced hint on dfreq: it is VOCABULARY-sized (unbounded at
        # web scale — a forced F.broadcast is never demoted by AQE and
        # would OOM the driver on a real corpus); AQE broadcasts it on
        # its own when the vocabulary is actually small. n is one row.
        tfd.join(dfreq, "td")
        .crossJoin(F.broadcast(n))
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", F.round(tfidf, 6).alias("tfidf"))
    )


@query(
    "c17_corpus_prep_pipeline",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, source,
             LENGTH(text) AS n_chars,
             LEN(STR_SPLIT(text, ' ')) AS n_words,
             LEN(LIST_FILTER(STR_SPLIT(LOWER(text), ' '),
                 w -> LIST_CONTAINS(
                   ['the','a','of','and','to','in','is','for'], w)))
               AS en_hits
      FROM documents
    ),
    quality AS (
      SELECT * FROM base
      WHERE n_chars BETWEEN 100 AND 5000 AND n_words >= 20
    ),
    english AS (SELECT * FROM quality WHERE en_hits * 10 >= n_words),
    keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM english GROUP BY MD5(text)
    )
    SELECT e.source,
           COUNT(*) AS n_docs,
           CAST(SUM(e.n_words) AS BIGINT) AS ws_tokens,
           CAST(SUM(e.n_chars) AS BIGINT) AS total_chars
    FROM english e JOIN keepers k ON e.doc_id = k.doc_id
    GROUP BY e.source
    """,
)
def c17_corpus_prep_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The composed training-data prep pipeline in one plan: quality
    gate (length/word bounds) -> language gate (stopword density) ->
    exact dedup keep-first (digest groupBy) -> per-source token stats.
    One scan feeds everything; the only shuffles are the digest
    dedup and the final small rollup — the end-to-end shape a corpus
    build runs nightly at 100 TB."""
    d = t(spark, sf, "documents")
    ws = words("text")
    base = d.select(
        "doc_id",
        "text",
        "source",
        F.length("text").alias("n_chars"),
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
        F.size(F.filter(ws, lambda w: w.isin(*_EN_MARKERS))).alias("en_hits"),
    )
    english = base.filter(
        F.col("n_chars").between(100, 5000)
        & (F.col("n_words") >= 20)
        & (F.col("en_hits") * 10 >= F.col("n_words"))
    )
    keepers = english.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        english.join(keepers.select("doc_id"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("ws_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "c10_text_fingerprint",
    oracle="""
    SELECT doc_id,
           LIST_REDUCE([CAST(ORD(c) AS BIGINT)
                        for c in STR_SPLIT(SUBSTRING(LOWER(text), 1, 64), '')],
                       (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def c10_text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-hash document fingerprint (polynomial mod 1e9+7 over the
    first 64 chars) — cheap near-identity clustering key. aggregate()
    keeps the fold JVM-side; DuckDB's list_reduce seeds with the first
    element, which equals a 0-seeded fold for this hash."""
    d = t(spark, sf, "documents")
    return d.select("doc_id", rolling_hash(F.col("text")).alias("fingerprint"))


# -- LLM training-data pipeline extensions (round 6) ------------------------

# per-language mixture rates in basis points of 10000 — the "data
# mixing" knob of a pre-training corpus (upsample English, downsample
# the rest). Deterministic: membership is a pure function of doc_id.
_MIXTURE_BP = {"en": 10000, "de": 5000, "es": 5000, "fr": 2500, "zh": 1000}


@query(
    "c20_weighted_mixture",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
          % 10000 <
          CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIXTURE_BP.items())}
          ELSE 0 END
    """,
)
def c20_weighted_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted domain mixing: keep a document iff its
    key hash lands under the language's rate threshold (basis points
    of 10000). This is how a training pipeline composes a corpus
    mixture REPRODUCIBLY at 100 TB: membership is a pure function of
    the key — stable across reruns, engines, partitionings, and
    incremental additions (a new shard's draw never perturbs old
    rows), unlike rand()-based sampling. Pure Catalyst: one scan, a
    hash, a CASE; hash-gated via the md5_hash60 DuckDB twin."""
    from ..functions import md5_hash60  # noqa: PLC0415

    d = t(spark, sf, "documents")
    rate = F.lit(0)
    for k, v in _MIXTURE_BP.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return d.filter(
        md5_hash60(F.col("doc_id").cast("string")) % 10000 < rate
    ).select("doc_id", "lang", "source")


_CHUNK, _STRIDE = 64, 48  # 64-word chunks, 16-word overlap


@query(
    "c22_chunk_overlap",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, STR_SPLIT(text, ' ') AS ws,
             LEN(STR_SPLIT(text, ' ')) AS n
      FROM documents
    ),
    starts AS (
      SELECT doc_id, ws, n, UNNEST(RANGE(0, GREATEST(n - 1, 0) + 1,
             {_STRIDE})) AS start
      FROM w
    )
    SELECT doc_id,
           CAST(start / {_STRIDE} AS BIGINT) AS chunk_id,
           CAST(LEAST({_CHUNK}, n - start) AS BIGINT) AS n_chunk_words,
           ARRAY_TO_STRING(ws[start + 1 : start + {_CHUNK}], ' ')
             AS chunk_text
    FROM starts
    """,
)
def c22_chunk_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window document chunking (64-word chunks, 16-word
    overlap — the context-window preprocessing step of an embedding /
    pretraining pipeline). One scan, one explode; chunk boundaries are
    a pure function of the word offsets, so the output is stable under
    any partitioning. Catalyst-only: sequence() for the stride starts,
    slice() + concat_ws for the chunk — no Python in the row path."""
    d = t(spark, sf, "documents")
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(_STRIDE)
    )
    e = d.select(
        "doc_id", ws.alias("ws"), n.alias("n"),
        F.explode(starts).alias("start"),
    )
    return e.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("bigint").alias("chunk_id"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("start"))
        .cast("bigint")
        .alias("n_chunk_words"),
        F.concat_ws(
            " ", F.slice(F.col("ws"), F.col("start") + 1, _CHUNK)
        ).alias("chunk_text"),
    )


_PACK_WINDOW, _PACK_SHARDS = 256, 8


@query(
    "c19_sequence_packing",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
               % {_PACK_SHARDS} AS shard,
             CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                 1, 15))::BIGINT) % {_PACK_SHARDS}
               ORDER BY doc_id) AS rn
      FROM documents
    ),
    pack(shard, rn, doc_id, n_tokens, pack_id, acc) AS (
      SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN p.acc + d.n_tokens > {_PACK_WINDOW}
                  THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.acc + d.n_tokens > {_PACK_WINDOW}
                  THEN d.n_tokens ELSE p.acc + d.n_tokens END
      FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
    )
    SELECT CAST(shard AS BIGINT) AS shard, doc_id, n_tokens, pack_id
    FROM pack
    """,
)
def c19_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy sequence packing into fixed context windows (256
    whitespace tokens) — the batch-construction step of LLM
    pretraining: concatenate documents until the window would
    overflow, then start the next pack (oversized documents get
    singleton packs). The recurrence is inherently sequential, so it
    runs per SHARD (deterministic hash of the key): shards pack
    independently and in parallel — at 100 TB the shard count is the
    parallelism knob and each shard's pass is one Arrow-batched
    applyInPandas (the documented escape hatch for sequential state,
    never row-at-a-time Python). Output: (shard, doc_id, n_tokens,
    pack_id) — the assignment, hash-checked against a DuckDB
    recursive-CTE replay of the same recurrence."""
    import pandas as pd  # noqa: PLC0415

    from ..functions import md5_hash60  # noqa: PLC0415

    d = t(spark, sf, "documents").select(
        "doc_id",
        (md5_hash60(F.col("doc_id").cast("string")) % _PACK_SHARDS)
        .alias("shard"),
        F.size(F.split(F.col("text"), " "))
        .cast("bigint")
        .alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, pid, acc = [], 0, None
        for tks in pdf["n_tokens"]:
            if acc is None:
                acc = tks
            elif acc + tks > _PACK_WINDOW:
                pid += 1
                acc = tks
            else:
                acc += tks
            pack_ids.append(pid)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf[["shard", "doc_id", "n_tokens", "pack_id"]]

    return d.groupBy("shard").applyInPandas(
        pack, "shard bigint, doc_id bigint, n_tokens bigint, pack_id bigint"
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (round 7): flag training documents sharing
# any word n-gram with a held-out benchmark set — the standard overlap
# filter every LLM training pipeline runs before training (13-gram
# variants in public model reports; n parameterized here).
# ---------------------------------------------------------------------------


def decontaminate(
    docs: DataFrame, bench: DataFrame, n: int = 3
) -> DataFrame:
    """Per-training-doc contamination flags against a benchmark corpus.

    ``docs`` / ``bench``: (doc_id, text). Returns (doc_id, n_shared,
    contaminated) — n_shared = distinct n-grams also present anywhere
    in the benchmark set.

    Scale shape: the benchmark side is the SMALL side by construction
    (eval sets are tiny next to a 100 TB corpus), so its distinct-gram
    set broadcasts and the corpus is touched in ONE scan + one
    broadcast-hash semi pass; the only shuffle is the per-doc count
    aggregation (|docs| rows of (id, long)). No corpus-vs-corpus join
    ever forms.
    """
    from ..functions import word_ngrams  # noqa: PLC0415

    def grams(d: DataFrame) -> DataFrame:
        # ws-projection barrier: keeps split(lower(text)) out of the
        # generator lambda (driver plan/codegen cost — see word_ngrams)
        return d.select("doc_id", words("text").alias("ws")).select(
            "doc_id",
            F.explode(word_ngrams(F.col("ws"), n)).alias("gram"),
        )

    bench_grams = grams(bench).select("gram").distinct()
    hits = (
        grams(docs)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0))
            .cast("long")
            .alias("n_shared"),
            F.when(F.coalesce(F.col("n_shared"), F.lit(0)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("contaminated"),
        )
    )


@query(
    "c23_decontamination",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                      for i in RANGE(1, GREATEST(LEN(ws) - 1, 1))])) AS gram
      FROM (SELECT doc_id, STR_SPLIT(LOWER(text), ' ') AS ws FROM documents)
      WHERE LEN(ws) >= 3
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
    hits AS (
      SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
      FROM g JOIN bench USING (gram)
      WHERE g.doc_id % 20 <> 0
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
           CASE WHEN COALESCE(h.n_shared, 0) > 0 THEN 1 ELSE 0 END
             AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    """,
)
def c23_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    """Gate wiring for ``decontaminate``: every 20th document plays
    the held-out benchmark, the rest are the training corpus; word
    3-grams shared with any benchmark doc flag contamination. The
    oracle replays gram generation + the overlap join relationally
    (same tokenizer as the c04 family). Planted-overlap recall is
    additionally pytest-checked (tests/test_llm_pipeline.py)."""
    d = t(spark, sf, "documents")
    par = spark.sparkContext.defaultParallelism
    docs = d.filter(F.col("doc_id") % 20 != 0).repartition(par, "doc_id")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(docs, bench, n=3)


# ---------------------------------------------------------------------------
# PII scrubbing (round 7): redact emails / IPv4 addresses — the
# compliance pass a training-data pipeline runs before tokenization.
# Patterns are RE2-safe (no backreferences or lookaround) so Spark's
# Java regex and the DuckDB oracle's RE2 agree symbol-for-symbol.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# r14 (VERDICT r13 item 5): phone + credit-card classes. Both RE2-safe
# (alternation instead of backreferences/lookaround — RE2 has neither).
# Phone covers NANP local formats — (415) 555-0134 / 415-555-0134 /
# 415.555.0134; the parens branch needs no leading \b (\b between two
# non-word chars never holds), the bare-digit branch uses it to refuse
# matching inside longer digit runs. Card covers 4x4 grouped (uniform
# space or dash separators — a mixed-separator [ -] class was measured
# to cross class boundaries, eating a phone's trailing 4 digits plus
# three card groups as one "card"; per-branch uniform separators are
# the RE2-safe stand-in for the backreference RE2 lacks) and bare
# 16-digit runs.
PII_PHONE_RE = (
    r"\(\d{3}\)[ .-]?\d{3}[ .-]\d{4}\b"
    r"|\b\d{3}[ .-]\d{3}[ .-]\d{4}\b"
)
PII_CC_RE = (
    r"\b\d{4} \d{4} \d{4} \d{4}\b"
    r"|\b\d{4}-\d{4}-\d{4}-\d{4}\b"
    r"|\b\d{16}\b"
)
# IBAN: ISO 13616 shape — country code, 2 check digits, 10-30
# alphanumeric BBAN (the shortest real IBANs are 15 chars total, e.g.
# Norway; the longest 34). Uppercase-only by spec, so prose words
# never match; no country-table validation (over-redaction is the
# safe side, same stance as the card pattern).
PII_IBAN_RE = r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b"


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, n_ccs, n_ibans, scrubbed)
    — per-class span counts (measured independently on the ORIGINAL
    text) plus the redacted text. Redaction order email -> IBAN ->
    card -> phone -> IP: cards go before phones so a grouped card
    number can't get half-eaten by the phone pattern's digit groups
    (IBAN/card can't cross because both are \b-guarded single
    word-runs). Pure codegen regex kernels: one
    scan, zero shuffles, no Python in the row path — the shape a
    100 TB compliance pass needs."""
    c = F.col(text_col)
    # Column-form patterns, NOT F.expr SQL literals: Spark SQL string
    # literals eat backslashes ('\b' -> backspace), Column lits don't
    def n(pattern: str, name: str):  # type: ignore[no-untyped-def]
        return (
            F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))
            .cast("long")
            .alias(name)
        )

    return docs.select(
        "doc_id",
        n(PII_EMAIL_RE, "n_emails"),
        n(PII_IPV4_RE, "n_ips"),
        n(PII_PHONE_RE, "n_phones"),
        n(PII_CC_RE, "n_ccs"),
        n(PII_IBAN_RE, "n_ibans"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"),
                        PII_IBAN_RE,
                        "<IBAN>",
                    ),
                    PII_CC_RE,
                    "<CARD>",
                ),
                PII_PHONE_RE,
                "<PHONE>",
            ),
            PII_IPV4_RE,
            "<IP>",
        ).alias("scrubbed"),
    )


@query(
    "c24_pii_scrub",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.'
                    || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
                    || CAST((doc_id * 13) % 256 AS VARCHAR) || ' ok'
             ELSE text END
             || CASE WHEN doc_id % 5 = 0 THEN
               ' call (415) 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR),
                                          4, '0')
                    || ' card 4111 1111 1111 '
                    || LPAD(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0')
                    || ' iban DE89370400'
                    || LPAD(CAST((doc_id * 7) % 100000000 AS VARCHAR), 8, '0')
                    || '3000 done'
             ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS BIGINT) AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(text,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
             AS BIGINT) AS n_ips,
           CAST(LEN(REGEXP_EXTRACT_ALL(text,
             '\(\d{3}\)[ .-]?\d{3}[ .-]\d{4}\b|\b\d{3}[ .-]\d{3}[ .-]\d{4}\b'))
             AS BIGINT) AS n_phones,
           CAST(LEN(REGEXP_EXTRACT_ALL(text,
             '\b\d{4} \d{4} \d{4} \d{4}\b|\b\d{4}-\d{4}-\d{4}-\d{4}\b|\b\d{16}\b'))
             AS BIGINT) AS n_ccs,
           CAST(LEN(REGEXP_EXTRACT_ALL(text,
             '\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b'))
             AS BIGINT) AS n_ibans,
           MD5(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
             REGEXP_REPLACE(
             text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
             '\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b',
             '<IBAN>', 'g'),
             '\b\d{4} \d{4} \d{4} \d{4}\b|\b\d{4}-\d{4}-\d{4}-\d{4}\b|\b\d{16}\b',
             '<CARD>', 'g'),
             '\(\d{3}\)[ .-]?\d{3}[ .-]\d{4}\b|\b\d{3}[ .-]\d{3}[ .-]\d{4}\b',
             '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
             '<IP>', 'g')) AS scrub_md5
    FROM aug
    """,
)
def c24_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """Gate wiring for ``scrub_pii``: every 7th document gets a
    deterministic planted email + IPv4 suffix and every 5th a planted
    phone + card suffix (so each redaction class is exercised on known
    spans, not just on whatever the synthetic text happens to
    contain; docs divisible by 35 carry all four), then both engines
    scrub with the identical RE2-safe patterns and hash the redacted
    text. The n_* columns count extracted spans BEFORE redaction."""
    d = t(spark, sf, "documents")
    k = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        k.cast("string"),
        F.lit("@example.com from 10."),
        (k % 256).cast("string"),
        F.lit("."),
        ((k * 7) % 256).cast("string"),
        F.lit("."),
        ((k * 13) % 256).cast("string"),
        F.lit(" ok"),
    )
    phone_cc = F.concat(
        F.lit(" call (415) 555-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" card 4111 1111 1111 "),
        F.lpad(((k * 3) % 10000).cast("string"), 4, "0"),
        F.lit(" iban DE89370400"),
        F.lpad(((k * 7) % 100000000).cast("string"), 8, "0"),
        F.lit("3000 done"),
    )
    aug = d.select(
        "doc_id",
        F.concat(
            F.when(k % 7 == 0, planted).otherwise(F.col("text")),
            F.when(k % 5 == 0, phone_cc).otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_pii(aug).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "n_ccs", "n_ibans",
        F.md5(F.col("scrubbed")).alias("scrub_md5"),
    )


# ---------------------------------------------------------------------------
# Repetition stats (round 7): within-document token-repetition signals
# — the quality filter that catches degenerate/boilerplate text (a
# handful of tokens dominating a document) before it reaches training.
# ---------------------------------------------------------------------------


@query(
    "c25_repetition_stats",
    oracle="""
    WITH w AS (
      SELECT doc_id, UNNEST(STR_SPLIT(LOWER(text), ' ')) AS word
      FROM documents
    ), wf AS (
      SELECT doc_id, word, COUNT(*) AS c
      FROM w WHERE word <> '' GROUP BY doc_id, word
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_token_ratio,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS distinct_ratio
    FROM wf GROUP BY doc_id
    """,
)
def c25_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document repetition profile: token count, distinct-token
    count, the dominance of the most frequent token, and the
    type/token ratio — the standard signals for dropping degenerate
    repetition. Shares the oracle tokenizer (``words``). Scale shape:
    one explode + two shuffles keyed by (doc_id[, word]) — widths are
    token counts, the aggregate state per key is one long; no
    corpus-sized collect anywhere."""
    d = t(spark, sf, "documents")
    par = spark.sparkContext.defaultParallelism
    wf = (
        d.repartition(par, "doc_id")
        .select("doc_id", F.explode(words("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return wf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(
            F.max("c").cast("double") / F.sum("c"), 6
        ).alias("top_token_ratio"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c"), 6
        ).alias("distinct_ratio"),
    )


@query(
    "c26_domain_cap_filter",
    # blocklist threshold and per-domain cap chosen so BOTH paths do
    # real work at sf0.01 (some sources blocked, every survivor capped)
    oracle="""
    WITH stats AS (
      SELECT source, AVG(n_chars) AS avg_chars FROM documents
      GROUP BY source
    ), blocked AS (
      SELECT source FROM stats
      WHERE avg_chars < (SELECT AVG(n_chars) * 0.98 FROM documents)
    ), ranked AS (
      SELECT d.source, d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.doc_id)
               AS rk
      FROM documents d
      WHERE d.source NOT IN (SELECT source FROM blocked)
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(CASE WHEN rk <= 40 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_capped,
           CAST(SUM(CASE WHEN rk <= 40 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM ranked GROUP BY source
    """,
)
def c26_domain_cap_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Domain/source filtering + per-domain cap — the web-corpus
    diversity stage (block low-quality domains, then cap how many
    documents any single domain may contribute so head domains don't
    dominate the training mix). The blocklist here is DERIVED from the
    corpus (sources whose mean doc length falls below 98% of the
    global mean) so the episode is self-contained and exactly
    replayable in SQL; a production run broadcasts a curated list the
    same way.

    Scale shape: the blocklist is |sources|-sized and BROADCAST into
    an anti-join (no corpus shuffle for the filter); the cap is one
    hash shuffle keyed by source + a row_number window — per-domain
    state is a single counter, and a skewed head domain is bounded by
    the cap itself. No all-pairs work, no driver collect."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = t(spark, sf, "documents")
    global_avg = d.agg(
        (F.avg("n_chars") * F.lit(0.98)).alias("thr")
    )
    blocked = (
        d.groupBy("source")
        .agg(F.avg("n_chars").alias("avg_chars"))
        .join(F.broadcast(global_avg))
        .filter(F.col("avg_chars") < F.col("thr"))
        .select("source")
    )
    ranked = (
        d.join(F.broadcast(blocked), "source", "left_anti")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")
            ),
        )
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.when(F.col("rk") <= 40, 0).otherwise(1)).alias("n_capped"),
        F.sum(
            F.when(F.col("rk") <= 40, F.col("n_chars")).otherwise(0)
        ).alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# Cross-document duplicate n-gram fraction (round 7): the RefinedWeb /
# Gopher "dup_ngram_frac" quality rule — a document most of whose
# n-grams also occur in OTHER documents is boilerplate or a near-copy
# and gets dropped before training. Distinct from c25 (WITHIN-doc
# repetition) and from c02/c03 (pairwise near-dup): this is a
# corpus-global per-document signal with no pair enumeration at all.
# ---------------------------------------------------------------------------

_DUPG_N, _DUPG_MIN_DF, _DUPG_KEEP_PCT = 5, 2, 60


def dup_ngram_fraction(
    docs: DataFrame,
    n: int = _DUPG_N,
    min_df: int = _DUPG_MIN_DF,
    keep_pct: int = _DUPG_KEEP_PCT,
) -> DataFrame:
    """(doc_id, n_grams, n_dup, keep): of each document's DISTINCT word
    n-grams, how many occur in at least ``min_df`` documents
    corpus-wide; ``keep`` = 0 when more than ``keep_pct``% of the
    doc's grams are corpus-duplicated (integer comparison — no float
    in the gate, so the flag hashes identically across engines).

    Scale shape: grams are hashed to 60-bit digests *before* any
    shuffle (8-byte keys, never gram text). ``word_ngrams`` is
    distinct-per-doc, so document frequency is a plain COUNT(*) per
    digest — no countDistinct. Three hash-keyed exchanges total
    (df aggregate, dup-flag probe join, one per-doc aggregate that
    yields BOTH counts), all on well-distributed digests or doc ids;
    the duplicated-gram set is corpus-dependent so NO forced broadcast
    — AQE picks the strategy (the forced-hint-never-demoted lesson
    from ADVICE r6).
    """
    from ..functions import md5_hash60, word_ngrams  # noqa: PLC0415

    # Materialize the token array behind its own projection BEFORE the
    # n-gram transform: passing words(text) inline would inline
    # split(lower(text)) into every element_at inside the generator
    # lambda (n+2 copies), and the resulting expression tree costs
    # ~16 s of DRIVER-side plan/codegen work per fresh plan at n=5 —
    # measured 20 s -> 2.2 s for the identical query with the barrier.
    # The projection survives because Catalyst does not collapse a
    # projected alias into a generator argument.
    ws = docs.select("doc_id", words("text").alias("ws"))
    g = ws.select(
        "doc_id", F.explode(word_ngrams(F.col("ws"), n)).alias("gram")
    ).select("doc_id", md5_hash60("gram").alias("h"))
    dup = (
        g.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h", F.lit(1).alias("dup"))
    )
    # one left join flags each gram in place (dup has distinct h, so no
    # row multiplication), and ONE per-doc aggregate yields both counts
    # — two gram passes total instead of three, one per-doc shuffle
    per_doc = (
        g.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).alias("n_dup"),
        )
    )
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
    n_dup = F.coalesce(F.col("n_dup"), F.lit(0)).cast("long")
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            n_dup.alias("n_dup"),
            F.when(n_dup * 100 <= n_grams * keep_pct, F.lit(1))
            .otherwise(F.lit(0))
            .alias("keep"),
        )
    )


@query(
    "c27_dup_ngram_fraction",
    # the oracle rebuilds the same 5-grams (1-based inclusive list
    # slice), the same md5-portable 60-bit digest, and the same
    # integer keep gate — bit-for-bit replayable
    oracle=f"""
    WITH g AS (
      SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
      FROM (
        SELECT doc_id,
               UNNEST(LIST_DISTINCT(
                 [array_to_string(ws[i:i+{_DUPG_N - 1}], ' ')
                  for i in RANGE(1, GREATEST(LEN(ws) - {_DUPG_N - 2}, 1))]
               )) AS gram
        FROM (SELECT doc_id, STR_SPLIT(LOWER(text), ' ') AS ws
              FROM documents)
        WHERE LEN(ws) >= {_DUPG_N}
      )
    ),
    dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= {_DUPG_MIN_DF}),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
    hit AS (
      SELECT g.doc_id, COUNT(*) AS n_dup
      FROM g JOIN dup USING (h) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup,
           CASE WHEN COALESCE(p.n_dup, 0) * 100
                     <= COALESCE(t.n_grams, 0) * {_DUPG_KEEP_PCT}
                THEN 1 ELSE 0 END AS keep
    FROM documents d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN hit p USING (doc_id)
    """,
)
def c27_dup_ngram_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """Gate wiring for ``dup_ngram_fraction`` over ``documents``: word
    5-grams, duplicated = present in >=2 docs, drop when >60% of a
    doc's grams are duplicated. At sf0.01 the signal is bimodal —
    planted near-dup clusters sit at frac 1.0 (keep=0), singletons at
    0.0 — so both branches of the gate do real work."""
    return dup_ngram_fraction(t(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# c28 — exact substring dedup (cross-document duplicate span detection)
#
# The standard pipeline stage between exact doc-level dedup (c01) and
# near-dup doc-level dedup (c02): find the exact token spans that are
# REPEATED ACROSS DOCUMENTS, at k-token block granularity (the
# suffix-array stage of production pre-training pipelines, approximated
# by sorted gram-anchor extension — VERDICT r7 item 5).
#
# Granularity contract (documented, not hidden): with anchors at every
# token position, a cross-document repeated substring of length
# L >= _SUB_K tokens shares ALL of its L-k+1 k-gram anchors, so the
# merged anchor span covers the full repeat exactly; repeats shorter
# than k tokens are below the detection block and produce nothing.
# Spans are unions of overlapping-or-adjacent duplicated k-blocks.
# ---------------------------------------------------------------------------

_SUB_K = 8  # anchor width: minimum duplicated-span length, in tokens
_SUB_MIN_DOCS = 2  # "duplicated" = the block appears in >= this many docs


def substring_dup_spans(
    docs: DataFrame, k: int = _SUB_K, min_docs: int = _SUB_MIN_DOCS
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens): merged token spans
    of each document covered by k-token blocks that occur in at least
    ``min_docs`` distinct documents.

    Scale shape (the point): positionally-anchored gram digests are
    hashed to 60-bit longs INSIDE the gram transform, so nothing
    heavier than (doc_id, pos, 8-byte digest) ever crosses a shuffle —
    never gram text. Stages: one digest-keyed distinct + count for
    document frequency, one digest-keyed probe join back to anchors
    (corpus-dependent size — NO forced broadcast, AQE decides), and one
    doc-keyed window for the sorted-anchor extension (gaps-and-islands
    interval merge: new island when s > running max(e) + 1). Every
    exchange is on well-distributed hash keys or doc ids; there is no
    all-pairs stage anywhere — the posting list of a digest is the only
    quadratic surface and it is exactly the duplication being measured.
    """
    from ..functions import words  # noqa: PLC0415

    ws = docs.select("doc_id", words("text").alias("ws")).filter(
        F.size("ws") >= k
    )
    # digest computed inside the transform lambda (one md5 per anchor,
    # hashed before the explode); ws is projected behind its own alias
    # first — the ws-projection barrier (see dup_ngram_fraction)
    gh = F.expr(
        f"transform(sequence(0, size(ws) - {k}), i -> "
        f"cast(conv(substring(md5(array_join(slice(ws, i + 1, {k}), ' ')), "
        f"1, 15), 16, 10) AS bigint))"
    )
    g = ws.select("doc_id", F.posexplode(gh).alias("pos", "ghash"))
    dupg = (
        g.select("doc_id", "ghash")
        .distinct()
        .groupBy("ghash")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("ghash")
    )
    anchors = g.join(dupg, "ghash").select(
        "doc_id",
        F.col("pos").cast("long").alias("s"),
        (F.col("pos") + k - 1).cast("long").alias("e"),
    )
    # sorted-anchor extension: anchors are unique per (doc, pos), so
    # ORDER BY s is total; merge overlapping-or-adjacent blocks
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    brk = F.when(
        F.col("s") > F.coalesce(F.max("e").over(prev), F.lit(-1)) + 1, 1
    ).otherwise(0)
    return (
        anchors.withColumn("island", F.sum(brk).over(run))
        .groupBy("doc_id", "island")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


@query(
    "c28_substring_dup_spans",
    # full DuckDB replay of the span rule: same tokenizer, same 60-bit
    # md5 digest, same >=2-distinct-docs duplication test, same
    # gaps-and-islands merge — every value hash-gated
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, STR_SPLIT(LOWER(text), ' ') AS ws FROM documents
    ),
    gi AS (
      SELECT doc_id, ws,
             UNNEST(RANGE(1, GREATEST(LEN(ws) - {_SUB_K} + 2, 1))) AS i
      FROM ws
      WHERE LEN(ws) >= {_SUB_K}
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             (('0x' || substr(md5(ARRAY_TO_STRING(ws[i:i + {_SUB_K} - 1],
                ' ')), 1, 15))::BIGINT) AS ghash
      FROM gi
    ),
    dupg AS (
      SELECT ghash
      FROM (SELECT DISTINCT doc_id, ghash FROM g)
      GROUP BY ghash
      HAVING COUNT(*) >= {_SUB_MIN_DOCS}
    ),
    a AS (
      SELECT g.doc_id, pos AS s, pos + {_SUB_K} - 1 AS e
      FROM g JOIN dupg USING (ghash)
    ),
    b AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                      PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM a
    ),
    c AS (
      SELECT doc_id, s, e,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM b
    )
    SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
           MAX(e) - MIN(s) + 1 AS span_tokens
    FROM c
    GROUP BY doc_id, island
    """,
)
def c28_substring_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Gate wiring for ``substring_dup_spans`` over ``documents``:
    8-token anchor blocks, duplicated = present in >= 2 docs. At
    sf0.01 the planted near-dup clusters yield full-document spans and
    partially-overlapping docs yield interior spans, so the interval
    merge is exercised on real shapes."""
    return substring_dup_spans(t(spark, sf, "documents"))


@query(
    "c30_filter_funnel",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, LENGTH(text) AS n_chars,
             LEN(STR_SPLIT(text, ' ')) AS n_words,
             CAST(LENGTH(REGEXP_REPLACE(text, '[a-zA-Z0-9 ]', '', 'g'))
                  AS DOUBLE) / LENGTH(text) AS punct_ratio,
             CAST(LEN(LIST_FILTER(STR_SPLIT(LOWER(text), ' '),
                   w -> LIST_CONTAINS(
                     ['the','a','of','and','to','in','is','for'], w)))
                  AS DOUBLE) / LEN(STR_SPLIT(text, ' ')) AS stop_ratio
      FROM documents
    ),
    verdicts AS (
      SELECT source,
             CASE WHEN n_chars < 100 THEN '1_too_short'
                  WHEN n_chars > 5000 THEN '2_too_long'
                  WHEN n_words < 20 THEN '3_low_words'
                  WHEN punct_ratio > 0.10 THEN '4_high_punct'
                  WHEN stop_ratio < 0.01 THEN '5_low_stopword'
                  ELSE 'pass' END AS verdict,
             n_chars
      FROM scored
    )
    SELECT verdict, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM verdicts GROUP BY verdict
    """,
)
def c30_filter_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-filter FUNNEL (the observability stage every production
    corpus pipeline runs next to its filters): each document is
    annotated with the FIRST failing rule of an ordered cascade
    (length floor/ceiling, word floor, punctuation ceiling, stopword
    floor — the c08 rule family), then the funnel aggregates
    docs/chars/sources per verdict. First-fail attribution is what
    makes a filter cascade debuggable — per-rule independent rates
    double-count, a funnel's stages sum to the corpus. One projection
    + one |verdicts|-row aggregate; every rule is pure codegen, no
    Python in the pipeline at any scale."""
    d = t(spark, sf, "documents")
    n_chars = F.length("text")
    n_words = F.size(F.split(F.col("text"), " "))
    punct = (
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast(
            "double"
        )
        / n_chars
    )
    stop = (
        F.size(
            F.filter(words("text"), lambda w: w.isin(*_EN_MARKERS))
        ).cast("double")
        / n_words
    )
    verdict = (
        F.when(n_chars < 100, "1_too_short")
        .when(n_chars > 5000, "2_too_long")
        .when(n_words < 20, "3_low_words")
        .when(punct > 0.10, "4_high_punct")
        .when(stop < 0.01, "5_low_stopword")
        .otherwise("pass")
    )
    return (
        d.select(
            "source", verdict.alias("verdict"), n_chars.alias("n_chars")
        )
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@query(
    "c31_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, LENGTH(text) AS n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(rn) AS BIGINT) AS max_rank
    FROM ranked WHERE rn <= 50
    GROUP BY source
    """,
)
def c31_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified corpus subsampling with EXACT per-stratum quotas
    (the mixture-construction stage next to c20's weighted sampler):
    rank documents within each source by a deterministic content-free
    key (md5 of the doc id — uniform, reproducible across engines and
    runs, no RNG seed to disagree on) and keep the first N per
    stratum. Unlike fraction-based sampleBy, quotas are exact and the
    sample is stable under reordering/partitioning; the rank is one
    window over the stratum key, O(corpus) with no skew beyond the
    strata themselves. DuckDB replays the identical ranking."""
    d = t(spark, sf, "documents")
    from pyspark.sql.window import Window  # noqa: PLC0415

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id", "source", F.length("text").alias("n_chars")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.max("rn").cast("bigint").alias("max_rank"),
        )
    )


# ---------------------------------------------------------------------------
# c33 — duplicate-span REMOVAL (the cut step after c28's detection)
#
# Lee et al.'s exact-substring dedup keeps ONE copy of each repeated
# span and removes the rest; c28 finds the spans, this operator cuts
# them. Keeper rule: per duplicated k-block, the MINIMUM doc_id keeps
# its occurrence; every other doc's anchor is removable. Removable
# anchors merge into spans (the c28 islands logic) and the document is
# rebuilt from the tokens OUTSIDE those spans. VERDICT r8 item 8.
# ---------------------------------------------------------------------------


def remove_duplicate_spans(
    docs: DataFrame, k: int = _SUB_K, min_docs: int = _SUB_MIN_DOCS
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, text_clean): each document with
    its cross-document duplicated spans cut, keep-first-occurrence
    (min doc_id per duplicated block keeps it). ``text_clean`` is the
    tokenizer-normalized rebuild (lowercased, single-space joined) —
    byte-lossless for already-normalized corpora, token-lossless
    always.

    Scale shape mirrors c28 (nothing heavier than (doc_id, pos,
    8-byte digest) crosses a shuffle); the one addition is the final
    doc-keyed join of merged spans back onto the token arrays, where
    span subtraction runs as JVM higher-order functions (zip_with /
    filter / exists) — no Python in the rebuild."""
    ws = docs.select("doc_id", words("text").alias("ws"))
    anchored = ws.filter(F.size("ws") >= k)
    gh = F.expr(
        f"transform(sequence(0, size(ws) - {k}), i -> "
        f"cast(conv(substring(md5(array_join(slice(ws, i + 1, {k}), ' ')), "
        f"1, 15), 16, 10) AS bigint))"
    )
    g = anchored.select("doc_id", F.posexplode(gh).alias("pos", "ghash"))
    # duplicated blocks + their keeper doc in ONE digest-keyed agg
    km = (
        g.groupBy("ghash")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("nd") >= min_docs)
        .select("ghash", "keeper")
    )
    rem = (
        g.join(km, "ghash")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("s"),
            (F.col("pos") + k - 1).cast("long").alias("e"),
        )
    )
    return _rebuild_minus_spans(ws, rem)


def _rebuild_minus_spans(ws: DataFrame, rem: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_removed, text_clean): subtract removal
    spans from token arrays. ``ws`` is (doc_id, ws array<string>);
    ``rem`` is (doc_id, s, e) token-index spans (inclusive).
    Overlapping/adjacent spans islands-merge per doc (one window pass
    keyed by doc_id), then the rebuild runs as JVM higher-order
    functions (zip_with / filter / exists) — no Python. Shared by
    c33 (cross-doc duplicate spans) and c38 (corpus boilerplate)."""
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    brk = F.when(
        F.col("s") > F.coalesce(F.max("e").over(prev), F.lit(-1)) + 1, 1
    ).otherwise(0)
    spans = (
        rem.withColumn("island", F.sum(brk).over(run))
        .groupBy("doc_id", "island")
        .agg(F.min("s").alias("ss"), F.max("e").alias("se"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("ss"), F.col("se")))
            ).alias("spans")
        )
    )
    out = ws.join(spans, "doc_id", "left").withColumn(
        "spans", F.coalesce(F.col("spans"), F.expr("array()"))
    )
    return out.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        F.expr(
            "aggregate(spans, 0L, (acc, sp) -> acc + sp.se - sp.ss + 1)"
        ).alias("n_removed"),
        F.expr(
            "array_join(transform(filter("
            "zip_with(ws, sequence(0, size(ws) - 1), (w, i) -> struct(w, i)),"
            " x -> NOT exists(spans, sp -> x.i >= sp.ss AND x.i <= sp.se)),"
            " x -> x.w), ' ')"
        ).alias("text_clean"),
    )


@query(
    "c33_dup_span_removal",
    # full DuckDB replay: same tokenizer/digests as c28, keeper =
    # min(doc_id) per duplicated block, islands merge, positional
    # anti-join rebuild — every value (including the rebuilt text)
    # hash-gated
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, STR_SPLIT(LOWER(text), ' ') AS ws FROM documents
    ),
    gi AS (
      SELECT doc_id, ws,
             UNNEST(RANGE(1, GREATEST(LEN(ws) - {_SUB_K} + 2, 1))) AS i
      FROM ws
      WHERE LEN(ws) >= {_SUB_K}
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             (('0x' || substr(md5(ARRAY_TO_STRING(ws[i:i + {_SUB_K} - 1],
                ' ')), 1, 15))::BIGINT) AS ghash
      FROM gi
    ),
    km AS (
      SELECT ghash, MIN(doc_id) AS keeper
      FROM g
      GROUP BY ghash
      HAVING COUNT(DISTINCT doc_id) >= {_SUB_MIN_DOCS}
    ),
    rem AS (
      SELECT g.doc_id, pos AS s, pos + {_SUB_K} - 1 AS e
      FROM g JOIN km USING (ghash)
      WHERE g.doc_id <> km.keeper
    ),
    b AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                      PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM rem
    ),
    c AS (
      SELECT doc_id, s, e,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM b
    ),
    spans AS (
      SELECT doc_id, MIN(s) AS ss, MAX(e) AS se
      FROM c GROUP BY doc_id, island
    ),
    removed_pos AS (
      SELECT doc_id, UNNEST(RANGE(ss, se + 1)) AS p FROM spans
    ),
    toks AS (
      SELECT ws.doc_id, ws.ws[i] AS w, i - 1 AS p
      FROM ws, UNNEST(RANGE(1, LEN(ws.ws) + 1)) AS r(i)
    ),
    kept AS (
      SELECT t.doc_id, t.w, t.p
      FROM toks t
      LEFT JOIN removed_pos r ON t.doc_id = r.doc_id AND t.p = r.p
      WHERE r.p IS NULL
    )
    SELECT w.doc_id,
           CAST(LEN(w.ws) AS BIGINT) AS n_tokens,
           CAST(COALESCE(nr.n, 0) AS BIGINT) AS n_removed,
           COALESCE(k.txt, '') AS text_clean
    FROM ws w
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM removed_pos
               GROUP BY doc_id) nr ON w.doc_id = nr.doc_id
    LEFT JOIN (SELECT doc_id, STRING_AGG(w, ' ' ORDER BY p) AS txt
               FROM kept GROUP BY doc_id) k ON w.doc_id = k.doc_id
    """,
)
def c33_dup_span_removal(spark: SparkSession, sf: str) -> DataFrame:
    """Gate wiring for ``remove_duplicate_spans`` over ``documents``:
    8-token blocks, duplicated = >= 2 docs, keep-first by min doc_id.
    The planted near-dup clusters lose their repeated bodies in every
    doc but the cluster minimum; partial overlaps lose interior spans
    only."""
    return remove_duplicate_spans(t(spark, sf, "documents"))

@query(
    "c35_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, STR_SPLIT(LOWER(text), ' ') AS ws FROM documents
    ),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      FROM (SELECT doc_id, ws, UNNEST(RANGE(1, LEN(ws))) AS i FROM toks)
      WHERE LEN(ws) >= 2
    ),
    prefix_counts AS (
      SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
    ),
    bigram_counts AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2
    ),
    scored AS (
      SELECT b.doc_id,
             CAST(ROUND(1000 * LOG2(CAST(p.c1 AS DOUBLE) / bc.c2), 0)
               AS BIGINT) AS millibits
      FROM big b
      JOIN prefix_counts p ON p.w1 = b.w1
      JOIN bigram_counts bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(millibits) AS BIGINT) AS total_millibits,
           ROUND(CAST(SUM(millibits) AS DOUBLE) / (1000 * COUNT(*)), 3)
             AS bits_per_bigram
    FROM scored GROUP BY doc_id
    """,
)
def c35_bigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style language-model QUALITY score: per-document average
    bigram surprisal, -avg log2 P(w2|w1), under a bigram model trained
    on the corpus itself (self-scoring — the standard trick for
    flagging boilerplate/garbage outliers without shipping an external
    LM; every observed bigram has count >= 1, so no smoothing term).

    Determinism across engines: per-bigram surprisal is rounded to
    integer MILLI-bits before the per-document aggregation, so the
    reduction is an exact integer sum (float sums are order-sensitive;
    ulp differences between libm and the JVM's log are 1e-16-scale,
    twelve orders below the rounding grain). Same construction as the
    b12 fixed-point kernel.

    100 TB shape: two token-keyed aggregations build the model (the
    same shuffles c15's TF-IDF pays), one join streams counts back
    onto the exploded bigrams — model size is vocabulary-sized, not
    corpus-sized, and nothing rides the driver. Tokenization is the
    repo-standard STR_SPLIT(LOWER(text), ' ') (c04/c07 share it)."""
    docs = t(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    ).filter(F.size("ws") >= 2)
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2), "
                "i -> struct(ws[i] as w1, ws[i + 1] as w2))"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    prefix = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bigrams = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        big.join(prefix, "w1")
        .join(bigrams, ["w1", "w2"])
        .withColumn(
            "millibits",
            F.round(
                1000
                * F.log2(F.col("c1").cast("double") / F.col("c2")),
                0,
            ).cast("long"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("millibits").alias("total_millibits"),
        F.round(
            F.sum("millibits").cast("double")
            / (1000 * F.count(F.lit(1))),
            3,
        ).alias("bits_per_bigram"),
    )


# ---------------------------------------------------------------------------
# c36: REAL byte-BPE tokenizer (r14, VERDICT r13 item 3) — train merge
# ranks on the corpus, apply them, replacing c09's "BPE-ish" regex
# proxy as the tokenizer-exact sizing query. Tier C by construction
# (the reference has no read path, let alone a tokenizer).
#
# The cross-engine trick that makes BPE hash-gateable: a word's
# segmentation is ONE delimited string — every token wrapped as
# \x1e token \x1f — so applying a merge (l, r) is a plain
# REPLACE(s, "\x1e l \x1f \x1e r \x1f", "\x1e lr \x1f"). Both Spark's
# replace() and DuckDB's REPLACE scan left-to-right replacing
# non-overlapping occurrences, which is EXACTLY BPE's simultaneous
# leftmost-non-overlapping merge step ("aaaa" + (a,a) -> [aa][aa]).
# The sentinels double as anchors: a pattern can only match where l is
# a COMPLETE token followed by a complete r token, and because each
# token carries its own open+close sentinel, consecutive matches share
# no characters (four a's merge to [aa][aa], not [aa][a][a]).
#
# Scale shape: training runs on the WORD-FREQUENCY table (the standard
# BPE trick — vocabulary-sized, not corpus-sized), one pair-count
# aggregation per merge with a k=1 argmax pulled driver-side (model
# parameters, same contract as train_ivf_codebook's k x dim pulls).
# Application re-tokenizes each DISTINCT word once and joins the
# per-word token count back onto the corpus — the corpus-sized side
# shuffles once on the word key (or broadcasts when the vocab fits).
# ---------------------------------------------------------------------------

_BPE_N_MERGES = 8
_BPE_TL = "\x1e"  # token-open sentinel
_BPE_TR = "\x1f"  # token-close sentinel
# words carrying C0 controls / unicode line separators are excluded
# from the vocabulary: the sentinels must stay unambiguous, and Java's
# '.' and RE2's '.' disagree on line terminators — dropping those
# (synthetic-corpus-absent) words keeps the two engines' char
# splitting provably identical
_BPE_BAD_WORD_RE = r"[\x00-\x1f\x{0085}\x{2028}\x{2029}]"
_BPE_BAD_WORD_RE_DUCK = r"[\x00-\x1f\x{0085}\x{2028}\x{2029}]"


def _bpe_vocab(docs: DataFrame) -> DataFrame:
    """(w, wc) word-frequency table — repo-standard whitespace/lower
    tokenization (c04/c07/c35 share it)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
        )
        .filter((F.col("w") != "") & ~F.col("w").rlike(_BPE_BAD_WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _bpe_seed(vocab: DataFrame) -> DataFrame:
    """Character-level seed segmentation, wrapped in sentinels."""
    chars = F.regexp_extract_all(F.col("w"), F.lit("."), F.lit(0))
    return vocab.withColumn(
        "s",
        F.concat(
            F.lit(_BPE_TL),
            F.array_join(chars, _BPE_TR + _BPE_TL),
            F.lit(_BPE_TR),
        ),
    )


def _bpe_tokens(col) -> "F.Column":  # type: ignore[no-untyped-def]
    """Token list of a wrapped segmentation string."""
    return F.regexp_extract_all(
        col, F.lit(f"{_BPE_TL}([^{_BPE_TR}]*){_BPE_TR}"), F.lit(1)
    )


def train_bpe_merges(
    docs: DataFrame, n_merges: int = _BPE_N_MERGES
) -> "tuple[list[dict], DataFrame]":
    """Learn ``n_merges`` BPE merges on ``docs.text`` and return
    ``(merges, seg)``: the ranked merge table (driver-side — it IS the
    model, k rows) and the final per-word segmentation DataFrame
    ``(w, wc, s)``. Ties break (count DESC, lhs, rhs) so the ranks are
    deterministic and DuckDB-replayable. Stops early when no adjacent
    pair remains (every word fully merged)."""
    vocab = _bpe_vocab(docs).persist()
    merges: list[dict] = []
    seg = _bpe_seed(vocab)
    try:
        for rank in range(1, n_merges + 1):
            toks = seg.select(
                "wc", _bpe_tokens(F.col("s")).alias("ws")
            ).filter(F.size("ws") >= 2)
            pairs = (
                toks.select(
                    "wc",
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(ws) - 2), "
                            "i -> struct(ws[i] as l, ws[i + 1] as r))"
                        )
                    ).alias("p"),
                )
                .groupBy(
                    F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs")
                )
                .agg(F.sum("wc").alias("c"))
            )
            best = (
                pairs.orderBy(F.col("c").desc(), "lhs", "rhs")
                # model parameters: the argmax pair — ONE row per merge
                .limit(1)
                .collect()
            )
            if not best:
                break
            lhs, rhs, c = best[0].lhs, best[0].rhs, int(best[0].c)
            merges.append(
                {
                    "rank": rank,
                    "lhs": lhs,
                    "rhs": rhs,
                    "merged": lhs + rhs,
                    "pair_count": c,
                }
            )
            pat = _BPE_TL + lhs + _BPE_TR + _BPE_TL + rhs + _BPE_TR
            rep = _BPE_TL + lhs + rhs + _BPE_TR
            seg = seg.withColumn("s", F.replace(F.col("s"), F.lit(pat), F.lit(rep)))
    finally:
        vocab.unpersist()
    return merges, seg


def _bpe_oracle_prefix(n_merges: int) -> str:
    """The unrolled DuckDB replay of training: one (pairs -> argmax ->
    REPLACE) CTE block per merge. Generated, not handwritten — the
    recurrence is mechanical."""
    tl, tr = "CHR(30)", "CHR(31)"
    sql = f"""
    WITH w0 AS (
      SELECT w, COUNT(*) AS wc
      FROM (SELECT UNNEST(STR_SPLIT(LOWER(text), ' ')) AS w FROM documents)
      WHERE w <> '' AND NOT REGEXP_MATCHES(w, '{_BPE_BAD_WORD_RE_DUCK}')
      GROUP BY w
    ),
    seg0 AS (
      SELECT w, wc,
             {tl} || ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(w, '.'),
                 {tr} || {tl}) || {tr} AS s
      FROM w0
    )"""
    for i in range(1, n_merges + 1):
        p = i - 1
        sql += f""",
    toks{i} AS (
      SELECT w, wc, STR_SPLIT(TRIM(s, {tl} || {tr}), {tr} || {tl}) AS ws, s
      FROM seg{p}
    ),
    pairs{i} AS (
      SELECT ws[j] AS lhs, ws[j+1] AS rhs, SUM(wc) AS c
      FROM (SELECT wc, ws, UNNEST(RANGE(1, LEN(ws))) AS j FROM toks{i}
            WHERE LEN(ws) >= 2)
      GROUP BY 1, 2
    ),
    best{i} AS (
      SELECT lhs, rhs, c, {i} AS rank FROM pairs{i}
      ORDER BY c DESC, lhs, rhs LIMIT 1
    ),
    seg{i} AS (
      SELECT t.w, t.wc,
             COALESCE(REPLACE(t.s,
                 {tl} || b.lhs || {tr} || {tl} || b.rhs || {tr},
                 {tl} || b.lhs || b.rhs || {tr}), t.s) AS s
      FROM toks{i} t LEFT JOIN best{i} b ON TRUE
    )"""
    return sql


_C36_MERGES_ORACLE = _bpe_oracle_prefix(_BPE_N_MERGES) + f"""
    SELECT CAST(rank AS INTEGER) AS rank, lhs, rhs, lhs || rhs AS merged,
           CAST(c AS BIGINT) AS pair_count
    FROM ({" UNION ALL ".join(f"SELECT * FROM best{i}" for i in range(1, _BPE_N_MERGES + 1))})
    """


@query("c36_bpe_train_merges", oracle=_C36_MERGES_ORACLE)
def c36_bpe_train_merges(spark: SparkSession, sf: str) -> DataFrame:
    """The learned merge-rank table — BPE's entire model. Hash-gated:
    DuckDB re-trains from scratch through the unrolled replay and must
    land on the same 8 (lhs, rhs) pairs with the same counts in the
    same order."""
    merges, _ = train_bpe_merges(t(spark, sf, "documents"))
    return spark.createDataFrame(
        [
            (m["rank"], m["lhs"], m["rhs"], m["merged"], m["pair_count"])
            for m in merges
        ],
        "rank int, lhs string, rhs string, merged string, pair_count long",
    )


_C36B_APPLY_ORACLE = _bpe_oracle_prefix(_BPE_N_MERGES) + f"""
    , perword AS (
      SELECT w, LEN(STR_SPLIT(TRIM(s, CHR(30) || CHR(31)),
                              CHR(31) || CHR(30))) AS n_toks
      FROM seg{_BPE_N_MERGES}
    ),
    cw AS (
      SELECT source, doc_id, UNNEST(STR_SPLIT(LOWER(text), ' ')) AS w
      FROM documents
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_toks) AS BIGINT) AS bpe_tokens
    FROM cw JOIN perword USING (w)
    GROUP BY source
    """


@query("c36b_bpe_apply_tokens", oracle=_C36B_APPLY_ORACLE)
def c36b_bpe_apply_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-EXACT corpus sizing: apply the learned merges and
    count real BPE tokens per source (supersedes c09's regex proxy
    for sizing; c09 stays as the cheap first-pass estimate). Each
    DISTINCT word is tokenized once on the vocabulary table; the
    corpus joins to it on the word key — at 100 TB that is one
    corpus shuffle (or none, when the vocab broadcasts)."""
    docs = t(spark, sf, "documents")
    _, seg = train_bpe_merges(docs)
    per_word = seg.select(
        "w", F.size(_bpe_tokens(F.col("s"))).alias("n_toks")
    )
    cw = docs.select(
        "source",
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    )
    return (
        cw.join(per_word, "w")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("bpe_tokens"),
        )
    )


_C09B_ORACLE = _bpe_oracle_prefix(_BPE_N_MERGES) + f"""
    , perword AS (
      SELECT w, LEN(STR_SPLIT(TRIM(s, CHR(30) || CHR(31)),
                              CHR(31) || CHR(30))) AS n_toks
      FROM seg{_BPE_N_MERGES}
    ),
    cw AS (
      SELECT doc_id, UNNEST(STR_SPLIT(LOWER(text), ' ')) AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_toks) AS BIGINT) AS bpe_tokens,
           ROUND(CAST(SUM(n_toks) AS DOUBLE) / COUNT(*), 6)
             AS tokens_per_word
    FROM cw JOIN perword USING (w)
    GROUP BY doc_id
    """


@query("c09b_token_count_exact", oracle=_C09B_ORACLE)
def c09b_token_count_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-EXACT per-document sizing (r15, VERDICT r14 item 3):
    the user-facing "how many tokens is this document" surface now
    counts tokens of the TRAINED c36 tokenizer, not c09's regex proxy
    (which stays registered as the documented cheap first-pass
    estimate; c36b carries the per-source rollup).

    Scale shape: the merge table is applied once per DISTINCT word on
    the vocabulary table (train_bpe_merges returns that segmentation),
    and the corpus joins to the resulting (word -> n_toks) map, which
    is BROADCAST — a trained tokenizer's vocabulary is model-sized
    (bounded by merges + seed alphabet), never corpus-sized, so the
    corpus side joins map-side with zero shuffle; the only shuffle is
    the per-doc aggregation."""
    docs = t(spark, sf, "documents")
    _, seg = train_bpe_merges(docs)
    per_word = seg.select(
        "w", F.size(_bpe_tokens(F.col("s"))).alias("n_toks")
    )
    cw = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    )
    return (
        cw.join(F.broadcast(per_word), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("bpe_tokens"),
            F.round(
                F.sum("n_toks").cast("double") / F.count(F.lit(1)), 6
            ).alias("tokens_per_word"),
        )
    )


_C37_K = 3       # gram width (words)
_C37_TOP = 20    # heavy hitters returned


@query(
    "c37_boilerplate_ngrams",
    # same md5-portable 60-bit digest family as c27/c28; the oracle
    # replays df-per-digest, the (df DESC, digest) top-k, and the
    # min-gram text recovery bit-for-bit
    oracle=f"""
    WITH g AS (
      SELECT doc_id, gram,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
      FROM (
        SELECT doc_id,
               UNNEST(LIST_DISTINCT(
                 [array_to_string(ws[i:i+{_C37_K - 1}], ' ')
                  for i in RANGE(1, GREATEST(LEN(ws) - {_C37_K - 2}, 1))]
               )) AS gram
        FROM (SELECT doc_id, STR_SPLIT(LOWER(text), ' ') AS ws
              FROM documents)
        WHERE LEN(ws) >= {_C37_K}
      )
    ),
    df AS (
      SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY h
    ),
    top AS (
      SELECT h, n_docs,
             ROW_NUMBER() OVER (ORDER BY n_docs DESC, h) AS rank
      FROM df ORDER BY n_docs DESC, h LIMIT {_C37_TOP}
    )
    SELECT CAST(t.rank AS INT) AS rank,
           MIN(g.gram) AS gram,
           CAST(t.n_docs AS BIGINT) AS n_docs
    FROM top t JOIN g ON g.h = t.h
    GROUP BY t.rank, t.n_docs
    """,
)
def c37_boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level BOILERPLATE detection (r15): the top-20 word
    3-grams by document frequency — the heavy-hitter pass that
    identifies templated headers/footers/navigation before targeted
    removal (c27 measures per-doc duplication, c33 cuts known spans;
    this finds WHAT to cut corpus-wide).

    Scale shape: document frequency aggregates on 60-bit gram DIGESTS
    (distinct per doc first, so one doc repeating a gram counts once)
    — digests shuffle, never text. Only the top-k digests (driver-side
    model output, k rows) join back against the gram texts, broadcast,
    to recover a deterministic representative string (min per digest)
    — at 100 TB the text-recovery join touches each partition once
    against a k-row broadcast, and no text-keyed shuffle exists
    anywhere."""
    from ..functions import word_ngrams, words  # noqa: PLC0415

    docs = t(spark, sf, "documents")
    # ws projected behind its own alias per word_ngrams' documented
    # plan/codegen pitfall (r15 advice: reuse the shared helper
    # instead of an inline F.expr duplicate)
    ws = docs.select("doc_id", words("text").alias("ws")).filter(
        F.size("ws") >= _C37_K
    )
    grams = ws.select(
        "doc_id",
        F.explode(word_ngrams(F.col("ws"), _C37_K)).alias("gram"),
    ).withColumn(
        "h",
        F.expr("cast(conv(substring(md5(gram), 1, 15), 16, 10) AS bigint)"),
    )
    df_per_hash = grams.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    from pyspark.sql.window import Window  # noqa: PLC0415

    top = (
        df_per_hash.orderBy(F.col("n_docs").desc(), "h")
        .limit(_C37_TOP)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n_docs").desc(), "h")
            ),
        )
    )
    return (
        grams.join(F.broadcast(top), "h")
        .groupBy("rank", "n_docs")
        .agg(F.min("gram").alias("gram"))
        .select("rank", "gram", "n_docs")
    )


def remove_boilerplate(
    docs: DataFrame,
    k: int = _C37_K,
    top: int = _C37_TOP,
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, text_clean): cut the corpus's
    top-``top`` word k-grams by document frequency (c37's detected
    boilerplate — templated headers/footers/navigation) out of EVERY
    document. Unlike c33's duplicate-span removal there is no keeper:
    boilerplate is noise wherever it appears. ``min_docs`` floors the
    document frequency so a tiny corpus can't promote singleton grams
    to "boilerplate".

    Scale shape: detection is c37's pass (document frequency on
    60-bit gram digests — countDistinct(doc_id) folds a doc's
    repeats, digests shuffle, never text; top-k is a k-row driver
    model). The cut pass joins each position's digest against the
    k-row winner set BROADCAST, islands-merges per doc, and rebuilds
    text in JVM higher-order functions (the shared
    ``_rebuild_minus_spans``). Two corpus passes total (detect, cut),
    no text-keyed shuffle anywhere, no UDF."""
    ws = docs.select("doc_id", words("text").alias("ws"))
    anchored = ws.filter(F.size("ws") >= k)
    gh = F.expr(
        f"transform(sequence(0, size(ws) - {k}), i -> "
        f"cast(conv(substring(md5(array_join(slice(ws, i + 1, {k}), ' ')), "
        f"1, 15), 16, 10) AS bigint))"
    )
    g = anchored.select("doc_id", F.posexplode(gh).alias("pos", "ghash"))
    winners = (
        g.groupBy("ghash")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), "ghash")
        .limit(top)
        .select("ghash")
    )
    rem = g.join(F.broadcast(winners), "ghash").select(
        "doc_id",
        F.col("pos").cast("long").alias("s"),
        (F.col("pos") + k - 1).cast("long").alias("e"),
    )
    return _rebuild_minus_spans(ws, rem)


@query(
    "c38_boilerplate_removal",
    # full DuckDB replay of the c37 -> cut composition: document
    # frequency on the same 60-bit gram digests, top-20 by
    # (df DESC, digest) with a df >= 2 floor, every matching position
    # a removal span, islands merge, positional anti-join rebuild —
    # every value (including the rebuilt text) hash-gated
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, STR_SPLIT(LOWER(text), ' ') AS ws FROM documents
    ),
    gi AS (
      SELECT doc_id, ws,
             UNNEST(RANGE(1, GREATEST(LEN(ws) - {_C37_K} + 2, 1))) AS i
      FROM ws
      WHERE LEN(ws) >= {_C37_K}
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             (('0x' || substr(md5(ARRAY_TO_STRING(ws[i:i + {_C37_K} - 1],
                ' ')), 1, 15))::BIGINT) AS ghash
      FROM gi
    ),
    winners AS (
      SELECT ghash
      FROM g
      GROUP BY ghash
      HAVING COUNT(DISTINCT doc_id) >= 2
      ORDER BY COUNT(DISTINCT doc_id) DESC, ghash
      LIMIT {_C37_TOP}
    ),
    rem AS (
      SELECT g.doc_id, pos AS s, pos + {_C37_K} - 1 AS e
      FROM g JOIN winners USING (ghash)
    ),
    b AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                      PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM rem
    ),
    isl AS (
      SELECT doc_id, s, e,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM b
    ),
    spans AS (
      SELECT doc_id, MIN(s) AS ss, MAX(e) AS se
      FROM isl GROUP BY doc_id, island
    ),
    removed_pos AS (
      SELECT doc_id, UNNEST(RANGE(ss, se + 1)) AS p FROM spans
    ),
    toks AS (
      SELECT ws.doc_id, ws.ws[i] AS w, i - 1 AS p
      FROM ws, UNNEST(RANGE(1, LEN(ws.ws) + 1)) AS r(i)
    ),
    kept AS (
      SELECT t.doc_id, t.w, t.p
      FROM toks t
      LEFT JOIN removed_pos r ON t.doc_id = r.doc_id AND t.p = r.p
      WHERE r.p IS NULL
    )
    SELECT w.doc_id,
           CAST(LEN(w.ws) AS BIGINT) AS n_tokens,
           CAST(COALESCE(nr.n, 0) AS BIGINT) AS n_removed,
           COALESCE(k.txt, '') AS text_clean
    FROM ws w
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM removed_pos
               GROUP BY doc_id) nr ON w.doc_id = nr.doc_id
    LEFT JOIN (SELECT doc_id, STRING_AGG(w, ' ' ORDER BY p) AS txt
               FROM kept GROUP BY doc_id) k ON w.doc_id = k.doc_id
    """,
)
def c38_boilerplate_removal(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate REMOVAL (r16 — VERDICT r15 item 3, closing c37's
    detect-but-not-remove gap): the c37 heavy-hitter grams become
    removal spans over the whole corpus, cut through the same islands
    + JVM-HOF rebuild machinery c33 uses. Composition is one call:
    ``remove_boilerplate(docs)``."""
    return remove_boilerplate(t(spark, sf, "documents"))


@query(
    "c39_repetition_quality",
    # full replay: per-doc token stats, the modal token, the modal
    # word 2-gram (count DESC then gram text for a deterministic
    # winner), and the token mass in repeated 3-grams — the Gopher
    # (Rae et al. 2021) repetition-filter family over word grams
    oracle="""
    WITH ws AS (
      SELECT doc_id, STR_SPLIT(LOWER(text), ' ') AS ws FROM documents
    ),
    toks AS (
      SELECT doc_id, LEN(ws) AS n_tokens FROM ws
    ),
    t1 AS (
      SELECT doc_id, w, COUNT(*) AS c
      FROM (SELECT doc_id, UNNEST(ws) AS w FROM ws)
      GROUP BY doc_id, w
    ),
    top1 AS (
      SELECT doc_id,
             MAX(c) AS c1,
             COUNT(*) AS n_distinct
      FROM t1 GROUP BY doc_id
    ),
    g2 AS (
      SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g, COUNT(*) AS c
      FROM (SELECT doc_id, ws, UNNEST(RANGE(1, LEN(ws))) AS i FROM ws
            WHERE LEN(ws) >= 2)
      GROUP BY doc_id, g
    ),
    top2 AS (
      SELECT doc_id, MAX(c) AS c2 FROM g2 GROUP BY doc_id
    ),
    g3 AS (
      SELECT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g,
             COUNT(*) AS c
      FROM (SELECT doc_id, ws, UNNEST(RANGE(1, LEN(ws) - 1)) AS i
            FROM ws WHERE LEN(ws) >= 3)
      GROUP BY doc_id, g
    ),
    dup3 AS (
      SELECT doc_id, SUM(c) AS dup_mass
      FROM g3 WHERE c >= 2 GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           ROUND(CAST(top1.n_distinct AS DOUBLE) / t.n_tokens, 6)
             AS ttr,
           ROUND(CAST(top1.c1 AS DOUBLE) / t.n_tokens, 6)
             AS top1_frac,
           ROUND(CAST(COALESCE(top2.c2, 0) * 2 AS DOUBLE) / t.n_tokens,
                 6) AS top2g_frac,
           ROUND(CAST(COALESCE(dup3.dup_mass, 0) * 3 AS DOUBLE)
                 / t.n_tokens, 6) AS dup3g_frac,
           CASE WHEN CAST(top1.c1 AS DOUBLE) / t.n_tokens <= 0.2
                 AND CAST(COALESCE(top2.c2, 0) * 2 AS DOUBLE)
                     / t.n_tokens <= 0.2
                 AND CAST(COALESCE(dup3.dup_mass, 0) * 3 AS DOUBLE)
                     / t.n_tokens <= 0.3
                 AND CAST(top1.n_distinct AS DOUBLE) / t.n_tokens >= 0.3
                THEN 1 ELSE 0 END AS passes_repetition
    FROM toks t
    JOIN top1 ON top1.doc_id = t.doc_id
    LEFT JOIN top2 ON top2.doc_id = t.doc_id
    LEFT JOIN dup3 ON dup3.doc_id = t.doc_id
    """,
)
def c39_repetition_quality(spark: SparkSession, sf: str) -> DataFrame:
    """REPETITION quality filters (r16): the Gopher rule family
    (Rae et al. 2021, Table A1) adapted to word grams — type/token
    ratio, modal-token fraction, top word-2-gram token fraction, and
    the token mass sitting in repeated 3-grams, plus the composed
    pass/fail gate. The signals c08's length/punct/stopword family
    misses: a doc that loops one phrase passes c08 and fails here.

    100 TB shape: ONE scan, ONE tagged gram explode (1/2/3-grams in
    a single generator), then exactly TWO exchanges — (doc_id, k,
    gram) for the counts, doc_id for the per-doc fold — with
    map-side partial aggregation on both, no joins, no
    cross-document state, pure codegen (no UDF). (The first cut used
    four scans + three join-backs: 18 exchanges at gate scale,
    corpus-sized shuffles at 100 TB — replaced after the plan
    audit.)"""
    docs = t(spark, sf, "documents")
    ws = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    grams = ws.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        F.explode(
            F.expr(
                # size guards: sequence(0, -1) would DESCEND in Spark
                # (yielding [0, -1]) — short docs must contribute no
                # 2/3-grams, not garbage indexes.
                # r16 (guide §2.3): grams are digested to 64-bit longs
                # INSIDE the generator — the output carries only
                # counts/fractions, never gram text, so the (doc, k,
                # gram) count key only needs gram-equality semantics;
                # an 8-byte key shuffles ~4x fewer bytes than 3-word
                # gram text and hashes/compares as a long in both
                # aggregate phases (per-doc collision odds ~n^2/2^65
                # at ~300 grams/doc: negligible, and a gated-scale
                # collision would fail the value gate loudly)
                "concat("
                " transform(ws, w -> struct(1 as k, xxhash64(w) as g)),"
                " IF(size(ws) >= 2,"
                "   transform(sequence(0, size(ws) - 2),"
                "     i -> struct(2 as k, xxhash64(concat(ws[i], ' ',"
                "       ws[i + 1])) as g)),"
                "   array()),"
                " IF(size(ws) >= 3,"
                "   transform(sequence(0, size(ws) - 3),"
                "     i -> struct(3 as k, xxhash64(concat(ws[i], ' ',"
                "       ws[i + 1], ' ', ws[i + 2])) as g)),"
                "   array()))"
            )
        ).alias("kg"),
    )
    counts = grams.groupBy(
        "doc_id", "n_tokens", F.col("kg.k").alias("k"),
        F.col("kg.g").alias("g"),
    ).agg(F.count(F.lit(1)).alias("c"))
    one = F.col("k") == 1
    stats = counts.groupBy("doc_id", "n_tokens").agg(
        F.max(F.when(one, F.col("c"))).alias("c1"),
        F.count(F.when(one, F.lit(1))).alias("n_distinct"),
        F.max(F.when(F.col("k") == 2, F.col("c"))).alias("c2"),
        F.sum(
            F.when((F.col("k") == 3) & (F.col("c") >= 2), F.col("c"))
        ).alias("dup_mass"),
    )
    nt = F.col("n_tokens").cast("double")
    top1_frac = F.col("c1").cast("double") / nt
    top2_frac = F.coalesce(F.col("c2"), F.lit(0)).cast("double") * 2 / nt
    dup3_frac = (
        F.coalesce(F.col("dup_mass"), F.lit(0)).cast("double") * 3 / nt
    )
    ttr = F.col("n_distinct").cast("double") / nt
    return stats.select(
        "doc_id",
        "n_tokens",
        F.round(ttr, 6).alias("ttr"),
        F.round(top1_frac, 6).alias("top1_frac"),
        F.round(top2_frac, 6).alias("top2g_frac"),
        F.round(dup3_frac, 6).alias("dup3g_frac"),
        F.when(
            (top1_frac <= 0.2)
            & (top2_frac <= 0.2)
            & (dup3_frac <= 0.3)
            & (ttr >= 0.3),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("passes_repetition"),
    )
