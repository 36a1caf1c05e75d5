"""LLM training-data pipeline operators (round 6): sequence packing,
weighted mixture sampling, keeper selection, chunking — invariants the
hash oracles don't express (packing feasibility, mixture proportions,
chunk reconstruction)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_sequence_packing_invariants(spark):
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        _PACK_WINDOW,
        c19_sequence_packing,
    )

    rows = c19_sequence_packing(spark, SF).collect()
    assert rows
    # every doc assigned exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    by_pack: dict[tuple, list] = {}
    for r in rows:
        by_pack.setdefault((r.shard, r.pack_id), []).append(r)
    for (shard, pid), members in by_pack.items():
        total = sum(m.n_tokens for m in members)
        if len(members) > 1:
            # multi-doc packs never overflow the context window
            assert total <= _PACK_WINDOW, (shard, pid, total)
        # pack ids are dense per shard
    for shard in {r.shard for r in rows}:
        pids = sorted({r.pack_id for r in rows if r.shard == shard})
        assert pids == list(range(len(pids)))
    # greedy tightness: consecutive packs couldn't be merged
    for shard in {r.shard for r in rows}:
        packs = sorted(
            {r.pack_id for r in rows if r.shard == shard}
        )
        docs = sorted(
            (r.doc_id, r.pack_id, r.n_tokens)
            for r in rows
            if r.shard == shard
        )
        for i in range(1, len(docs)):
            prev_pack = docs[i - 1][1]
            if docs[i][1] == prev_pack + 1:
                # first doc of the new pack wouldn't have fit
                prev_total = sum(
                    t for _d, p, t in docs[:i] if p == prev_pack
                )
                assert prev_total + docs[i][2] > _PACK_WINDOW
        assert packs  # non-empty


def test_weighted_mixture_rates(spark):
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        _MIXTURE_BP,
        c20_weighted_mixture,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.registry import t

    out = c20_weighted_mixture(spark, SF)
    total = {
        r.lang: r.n
        for r in t(spark, SF, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    kept = {
        r.lang: r.n
        for r in out.groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    # en keeps everything (rate 10000/10000); zh heavily downsampled
    assert kept.get("en") == total.get("en")
    for lang, bp in _MIXTURE_BP.items():
        if bp < 10000 and total.get(lang, 0) >= 10:
            assert kept.get(lang, 0) < total[lang]
    # determinism: a second run is byte-identical
    again = {
        (r.doc_id, r.lang) for r in c20_weighted_mixture(spark, SF).collect()
    }
    assert again == {(r.doc_id, r.lang) for r in out.collect()}


def test_chunk_overlap_reconstruction(spark):
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        _CHUNK,
        _STRIDE,
        c22_chunk_overlap,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.registry import t

    docs = {
        r.doc_id: r.text
        for r in t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    chunks: dict[int, list] = {}
    for r in c22_chunk_overlap(spark, SF).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    assert set(chunks) == set(docs)
    for doc_id, parts in chunks.items():
        parts.sort(key=lambda r: r.chunk_id)
        ws = docs[doc_id].split(" ")
        for r in parts:
            start = r.chunk_id * _STRIDE
            expect = ws[start : start + _CHUNK]
            assert r.chunk_text == " ".join(expect)
            assert r.n_chunk_words == min(_CHUNK, len(ws) - start)
        # full coverage: strides tile the word sequence
        assert (len(parts) - 1) * _STRIDE < len(ws)


def test_keeper_selection_policy(spark):
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.dedup import (
        c18_dedup_cluster_resolution,
        c21_dedup_keeper_selection,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.registry import t

    keepers = {
        r.cluster_id: r for r in c21_dedup_keeper_selection(spark, SF).collect()
    }
    members: dict[int, list] = {}
    for r in c18_dedup_cluster_resolution(spark, SF).collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    n_chars = {
        r.doc_id: r.n_chars
        for r in t(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    assert set(keepers) == set(members)
    for cid, ks in keepers.items():
        assert ks.n_members == len(members[cid])
        # keeper is the longest member (doc_id tiebreak)
        best = sorted(members[cid], key=lambda d: (-n_chars[d], d))[0]
        assert ks.keeper_doc_id == best


# -- round 7: decontamination + PII scrub ----------------------------------


def test_decontaminate_planted_overlap(spark):
    """A training doc sharing a 3-gram with a benchmark doc is flagged
    with the exact shared-gram count; disjoint docs are clean."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated wording here entirely"),
            (3, "quick brown fox is a benchmark phrase fragment"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps high")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shared, r.contaminated)
        for r in decontaminate(docs, bench, n=3).collect()
    }
    # doc 1 shares 'quick brown fox' and 'brown fox jumps'; doc 3 only
    # 'quick brown fox'; doc 2 nothing
    assert got[1] == (2, 1)
    assert got[3] == (1, 1)
    assert got[2] == (0, 0)


def test_scrub_pii_redacts_planted_spans(spark):
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        scrub_pii,
    )

    docs = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@sub.example.org or 192.168.0.1 ok"),
            (2, "no pii here, just text with a dot. and 12345 numbers"),
            (3, "two mails a@b.io c@d.co one ip 10.0.0.255"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert (got[1].n_emails, got[1].n_ips) == (1, 1)
    assert got[1].scrubbed == "reach me at <EMAIL> or <IP> ok"
    assert (got[2].n_emails, got[2].n_ips) == (0, 0)
    assert got[2].scrubbed == docs.collect()[1][1] or got[2].scrubbed
    assert (got[3].n_emails, got[3].n_ips) == (2, 1)
    assert got[3].scrubbed == "two mails <EMAIL> <EMAIL> one ip <IP>"


def test_domain_cap_filter_blocks_and_caps(spark):
    """c26 semantics: blocked sources contribute nothing; surviving
    sources contribute at most the cap; kept docs are the
    deterministically-first (lowest doc_id) per source."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        c26_domain_cap_filter,
    )

    from pyspark.sql import functions as F

    out = {r.source: r for r in c26_domain_cap_filter(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    thr = docs.agg(F.avg("n_chars") * 0.98).first()[0]
    stats = {
        r.source: (r.n, r.avg)
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.avg("n_chars").alias("avg"))
        .collect()
    }
    assert out, "no sources survived"
    for src, (n, avg) in stats.items():
        if avg < thr:
            assert src not in out  # blocked
        else:
            row = out[src]
            assert row.n_kept == n
            assert row.n_capped == max(0, n - 40)
            # kept_chars = chars of the 40 lowest doc_ids of the source
            kept = (
                docs.filter(F.col("source") == src)
                .orderBy("doc_id")
                .limit(40)
                .agg(F.sum("n_chars"))
                .first()[0]
            )
            assert row.kept_chars == kept


def test_dup_ngram_fraction_planted_duplicates(spark):
    """Two identical docs have every 5-gram corpus-duplicated
    (frac 1.0 -> dropped); a disjoint doc has none (kept); a doc
    shorter than the gram width yields zero grams and is kept —
    the short-doc case is other filters' job."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        dup_ngram_fraction,
    )

    twin = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, twin),
            (2, twin),
            (3, "one two three four five six seven eight nine"),
            (4, "too short here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_dup, r.keep)
        for r in dup_ngram_fraction(docs).collect()
    }
    assert got[1] == (4, 4, 0)
    assert got[2] == (4, 4, 0)
    assert got[3] == (5, 0, 1)
    assert got[4] == (0, 0, 1)


def test_substring_dup_spans_planted(spark):
    """c28 exact substring dedup: a >=k-token span shared verbatim by
    two documents is recovered EXACTLY (anchor extension covers the
    full repeat, nothing more); a repeat shorter than k tokens is
    below the block granularity and yields nothing; a span repeated
    only WITHIN one document is not cross-document duplication; two
    disjoint shared spans in one doc merge only if overlapping or
    adjacent."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        substring_dup_spans,
    )

    # tokens are single letters a0..; k=4 keeps the fixture readable
    shared = "s1 s2 s3 s4 s5 s6"  # 6 tokens >= k
    short = "x1 x2 x3"  # 3 tokens < k
    docs = spark.createDataFrame(
        [
            # doc 1: shared span at token offset 2..7
            (1, f"a1 a2 {shared} a3 a4"),
            # doc 2: same span at offset 0..5, plus the short repeat
            (2, f"{shared} b1 {short} b2"),
            # doc 3: only the short repeat — below block width
            (3, f"c1 {short} c2 c3 c4 c5"),
            # doc 4: within-doc repetition only (no other doc has it)
            (4, "r1 r2 r3 r4 r1 r2 r3 r4 r1 r2 r3 r4"),
            # doc 5: two disjoint copies of the shared span, separated
            # by a gap token — two islands, not one
            (5, f"{shared} gap1 gap2 {shared}"),
        ],
        "doc_id long, text string",
    )
    rows = substring_dup_spans(docs, k=4, min_docs=2).collect()
    spans = sorted((r.doc_id, r.span_start, r.span_end, r.span_tokens)
                   for r in rows)
    assert spans == [
        (1, 2, 7, 6),   # exact recovery, offset preserved
        (2, 0, 5, 6),
        (5, 0, 5, 6),   # first copy
        (5, 8, 13, 6),  # second copy: separate island across the gap
    ]


def test_substring_dup_spans_merges_overlap(spark):
    """Overlapping and adjacent duplicated blocks merge into one span:
    two docs sharing a long span report ONE island covering it, even
    though every interior k-gram anchors separately."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        substring_dup_spans,
    )

    long_shared = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, long_shared), (2, f"pre1 pre2 {long_shared}")],
        "doc_id long, text string",
    )
    rows = substring_dup_spans(docs, k=8, min_docs=2).collect()
    spans = sorted((r.doc_id, r.span_start, r.span_end) for r in rows)
    assert spans == [(1, 0, 19), (2, 2, 21)]


def test_c29_incremental_ingest_dedup_invariants(spark):
    """The episode's admit rule, checked against an independent
    DataFrame-side replay (no DuckDB): the CDC delta equals the count
    of batch-2 texts unseen in batch 1 (first copy per digest), and
    the per-source corpus counts sum to |batch1| + delta."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.dedup import (
        c29_incremental_ingest_dedup,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.registry import t

    out = c29_incremental_ingest_dedup(spark, SF).collect()
    d = t(spark, SF, "documents").select("doc_id", "text")
    b1 = d.filter(F.col("doc_id") <= 300)
    b2 = d.filter((F.col("doc_id") > 200) & (F.col("doc_id") <= 500))
    b1_digests = {r.dg for r in b1.select(F.md5("text").alias("dg")).collect()}
    fresh_first = (
        b2.select("doc_id", F.md5("text").alias("dg"))
        .groupBy("dg").agg(F.min("doc_id").alias("doc_id"))
        .filter(~F.col("dg").isin(list(b1_digests)))
    )
    expected_delta = fresh_first.count()
    assert expected_delta > 0  # testdata's planted exact dups make this real
    assert {r.delta_rows for r in out} == {expected_delta}
    assert sum(r.n for r in out) == b1.count() + expected_delta


def test_leakage_safe_split_cluster_integrity(spark):
    """c32's guarantee, asserted structurally: every near-dup cluster
    lands WHOLLY inside one split, the three splits partition the
    corpus, and the assignment is deterministic across invocations."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.dedup import (
        c18_dedup_cluster_resolution,
        c32_leakage_safe_split,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.registry import t

    out = {r.split: r for r in c32_leakage_safe_split(spark, SF).collect()}
    assert set(out) <= {"train", "val", "test"} and "train" in out
    assert all(r.no_straddle for r in out.values())
    n_docs = t(spark, SF, "documents").count()
    assert sum(r.n_docs for r in out.values()) == n_docs  # a partition
    # determinism: re-run assigns identical counts
    again = {r.split: r.n_docs for r in
             c32_leakage_safe_split(spark, SF).collect()}
    assert again == {s: r.n_docs for s, r in out.items()}
    # and the flag is not vacuous: clusters with >1 member exist
    clusters = c18_dedup_cluster_resolution(spark, SF)
    assert clusters.groupBy("cluster_id").count().filter(
        "count > 1"
    ).count() > 0


def test_c34_semantic_dedup_invariants(spark):
    """SemDeDup cell-gated keep-first (c34): (1) the kept set of every
    cell contains no within-threshold pair; (2) every dropped doc has
    SOME smaller-id cell-mate within threshold (nothing over-dropped
    — note the keeper itself need not be KEPT: similarity is
    non-transitive, so drop chains are legal); (3) cells partition
    the corpus."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.functions import cosine
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.registry import t
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.similarity import (
        c34_semantic_dedup_cells,
    )
    from pyspark.sql import functions as F

    out = c34_semantic_dedup_cells(spark, SF)
    e = t(spark, SF, "embeddings")
    assert out.count() == e.count()  # every vector assigned exactly once
    j = out.join(e, "vec_id")
    a = j.select(
        F.col("vec_id").alias("va"), "cell",
        F.col("keep").alias("ka"), F.col("embedding").alias("ea"),
    )
    b = j.select(
        F.col("vec_id").alias("vb"), "cell",
        F.col("keep").alias("kb"), F.col("embedding").alias("eb"),
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("cs", cosine(F.col("ea"), F.col("eb")))
    )
    # (1) no kept-kept within-threshold pair survives in any cell
    assert pairs.filter("ka AND kb AND cs >= 0.3").count() == 0
    # (2) every dropped doc has a smaller cell-mate within threshold
    # (the stronger "its keeper is KEPT" property is NOT an invariant
    # of keep-first under non-transitive similarity — r13 ADVICE)
    dropped = out.filter("NOT keep").count()
    assert dropped > 0  # threshold calibrated to actually fire
    dropped_with_smaller = (
        pairs.filter("(NOT kb) AND cs >= 0.3").select("vb").distinct()
    )
    # every dropped doc is within threshold of SOME smaller cell-mate
    assert dropped_with_smaller.count() == dropped


def test_c35_bigram_lm_score_properties(spark):
    """Self-trained bigram surprisal (c35): a doc made of one repeated
    bigram has (near-)zero surprisal — its bigram is its own prefix's
    only continuation — while corpus docs average well above it; and
    surprisal is non-negative everywhere (counts: c2 <= c1)."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        c35_bigram_lm_score,
    )

    out = c35_bigram_lm_score(spark, SF)
    assert out.filter("total_millibits < 0").count() == 0
    assert out.filter("n_bigrams < 1").count() == 0
    # corpus-wide average surprisal is meaningfully positive
    avg = out.agg(F.avg("bits_per_bigram")).first()[0]
    assert avg > 0.5, avg


def test_c34_giant_cell_pair_work_is_bounded(spark, monkeypatch):
    """r13 VERDICT item 2: a degenerate codebook (one cell swallowing
    the corpus) must NOT make c34's within-cell join quadratic in
    corpus size. With the cap at 10, 60 same-cell vectors form
    6 chunks x C(10,2) = 270 candidate pairs, not C(60,2) = 1770;
    with the cap above the cell size the candidates are exactly the
    unchunked set (the guard is inert where gate hashes are pinned)."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import (
        similarity as sim,
    )

    cells = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.lit(0).alias("cell"),  # one giant cell
        F.array(F.col("id").cast("float"), F.lit(1.0).cast("float"))
        .alias("embedding"),
    )
    monkeypatch.setattr(sim, "C34_MAX_CELL_SIZE", 10)
    bounded = sim._c34_pair_candidates(cells)
    assert bounded.count() == 6 * 45
    # chunks are contiguous vec_id ranks: no pair spans a chunk edge
    assert bounded.filter(
        (F.col("va") / 10).cast("long") != (F.col("vb") / 10).cast("long")
    ).count() == 0
    monkeypatch.setattr(sim, "C34_MAX_CELL_SIZE", 4096)
    assert sim._c34_pair_candidates(cells).count() == 60 * 59 // 2


def test_c36_bpe_planted_merges(spark):
    """Planted-merge pin (r13 VERDICT item 3): the classic BPE corpus
    low/lower/lowest/newer/newest/wider/widest learns exactly
    (l,o) -> (lo,w) -> (e,r) -> (e,s) under count-then-lexicographic
    tie-breaking, and the leftmost-non-overlapping merge step is real:
    'aaaa' under (a,a) becomes [aa][aa], never [aa][a][a]."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        _bpe_tokens,
        train_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "newer newest wider widest")],
        "doc_id long, text string",
    )
    merges, seg = train_bpe_merges(docs, n_merges=4)
    assert [(m["lhs"], m["rhs"]) for m in merges] == [
        ("l", "o"), ("lo", "w"), ("e", "r"), ("e", "s"),
    ]
    assert [m["pair_count"] for m in merges] == [5, 5, 3, 3]
    toks = {
        r.w: r.ws
        for r in seg.select("w", _bpe_tokens(F.col("s")).alias("ws")).collect()
    }
    assert toks["low"] == ["low"]
    assert toks["lower"] == ["low", "er"]
    assert toks["lowest"] == ["low", "es", "t"]
    assert toks["newest"] == ["n", "e", "w", "es", "t"]

    # overlap semantics: a run of four identical chars merges pairwise
    aaaa = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    m2, seg2 = train_bpe_merges(aaaa, n_merges=1)
    assert (m2[0]["lhs"], m2[0]["rhs"], m2[0]["pair_count"]) == ("a", "a", 3)
    [row] = seg2.select(_bpe_tokens(F.col("s")).alias("ws")).collect()
    assert row.ws == ["aa", "aa"]

    # early stop: a fully-merged vocabulary yields no further merges
    tiny = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    m3, _ = train_bpe_merges(tiny, n_merges=5)
    assert [(m["lhs"], m["rhs"]) for m in m3] == [("a", "b")]


def test_scrub_pii_phone_and_card_spans(spark):
    """r13 VERDICT item 5: phone and credit-card classes redact
    planted spans; card redaction precedes phone so grouped card
    digits never half-match as phones; bare 16-digit runs and all
    three NANP phone formats are covered; digits inside words/longer
    runs stay untouched."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        scrub_pii,
    )

    docs = spark.createDataFrame(
        [
            (1, "call (415) 555-0134 or 415-555-0134 or 415.555.0134 ok"),
            (2, "card 4111 1111 1111 1111 and bare 4111111111111111 end"),
            (3, "order 55555123456789012345 is not a card or phone"),
            (4, "mix a@b.io 10.0.0.1 (212) 555-0100 4000-1234-5678-9010"),
            (5, "no pii at all here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert got[1].n_phones == 3
    assert got[1].scrubbed == "call <PHONE> or <PHONE> or <PHONE> ok"
    assert got[2].n_ccs == 2 and got[2].n_phones == 0
    assert got[2].scrubbed == "card <CARD> and bare <CARD> end"
    # a 20-digit run is neither a 16-digit card nor a phone (\b guards)
    assert (got[3].n_ccs, got[3].n_phones) == (0, 0)
    assert got[3].scrubbed == docs.filter("doc_id = 3").first().text
    assert (
        got[4].n_emails, got[4].n_ips, got[4].n_phones, got[4].n_ccs
    ) == (1, 1, 1, 1)
    assert got[4].scrubbed == "mix <EMAIL> <IP> <PHONE> <CARD>"
    assert all(
        getattr(got[5], c) == 0
        for c in ("n_emails", "n_ips", "n_phones", "n_ccs", "n_ibans")
    )
    # IBAN: real-shaped IBANs redact; lowercase and too-short
    # uppercase runs don't (ISO 13616 is uppercase, >= 15 chars)
    iban_docs = spark.createDataFrame(
        [
            (10, "pay to DE89370400440532013000 or GB29NWBK60161331926819"),
            (11, "not ibans: de89370400440532013000 and AB12SHORT"),
            (12, "NO9386011117947 is the shortest real shape"),
        ],
        "doc_id long, text string",
    )
    g2 = {r.doc_id: r for r in scrub_pii(iban_docs).collect()}
    assert g2[10].n_ibans == 2
    assert g2[10].scrubbed == "pay to <IBAN> or <IBAN>"
    assert g2[11].n_ibans == 0
    assert g2[12].n_ibans == 1 and g2[12].scrubbed.startswith("<IBAN>")


def test_c36_bpe_concat_invariant_random_corpus(spark):
    """BPE structural invariant on a deterministic pseudo-random
    corpus: after any number of merges, each word's token sequence
    concatenates back to exactly the word (merges only ever fuse
    adjacent tokens), every token is non-empty, and re-training on
    the same corpus is bit-stable."""
    import random

    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        _bpe_tokens,
        train_bpe_merges,
    )

    rng = random.Random(1414)
    words = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 12)))
        for _ in range(120)
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i::4])) for i in range(4)],
        "doc_id long, text string",
    )
    merges, seg = train_bpe_merges(docs, n_merges=6)
    assert len(merges) == 6
    rows = seg.select(
        "w", _bpe_tokens(F.col("s")).alias("ws")
    ).collect()
    assert rows
    for r in rows:
        assert "".join(r.ws) == r.w
        assert all(tok for tok in r.ws)
    merges2, _ = train_bpe_merges(docs, n_merges=6)
    assert merges == merges2


def test_c37_boilerplate_ngrams_finds_planted_template(spark, tmp_path):
    """c37: a trigram planted across most docs ranks first with the
    exact document frequency; ranks are dense and df non-increasing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.text import (
        c37_boilerplate_ngrams,
    )

    docs = []
    for i in range(30):
        body = f"unique{i} filler{i} words{i} more{i} body{i}"
        if i < 24:  # the planted boilerplate footer
            body += " subscribe to newsletter"
        docs.append((i, "web", body))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "source": pa.array([d[1] for d in docs]),
                "text": pa.array([d[2] for d in docs]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = c37_boilerplate_ngrams(spark, str(tmp_path)).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    dfs = [r.n_docs for r in out]
    assert dfs == sorted(dfs, reverse=True)
    assert out[0].gram == "subscribe to newsletter"
    assert out[0].n_docs == 24
    assert all(len(r.gram.split(" ")) == 3 for r in out)


def test_c39_repetition_short_doc_edges(spark):
    """c39's single-explode shape guards sequence(0, -1) descent:
    1-token docs contribute no 2/3-grams (zero fractions), a pure
    loop fails the gate, varied text passes."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import (
        text as tx,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello"),
            (2, "a b"),
            (3, "x x x x x x x x x x"),
            (4, "one two three four five six seven eight nine ten"),
        ],
        "doc_id bigint, text string",
    )
    orig = tx.t
    try:
        tx.t = lambda _s, _sf, _n: docs
        got = {
            r.doc_id: r
            for r in tx.c39_repetition_quality(spark, "ignored").collect()
        }
    finally:
        tx.t = orig
    assert got[1].n_tokens == 1 and got[1].top2g_frac == 0.0
    assert got[1].dup3g_frac == 0.0 and got[1].ttr == 1.0
    assert got[2].top2g_frac == 1.0  # one 2-gram covering both tokens
    assert got[3].passes_repetition == 0  # pure loop: fails
    # dup3g is overlap-counting token MASS (8 positions x 3 / 10),
    # deliberately > 1 for a pure loop — it's a mass, not coverage
    assert got[3].top1_frac == 1.0 and got[3].dup3g_frac == 2.4
    assert got[4].passes_repetition == 1  # varied text: passes
