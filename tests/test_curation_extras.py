"""Corpus-shaping extras: PII scrubbing, C4-style paragraph dedup,
skew-aware per-key caps, deterministic hash sampling.

Reference analogue: none in geolake (no text ops) — beyond-reference
training-data mandate; each operator also has a DuckDB value oracle in
__spark_entry__.py (pii_scrub / paragraph_dedup / domain_cap /
det_sample)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from geolake_spark.functions import text as tx
from geolake_spark.operators import curation as C

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_pii_scrub_and_counts(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.co.uk then 10.0.0.255 "
            "call +1 (555) 123-4567 or 555.123.4567 end"),
        (2, "no pii here, just 12.5 numbers and v1.2.3 versions"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    counts = tx.pii_count_cols(F.col("text"))
    got = {r.doc_id: r for r in df.select(
        "doc_id", tx.pii_scrub_col(F.col("text")).alias("t"),
        *[v.alias(k) for k, v in counts.items()]).collect()}
    assert got[1].t == ("mail <EMAIL> then <IP> call <PHONE> "
                        "or <PHONE> end")
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_phone) == (1, 1, 2)
    # dotted floats / versions are NOT dotted quads; bare numbers not phones
    assert got[2].t == rows[1][1]
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_phone) == (0, 0, 0)
    assert got[3].t == "" and got[3].n_email == 0


def test_pii_email_scrubbed_before_phone_can_eat_digits(spark):
    # an email whose local part looks phone-ish must become <EMAIL>,
    # not a mangled <PHONE> remnant (pattern order contract)
    df = spark.createDataFrame([(1, "reach 555-123-4567@corp.com now")],
                               "doc_id bigint, text string")
    got = df.select(tx.pii_scrub_col(F.col("text")).alias("t")).head().t
    assert got == "reach <EMAIL> now"


# ---------------------------------------------------------------------------
# Paragraph dedup
# ---------------------------------------------------------------------------


def _para_df(spark):
    rows = [
        (1, "alpha one\n\nshared para\n\ntail a", "en"),
        (2, "beta two\n\nshared para\n\ntail b", "de"),
        (3, "shared para", "en"),          # every paragraph a repeat
        (4, "gamma\n\n\n\ndelta", "fr"),   # empty paragraph in the middle
        (5, "tail a", "es"),               # repeats doc 1's third para
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_paragraph_dedup_keeps_first_occurrence(spark):
    out = {r.doc_id: r for r in C.paragraph_dedup(_para_df(spark)).collect()}
    assert out[1].text == "alpha one\n\nshared para\n\ntail a"
    assert out[2].text == "beta two\n\ntail b"
    assert 3 not in out and 5 not in out      # fully-duplicated docs vanish
    assert out[4].text == "gamma\n\ndelta"    # empty paragraph dropped
    # passthrough columns survive the id join
    assert out[1].lang == "en" and out[4].lang == "fr"


def test_paragraph_dedup_idempotent(spark):
    once = C.paragraph_dedup(_para_df(spark))
    twice = C.paragraph_dedup(once)
    a = sorted((r.doc_id, r.text) for r in once.collect())
    b = sorted((r.doc_id, r.text) for r in twice.collect())
    assert a == b


# ---------------------------------------------------------------------------
# Per-key cap
# ---------------------------------------------------------------------------


def test_capped_by_key_matches_naive_window(spark):
    # skewed: one hot key with 500 rows, several small keys
    rows = [(i, "hot") for i in range(500)]
    rows += [(1000 + i, f"k{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = sorted((r.doc_id, r.source, r.rank_in_key) for r in
                 C.capped_by_key(df, "source", "doc_id", cap=6,
                                 salt_buckets=8).collect())
    w = Window.partitionBy("source").orderBy("doc_id")
    want = sorted((r.doc_id, r.source, r.rank_in_key) for r in
                  df.withColumn("rank_in_key", F.row_number().over(w))
                  .filter("rank_in_key <= 6").collect())
    assert got == want
    assert len(got) == 6 + 7 * 6


def test_capped_by_key_cap_larger_than_group(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                               "doc_id bigint, source string")
    out = C.capped_by_key(df, "source", "doc_id", cap=10).collect()
    assert len(out) == 3
    assert {(r.source, r.rank_in_key) for r in out} == {
        ("a", 1), ("a", 2), ("b", 1)}


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


def test_deterministic_sample_reproducible_and_in_tolerance(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    a = set(r.doc_id for r in
            C.deterministic_sample(df, rate=0.2).collect())
    b = set(r.doc_id for r in
            C.deterministic_sample(df, rate=0.2).collect())
    assert a == b                       # same rows every run, no RNG
    assert abs(len(a) / 20000 - 0.2) < 0.02
    # nested rates: a 0.1 sample is a subset of the 0.2 sample
    c = set(r.doc_id for r in
            C.deterministic_sample(df, rate=0.1).collect())
    assert c <= a


def test_deterministic_sample_stratified(spark):
    df = (spark.range(0, 30000).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.when(F.col("doc_id") % 3 == 0, "en")
                      .when(F.col("doc_id") % 3 == 1, "de")
                      .otherwise("zh")))
    out = (C.deterministic_sample(df, rate=0.05, strata_col="lang",
                                  rates={"en": 0.5, "de": 0.1})
           .groupBy("lang").count().collect())
    got = {r.lang: r["count"] for r in out}
    assert abs(got["en"] / 10000 - 0.5) < 0.03
    assert abs(got["de"] / 10000 - 0.1) < 0.03
    assert abs(got.get("zh", 0) / 10000 - 0.05) < 0.03  # fallback rate


def test_deterministic_sample_requires_rate_or_rates(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        C.deterministic_sample(df)
    with pytest.raises(ValueError):
        C.deterministic_sample(df, rates={"en": 0.5})  # no strata_col


def test_capped_by_key_naive_path_identical(spark):
    rows = [(i, f"k{i % 5}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    salted = sorted((r.doc_id, r.rank_in_key) for r in
                    C.capped_by_key(df, "source", "doc_id", 3).collect())
    naive = sorted((r.doc_id, r.rank_in_key) for r in
                   C.capped_by_key(df, "source", "doc_id", 3,
                                   salt_buckets=None).collect())
    assert salted == naive


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_spans_and_splits(spark):
    df = spark.createDataFrame(
        [(0, 300), (4, 300), (8, 100), (1, 50), (5, 0)],
        "doc_id bigint, n_tokens bigint")
    out = {r.doc_id: r for r in
           C.pack_sequences(df, seq_len=512, n_shards=4).collect()}
    assert 5 not in out                      # zero-token doc excluded
    # shard 0 stream: doc 0 [0,300), doc 4 [300,600), doc 8 [600,700)
    assert (out[0].tok_begin, out[0].seq_first, out[0].seq_last) == (0, 0, 0)
    assert (out[4].tok_begin, out[4].seq_first, out[4].seq_last) == (300, 0, 1)
    assert (out[8].tok_begin, out[8].seq_first, out[8].seq_last) == (600, 1, 1)
    assert out[1].shard == 1 and out[1].tok_begin == 0


def test_pack_sequences_deterministic_and_gapless(spark):
    import random
    rows = [(i, random.Random(i).randint(1, 400)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    a = sorted(map(tuple, C.pack_sequences(df, 128, n_shards=8).collect()))
    b = sorted(map(tuple, C.pack_sequences(df, 128, n_shards=8).collect()))
    assert a == b                            # re-run -> identical plan
    # per shard: spans tile the stream exactly (no gaps, no overlaps)
    from collections import defaultdict
    byshard = defaultdict(list)
    for doc_id, shard, n, begin, sf, sl in a:
        byshard[shard].append((begin, n))
        assert sf == begin // 128 and sl == (begin + n - 1) // 128
    for spans in byshard.values():
        spans.sort()
        pos = 0
        for begin, n in spans:
            assert begin == pos
            pos += n


def test_paragraph_dedup_global_invariants(spark):
    """On any corpus: the kept paragraph multiset == the distinct
    non-empty paragraph set of the input, and each survivor sits in the
    doc with the smallest (doc_id, pos) occurrence."""
    import random
    rng = random.Random(7)
    pool = [f"para {i} " + " ".join(f"w{i}x{j}" for j in range(5))
            for i in range(50)]
    rows = [(d, "\n\n".join(rng.choice(pool)
                            for _ in range(rng.randint(1, 6))))
            for d in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = C.paragraph_dedup(df).collect()
    kept = [p for r in out for p in r.text.split("\n\n")]
    # every distinct input paragraph survives exactly once
    distinct_in = {p for _, t in rows for p in t.split("\n\n") if p}
    assert sorted(kept) == sorted(distinct_in)
    # survivor location is the global first occurrence
    first = {}
    for d, t in rows:  # rows are doc_id-ordered
        for pos, p in enumerate(t.split("\n\n")):
            if p and p not in first:
                first[p] = d
    for r in out:
        for p in r.text.split("\n\n"):
            assert first[p] == r.doc_id


def test_pack_job_resume(spark, synth_paths, tmp_path):
    """jobs/pack.py logic: packing plan commits per shard and a resumed
    run skips every committed shard (deterministic plan => safe)."""
    from geolake_spark.catalog import IcebergishTable
    from geolake_spark.functions import text as tx
    from geolake_spark.write import write_snapshot
    docs = (spark.read.parquet(synth_paths["pages"])
            .withColumn("doc_id", F.xxhash64("url"))
            .select("doc_id", tx.token_count_col(F.col("text"))
                    .alias("n_tokens")))
    plan = C.pack_sequences(docs, seq_len=512, n_shards=4)
    t = IcebergishTable(str(tmp_path / "pack"))
    first = write_snapshot(plan, t, ["shard"], resume=True)
    again = write_snapshot(plan, t, ["shard"], resume=True)
    assert first["written_partitions"] == 4 and first["rows"] == 500
    assert again["written_partitions"] == 0
    assert again["skipped_partitions"] == 4


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_report_planted(spark):
    bench = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string")
    docs = spark.createDataFrame([
        (1, "prefix words THE QUICK BROWN fox ran away"),   # 1 shared 3-gram? see below
        (2, "the quick brown fox jumps over it and the quick brown fox jumps again"),
        (3, "completely different words in this sentence"),
        (4, ""),
        (5, "quick brown"),                                  # < n tokens
    ], "doc_id bigint, text string")
    rep = {r.doc_id: r for r in
           C.decontaminate_report(docs, bench, n=3).collect()}
    # doc 1: lowercased grams share "the quick brown" + "quick brown fox"
    assert rep[1].n_hits == 2 and rep[1].contaminated
    # doc 2: all 3 bench 3-grams appear (distinct count, repeats collapse)
    assert rep[2].n_hits == 3 and rep[2].contaminated
    assert rep[3].n_hits == 0 and not rep[3].contaminated
    assert rep[4].n_hits == 0 and rep[5].n_hits == 0
    assert len(rep) == 5                                    # every doc reported


def test_decontaminate_removes_and_keeps_schema(spark):
    bench = spark.createDataFrame([("a b c",)], "text string")
    docs = spark.createDataFrame(
        [(1, "x a b c y", "k"), (2, "clean text here", "m")],
        "doc_id bigint, text string, extra string")
    out = C.decontaminate(docs, bench, n=3)
    assert out.columns == docs.columns
    assert [tuple(r) for r in out.collect()] == [(2, "clean text here", "m")]


def test_decontaminate_min_overlap_threshold(spark):
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    docs = spark.createDataFrame(
        [(1, "z a b c z"), (2, "a b c d zz")], "doc_id bigint, text string")
    rep = {r.doc_id: r.contaminated for r in
           C.decontaminate_report(docs, bench, n=3, min_overlap=2).collect()}
    assert rep == {1: False, 2: True}    # 1 shared gram vs 2


# --- document chunking ---


def test_chunk_documents_shapes(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    toks = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [toks, "a b", ""]}))
    out = C.chunk_documents(df, width=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 10 tokens, width 4 stride 3 -> starts 0,3,6; the last
    # window reaches the end exactly ((n-width) divisible by stride)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert [r.n_tokens for r in c1] == [4, 4, 4]
    # overlap: last token of chunk k is first of chunk k+1 (stride=width-1)
    assert by_doc[2][0].chunk_text == "a b"   # short doc -> one chunk
    assert 3 not in by_doc                     # empty doc -> no chunks


def test_chunk_coverage_no_token_lost(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "text": [" ".join(f"t{i}" for i in range(57))]}))
    out = C.chunk_documents(df, width=16, stride=16)  # no overlap
    toks = [t for r in sorted(out.collect(), key=lambda r: r.chunk_idx)
            for t in r.chunk_text.split()]
    assert toks == [f"t{i}" for i in range(57)]


def test_chunk_short_tail_kept(spark):
    import pandas as pd
    # 11 tokens, width 4 stride 3: starts 0,3,6,9 — last chunk is the
    # 2-token tail (nothing dropped)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "text": [" ".join(f"w{i}" for i in range(11))]}))
    out = sorted(C.chunk_documents(df, width=4, stride=3).collect(),
                 key=lambda r: r.chunk_idx)
    assert [r.n_tokens for r in out] == [4, 4, 4, 2]
    assert out[-1].chunk_text == "w9 w10"


# ---------------------------------------------------------------------------
# Exact substring dedup (span removal)
# ---------------------------------------------------------------------------


def _sd(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.remove_duplicate_spans(df, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_span_removal_cuts_shared_run_keeps_unique(spark):
    shared = "the quick brown fox jumps over the lazy dog today"  # 10 toks
    rows = [(1, f"alpha beta {shared} gamma delta"),
            (2, f"one two three {shared} four"),
            (3, "totally unique words nothing repeats here at all")]
    out = _sd(spark, rows, k=6)
    # every token of the shared run is covered by some dup 6-window;
    # unique prefix/suffix tokens survive
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[2]["clean_text"] == "one two three four"
    assert out[1]["n_removed"] == 10 and out[2]["n_removed"] == 10
    assert out[3]["clean_text"] == rows[2][1] and out[3]["n_removed"] == 0


def test_span_removal_same_doc_repetition_counts(spark):
    # the 6-gram appears twice WITHIN one doc -> corpus count 2 -> cut
    gram = "a b c d e f"
    rows = [(1, f"x {gram} y {gram} z")]
    out = _sd(spark, rows, k=6)
    assert out[1]["clean_text"] == "x y z"
    assert out[1]["n_removed"] == 12


def test_span_removal_short_and_empty_docs_untouched(spark):
    rows = [(1, "only five tokens right here"),
            (2, ""), (3, "   ")]
    out = _sd(spark, rows, k=6)
    assert out[1]["clean_text"] == rows[0][1]
    assert out[2]["clean_text"] == "" and out[2]["n_tokens"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_tokens"] == 0


def test_span_removal_min_count_threshold(spark):
    shared = "p q r s t u"
    rows = [(1, f"a {shared}"), (2, f"b {shared}")]
    # duplicated twice -> survives min_count=3, cut at min_count=2
    keep = _sd(spark, rows, k=6, min_count=3)
    assert keep[1]["n_removed"] == 0
    cut = _sd(spark, rows, k=6, min_count=2)
    assert cut[1]["clean_text"] == "a" and cut[2]["clean_text"] == "b"


def test_span_windows_positions(spark):
    df = spark.createDataFrame([(1, "w1 w2 w3 w4")],
                               "doc_id long, text string")
    win = C.span_windows(df, k=3).collect()
    assert sorted(r["pos"] for r in win) == [1, 2]


# ---------------------------------------------------------------------------
# Temperature mixing
# ---------------------------------------------------------------------------


def _mix_df(spark):
    # heavily skewed: 3 sources with 6400 / 1600 / 100 docs
    rows = ([(i, "big") for i in range(6400)]
            + [(10_000 + i, "mid") for i in range(1600)]
            + [(20_000 + i, "small") for i in range(100)])
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_rates_flatten_the_head(spark):
    df = _mix_df(spark)
    r = C.temperature_mix_rates(df, "source", target_rows=1000, alpha=0.5)
    # expected shares: sqrt(c)/sum(sqrt) = 80/130, 40/130, 10/130
    assert abs(r["big"] * 6400 - 1000 * 80 / 130) < 1e-6
    assert abs(r["small"] * 100 - 1000 * 10 / 130) < 1e-6
    # flattening: small keeps a ~5x higher fraction than big
    assert r["small"] / r["big"] > 4
    # expected total == target
    assert abs(r["big"] * 6400 + r["mid"] * 1600 + r["small"] * 100
               - 1000) < 1e-6


def test_temperature_alpha_one_is_proportional(spark):
    df = _mix_df(spark)
    r = C.temperature_mix_rates(df, "source", target_rows=810, alpha=1.0)
    # alpha=1: every source keeps the same fraction target/total
    assert abs(r["big"] - 810 / 8100) < 1e-9
    assert abs(r["small"] - 810 / 8100) < 1e-9


def test_temperature_rate_caps_at_one(spark):
    df = _mix_df(spark)
    r = C.temperature_mix_rates(df, "source", target_rows=50_000,
                                alpha=0.5)
    assert r["small"] == 1.0  # can't upsample a 100-doc source


def test_temperature_mix_deterministic_and_near_target(spark):
    df = _mix_df(spark)
    a = sorted(r["doc_id"] for r in
               C.temperature_mix(df, "source", 1000).collect())
    b = sorted(r["doc_id"] for r in
               C.temperature_mix(df, "source", 1000).collect())
    assert a == b
    assert abs(len(a) - 1000) < 100  # hash sampling noise


# ---------------------------------------------------------------------------
# Language mixture
# ---------------------------------------------------------------------------


def test_language_mixture_profiles_mixed_docs(spark):
    en = "the cat and the dog is one of the best"
    de = "der hund und die katze ist nicht hier"
    rows = [
        (1, f"{en}\n\n{en}\n\n{de}"),        # 2/3 english
        (2, f"{de}\n\n{de}"),                # pure german
        (3, "zzz qqq xxx"),                  # no stopword evidence -> und
        (4, f"{en}\n\n\n\n{en}"),            # empty paragraph dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in C.language_mixture(df).collect()}
    assert (out[1].main_lang, out[1].n_paras, out[1].n_langs,
            out[1].main_frac) == ("en", 3, 2, 0.666667)
    assert out[2].main_lang == "de" and out[2].main_frac == 1.0
    assert out[3].main_lang == "und" and out[3].n_langs == 1
    assert out[4].n_paras == 2 and out[4].main_lang == "en"


def test_strip_boilerplate_hand_checked(spark):
    from geolake_spark.operators import curation
    mk = lambda i, h, *paras: (i, f"https://{h}/p/{i}", "\n\n".join(paras))
    rows = [
        mk(1, "a.com", "unique one", "FOOTER"),
        mk(2, "a.com", "unique two", "FOOTER"),
        mk(3, "a.com", "unique three"),            # no footer: 2/3 >= 0.5
        mk(4, "b.com", "FOOTER", "other text"),    # b: 1/2 < 0.5 -> kept
        mk(5, "b.com", "only content"),
        mk(6, "c.com", "FOOTER"),                  # single-page host: kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r.doc_id: r.text
           for r in curation.strip_boilerplate(df, min_frac=0.5,
                                               min_pages=2).collect()}
    assert out[1] == "unique one" and out[2] == "unique two"
    assert out[3] == "unique three"
    assert out[4] == "FOOTER\n\nother text"        # below host threshold
    assert out[6] == "FOOTER"                      # min_pages guard
    assert len(out) == 6


def test_normalize_by_group_hand_checked(spark):
    from geolake_spark.operators import curation
    rows = [("h1", 1, 0.1), ("h1", 2, 0.5), ("h1", 3, 0.9),
            ("h2", 4, 0.9),                        # single row: 0.0
            ("h3", 5, 0.2), ("h3", 6, 0.2)]        # tie: shared rank
    df = spark.createDataFrame(rows, "host string, id long, q double")
    got = {r.id: r.pct_rank
           for r in curation.normalize_by_group(df, "q", "host").collect()}
    assert got == {1: 0.0, 2: 0.5, 3: 1.0, 4: 0.0, 5: 0.0, 6: 0.0}
