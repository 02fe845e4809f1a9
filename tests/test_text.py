"""Text pipeline: the byte-identical extraction invariant (BASELINE.json
input_hint), golden hashes, token counts, lang-id, quality, fingerprints."""

import hashlib

import pytest
from pyspark.sql import functions as F

from geolake_spark.functions import text as tx


def test_extractor_golden():
    html = (b"<html><head><title>T</title><script>bad()</script>"
            b"<style>x{}</style></head><body><!-- c --><h1>Hello</h1>"
            b"<p>a &amp; b &lt;tag&gt;&nbsp;end</p></body></html>")
    assert tx.extract_text_bytes(html) == "T Hello a & b <tag> end"


def test_extractor_nested_script_and_entities():
    html = b"<p>x</p><script>if (a<b) { run('</div>') }</script><p>y &#39;q&#39;</p>"
    out = tx.extract_text_bytes(html)
    assert out == "x y 'q'"


def test_extractor_is_pure_and_stable():
    html = b"<b>repeat</b> me"
    h1 = hashlib.sha256(tx.extract_text_bytes(html).encode()).hexdigest()
    h2 = hashlib.sha256(tx.extract_text_bytes(html).encode()).hexdigest()
    assert h1 == h2 == hashlib.sha256(b"repeat me").hexdigest()


def test_pages_text_invariant_byte_identical(spark, pages):
    """THE invariant: engine-extracted text == stored text for every url."""
    re_extracted = pages.withColumn("text2", tx.extract_text_udf(F.col("html")))
    n_bad = re_extracted.filter(F.col("text") != F.col("text2")).count()
    assert n_bad == 0
    assert re_extracted.count() == pages.count()


def test_token_count_col(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("  ",), ("", ), ("one",)], ["text"])
    got = [r[0] for r in
           df.select(tx.token_count_col(F.col("text"))).collect()]
    assert got == [3, 0, 0, 1]


def test_bpe_token_count(spark):
    df = spark.createDataFrame([("hello, world 42",)], ["text"])
    got = df.select(tx.bpe_token_count_udf(F.col("text"))).first()[0]
    # hello(2) ,(1) world(2) 4(1) 2(1)
    assert got == 7


def test_lang_id_stopwords(spark):
    df = spark.createDataFrame([
        ("the cat and the dog is here of course",),
        ("il gatto che corre di casa per sempre il",),
        ("der hund und die katze ist nicht da der und",),
        ("zzz qqq www",),
    ], ["text"])
    got = [r[0] for r in df.select(tx.lang_id_col(F.col("text"))).collect()]
    assert got == ["en", "it", "de", "und"]


def test_lang_id_kernel_matches_case_ladder(spark):
    """The vectorized Arrow lang_id kernel must match the JVM CASE-ladder
    reference bit-for-bit — including the non-overlapping replace-count
    chain rule (" is is is " counts 2, not 3), multi-space/tab separators
    (needles match only 0x20), NULL -> 'und', and non-ASCII text."""
    import random
    rng = random.Random(99)
    vocab = ["the", "and", "is", "of", "il", "che", "di", "per", "der",
             "und", "ist", "nicht", "le", "et", "est", "les", "el", "que",
             "de", "los", "cat", "x"]
    rows = []
    for _ in range(300):
        s = ""
        for _ in range(rng.randint(0, 20)):
            s += rng.choice(vocab) + rng.choice([" ", " ", "  ", "\t", "\n"])
        rows.append((s,))
    rows += [(" is is is ",), ("is is",), ("the the the the",), ("",),
             (None,), ("ΤΗΣ is of the",), ("DE DE QUE EL LOS",),
             ("is\tis is is",), ("наш il che di per",)]
    df = spark.createDataFrame(rows, ["text"])
    out = df.select(tx._lang_id_case_col(F.col("text")).alias("ref"),
                    tx.lang_id_col(F.col("text")).alias("got")).collect()
    assert all(r["ref"] == r["got"] for r in out)


def test_quality_monotone_in_length(spark):
    df = spark.createDataFrame([("word " * 5,), ("the and is of. " * 60,)],
                               ["text"])
    lo, hi = [r[0] for r in
              df.select(tx.quality_score_col(F.col("text"))).collect()]
    assert hi > lo


def test_fingerprint_is_md5(spark):
    df = spark.createDataFrame([("abc",)], ["text"])
    assert (df.select(tx.fingerprint_col(F.col("text"))).first()[0]
            == "900150983cd24fb0d6963f7d28e17f72")


def test_repetition_metrics(spark):
    """Hand-computed goldens: 'a b c' x3 has 7 trigrams of which 3 are
    distinct (1 - 3/7); 'a a a a' gives top word share 1.0; short/empty
    docs score 0.0 (no trigram denominator / no tokens)."""
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, ""), (3, "x"), (4, "a a a a"),
         (5, "The the THE ok")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        tx.dup_ngram_frac_col(F.col("text"), 3).alias("d"),
        tx.top_word_frac_col(F.col("text")).alias("w")).collect()}
    assert rows[1]["d"] == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert rows[1]["w"] == pytest.approx(3 / 9, abs=1e-6)
    assert rows[2]["d"] == 0.0 and rows[2]["w"] == 0.0
    assert rows[3]["d"] == 0.0 and rows[3]["w"] == 1.0
    assert rows[4]["d"] == pytest.approx(0.5) and rows[4]["w"] == 1.0
    assert rows[5]["w"] == pytest.approx(3 / 4)  # lowercased counting


def test_repetition_boilerplate_separates(spark):
    """A pasted-template page scores far above an organic page on
    duplicate-trigram coverage — the gate the metric exists for."""
    organic = "the quick brown fox jumps over a lazy dog near the old barn"
    template = ("buy now best price free shipping " * 8).strip()
    df = spark.createDataFrame([(1, organic), (2, template)],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r["d"] for r in df.select(
        "doc_id",
        tx.dup_ngram_frac_col(F.col("text"), 3).alias("d")).collect()}
    assert got[1] < 0.1 < 0.7 < got[2]


# ---------------------------------------------------------------------------
# URL anatomy (round 5)
# ---------------------------------------------------------------------------


def test_url_anatomy(spark):
    from pyspark.sql import functions as F
    from geolake_spark.functions import text as tx
    cases = [
        ("https://News.Example.co.uk:8080/a/b/c?q=1#f",
         "news.example.co.uk", "example.co.uk", 3),
        ("http://user:pw@sub.deep.example.com/x//y/",
         "sub.deep.example.com", "example.com", 2),
        ("https://example.org", "example.org", "example.org", 0),
        ("notaurl", "", "", 0),
        ("https://localhost/p", "localhost", "localhost", 1),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    got = df.select(
        "url", tx.url_host_col(F.col("url")).alias("h"),
        tx.registered_domain_col(F.col("url")).alias("d"),
        tx.url_path_depth_col(F.col("url")).alias("n")).collect()
    for row, (_, h, d, n) in zip(sorted(got, key=lambda r: [c[0] for c in cases].index(r.url)), cases):
        assert (row.h, row.d, row.n) == (h, d, n), row


def test_gopher_gates_and_script_mix(spark):
    from pyspark.sql import functions as F
    from geolake_spark.functions import text as tx
    txt = ("the cat sat\n- bullet line\nends with dots...\n"
           "只有中文字符 here with that")
    df = spark.createDataFrame([(1, txt), (2, "")],
                               "doc_id bigint, text string")
    cols = {**tx.gopher_gate_cols(F.col("text")),
            **tx.script_fraction_cols(F.col("text"))}
    got = {r.doc_id: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in cols.items()]).collect()}
    r = got[1]
    assert r.bullet_line_frac == 0.25 and r.ellipsis_line_frac == 0.25
    assert r.stopword_count == 4        # the, with (x2), that
    assert r.frac_han > 0.05 and r.frac_cyrillic == 0.0
    assert 0 < r.alpha_word_frac < 1    # CJK token has no [A-Za-z]
    z = got[2]
    assert (z.mean_word_len, z.frac_latin, z.stopword_count) == (0.0, 0.0, 0)


def test_url_canonical_contract(spark):
    """Each clause of the url_canonical_col contract (functions/text.py):
    case, userinfo, default-port-per-scheme, fragment, tracking params,
    param sort, trailing slash / empty path, and the no-scheme fallback."""
    cases = [
        ("HTTPS://WWW.Ex.COM/Path", "https://www.ex.com/Path"),   # case; path case kept
        ("https://user:pw@ex.com/a", "https://ex.com/a"),         # userinfo stripped
        ("http://ex.com:80/a", "http://ex.com/a"),                # http default port
        ("https://ex.com:443/a", "https://ex.com/a"),             # https default port
        ("http://ex.com:443/a", "http://ex.com:443/a"),           # NOT default for http
        ("https://ex.com:8080/a", "https://ex.com:8080/a"),       # non-default kept
        ("https://ex.com/a#frag", "https://ex.com/a"),            # fragment dropped
        ("https://ex.com/a?utm_source=tw&b=2&a=1", "https://ex.com/a?a=1&b=2"),
        ("https://ex.com/a?fbclid=xyz", "https://ex.com/a"),      # empty query -> no ?
        ("https://ex.com/a?ref=home&gclid=1&z=9", "https://ex.com/a?z=9"),
        ("https://ex.com", "https://ex.com/"),                    # empty path -> /
        ("https://ex.com/", "https://ex.com/"),
        ("https://ex.com/a/b/", "https://ex.com/a/b"),            # trailing / stripped
        ("https://ex.com/a?", "https://ex.com/a"),                # bare ? dropped
        ("no scheme here", ""),                                   # fallback
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string")
    got = {r.i: r.c for r in df.select(
        "i", tx.url_canonical_col(F.col("url")).alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_url_canonical_duckdb_parity(spark):
    """Spark column and DuckDB SQL mirror agree on every contract case."""
    import duckdb
    urls = [
        "HTTPS://User@WWW.Ex.COM:443/A/b/?utm_campaign=x&b=2&a=1#f",
        "http://ex.com:8080?gclid=1", "https://ex.com/x?", "plain text",
        "ftp://Ex.com:21/f/", "https://ex.com/a?a=1&a=0",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: r.c for r in df.select(
        "url", tx.url_canonical_col(F.col("url")).alias("c")).collect()}
    con = duckdb.connect()
    for u in urls:
        lit = "'" + u.replace("'", "''") + "'"
        (want,) = con.sql(
            f"SELECT {tx.url_canonical_sql(lit)}").fetchone()
        assert got[u] == want, (u, got[u], want)


def test_hashed_bow_score_matches_reference_impl(spark):
    """Spark JVM scorer == a straight Python reimplementation (md5 bucket,
    mean weight, sigmoid), incl. empty text -> sigmoid(bias)."""
    import hashlib, math
    D, bias = 64, 0.25
    w = tx.demo_classifier_weights(D)

    def ref(s: str) -> float:
        toks = s.strip().lower().split()
        z = bias + (sum(w[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % D]
                        for t in toks) / max(len(toks), 1))
        return round(1.0 / (1.0 + math.exp(-z)), 6)

    texts = ["The quick Brown fox", "", "  ", "one", "a a a b"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    got = {r.i: r.s for r in df.select(
        "i", tx.hashed_bow_score_col(F.col("text"), w, bias).alias("s")
    ).collect()}
    for i, t in enumerate(texts):
        assert abs(got[i] - ref(t)) < 1e-9, (t, got[i], ref(t))
    assert got[1] == round(1 / (1 + math.exp(-0.25)), 6)  # empty -> sigmoid(bias)


def test_hashed_bow_score_stays_jvm_side(spark):
    """The scorer must not fall off the codegen path into Python."""
    df = spark.createDataFrame([("x y z",)], "text string")
    plan = df.select(
        tx.hashed_bow_score_col(F.col("text"),
                                tx.demo_classifier_weights(16))
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hashed_bow_score_feature_bounds(spark):
    with pytest.raises(AssertionError):
        tx.hashed_bow_score_col(F.lit("x"), [0.1, 0.2])       # D too small
    with pytest.raises(AssertionError):
        tx.hashed_bow_score_col(F.lit("x"), [0.0] * (1 << 17))  # too big


def test_kwic_snippets(spark):
    from pyspark.sql import functions as F

    from geolake_spark.functions import text as tx
    rows = [(1, "alpha beta GAMMA delta epsilon zeta eta"),
            (2, "gamma at start of doc here"),
            (3, "tail words then gamma"),
            (4, "no match here at all"),
            (5, "gamma")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.s for r in df.select(
        "id", tx.kwic_col(F.col("text"), "Gamma", window=2)
        .alias("s")).collect()}
    assert got == {1: "alpha beta GAMMA delta epsilon",  # case preserved
                   2: "gamma at start",
                   3: "words then gamma",
                   4: "",
                   5: "gamma"}


def test_readability_hand_checked(spark):
    from pyspark.sql import functions as F

    from geolake_spark.functions import text as tx
    text = "The cat sat. The dog ran away! Did it?"
    df = spark.createDataFrame([(1, text)], "id long, text string")
    cols = tx.readability_cols(F.col("text"))
    r = df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0]
    # 9 words, 3 sentences, syllables: the=1 cat=1 sat=1 the=1 dog=1
    # ran=1 away=2(a, ay) did=1 it?=1 -> 10
    assert (r.n_words, r.n_sentences, r.n_syllables) == (9, 3, 10)
    exp = round(0.39 * (9 / 3) + 11.8 * (10 / 9) - 15.59, 4)
    assert r.fk_grade == exp


# ------------------------------------------------- sentences / mojibake

def test_sentences_and_lead(spark):
    import duckdb
    import pandas as pd
    from geolake_spark.functions import text as tx2
    rows = [
        (0, "Hello world. This is fine! Is it? Yes... maybe. End"),
        (1, "One sentence only"),
        (2, ""),
        (3, "A.B no split. Real split!  Double  spaces.   "),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    out = {r.doc_id: (r.n, r.lead2) for r in df.select(
        "doc_id", F.size(tx2.sentences_col(F.col("text"))).alias("n"),
        tx2.lead_sentences_col(F.col("text"), 2).alias("lead2")).collect()}
    assert out[0] == (6, "Hello world. This is fine.")
    assert out[1] == (1, "One sentence only.")
    assert out[2] == (0, "")
    # "A.B" has no whitespace after the period: one sentence
    assert out[3] == (3, "A.B no split. Real split.")
    con = duckdb.connect()
    con.register("t", pdf)
    ora = {r[0]: (r[1], r[2]) for r in con.sql(
        f"SELECT doc_id, len({tx2.sentences_sql('text')}), "
        f"{tx2.lead_sentences_sql('text', 2)} FROM t").fetchall()}
    assert ora == out


def test_mojibake_counts(spark):
    import pandas as pd
    from geolake_spark.functions import text as tx2
    resid = "caf" + "Ã©" + " q" + "â€™"
    rows = [
        (0, "clean ascii text."),
        (1, resid),                       # two residue markers
        (2, "bad �� here"),     # two replacement chars
        (3, "ctl \x01\x02 ok\ttab"),      # two C0 (tab excluded)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    cols = tx2.mojibake_cols(F.col("text"))
    out = {r.doc_id: (r.repl_chars, r.mojibake_seqs, r.ctrl_chars,
                      r.is_mojibake)
           for r in spark.createDataFrame(pdf).select(
               "doc_id", *[v.alias(k) for k, v in cols.items()]).collect()}
    assert out[0] == (0, 0, 0, 0)
    assert out[1] == (0, 2, 0, 1)
    assert out[2] == (2, 0, 0, 1)
    assert out[3] == (0, 0, 2, 1)
