"""HTML -> text extraction (functions/text.py html_strip_col): the
crawl-shape edge cases the regex chain must handle."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.functions import text as tx


def _strip(spark, html):
    df = spark.createDataFrame(pd.DataFrame({"html": [html]}))
    return df.select(tx.html_strip_col(F.col("html")).alias("t"),
                     tx.html_title_col(F.col("html")).alias("ti")) \
        .collect()[0]


def test_script_and_style_bodies_dropped(spark):
    r = _strip(spark, '<p>keep</p><script>var a = "<b>not text</b>";'
                      '</script><style>p>a{x:1}</style><p>also</p>')
    assert r.t == "keep also"


def test_multiline_script_and_comment(spark):
    r = _strip(spark, "<p>a</p><script>\nif (x<y) {}\n</script>"
                      "<!-- c1\n<p>hidden</p>\n--><p>b</p>")
    assert r.t == "a b"


def test_entities_decode_once_not_twice(spark):
    # '&amp;lt;' is the LITERAL text '&lt;' — must not become '<'
    r = _strip(spark, "<p>x &amp;lt; y &lt;tag&gt; &nbsp;&quot;q&quot;"
                      " &#39;s&#39;</p>")
    assert r.t == 'x &lt; y <tag> "q" \'s\''


def test_decoded_markup_not_restripped(spark):
    # entity-decoded '<p>' arrives AFTER tag stripping: stays literal
    r = _strip(spark, "<div>see &lt;p&gt;raw&lt;/p&gt; here</div>")
    assert r.t == "see <p>raw</p> here"


def test_title_extracted_and_collapsed(spark):
    r = _strip(spark, "<html><head><title>\n  A   Long\tTitle </title>"
                      "</head><body>x</body></html>")
    assert r.ti == "A Long Title"
    r2 = _strip(spark, "<p>no title</p>")
    assert r2.ti == ""


def test_attributes_and_selfclosing(spark):
    r = _strip(spark, '<a href="http://x.com/?a=1&amp;b=2">link</a>'
                      '<br/><img src="i.png"/>end')
    assert r.t == "link end"


def test_codegen_only(spark):
    df = spark.createDataFrame(pd.DataFrame({"html": ["<p>x</p>"]}))
    plan = df.select(tx.html_strip_col(F.col("html"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- Unicode normalization ---


def test_nfc_composes_and_is_idempotent(spark):
    import unicodedata
    cases = ["e" + chr(769), chr(4352) + chr(4449), "A" + chr(778),
             chr(233), "plain ascii", ""]
    df = spark.createDataFrame(pd.DataFrame({"t": cases}))
    out = [r[0] for r in df.select(
        tx.nfc_normalize_col(F.col("t"))).collect()]
    assert out == [unicodedata.normalize("NFC", c) for c in cases]
    assert out[0] == chr(233) and out[1] == chr(44032)  # é, 가
    # idempotent
    df2 = spark.createDataFrame(pd.DataFrame({"t": out}))
    again = [r[0] for r in df2.select(
        tx.nfc_normalize_col(F.col("t"))).collect()]
    assert again == out


def test_nfkc_folds_compat_forms(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["ﬁle ｆｕｌｌ"]}))
    out = df.select(tx.make_normalize_udf("NFKC")(F.col("t"))).collect()
    assert out[0][0] == "file full"


def test_normalization_fixes_dedup_misses(spark):
    """the motivating case: byte-different, visually identical docs
    exact-dedup ONLY after NFC."""
    from geolake_spark.operators import dedup
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["caf" + chr(233), "cafe" + chr(769)]}))
    raw_reps = dedup.exact_dedup(df, text_col="text", id_col="doc_id")
    assert raw_reps.count() == 2  # missed without normalization
    norm = df.withColumn("text", tx.nfc_normalize_col(F.col("text")))
    assert dedup.exact_dedup(norm, text_col="text",
                             id_col="doc_id").count() == 1
