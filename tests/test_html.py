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


# ---------------------------------------------------------------------------
# main-content extraction (boilerplate removal)
# ---------------------------------------------------------------------------


def _main(spark, html, min_chars=25):
    df = spark.createDataFrame(pd.DataFrame({"html": [html]}))
    return df.select(tx.main_content_col(F.col("html"), min_chars)
                     .alias("t")).collect()[0].t


def test_main_content_drops_boilerplate(spark):
    html = ('<body><div class="nav"><a href="/">Home</a> '
            '<a href="/a">Archive</a> <a href="/c">Contact</a></div>'
            "<p>This paragraph is the actual article content with many "
            "plain words and zero links.</p>"
            "<p>short.</p>"
            '<div class="footer"><a href="/p">Privacy</a> '
            '<a href="/t">Terms</a></div></body>')
    out = _main(spark, html)
    assert out == ("This paragraph is the actual article content with "
                   "many plain words and zero links.")


def test_main_content_script_hides_block_closers(spark):
    # a '</div>' inside a script body must not split blocks after the
    # global span drop; the comment-hidden paragraph must not leak
    html = ("<script>var x = '</div></p>';</script>"
            "<!-- <p>hidden comment paragraph with many words</p> -->"
            "<div>Real content block long enough to clear the minimum "
            "character bar easily.</div>")
    out = _main(spark, html)
    assert out == ("Real content block long enough to clear the minimum "
                   "character bar easily.")


def test_main_content_link_density_integer_boundary(spark):
    # tag removal inserts one space: visible text is 20 + 1 + n chars.
    # anchor 10 -> 3*10 <= 31 kept; anchor 11 -> 3*11 > 32 dropped
    base = "x" * 20
    keep = f"<p>{base}<a href='/l'>{'y' * 10}</a></p>"
    drop = f"<p>{base}<a href='/l'>{'y' * 11}</a></p>"
    assert _main(spark, keep) == base + " " + "y" * 10
    assert _main(spark, drop) == ""


def test_main_content_min_chars_and_entities(spark):
    # 24 visible chars dropped at min 25; entity decodes before counting
    assert _main(spark, "<p>" + "a" * 24 + "</p>") == ""
    assert _main(spark, "<p>" + "a" * 25 + "</p>") == "a" * 25
    out = _main(spark, "<p>Fish &amp; chips " + "pad " * 5 + "end</p>")
    assert "Fish & chips" in out


def test_main_content_joins_blocks_with_newline(spark):
    html = ("<p>First real paragraph with enough visible words here.</p>"
            "<div>Second real block also has plenty of visible text.</div>")
    out = _main(spark, html)
    assert out.split("\n") == [
        "First real paragraph with enough visible words here.",
        "Second real block also has plenty of visible text."]
