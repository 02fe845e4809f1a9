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
