"""html_to_text — hand-crafted extraction cases (q60's operator)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.functions.html import (
    html_to_text,
    with_extracted_text,
)


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html_text string")
    return with_extracted_text(df).collect()[0]["extracted_text"]


class TestHtmlToText:
    def test_script_with_embedded_closer_removed(self, spark):
        h = '<p>keep</p><script>var x = "</p> sneaky";</script><p>also</p>'
        assert _extract(spark, h) == "keep\nalso"

    def test_style_comment_and_entities(self, spark):
        h = (
            "<style>p{color:red}</style><!-- secret -->"
            "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
        )
        assert _extract(spark, h) == "a & b <tag> \"q\" 's' end"

    def test_double_escaped_entity_stays_literal(self, spark):
        # &amp;lt; means the PAGE displayed "&lt;" — must not decode twice
        assert _extract(spark, "<p>&amp;lt;</p>") == "&lt;"

    def test_block_tags_break_lines_inline_tags_do_not(self, spark):
        h = "<h1>Title</h1><p>one <b>bold</b> word</p><div>footer</div>"
        assert _extract(spark, h) == "Title\none bold word\nfooter"

    def test_whitespace_collapse(self, spark):
        h = "<p>a\t\t b</p>\n\n\n<p>c</p>"
        assert _extract(spark, h) == "a b\nc"
