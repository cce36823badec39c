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


class TestDomExtract:
    """DOM-aware variant (VERDICT r3 #4): stdlib-parser extraction
    that survives adversarial markup the regex chain mis-handles.
    Pure-python function tested directly; the Spark crossing once."""

    def _dom(self, html: str) -> str:
        from fineweb_domain_analyzer_spark.functions.html import (
            dom_extract_text,
        )

        return dom_extract_text(html)

    def test_gt_inside_attribute_value(self, spark):
        # regex `<[^>]*>` stops at the > inside the attribute and
        # leaks `b">link` — the DOM parser tokenizes the tag correctly
        h = '<p>x</p><a title="a > b">link</a><p>y</p>'
        assert self._dom(h) == "x\nlink\ny"
        df = spark.createDataFrame([(h,)], "html_text string")
        regex_out = df.select(html_to_text(F.col("html_text")).alias("t")).first()["t"]
        assert 'b">' in regex_out  # documents the regex failure mode

    def test_lt_inside_script_string(self):
        h = "<script>if (a < b) { x = '<p>fake</p>'; }</script><p>real</p>"
        assert self._dom(h) == "real"

    def test_cdata_with_gt_dropped(self):
        h = "<p>a</p><![CDATA[ 1 > 0 && 2 < 3 ]]><p>b</p>"
        assert self._dom(h) == "a\nb"

    def test_comment_containing_tags(self):
        h = "<p>a</p><!-- <p>not text</p> <div> --><p>b</p>"
        assert self._dom(h) == "a\nb"

    def test_unclosed_tag_at_eof(self):
        assert self._dom('<p>text</p><div class="x') == "text"

    def test_trailing_text_with_ampersand_kept(self):
        """Regression (r4 review): convert_charrefs buffers trailing
        plain text whose tail holds an unresolved '&'; close() must
        flush it as visible text, not drop it as markup garbage."""
        assert self._dom("<p>Hello</p>Call AT&T") == "Hello\nCall AT&T"
        assert self._dom("Call AT&T") == "Call AT&T"
        assert self._dom("<p>a</p>trail &") == "a\ntrail &"
        # ...while genuine incomplete markup at EOF is still dropped
        assert self._dom("<p>text</p><div class='x") == "text"
        assert self._dom("text <") == "text"

    def test_numeric_and_named_entities(self):
        h = "<p>&amp; &#x27;s&#39; &lt;tag&gt;&nbsp;end</p>"
        assert self._dom(h) == "& 's' <tag> end".replace(" ", "\xa0")

    def test_nested_same_skip_tag(self):
        # malformed nested <script> — depth counter keeps skipping
        h = "<script>a<script>b</script>c</script><p>ok</p>"
        assert "ok" in self._dom(h)
        assert "a" not in self._dom(h)

    def test_agrees_with_regex_chain_on_clean_markup(self, spark):
        """On well-formed markup (q60's synthesized shape) the two
        variants agree, modulo nbsp (regex maps &nbsp;→space, DOM
        keeps \\xa0 — both then collapse)."""
        from fineweb_domain_analyzer_spark.functions.html import (
            dom_html_to_text_udf,
        )

        h = (
            "<html><head><style>p {color: red}</style>"
            '<script>var x = "</p>";</script></head><body>'
            "<h1>Head</h1>\n<p>body text &amp; more</p>"
            "<div>footer</div><!-- hidden --></body></html>"
        )
        df = spark.createDataFrame([(h,)], "html_text string")
        row = df.select(
            html_to_text(F.col("html_text")).alias("rx"),
            dom_html_to_text_udf()(F.col("html_text")).alias("dom"),
        ).first()
        assert row["rx"] == row["dom"] == "Head\nbody text & more\nfooter"

    def test_dom_mode_via_with_extracted_text(self, spark):
        df = spark.createDataFrame(
            [('<a title="a > b">link</a>',), (None,)], "html_text string"
        )
        rows = with_extracted_text(df, mode="dom").collect()
        assert rows[0]["extracted_text"] == "link"
        assert rows[1]["extracted_text"] is None


class TestPageMetadata:
    def test_title_and_meta(self, spark):
        from pyspark.sql import functions as F

        from fineweb_domain_analyzer_spark.functions.html import (
            extract_meta_description,
            extract_title,
        )

        html = (
            '<html><head><META NAME="description" CONTENT="a summary">'
            "<TITLE>Hello &amp; World</TITLE></head>"
            "<body><title>second title ignored</title></body></html>"
        )
        df = spark.createDataFrame([(html,)], "html string")
        r = df.select(
            extract_title(F.col("html")).alias("t"),
            extract_meta_description(F.col("html")).alias("m"),
        ).collect()[0]
        assert r["t"] == "Hello &amp; World"  # first title wins; entities raw
        assert r["m"] == "a summary"

    def test_absent_yields_empty(self, spark):
        from pyspark.sql import functions as F

        from fineweb_domain_analyzer_spark.functions.html import (
            extract_meta_description,
            extract_title,
        )

        df = spark.createDataFrame(
            [("<html><body>no head</body></html>",), (None,)], "html string"
        )
        rows = df.select(
            extract_title(F.col("html")).alias("t"),
            extract_meta_description(F.col("html")).alias("m"),
        ).collect()
        assert (rows[0]["t"], rows[0]["m"]) == ("", "")
        assert rows[1]["t"] is None  # null html propagates
