"""White-box tests of the r12 HTML→text extraction rules (the third
leg next to the Spark/DuckDB oracle cross-check): crafted HTML with
hand-computed expectations, exercising each rule in isolation —
removal classes, case/dotall behavior, entity decode ORDER, the
two-signal keep rule's boundaries, and block ordering."""

from __future__ import annotations

import pytest

from mincemeatpy_spark.text.html_extract import extract_text_cols

import pyspark.sql.functions as F


def _extract(spark, html: str) -> dict:
    cols = extract_text_cols(F.col("html"))
    row = (
        spark.createDataFrame([(html,)], "html string")
        .select(
            cols["body"].alias("body"),
            cols["n_blocks"].alias("n_blocks"),
            cols["n_words"].alias("n_words"),
        )
        .collect()[0]
    )
    return {"body": row.body, "n_blocks": row.n_blocks, "n_words": row.n_words}


def test_script_style_comment_removed_case_insensitive_dotall(spark):
    got = _extract(
        spark,
        '<p>alpha beta gamma delta epsilon</p>'
        '<SCRIPT type="x">line1\nline2 with many words here</SCRIPT>'
        "<Style>body { a: b }\n.c { d: e }</Style>"
        "<!-- a comment\nspanning lines with words words words -->"
        "<p>zeta eta theta iota kappa</p>",
    )
    assert got["n_blocks"] == 2
    assert got["body"] == (
        "alpha beta gamma delta epsilon\nzeta eta theta iota kappa"
    )
    assert got["n_words"] == 10


def test_entity_decode_order_amp_last(spark):
    # &amp;lt; must decode to the literal text "&lt;", NOT to "<"
    got = _extract(
        spark,
        "<p>one two three four &amp;lt; stays literal here</p>",
    )
    assert "&lt;" in got["body"]
    assert "<" not in got["body"].replace("&lt;", "")
    # and the plain entities decode
    got2 = _extract(
        spark,
        "<p>a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; w x y z</p>",
    )
    assert '<tag>' in got2["body"] and '"q"' in got2["body"]
    assert "'s'" in got2["body"]
    assert "&nbsp;" not in got2["body"]  # collapsed to a space


def test_keep_rule_word_count_boundary(spark):
    # exactly 5 words, no links: kept; 4 words: dropped
    assert _extract(spark, "<p>one two three four five</p>")["n_blocks"] == 1
    assert _extract(spark, "<p>one two three four</p>")["n_blocks"] == 0


def test_keep_rule_link_density_boundary(spark):
    # 2 links x factor 5 = 10: a 10-word block drops, an 11-word keeps
    ten = '<a href="/a">w1</a> w2 w3 w4 w5 w6 w7 w8 <a href="/b">w9</a> w10'
    eleven = ten + " w11"
    assert _extract(spark, f"<p>{ten}</p>")["n_blocks"] == 0
    got = _extract(spark, f"<p>{eleven}</p>")
    assert got["n_blocks"] == 1 and got["n_words"] == 11


def test_inline_tags_stripped_blocks_ordered(spark):
    got = _extract(
        spark,
        "<div>first block with <b>bold</b> inline markup kept</div>"
        "<li>tiny</li>"
        "<p>second block follows the first in document order</p>",
    )
    assert got["n_blocks"] == 2
    first, second = got["body"].split("\n")
    assert first.startswith("first block")
    assert "bold" in first and "<b>" not in got["body"]
    assert second.startswith("second block")


def test_whitespace_collapse_and_empty_input(spark):
    got = _extract(
        spark, "<p>spaced   out\twords\nacross   lines here</p>"
    )
    assert got["body"] == "spaced out words across lines here"
    empty = _extract(spark, "<nav><li>Home</li><li>About</li></nav>")
    assert empty == {"body": "", "n_blocks": 0, "n_words": 0}


@pytest.mark.parametrize(
    "html,words",
    [
        # block tags with attributes still split; self-closing br splits
        ('<p class="x" id=y>a b c d e</p><br/>f g h i j', 10),
        # h1-h6 all act as block boundaries (here: drop 2-word headings)
        ("<H3>short heading</H3><p>real body text five words</p>", 5),
    ],
)
def test_block_tag_variants(spark, html, words):
    assert _extract(spark, html)["n_words"] == words
