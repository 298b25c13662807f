"""HTML extraction: python-reference (same regex subset) equality on
crafted and random pages, entity decode order, link density, map-only
plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tube_spark.operators.text_extract import html_extract, html_to_text

_ENTS = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
]


def _py_extract(s):
    s = re.sub(r"(?is)<script[^>]*>.*?</script>", " ", s)
    s = re.sub(r"(?is)<style[^>]*>.*?</style>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"<[^>]+>", " ", s)
    for e, c in _ENTS:
        s = s.replace(e, c)
    return re.sub(r"\s+", " ", s).strip()


def _py_anchor(s):
    joined = " ".join(re.findall(r"(?is)<a\b[^>]*>(.*?)</a>", s))
    joined = re.sub(r"<[^>]+>", " ", joined)
    for e, c in _ENTS:
        joined = joined.replace(e, c)
    return re.sub(r"\s+", " ", joined).strip()


PAGES = [
    "<html><head><title>T</title><style>p{color:red}</style>"
    "<script>if(a<b && c>d){x='&amp;'}</script></head>"
    "<body><h1>Header</h1><p>Body &amp; soul &lt;tag&gt; &#39;q&#39;"
    "&nbsp;end</p><a href='/x'>a link</a><!-- hidden --></body></html>",
    "plain text, no markup at all",
    "",
    "<SCRIPT>upper case</SCRIPT><P>Mixed <B>bold</B> case</P>",
    "double encoded: &amp;lt; stays as &lt; literal",
    "<a href='1'>nav</a> <a href='2'>menu</a> <a href='3'>links</a>",
    "<p>broken <unclosed and a stray > bracket</p>",
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(PAGES)], "i long, html string")
    got = {
        r["i"]: (r["text_extracted"], r["n_links"], r["link_density"])
        for r in html_extract(df, "html").collect()
    }
    for i, p in enumerate(PAGES):
        text, n, dens = got[i]
        assert text == _py_extract(p), (i, text)
        assert n == len(re.findall(r"(?is)<a\b[^>]*>(.*?)</a>", p))
        want = (
            round(len(_py_anchor(p)) / len(_py_extract(p)), 6)
            if _py_extract(p)
            else 0.0
        )
        assert abs(dens - want) < 1e-9, (i, dens, want)


def test_entity_single_pass_decode(spark):
    df = spark.createDataFrame([("x &amp;lt; y",)], "html string")
    out = df.select(html_to_text(F.col("html")).alias("t")).first()["t"]
    assert out == "x &lt; y"  # NOT double-decoded to "x < y"


def test_nav_page_vs_prose_density(spark):
    nav = "<a>home</a><a>about</a><a>contact</a>"
    prose = "<p>" + "word " * 50 + "</p><a>ref</a>"
    df = spark.createDataFrame([(1, nav), (2, prose)], "i long, html string")
    d = {r["i"]: r["link_density"] for r in html_extract(df, "html").collect()}
    assert d[1] > 0.9 and d[2] < 0.1


def test_map_only_plan(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        html_extract(df, "html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
