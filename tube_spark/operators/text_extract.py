"""HTML -> training-text extraction (boilerplate stripping), the first
step of every web-crawl curation pipeline (WET-style extraction;
link-density boilerplate signal after Kohlschuetter et al., WSDM 2010
"Boilerplate detection using shallow text features").

Order of operations (the standard single-pass decode):
  1. drop <script>/<style> ELEMENTS (content and all — executable or
     presentational, never training text) and <!-- comments -->,
  2. replace every remaining tag with a space (block boundaries must
     not glue words together),
  3. decode the six ubiquitous entities (&amp; LAST, so "&amp;lt;"
     decodes to "&lt;" and stops — one pass, no double-decode),
  4. collapse whitespace runs and trim.

Everything is regexp_replace / replace / regexp_extract_all on the
COMMON Java-regex / RE2 subset (inline (?is) flags, lazy .*?, no
lookaround, no backreferences), so the whole kernel runs JVM-side
inside whole-stage codegen — zero shuffle, zero Python — and a DuckDB
oracle replays it character-for-character (each helper's docstring
carries its SQL twin).

``link_density`` — anchor-text chars / total text chars — is the
classic nav-page discriminator: index/menu pages approach 1.0, prose
approaches 0.0; downstream gates (operators/curation.py) threshold it
like any other quality score.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_STYLE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"<[^>]+>"
_ANCHOR = r"(?is)<a\b[^>]*>(.*?)</a>"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last: single-pass decode
]


def strip_tags(col: Column) -> Column:
    """Markup removal steps 1-2.  DuckDB twin: the same four
    ``regexp_replace(s, pat, repl, 'g')`` in the same order."""
    out = F.regexp_replace(col, _SCRIPT, " ")
    out = F.regexp_replace(out, _STYLE, " ")
    out = F.regexp_replace(out, _COMMENT, " ")
    return F.regexp_replace(out, _TAG, " ")


def decode_entities(col: Column) -> Column:
    """Step 3.  DuckDB twin: the same ``replace`` chain in the same
    order (&amp; last)."""
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def normalize_ws(col: Column) -> Column:
    """Step 4.  DuckDB twin: ``trim(regexp_replace(s, '\\s+', ' ',
    'g'))``."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def html_to_text(col: Column) -> Column:
    """Full extraction: strip -> decode -> normalize."""
    return normalize_ws(decode_entities(strip_tags(col)))


def anchor_text(col: Column) -> Column:
    """The concatenated inner text of every <a> element, run through
    the same decode/normalize — the numerator of ``link_density``.
    DuckDB twin: ``array_to_string(regexp_extract_all(s, pat, 1), ' ')``
    through the same cleanup."""
    joined = F.array_join(F.regexp_extract_all(col, F.lit(_ANCHOR), F.lit(1)), " ")
    return normalize_ws(decode_entities(F.regexp_replace(joined, _TAG, " ")))


def html_extract(
    df: DataFrame, col: str, out_col: str = "text_extracted"
) -> DataFrame:
    """df + (``out_col``, ``n_links``, ``link_density``): extracted
    text, anchor count, and anchor-chars / text-chars (0.0 when the
    page has no text).  One map-only projection — composes into the
    document scan's codegen span like operators/text_analysis.py."""
    src = F.col(col)
    text = html_to_text(src)
    ltxt = anchor_text(src)
    return (
        df.withColumn(out_col, text)
        .withColumn(
            "n_links",
            F.size(F.regexp_extract_all(src, F.lit(_ANCHOR), F.lit(1))),
        )
        .withColumn(
            "link_density",
            F.when(F.length(F.col(out_col)) > 0,
                   F.round(F.length(ltxt) / F.length(F.col(out_col)), 6))
            .otherwise(F.lit(0.0)),
        )
    )
