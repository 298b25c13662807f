"""Split documents into overlapping token-window chunks.

The retrieval/indexing counterpart of sequence packing: each document
becomes ``ceil((n - overlap) / (chunk - overlap))`` windows of at most
``chunk_tokens`` tokens, consecutive windows sharing ``overlap``
tokens, with stable ``(doc_id, chunk_index)`` identity and token
offsets — what a RAG indexer or embedding pipeline consumes.

Map-only: the window layout is computed per document with whole-array
expressions (sequence + slice), then exploded — no shuffle at all; the
operator scales with corpus tokens and parallelizes by input split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_index, start_token, n_tokens, chunk_text) — one row
    per window.  Token-less documents yield no chunks; a document
    shorter than ``chunk_tokens`` yields exactly one.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    tok = tokens(F.col(text_col))
    n = F.size(tok)
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
    )
    win = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_index"),
            (i * stride).cast("long").alias("start_token"),
            F.slice(tok, i * stride + 1, chunk_tokens).alias("toks"),
        ),
    )
    return (
        # n <= 0 would make sequence(0, -1) DESCEND ([0, -1]); drop
        # token-less docs before building the window array
        df.filter(n > 0)
        .select(F.col(id_col), F.explode(win).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_index").alias("chunk_index"),
            F.col("c.start_token").alias("start_token"),
            F.size("c.toks").cast("long").alias("n_tokens"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )


_SENT = r"[^.!?]+[.!?]*"


def sentence_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sentences_per_chunk: int = 3,
) -> DataFrame:
    """Sentence-window chunking — the semantic cousin of the token
    window above: split on sentence terminals (``[^.!?]+[.!?]*`` — the
    Java-regex/RE2 common subset, so an SQL oracle extracts the
    identical sentences), then group every ``sentences_per_chunk``
    consecutive sentences into one chunk.  RAG indexers prefer
    sentence windows when token windows cut mid-thought.

    Output: ``(id, chunk_id, n_sentences, chunk_text)`` — chunk text
    rejoined in sentence order (an explicit sort key, never
    collect_list arrival order, which is partition-dependent).

    Map-only until the per-(doc, chunk) regroup — one keyed
    aggregation whose key count is the chunk count; no windows."""
    if sentences_per_chunk < 1:
        raise ValueError(
            f"sentences_per_chunk must be >= 1, got {sentences_per_chunk}"
        )
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(_SENT), F.lit(0)),
            lambda s: F.trim(s),
        ),
        lambda s: s != F.lit(""),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(sents).alias("pos", "sentence")
    )
    ordered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sentence"))),
            lambda x: x["sentence"],
        ),
        " ",
    )
    return exploded.groupBy(
        F.col(id_col),
        (F.col("pos") / sentences_per_chunk).cast("long").alias("chunk_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_sentences"),
        ordered.alias("chunk_text"),
    )
