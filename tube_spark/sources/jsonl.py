"""JSONL / CSV landing ingestion with a schema contract and
corrupt-record quarantine.

Crawl pipelines land documents as (often gzipped) JSON-lines; the
ingestion step must (a) parse at scale without a Python worker, (b)
enforce the declared schema instead of silently inferring a drifting
one, and (c) never DROP malformed lines — they are routed to a
quarantine frame with the raw line preserved, the same
clean/rejected split contract as ``operators/quarantine.py``.

Spark-first shape: ``spark.read.json`` with an EXPLICIT schema +
PERMISSIVE mode and ``columnNameOfCorruptRecord`` — one JVM-side scan,
no inference job over the corpus (schema inference at 100 TB is a
full extra pass), .gz/.zst handled by the codec layer transparently.
A malformed line yields nulls in every data column and the raw text
in the corrupt column; a VALID line that merely misses fields yields
nulls WITHOUT the corrupt marker — the two cases are split exactly.

Reference: extends the reference's text-format ingestion
(tube/etl/indexers/base/translator.py reads Sqoop text parts with a
fixed schema) to the JSONL + quarantine contract a crawl corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines under ``path`` against the DECLARED ``schema``
    (DDL string, e.g. ``"doc_id long, text string, meta struct<...>"``)
    and return ``(clean, quarantine)``:

    * ``clean`` — schema-typed rows that parsed AND carry non-null
      values for every ``required`` column;
    * ``quarantine`` — ``(raw, reason)``: unparseable lines with their
      raw text (reason ``malformed``), plus parseable lines failing a
      ``required`` column (reason ``missing:<col>``, raw reassembled
      via ``to_json`` of the typed row).

    Both frames come from ONE materialized scan (localCheckpoint —
    also required: Spark disallows querying ONLY the corrupt column
    off a raw JSON source, QUERY_ONLY_CORRUPT_RECORD_COLUMN); nothing
    is dropped — counts satisfy ``clean + quarantine == input lines``."""
    if _CORRUPT in schema:
        raise ValueError(f"schema must not declare {_CORRUPT} itself")
    full_schema = f"{schema}, {_CORRUPT} string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .localCheckpoint(eager=False)
    )
    return _quarantine_split(raw, required)


def _quarantine_split(
    raw: DataFrame, required: list[str] | None
) -> tuple[DataFrame, DataFrame]:
    """Shared clean/quarantine split over a PERMISSIVE-parsed frame
    carrying ``_corrupt_record`` — used by the JSONL and CSV landing
    readers (same contract, different parser)."""
    data_cols = [c for c in raw.columns if c != _CORRUPT]
    parsed = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    malformed = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw"), F.lit("malformed").alias("reason")
    )
    req = [c for c in (required or []) if c]
    for c in req:
        if c not in data_cols:
            raise ValueError(f"required column {c!r} not in schema")
    if req:
        missing_cond = None
        reason = F.lit(None).cast("string")
        for c in reversed(req):
            cnd = F.col(c).isNull()
            missing_cond = cnd if missing_cond is None else (cnd | missing_cond)
            reason = F.when(cnd, F.lit(f"missing:{c}")).otherwise(reason)
        clean = parsed.filter(~missing_cond)
        bad = parsed.filter(missing_cond).select(
            F.to_json(F.struct(*data_cols)).alias("raw"), reason.alias("reason")
        )
        quarantine = malformed.unionByName(bad)
    else:
        clean, quarantine = parsed, malformed
    return clean, quarantine


def read_csv_landing(
    spark: SparkSession,
    path: str,
    schema: str,
    required: list[str] | None = None,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of ``read_jsonl``: same declared-schema PERMISSIVE
    parse, same ``(clean, quarantine)`` contract.  A line whose fields
    fail to parse under the declared types (or that is structurally
    malformed) lands in quarantine with the raw line preserved in the
    corrupt column; parseable rows missing a ``required`` column
    quarantine with reason ``missing:<col>`` (raw reassembled via
    ``to_json`` — the reassembled form is canonical, not the original
    byte sequence, same as the JSONL reader's missing-column path).

    Spark-first: one JVM-side scan with the declared schema — no
    inference pass — and the codec layer handles .gz transparently.
    Note Spark's CSV semantics: a row with FEWER columns than the
    schema yields nulls (caught by ``required``), not a corrupt record;
    type mismatches and extra columns do mark the record corrupt."""
    if _CORRUPT in schema:
        raise ValueError(f"schema must not declare {_CORRUPT} itself")
    full_schema = f"{schema}, {_CORRUPT} string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
        .localCheckpoint(eager=False)
    )
    return _quarantine_split(raw, required)


def jsonl_ingest_report(clean: DataFrame, quarantine: DataFrame) -> DataFrame:
    """One-row ingest gate: clean/quarantined counts and per-reason
    breakdown (sorted ``reason=count`` string — canonical for compare)."""
    n_clean = clean.count()
    by_reason = sorted(
        (r["reason"], r["n"])
        for r in quarantine.groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n_quar = sum(n for _, n in by_reason)
    spark = clean.sparkSession
    return spark.createDataFrame(
        [(n_clean, n_quar, ",".join(f"{r}={n}" for r, n in by_reason))],
        "n_clean long, n_quarantined long, reasons string",
    )
