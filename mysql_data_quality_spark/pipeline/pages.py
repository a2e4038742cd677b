"""Deterministic synthesis of the Common-Crawl-style ``pages`` table
(BASELINE.json input_hint: ``url:string, warc_ts:timestamp, html:binary,
text:string, lang:string``) from the driver-provided ``documents`` table.

No external data, no randomness: every derived value is a pure function of
``doc_id``/``source``/``text``.  PII, junk, and toxicity snippets are
injected for deterministic subsets of doc_ids so the scrub and drop rules
have real work to do.  The same derivation exists as a DuckDB CTE
(:func:`pages_cte_sql`) so oracle queries see the identical table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = 1700000000  # pinned epoch base for warc_ts

# (modulus, residue, suffix-expression builders) — injection is append-only
# so the original text stays a prefix (keeps features interpretable).
_EMAIL_MOD, _EMAIL_RES = 10, 3
_PHONE_MOD, _PHONE_RES = 10, 7
_IP_MOD, _IP_RES = 17, 5
_BLOCK_MOD, _BLOCK_RES = 23, 11
_JUNK_MOD, _JUNK_RES = 19, 2
_JUNK_SUFFIX = " @@@ ### $$$ %%% ^^^ &&& *** !!! ~~~ ((( )))"


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages."""
    did = F.col("doc_id")
    text = F.col("text")

    def inj(mod: int, res: int, suffix):
        return F.when(did % mod == res, suffix).otherwise(F.lit(""))

    email_sfx = F.concat(
        F.lit(" Contact me at user"),
        did.cast("string"),
        F.lit("@example.com for details."),
    )
    phone_sfx = F.concat(
        F.lit(" Call (11) 9"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit("-5678 now."),
    )
    ip_sfx = F.concat(
        F.lit(" server ip 10.0."),
        (did % 256).cast("string"),
        F.lit("."),
        ((did * 7) % 256).cast("string"),
        F.lit(" logged."),
    )
    block_sfx = F.lit(" this page mentions badword1 explicitly.")
    junk_sfx = F.lit(_JUNK_SUFFIX)

    aug_text = F.concat(
        text,
        inj(_EMAIL_MOD, _EMAIL_RES, email_sfx),
        inj(_PHONE_MOD, _PHONE_RES, phone_sfx),
        inj(_IP_MOD, _IP_RES, ip_sfx),
        inj(_BLOCK_MOD, _BLOCK_RES, block_sfx),
        inj(_JUNK_MOD, _JUNK_RES, junk_sfx),
    )

    return docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/page/"),
            did.cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(BASE_TS) + (did * 37) % 31536000).alias(
            "warc_ts"
        ),
        F.encode(
            F.concat(F.lit("<html><body>"), aug_text, F.lit("</body></html>")),
            "UTF-8",
        ).alias("html"),
        aug_text.alias("text"),
        F.col("lang"),
    )


def pages_cte_sql(docs_table: str = "documents") -> str:
    """DuckDB CTE body producing the identical pages table."""
    email_sfx = (
        "' Contact me at user' || cast(doc_id as varchar) || "
        "'@example.com for details.'"
    )
    phone_sfx = (
        "' Call (11) 9' || lpad(cast(doc_id % 10000 as varchar), 4, '0') || "
        "'-5678 now.'"
    )
    ip_sfx = (
        "' server ip 10.0.' || cast(doc_id % 256 as varchar) || '.' || "
        "cast((doc_id * 7) % 256 as varchar) || ' logged.'"
    )
    block_sfx = "' this page mentions badword1 explicitly.'"
    junk_sfx = f"'{_JUNK_SUFFIX}'"
    aug = (
        "text"
        f" || (case when doc_id % {_EMAIL_MOD} = {_EMAIL_RES} then {email_sfx} else '' end)"
        f" || (case when doc_id % {_PHONE_MOD} = {_PHONE_RES} then {phone_sfx} else '' end)"
        f" || (case when doc_id % {_IP_MOD} = {_IP_RES} then {ip_sfx} else '' end)"
        f" || (case when doc_id % {_BLOCK_MOD} = {_BLOCK_RES} then {block_sfx} else '' end)"
        f" || (case when doc_id % {_JUNK_MOD} = {_JUNK_RES} then {junk_sfx} else '' end)"
    )
    return (
        "select "
        "'https://' || source || '.example.com/page/' || cast(doc_id as varchar) as url, "
        f"to_timestamp({BASE_TS} + (doc_id * 37) % 31536000) as warc_ts, "
        f"encode('<html><body>' || {aug} || '</body></html>') as html, "
        f"{aug} as text, "
        "lang "
        f"from {docs_table}"
    )


def read_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pages_from_documents(docs)


def pages_with_extracted_text(
    pages: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """Fill ``text`` from the raw ``html`` payload where it is missing —
    the ingest step for corpora that arrive as WARC payloads only
    (the north-star input carries both columns; the driver's synthetic
    tables come pre-extracted, so this is a no-op there).  Rows with a
    non-null ``text`` keep it byte-identical (the per-url byte-identity
    contract); extraction is the pure-Column chain in
    :mod:`mysql_data_quality_spark.functions.htmltext` — no Python, no
    shuffle, whole-stage codegen."""
    from mysql_data_quality_spark.functions.htmltext import extract_text_col

    return pages.withColumn(
        text_col,
        F.coalesce(F.col(text_col), extract_text_col(F.col(html_col))),
    )
