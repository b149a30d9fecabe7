"""PII scrubbing and URL/domain analysis for pretraining corpora
(beyond-reference surface; the reference has no text processing at
all — /root/reference/metevents is numeric-series only).

Both operators are pure JVM regex expressions (``regexp_extract_all``
/ ``regexp_replace`` inside whole-stage codegen) — no Python in the
hot path, so they scale with the parquet scan. The regexes stick to
the syntax subset shared by Java (Spark) and RE2 (DuckDB oracle): no
backreferences, no lookaround.

The synthetic ``documents`` corpus contains no natural PII or URLs,
so the registry queries *inject* deterministic spans derived from
``doc_id`` before scrubbing — the injection is part of the query (and
mirrored in the oracle SQL) purely to exercise the machinery on
varied, verifiable content; the operators themselves
(:func:`pii_scrub_columns`, :func:`extract_domains`) apply to any
string column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from metevents_spark.io import load_table

# Shared Java/RE2 syntax. Email before phone/IP during replacement so
# digit runs inside a redacted span can't be re-matched.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def _token_count(col: Column, token: str) -> Column:
    """Occurrences of a literal token — a length delta, no regex."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(token), F.lit(""))))
        / len(token)
    ).cast("long")


def pii_scrub_columns(text: Column) -> list[Column]:
    """Per-kind match counts plus the fully redacted text for one
    string column. Replacement is sequential (email -> phone -> IPv4);
    counts are derived from each stage's replacement-token delta, so
    every PII kind costs ONE regex pass instead of two (measured 15.5s
    -> 11.9s on 50k docs; regex evaluation dominates, the literal
    length-delta counts are nearly free). Assumes the literal markers
    ``<EMAIL>`` etc. do not pre-exist in the input (a scrubbing
    pipeline invariant)."""
    s1 = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    s2 = F.regexp_replace(s1, PHONE_RE, "<PHONE>")
    s3 = F.regexp_replace(s2, IPV4_RE, "<IP>")
    return [
        _token_count(s1, "<EMAIL>").alias("n_emails"),
        _token_count(s2, "<PHONE>").alias("n_phones"),
        _token_count(s3, "<IP>").alias("n_ips"),
        s3.alias("redacted"),
    ]


def _with_injected_pii(docs: DataFrame) -> DataFrame:
    """Deterministic PII spans keyed off doc_id: always one email,
    a phone for 3 of every 4 docs, one IP plus a second for every
    fifth doc — so counts vary and the redaction paths all exercise."""
    d = F.col("doc_id")
    email = F.concat(
        F.lit(" user"), d, F.lit("@mail"), d % 7, F.lit(".example.com")
    )
    phone = F.when(
        d % 4 != 0,
        F.concat(F.lit(" +1-555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    ip = F.concat(F.lit(" 10."), d % 256, F.lit("."), (d * 7) % 256, F.lit(".42"))
    ip2 = F.when(
        d % 5 == 0, F.concat(F.lit(" 192.168."), d % 100, F.lit(".7"))
    ).otherwise(F.lit(""))
    return docs.withColumn(
        "text", F.concat(F.col("text"), email, phone, ip, ip2)
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: inject deterministic PII into every document,
    then count and redact it. Output one row per document with the
    per-kind counts and the scrubbed text."""
    docs = _with_injected_pii(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.select(
        "doc_id", *pii_scrub_columns(F.col("text"))
    ).orderBy("doc_id")


def extract_domains(text: Column) -> Column:
    """All lowercased URL host names in a string column (array)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(URL_DOMAIN_RE), F.lit(1)),
        lambda x: F.lower(x),
    )


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: inject deterministic URLs (one per doc, a second
    for even doc_ids), extract hostnames, and aggregate per-domain URL
    and document counts. The explode is map-side; the only shuffle is
    the final small groupBy(domain)."""
    d = F.col("doc_id")
    url1 = F.concat(
        F.lit(" https://www.site"), d % 23, F.lit(".example.com/p/"), d
    )
    url2 = F.when(
        d % 2 == 0, F.concat(F.lit(" http://cdn"), d % 7, F.lit(".example.org/x"))
    ).otherwise(F.lit(""))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.concat("text", url1, url2).alias("text"))
    )
    return (
        docs.select("doc_id", F.explode(extract_domains(F.col("text"))).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("domain")
    )


# query parameters that carry tracking state, not content identity —
# the standard strip-list for crawl URL dedup
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL column for dedup/grouping: lowercase
    scheme+host, default ports stripped, fragment dropped, tracking
    query parameters removed, remaining parameters SORTED (param order
    is not content identity). Empty query strings drop their '?'.

    Pure codegen: regexp splits + one array_sort over the (short)
    parameter array — no Python, no shuffle; a crawl-frontier dedup
    applies this map-side and groups on the result.
    """
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(no_frag, r"^[^:]+://([^/?:]+)", 1))
    port = F.regexp_extract(no_frag, r"^[^:]+://[^/?:]+:(\d+)", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(no_frag, r"^[^:]+://[^/?]+(/[^?]*)?", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
