"""Round-7 registration staging area: driver-shaped (spark, sf_dir)
queries + DuckDB oracle SQL for the four round-6 library operators,
kept OUT of the live registry while round-6's rotation freeze holds
(see the ROTATION note in queries.py).

Everything here is pre-validated by tests/test_staged_oracle.py with
the exact comparison the driver uses (row count, columns, value hash),
so promotion is a dict-merge: move these entries into
queries.QUERIES / queries.ORACLE_SQL and delete this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metevents_spark.io import load_table


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery over the documents corpus (min_words
    lowered to 5 for the short synthetic docs)."""
    from metevents_spark.text.stats import gopher_quality

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_quality(docs, min_words=5)


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup report: inject deterministic messy URLs
    (tracking params, default ports, mixed case — the domain_stats
    idiom), canonicalize, count how many raw forms collapse into each
    canonical URL. Map-side canonicalization; one small groupBy."""
    from metevents_spark.text.scrub import canonicalize_url

    d = F.col("doc_id")
    raw = F.concat(
        F.lit("HTTPS://Site"), d % 13, F.lit(".Example.COM:443/p/"), d % 29,
        F.when(d % 2 == 0, F.lit("?utm_source=x&b=2&a=1")).otherwise(
            F.lit("?b=2&a=1")
        ),
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", raw.alias("url")
    )
    return (
        docs.select(canonicalize_url(F.col("url")).alias("canonical"))
        .groupBy("canonical")
        .agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
        .orderBy("canonical")
    )


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level paragraph dedup over documents (the synthetic
    corpus is single-line, so '. ' is the paragraph separator)."""
    from metevents_spark.text.dedup import paragraph_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return paragraph_dedup(docs, sep=". ")


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture plan with deterministic weights derived from the source
    number (k = src_num % 4 + 1, normalized) and a 1M-token budget —
    the same stand-in-weight convention as source_mix_sample. The only
    collect is the distinct source list (|sources| rows, the same
    legitimate tiny-collect as the pivot value lists)."""
    from metevents_spark.text.pipeline import mixture_plan

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    sources = sorted(
        r.source for r in docs.select("source").distinct().collect()
    )
    ks = {s: int(s[3:]) % 4 + 1 for s in sources}
    total = sum(ks.values())
    weights = {s: k / total for s, k in ks.items()}
    return mixture_plan(docs, weights, target_total_tokens=1_000_000)


STAGED_QUERIES = {
    "gopher_quality": q_gopher_quality,
    "url_canonicalize": q_url_canonicalize,
    "paragraph_dedup": q_paragraph_dedup,
    "mixture_plan": q_mixture_plan,
}

STAGED_ORACLE_SQL = {
    "gopher_quality": """
WITH w AS (
  SELECT doc_id,
         string_split(text, ' ') AS words,
         string_split(text, chr(10)) AS lines
  FROM documents
), m AS (
  SELECT doc_id,
    len(words) AS n_words,
    round(list_sum(list_transform(words, x -> length(x))) * 1.0
          / len(words), 6) AS mean_word_len,
    round((len(list_filter(words, x -> contains(x, '#')))
           + len(list_filter(words, x -> contains(x, '...')))) * 1.0
          / len(words), 6) AS symbol_ratio,
    round(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]')))
          * 1.0 / len(lines), 6) AS bullet_line_frac,
    round(len(list_filter(lines, l -> l LIKE '%...')) * 1.0
          / len(lines), 6) AS ellipsis_line_frac,
    round(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]')))
          * 1.0 / len(words), 6) AS alpha_word_frac,
    len(list_intersect(list_distinct(words),
        ['the', 'a', 'of', 'and', 'to', 'in'])) AS stopword_hits
  FROM w
)
SELECT *,
  (n_words BETWEEN 5 AND 100000
   AND mean_word_len BETWEEN 3.0 AND 10.0
   AND symbol_ratio <= 0.1
   AND bullet_line_frac <= 0.9
   AND ellipsis_line_frac <= 0.3
   AND alpha_word_frac >= 0.8
   AND stopword_hits >= 2) AS keep
FROM m ORDER BY doc_id
""",
    "url_canonicalize": """
WITH raw AS (
  SELECT 'HTTPS://Site' || (doc_id % 13) || '.Example.COM:443/p/'
         || (doc_id % 29)
         || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&b=2&a=1'
                 ELSE '?b=2&a=1' END AS url
  FROM documents
), parts AS (
  SELECT
    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url, '^[^:]+://([^/?:]+)', 1)) AS host,
    regexp_extract(url, '^[^:]+://[^/?:]+:(\\d+)', 1) AS port,
    regexp_extract(url, '^[^:]+://[^/?]+(/[^?]*)?', 1) AS path,
    regexp_extract(url, '\\?(.*)$', 1) AS query
  FROM raw
), canon AS (
  SELECT scheme || '://' || host
    || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
              OR (scheme = 'https' AND port = '443') THEN ''
            ELSE ':' || port END
    || path
    || CASE WHEN len(kept) > 0 THEN '?' || list_aggregate(kept, 'string_agg', '&')
            ELSE '' END AS canonical
  FROM (
    SELECT *,
      list_sort(list_filter(string_split(query, '&'),
        p -> p <> '' AND NOT regexp_matches(p,
          '^(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)='))) AS kept
    FROM parts
  )
)
SELECT canonical, COUNT(*) AS n_raw FROM canon
GROUP BY canonical ORDER BY canonical
""",
    "paragraph_dedup": """
WITH paras AS (
  SELECT doc_id, u.pos, u.para FROM (
    SELECT doc_id,
      unnest(list_transform(string_split(text, '. '),
        (p, i) -> struct_pack(pos := i - 1, para := p))) AS u
    FROM documents
  )
), flagged AS (
  SELECT doc_id, pos, para,
    (length(para) < 16 OR
     row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) = 1
    ) AS keep
  FROM paras
)
SELECT doc_id,
  coalesce(string_agg(para, '. ' ORDER BY pos) FILTER (WHERE keep), '')
    AS text,
  COUNT(*) AS n_paragraphs,
  SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS n_dropped
FROM flagged GROUP BY doc_id ORDER BY doc_id
""",
    "mixture_plan": """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY source
), k AS (
  SELECT *, CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS kk FROM per
), tot AS (SELECT SUM(kk) AS sk FROM k)
SELECT source, n_docs, n_tokens,
  round(kk * 1.0 / sk, 6) AS weight,
  CAST(round(kk * 1.0 / sk * 1000000) AS BIGINT) AS target_tokens,
  round(round(kk * 1.0 / sk * 1000000) / n_tokens, 6) AS sampling_rate,
  CAST(ceil(round(kk * 1.0 / sk * 1000000) / n_tokens) AS BIGINT) AS epochs
FROM k, tot ORDER BY source
""",
}
