"""gopher_quality and canonicalize_url — registered in round 7 as the
gopher_quality / url_canonicalize queries.
Differential tests: Spark result vs an independent pandas/python
re-implementation of the published rules."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from metevents_spark.io import load_table
from metevents_spark.text.stats import STOPWORDS, gopher_quality
from metevents_spark.text.scrub import canonicalize_url

from tests.conftest import SF_SMALL


def _py_gopher(text: str, min_words: int) -> dict:
    words = text.split(" ")
    lines = text.split("\n")
    n = len(words)
    mean_len = round(sum(len(w) for w in words) / n, 6)
    sym = round(
        (sum("#" in w for w in words) + sum("..." in w for w in words)) / n, 6
    )
    bullet = round(
        sum(l.lstrip().startswith(("-", "*", "•")) for l in lines) / len(lines), 6
    )
    ell = round(sum(l.endswith("...") for l in lines) / len(lines), 6)
    alpha = round(sum(any(c.isalpha() and c.isascii() for c in w) for w in words) / n, 6)
    stop = len(set(words) & set(STOPWORDS))
    keep = (
        min_words <= n <= 100_000
        and 3.0 <= mean_len <= 10.0
        and sym <= 0.1
        and bullet <= 0.9
        and ell <= 0.3
        and alpha >= 0.8
        and stop >= 2
    )
    return dict(n_words=n, mean_word_len=mean_len, symbol_ratio=sym,
                bullet_line_frac=bullet, ellipsis_line_frac=ell,
                alpha_word_frac=alpha, stopword_hits=stop, keep=keep)


def test_gopher_quality_matches_pandas_on_corpus(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    got = gopher_quality(docs, min_words=5).toPandas().set_index("doc_id")
    raw = docs.toPandas().set_index("doc_id")["text"]
    assert len(got) == len(raw)
    for doc_id, text in raw.items():
        exp = _py_gopher(text, 5)
        row = got.loc[doc_id]
        assert bool(row["keep"]) == exp["keep"], doc_id
        for k, v in exp.items():
            if k == "keep":
                continue
            assert row[k] == pytest.approx(v), (doc_id, k, row[k], v)


def test_gopher_quality_rule_edges(spark):
    base = ("the of " + "hello " * 60).strip()
    rows = [
        (1, base),                                     # passes everything
        (2, "the of hello"),                           # too few words
        (3, ("the of " + "#tags " * 60).strip()),      # symbol ratio
        (4, "- the of x\n- b\n" + "hello " * 60),      # bullets but <=0.9
        (5, base + "\nx...\ny...\nz..."),              # ellipsis-ended lines
        (6, ("zzaaa " * 80).strip()),                  # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = gopher_quality(df, min_words=50).toPandas().set_index("doc_id")
    assert bool(got.loc[1, "keep"])
    assert not bool(got.loc[2, "keep"])
    assert not bool(got.loc[3, "keep"])
    assert bool(got.loc[4, "keep"])
    assert not bool(got.loc[6, "keep"])
    raw = {r[0]: r[1] for r in rows}
    for doc_id, text in raw.items():
        exp = _py_gopher(text, 50)
        row = got.loc[doc_id]
        assert bool(row["keep"]) == exp["keep"], doc_id
        for k, v in exp.items():
            if k == "keep":
                continue
            assert row[k] == pytest.approx(v), (doc_id, k)


def test_canonicalize_url_table(spark):
    cases = [
        ("HTTPS://Example.COM:443/Path?b=2&utm_source=x&a=1#f",
         "https://example.com/Path?a=1&b=2"),
        ("http://example.com:80/", "http://example.com/"),
        ("http://example.com:8080/x?fbclid=abc",
         "http://example.com:8080/x"),
        ("https://site.org/a?z=9&y=8&x=7", "https://site.org/a?x=7&y=8&z=9"),
        ("https://site.org/a", "https://site.org/a"),
        ("https://site.org/a?gclid=1&ref=tw", "https://site.org/a"),
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    bad = df.withColumn("got", canonicalize_url(F.col("url"))).filter(
        F.col("got") != F.col("expected")
    )
    assert bad.count() == 0, bad.collect()


def test_canonicalize_url_idempotent(spark):
    urls = [
        "HTTPS://A.B:443/p?b=2&utm_x=1&a=1#z",
        "http://h.i:8080/q?y=2&x=1",
        "https://plain.example/path",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonicalize_url(F.col("url")).alias("url"))
    twice = once.select(canonicalize_url(F.col("url")).alias("url"))
    assert [r.url for r in once.collect()] == [r.url for r in twice.collect()]
