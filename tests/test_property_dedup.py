"""Property-based checks for the round-7 text-pipeline promotions:
paragraph_dedup invariants (idempotence, no invented text, first
occurrence survives) and canonicalize_url invariants (idempotence,
tracking-param removal, case/port normalization) over random inputs.

Each hypothesis example packs many random documents into ONE DataFrame
so a single Spark job validates the whole batch.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "license", "header", "the", "x"]
)
paragraph = st.lists(words, min_size=1, max_size=6).map(" ".join)
document = st.lists(paragraph, min_size=1, max_size=6).map("\n\n".join)
corpus = st.lists(document, min_size=1, max_size=8)


@pytest.mark.slowfuzz
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus)
def test_paragraph_dedup_invariants(spark, docs):
    from metevents_spark.text.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = paragraph_dedup(df, sep="\n\n", min_chars=1).orderBy("doc_id")
    rows = out.collect()

    in_paras = {i: t.split("\n\n") for i, t in enumerate(docs)}
    seen: set[str] = set()
    for r in rows:
        orig = in_paras[r.doc_id]
        kept = r.text.split("\n\n") if r.text else []
        # accounting: n_paragraphs is the input count, n_dropped the diff
        assert r.n_paragraphs == len(orig)
        assert r.n_dropped == len(orig) - len(kept)
        # no invented text: kept paragraphs are a subsequence of input
        it = iter(orig)
        assert all(any(p == q for q in it) for p in kept), (orig, kept)
        # first-occurrence-wins across the corpus in (doc_id, pos) order
        for p in orig:
            if p not in seen:
                assert p in kept, (r.doc_id, p)
                seen.add(p)

    # idempotence: deduping the deduped corpus changes nothing
    again = paragraph_dedup(
        out.select("doc_id", "text"), sep="\n\n", min_chars=1
    ).orderBy("doc_id")
    assert [(r.doc_id, r.text) for r in again.collect()] == [
        (r.doc_id, r.text) for r in rows
    ]
    assert again.agg(F.sum("n_dropped")).collect()[0][0] == 0


host = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True)
path_seg = st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True)
qkey = st.sampled_from(["a", "b", "utm_source", "utm_medium", "fbclid", "z"])


@st.composite
def url(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS"]))
    h = draw(host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    p = "/" + draw(path_seg)
    params = draw(st.lists(qkey, max_size=3, unique=True))
    q = "&".join(f"{k}=1" for k in params)
    return f"{scheme}://{h}{port}{p}" + (f"?{q}" if q else "")


@pytest.mark.slowfuzz
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(url(), min_size=1, max_size=20))
def test_canonicalize_url_invariants(spark, urls):
    from metevents_spark.text.scrub import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = [
        r.c
        for r in df.select(
            canonicalize_url(F.col("url")).alias("c")
        ).collect()
    ]
    for u, c in zip(urls, out):
        assert "utm_" not in c and "fbclid" not in c
        # scheme+host lowercased; default ports stripped
        scheme = c.split("://")[0]
        assert scheme in ("http", "https")
        assert ":80/" not in c if scheme == "http" else ":443/" not in c

    # idempotence: canonicalizing a canonical URL is a no-op
    df2 = spark.createDataFrame([(c,) for c in out], "url string")
    out2 = [
        r.c
        for r in df2.select(
            canonicalize_url(F.col("url")).alias("c")
        ).collect()
    ]
    assert out2 == out
