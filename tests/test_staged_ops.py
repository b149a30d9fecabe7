"""paragraph_dedup and mixture_plan — registered in round 7 as registry
queries; differential tests vs independent pandas/python
implementations."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from metevents_spark.text.dedup import paragraph_dedup
from metevents_spark.text.pipeline import mixture_plan


def _py_paragraph_dedup(rows, sep="\n\n", min_chars=16):
    seen = {}
    order = []
    for doc_id, text in sorted(rows):
        for pos, para in enumerate(text.split(sep)):
            order.append((doc_id, pos, para))
    # winner = lowest (doc_id, pos) per paragraph
    for doc_id, pos, para in sorted(order):
        seen.setdefault(para, (doc_id, pos))
    out = {}
    for doc_id, text in rows:
        kept, dropped = [], 0
        paras = text.split(sep)
        for pos, para in enumerate(paras):
            if len(para) < min_chars or seen[para] == (doc_id, pos):
                kept.append(para)
            else:
                dropped += 1
        out[doc_id] = (sep.join(kept), len(paras), dropped)
    return out


def test_paragraph_dedup_matches_python(spark):
    footer = "COMMON FOOTER BLOCK repeated in many docs"
    rows = [
        (1, f"Unique one alpha beta gamma.\n\n{footer}\n\nshort"),
        (2, f"Another intro paragraph here.\n\n{footer}"),
        (3, f"{footer}\n\nDistinct tail paragraph content."),
        (4, f"{footer}\n\n{footer}"),          # intra-doc repeat
        (5, "No repeats in this document at all."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_paragraphs, r.n_dropped)
        for r in paragraph_dedup(df).collect()
    }
    assert got == _py_paragraph_dedup(rows)


def test_paragraph_dedup_idempotent(spark):
    footer = "COMMON FOOTER BLOCK repeated in many docs"
    rows = [(i, f"Doc {i} unique lead paragraph.\n\n{footer}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = paragraph_dedup(df).select("doc_id", "text")
    twice = paragraph_dedup(once).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_mixture_plan_math(spark):
    rows = [
        ("web", 100), ("web", 300),        # 400 tokens
        ("code", 50), ("code", 50),        # 100 tokens
        ("books", 10),                     # 10 tokens (upsampled)
        ("junk", 500),                     # no weight -> excluded
    ]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    plan = {
        r.source: r
        for r in mixture_plan(
            df, {"web": 0.5, "code": 0.3, "books": 0.2}, 1000
        ).collect()
    }
    assert set(plan) == {"web", "code", "books", "junk"}
    w = plan["web"]
    assert (w.n_docs, w.n_tokens, w.target_tokens) == (2, 400, 500)
    assert w.sampling_rate == pytest.approx(1.25) and w.epochs == 2
    c = plan["code"]
    assert (c.target_tokens, c.epochs) == (300, 3)
    b = plan["books"]
    assert b.sampling_rate == pytest.approx(20.0) and b.epochs == 20
    j = plan["junk"]
    assert (j.weight, j.target_tokens, j.sampling_rate, j.epochs) == (0.0, 0, 0.0, 0)
    # budget conservation: targets of weighted sources sum to the budget
    assert sum(p.target_tokens for p in plan.values()) == 1000
