"""Expectation-suite plan shape + compaction behavior."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from metevents_spark.io import load_table
from metevents_spark.quality import compact_parquet, data_expectations, expect

SF = "/root/testdata/sf0.001"


def test_expect_single_scan_no_join(spark):
    df = data_expectations(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan  # one aggregate, no per-rule scans
    pdf = df.toPandas()
    assert len(pdf) == 6
    assert (pdf["n_rows"] == load_table(spark, SF, "events").count()).all()
    # the user_id rule fires (user_id = 0 exists); null rules do not
    byrule = pdf.set_index("rule")
    assert byrule.loc["user_id_positive", "n_violations"] > 0
    assert byrule.loc["value_nonnull", "n_violations"] == 0


def test_expect_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, -1.0)], "id long, x double"
    )
    got = expect(df, {"x_pos": F.col("x") > 0}).toPandas()
    # NULL > 0 is NULL -> violation, plus the -1 row
    assert got.loc[0, "n_violations"] == 2


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    ev = load_table(spark, SF, "events")
    ev.repartition(64).write.parquet(src)  # simulate small-file-itis
    n_src = sum(
        f.endswith(".parquet") for _, _, fs in os.walk(src) for f in fs
    )
    assert n_src >= 64
    n_out = compact_parquet(spark, src, dst, target_file_mb=128)
    n_dst = sum(
        f.endswith(".parquet") for _, _, fs in os.walk(dst) for f in fs
    )
    assert n_dst == n_out == 1  # tiny table -> one right-sized file
    assert spark.read.parquet(dst).count() == ev.count()


def test_jsonl_reader_quarantines_corrupt_lines(spark, tmp_path):
    from metevents_spark.io import load_jsonl_documents

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "source": "web", "lang": "en", "text": "hello world"}\n'
        '{"doc_id": 2, "source": "web", "lang": "de", "text": "hallo"}\n'
        "{this is not json at all\n"
        '{"doc_id": 3, "source": "books", "lang": "en", "text": "ok"}\n'
    )
    good, bad = load_jsonl_documents(spark, str(p))
    assert good.count() == 3
    assert good.columns == ["doc_id", "source", "lang", "text"]
    assert set(r.doc_id for r in good.collect()) == {1, 2, 3}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not json" in bad_rows[0].raw_line
