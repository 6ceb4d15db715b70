"""Source-format coverage: JSONL and ORC round-trips preserve the documents
table exactly; JSONL quarantines corrupt records instead of dropping them."""

from __future__ import annotations

from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.sources.readers import (
    read_jsonl,
    read_orc,
    read_parquet_table,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return read_parquet_table(spark, SF, "documents")


def test_jsonl_round_trip(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_jsonl")
    docs.write.json(path)
    back = read_jsonl(spark, path, docs.schema).drop("_corrupt_record")
    assert back.schema == docs.schema
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_jsonl_quarantines_corrupt_records(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_bad")
    docs.write.json(path)
    (tmp_path / "docs_bad" / "bad.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n{not json at all\n'
    )
    # Spark disallows queries touching ONLY _corrupt_record on raw JSON
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    # parsed result first, as its own error message prescribes.
    back = read_jsonl(spark, str(path), docs.schema).cache()
    try:
        bad = back.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert "not json" in bad.first()["_corrupt_record"]
        good = back.filter(F.col("_corrupt_record").isNull())
        assert good.count() == docs.count() + 1
    finally:
        back.unpersist()


def test_orc_round_trip(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0
