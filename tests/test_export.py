"""Arrow training export (S6) and table clone (S8): write →
read-back identity."""

import tempfile

from nucliadb_spark.operators import exporter
from nucliadb_spark.sources import tpch


def test_arrow_export_roundtrip(spark, sf_dir):
    fields = tpch.fields(spark, sf_dir).select("rid", "text", "language", "source")
    with tempfile.TemporaryDirectory() as tmp:
        exporter.export_arrow_stream(fields, f"{tmp}/export", batch_size=100)
        back = exporter.read_arrow_export(spark, f"{tmp}/export")
        assert back.count() == fields.count()
        assert set(back.columns) == set(fields.columns)
        assert back.exceptAll(fields).count() == 0


def test_table_clone_roundtrip(spark, sf_dir):
    res = tpch.resources(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        res.write.mode("overwrite").parquet(f"{tmp}/clone")
        back = spark.read.parquet(f"{tmp}/clone")
        assert back.count() == res.count()
        assert back.exceptAll(res).count() == 0
