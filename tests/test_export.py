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


# --- S8 proper: full-fidelity KB export/import roundtrip -------------------


def test_kb_export_import_identity(spark, sf_dir, tmp_path):
    from nucliadb_spark.operators import exporter

    path = str(tmp_path / "kb_export")
    exporter.export_kb(spark, sf_dir, path)
    imported = exporter.import_kb(spark, path)
    source = exporter.kb_tables(spark, sf_dir)
    assert sorted(imported) == sorted(source)
    for name, src in source.items():
        imp = imported[name]
        # parquet normalizes nullability flags; names+types must match
        assert [(f.name, f.dataType) for f in imp.schema.fields] == [
            (f.name, f.dataType) for f in src.schema.fields
        ], name
        a = sorted(map(tuple, src.collect()))
        b = sorted(map(tuple, imp.collect()))
        assert a == b, f"{name}: roundtrip altered content"
