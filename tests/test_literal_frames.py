"""literal_frame (optimization r14): value/schema-identical to
createDataFrame for literal tables, with a JVM-only 1-partition plan
(no parallelize slices, no Python workers)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from nucliadb_spark.functions.frames import literal_frame


def test_values_and_schema_match_createdataframe(spark):
    rows = [("a", 1, [0.5, 0.25]), ("b", None, None)]
    schema = "s string, n long, v array<double>"
    got = literal_frame(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert got.collect() == want.collect()


def test_empty_frame(spark):
    df = literal_frame(spark, [], "id long, score double")
    assert df.collect() == []
    assert df.schema.simpleString() == "struct<id:bigint,score:double>"


def test_row_objects_and_structtype(spark):
    src = spark.range(3).select(
        F.col("id"), (F.col("id") * 2.0).alias("d")
    )
    rows = src.collect()
    round_tripped = literal_frame(spark, rows, src.schema)
    assert round_tripped.collect() == rows


def test_single_partition_and_no_python(spark):
    df = literal_frame(spark, [([1.0] * 8,)], "qvec array<double>")
    assert df.rdd.getNumPartitions() == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no PythonRDD / ArrowEvalPython
    assert "parallelize" not in plan


def test_preserves_row_order(spark):
    rows = [(i,) for i in (5, 3, 9, 1)]
    got = [r.x for r in literal_frame(spark, rows, "x int").collect()]
    assert got == [5, 3, 9, 1]


def test_bulk_rows_fall_back_to_createdataframe(spark):
    """Above MAX_LITERAL_ROWS the single Catalyst literal tree would
    blow past codegen limits (r14 advice); bulk row sets take the
    parallelize path with identical values and schema."""
    from nucliadb_spark.functions import frames

    rows = [(i, f"t{i}") for i in range(frames.MAX_LITERAL_ROWS + 1)]
    schema = "n long, s string"
    got = frames.literal_frame(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert got.collect() == want.collect()
    # and small inputs keep the JVM-literal single-partition shape
    small = frames.literal_frame(spark, rows[:3], schema)
    assert small.rdd.getNumPartitions() == 1
