"""JVM-literal tiny DataFrames (optimization r14, guide §4).

``spark.createDataFrame(small_python_list)`` parallelizes the rows
into ``defaultParallelism`` pickled slices and evaluates them through
a PythonRDD — so a 1-row query-vector frame becomes a 32-task stage
where EVERY task (31 of them empty) acquires a Python worker. On a
cold worker pool each fork pays the pandas/pyarrow import: the r14
baseline profile measured the 1-row qvec frame of ``find_rephrased``
as a 32-task stage with 88.7 s of summed executor run time and 0.5 s
of CPU — pure Python-worker wait (plans/r14/find_rephrased_before.txt,
stage 924 in the r14 baseline event log).

:func:`literal_frame` builds the same table as pure JVM literals:
``range(1) → inline(array(struct(...)))``, which Catalyst constant-
folds to a LocalRelation — no parallelize, no Python workers, no
tasks for the literal itself. Values are cast to the declared schema,
so the frame is value- and schema-identical to the createDataFrame it
replaces (oracle twins unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

# Above this many rows the single inline(array(struct...)) expression
# tree stops being "tiny": codegen splits/falls back to interpreted
# evaluation past the 64KB method limit and the py4j command itself
# balloons (r14 advice). createDataFrame's parallelize path is the
# right tool for bulk rows — the Python-boundary fixed cost it pays
# is amortized, and its slices stream instead of living in one
# expression. 512 is far above every query-path caller (query
# vectors, entity lists, plan rows: 1-60 rows) and far below where
# expression-tree pathology starts for the widest rows we build
# (64-double vectors ≈ 70 literals/row).
MAX_LITERAL_ROWS = 512


def _schema_of(spark: SparkSession, schema: str | StructType) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(schema)


def literal_frame(
    spark: SparkSession, rows: list[tuple], schema: str | StructType
) -> DataFrame:
    """A tiny DataFrame of driver-side literal rows, built JVM-only.

    Drop-in replacement for ``spark.createDataFrame(rows, schema)``
    for literal tables (query vectors, term lists, plan rows): same
    values, same schema, same row order — but a LocalRelation-shaped
    plan with one partition and zero Python workers.
    """
    st = _schema_of(spark, schema)
    if len(rows) > MAX_LITERAL_ROWS:
        # small-rows contract: callers feeding collected row SETS of
        # unbounded size (facet labels, compaction plan rows) fall
        # back to the parallelize path rather than building a giant
        # Catalyst literal tree
        return spark.createDataFrame(rows, st)
    base = spark.range(0, 1, 1, 1)  # ONE partition — range(1) defaults
    # to defaultParallelism splits, which is 31 empty tasks per stage
    if not rows:
        null_row = F.struct(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
        )
        return base.select(F.inline(F.array(null_row))).where(F.lit(False)).to(st)
    structs = []
    for row in rows:
        cols = []
        for value, fld in zip(row, st.fields):
            c = F.lit(value).cast(fld.dataType)
            if fld.nullable:
                # a bare non-null literal analyzes as non-nullable; an
                # otherwise-less `when` over the range's (non-foldable)
                # id attribute re-declares it nullable, so the schema
                # matches createDataFrame exactly. The predicate is
                # always true and evaluated on one row — free.
                c = F.when(F.col("id") >= 0, c)
            cols.append(c.alias(fld.name))
        structs.append(F.struct(*cols))
    return base.select(F.inline(F.array(*structs))).to(st)
