"""Salted join: value-parity with the plain join on a hub-skewed
graph, and the hot key's shuffle-key fanout actually widens."""

from pyspark.sql import functions as F

from nucliadb_spark.operators.skew import salted_join

N_SALT = 8


def _edges(spark):
    # hub node 0 with 2000 out-edges; 50 normal nodes with 3 each
    hub = spark.range(2000).select(
        F.lit(0).alias("src"), (F.col("id") + 100).alias("dst")
    )
    normal = (
        spark.range(1, 51)
        .select(F.col("id").alias("src"))
        .crossJoin(spark.range(3).select((F.col("id") + 5000).alias("dst")))
    )
    return hub.unionByName(normal)


def test_salted_join_equals_plain_join(spark):
    edges = _edges(spark)
    dim = spark.range(60).select(
        F.col("id").alias("src"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    plain = edges.join(dim, ["src"]).select("src", "dst", "name")
    salted = salted_join(edges, dim, ["src"], n_salt=N_SALT).select(
        "src", "dst", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_hot_key_spreads_over_salt_space(spark):
    edges = _edges(spark)
    salted = edges.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in edges.columns]), F.lit(N_SALT)),
    )
    hub_salts = (
        salted.filter(F.col("src") == 0).select("_salt").distinct().count()
    )
    # 2000 hub rows hash over all 8 sub-keys -> the hot key now lands
    # on 8 shuffle partitions instead of 1
    assert hub_salts == N_SALT
