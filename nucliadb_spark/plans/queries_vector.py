"""Registry entries: vector search (SURVEY §2.4 V2/V4/V5/V6/V7).

Query vectors are rows of the embeddings table itself (vec_id 0 / 1)
so every query is deterministic and self-contained per sf_dir. Dim=64
(driver testdata).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nucliadb_spark.operators import ann, knn, vectorsets
from nucliadb_spark.registry import register
from nucliadb_spark.sources import tpch

DIM = 64

_QUERY_SQL = "SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0"


def _query_df(spark, sf_dir, vec_id=0):
    e = tpch.table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") == vec_id).select(F.col("embedding").alias("qvec"))


def _vectors(spark, sf_dir):
    return tpch.vectors(spark, sf_dir)


# --- V2 cosine top-k ------------------------------------------------------


@register(
    "knn_cosine",
    knn.exact_knn_sql(tpch.SQL_VECTORS, _QUERY_SQL, DIM, k=10, similarity="cosine"),
)
def knn_cosine(spark, sf_dir):
    return knn.exact_knn(
        _vectors(spark, sf_dir), _query_df(spark, sf_dir), k=10, similarity="cosine"
    )


# --- V2 dot top-k ---------------------------------------------------------


@register(
    "knn_dot",
    knn.exact_knn_sql(tpch.SQL_VECTORS, _QUERY_SQL, DIM, k=10, similarity="dot"),
)
def knn_dot(spark, sf_dir):
    return knn.exact_knn(
        _vectors(spark, sf_dir), _query_df(spark, sf_dir), k=10, similarity="dot"
    )


# --- V7 min_score cut ------------------------------------------------------


@register(
    "knn_min_score",
    knn.exact_knn_sql(
        tpch.SQL_VECTORS, _QUERY_SQL, DIM, k=50, similarity="cosine", min_score=0.25
    ),
)
def knn_min_score(spark, sf_dir):
    return knn.exact_knn(
        _vectors(spark, sf_dir),
        _query_df(spark, sf_dir),
        k=50,
        similarity="cosine",
        min_score=0.25,
    )


# --- V5/F9 filtered KNN: prefilter semijoin before scoring -----------------


@register(
    "knn_prefiltered",
    knn.exact_knn_sql(
        tpch.SQL_VECTORS,
        _QUERY_SQL,
        DIM,
        k=10,
        similarity="cosine",
        where=(
            "rid IN (SELECT CAST(doc_id AS BIGINT) FROM documents "
            "WHERE lang = 'en' AND source IN ('src3', 'src7'))"
        ),
    ),
)
def knn_prefiltered(spark, sf_dir):
    docs = tpch.table(spark, sf_dir, "documents")
    allowed = docs.filter(
        (F.col("lang") == "en") & F.col("source").isin("src3", "src7")
    ).select(F.col("doc_id").cast("long").alias("rid"))
    filtered = _vectors(spark, sf_dir).join(F.broadcast(allowed), "rid", "semi")
    return knn.exact_knn(filtered, _query_df(spark, sf_dir), k=10, similarity="cosine")


# --- V3: 1-bit quantized first pass + exact rerank -------------------------


@register(
    "knn_quantized_rerank",
    knn.quantized_rerank_knn_sql(
        tpch.SQL_VECTORS, _QUERY_SQL, DIM, k=10, rerank_top=50
    ),
)
def knn_quantized_rerank(spark, sf_dir):
    return knn.quantized_rerank_knn(
        _vectors(spark, sf_dir), _query_df(spark, sf_dir), k=10, rerank_top=50
    )


# --- SQ8 scalar-quantized first pass + exact rerank -------------------------


# rerank budget follows the reference's RaBitQ rule: 100×k capped at
# 2000 (nidx_vector/src/vector_types/rabitq.rs:30-36) — the int-dot
# first pass is a dot-order proxy for cosine, so a thin budget loses
# small-norm true positives.
_SQ8_RERANK = min(100 * 10, 2000)


@register(
    "knn_sq8_rerank",
    knn.sq8_rerank_knn_sql(
        tpch.SQL_VECTORS, _QUERY_SQL, DIM, k=10, rerank_top=_SQ8_RERANK
    ),
)
def knn_sq8_rerank(spark, sf_dir):
    return knn.sq8_rerank_knn(
        _vectors(spark, sf_dir), _query_df(spark, sf_dir), k=10, rerank_top=_SQ8_RERANK
    )


# --- matryoshka two-stage KNN (nested-representation prefix dims) ----------


@register(
    "knn_matryoshka",
    knn.matryoshka_knn_sql(
        tpch.SQL_VECTORS, _QUERY_SQL, DIM, k=10, first_dims=16, rerank_top=50
    ),
)
def knn_matryoshka(spark, sf_dir):
    return knn.matryoshka_knn(
        _vectors(spark, sf_dir),
        _query_df(spark, sf_dir),
        k=10,
        first_dims=16,
        rerank_top=50,
    )


# --- V6 multivector MaxSim --------------------------------------------------


# --- V8: second vectorset, routed by name ----------------------------------
# The KB serves two vectorsets (64-dim multilingual, 32-dim english);
# the searcher routes by vectorset name and checks the dimension
# (ref: nidx/src/searcher/shard_search.rs:94-105, searcher.rs:254-262).

_ALT_QUERY_SQL = (
    "SELECT list_slice(embedding, 1, 32) AS qvec FROM embeddings WHERE vec_id = 2"
)


@register(
    "knn_vectorset_alt",
    knn.exact_knn_sql(
        tpch.SQL_VECTORS_ALT, _ALT_QUERY_SQL, 32, k=10, similarity="cosine"
    ),
)
def knn_vectorset_alt(spark, sf_dir):
    vs = knn.pick_vectorset(
        spark, sf_dir, tpch.VECTORSETS, "en-small-2023", expect_dim=32
    )
    e = tpch.table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 2).select(
        F.slice(F.col("embedding"), 1, 32).alias("qvec")
    )
    return knn.exact_knn(vs, q, k=10, similarity="cosine")


# --- V1 replacement: IVF probe (label cells, mean centroids) --------------


_BATCH_Q_SQL = (
    "SELECT CAST(vec_id AS BIGINT) AS query_id, embedding AS qvec "
    "FROM embeddings WHERE vec_id IN (0, 1, 5, 9)"
)


def _batch_queries(spark, sf_dir):
    e = tpch.table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id").isin([0, 1, 5, 9])).select(
        F.col("vec_id").cast("long").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )


@register(
    "batch_knn",
    knn.batch_knn_sql(
        tpch.SQL_VECTORS, _BATCH_Q_SQL, DIM, k=5, exclude_self=True
    ),
)
def batch_knn(spark, sf_dir):
    """kNN-graph baseline: every query's exact top-5 neighbours in
    ONE pass (self-matches excluded) — the vector sibling of
    batch_bm25. Bounded-Q exact scoring; the corpus-sized-Q plan is
    batch_knn_ivf below."""
    return knn.batch_knn(
        _vectors(spark, sf_dir),
        _batch_queries(spark, sf_dir),
        k=5,
        exclude_self=True,
    )


@register(
    "batch_knn_ivf",
    ann.batch_knn_ivf_sql(_BATCH_Q_SQL, DIM, k=5, nprobe=2, exclude_self=True),
)
def batch_knn_ivf(spark, sf_dir):
    """kNN-graph construction at scale: per-query IVF probe turns the
    query×corpus cartesian into ONE cell-keyed equi-join (both sides
    cell-partitioned in the persisted layout), per-query top-5 over
    only the probed candidates. Even the pruning is oracle-checked —
    the SQL twin replays the identical probe ranking."""
    from nucliadb_spark.cache import cached_df

    e = tpch.table(spark, sf_dir, "embeddings")
    cents = cached_df(
        sf_dir, "labeled_centroids", lambda: ann.labeled_centroids(e)
    )
    return ann.batch_knn_ivf(
        e,
        _batch_queries(spark, sf_dir),
        k=5,
        nprobe=2,
        exclude_self=True,
        centroids=cents,
    )


@register("ann_ivf_probe", ann.ivf_search_labeled_sql(k=10, nprobe=2, dim=DIM))
def ann_ivf_probe(spark, sf_dir):
    e = tpch.table(spark, sf_dir, "embeddings")
    return ann.ivf_search_labeled(e, _query_df(spark, sf_dir), k=10, nprobe=2, dim=DIM)


@register(
    "ann_ivf_sq8",
    ann.ivf_sq8_search_labeled_sql(k=10, nprobe=2, rerank_top=_SQ8_RERANK, dim=DIM),
)
def ann_ivf_sq8(spark, sf_dir):
    """The composed 100 TB serving path: IVF probe prunes to nprobe
    cells, SQ8 integer-dot first pass ranks inside them (u8 codes =
    1/4 of the float bytes), exact cosine reranks the reference's
    100×k budget."""
    e = tpch.table(spark, sf_dir, "embeddings")
    return ann.ivf_sq8_search_labeled(
        e, _query_df(spark, sf_dir), k=10, nprobe=2, rerank_top=_SQ8_RERANK, dim=DIM
    )


@register(
    "knn_maxsim",
    knn.maxsim_knn_sql(
        tpch.SQL_VECTORS,
        "SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1)",
        DIM,
        k=10,
        similarity="dot",
    ),
)
def knn_maxsim(spark, sf_dir):
    e = tpch.table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return knn.maxsim_knn(_vectors(spark, sf_dir), queries, k=10, similarity="dot")


_MAXSIM_Q_SQL = (
    "SELECT vec_id AS qid, embedding AS qvec FROM embeddings "
    "WHERE vec_id IN (0, 1)"
)


@register(
    "knn_maxsim_ivf",
    ann.maxsim_ivf_sql(_MAXSIM_Q_SQL, DIM, k=10, nprobe=2, similarity="dot"),
)
def knn_maxsim_ivf(spark, sf_dir):
    """Multivector MaxSim over the IVF probe path — the plan the
    reference's multi-vector search actually runs (per-query-vector
    ANN, then MaxSim over the retrieved vectors — nidx/nidx_vector/
    src/searcher.rs:345-394) and the only shape that survives a
    100 TB corpus: each query vector probes nprobe cells of the
    persisted IVF layout (cell-keyed equi-join, no query×corpus
    cartesian — pinned by tests/test_plan_shapes.py), MaxSim
    aggregates map-side. Even the probe pruning is oracle-checked;
    the clustered-corpus test compares the approximation against the
    exact knn_maxsim."""
    from nucliadb_spark.cache import cached_df

    e = tpch.table(spark, sf_dir, "embeddings")
    cents = cached_df(
        sf_dir, "labeled_centroids", lambda: ann.labeled_centroids(e)
    )
    queries = e.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann.maxsim_ivf(
        e, queries, k=10, nprobe=2, similarity="dot", centroids=cents
    )


# --- vectorset config normalize_vectors=true --------------------------------
# ref: nidx/tests/integration/vector_normalization.rs +
# nidx_vector/src/config.rs:107 — vectors are L2-normalized at index
# time and scored with plain DOT at query time (cosine semantics
# without per-query norm work; colinear vectors score 1.0).

from nucliadb_spark.functions import vector as _V  # noqa: E402

_NORM_VEC_SQL = (
    "SELECT CAST(vec_id AS BIGINT) AS rid, "
    f"list_transform(embedding, x -> x::DOUBLE / {_V.norm_sql_unrolled('embedding', DIM)}) AS vector "
    "FROM embeddings"
)
_NORM_QUERY_SQL = (
    "SELECT "
    f"list_transform(embedding, x -> x::DOUBLE / {_V.norm_sql_unrolled('embedding', DIM)}) AS qvec "
    "FROM embeddings WHERE vec_id = 0"
)


@register(
    "knn_normalized",
    knn.exact_knn_sql(_NORM_VEC_SQL, _NORM_QUERY_SQL, DIM, k=10, similarity="dot"),
)
def knn_normalized(spark, sf_dir):
    vecs = _vectors(spark, sf_dir).withColumn(
        "vector", _V.l2_normalize(F.col("vector"))
    )
    q = _query_df(spark, sf_dir).withColumn(
        "qvec", _V.l2_normalize(F.col("qvec"))
    )
    return knn.exact_knn(vecs, q, k=10, similarity="dot")


# --- distributed k-means step + PQ/ADC serving ------------------------------


@register("ann_kmeans_step", ann.kmeans_step_labeled_sql(k=4, dim=DIM))
def ann_kmeans_step(spark, sf_dir):
    """One Lloyd iteration of the IVF centroid training loop, opened
    up as DataFrame ops (assignment = broadcast join, update = one
    groupBy of k*dim partial sums) so index BUILD is oracle-checked,
    not just serving. Seeds are the first 4 vectors by id."""
    e = tpch.table(spark, sf_dir, "embeddings")
    return ann.kmeans_step_labeled(e, k=4, dim=DIM)


@register(
    "knn_pq_adc",
    ann.pq_adc_labeled_sql(k=10, m=8, k_codes=16, rerank_top=50, dim=DIM),
)
def knn_pq_adc(spark, sf_dir):
    """Product-quantized serving: 64 floats → 8 byte codes (32×
    compression vs SQ8's 4×), ADC lookup-table first pass, exact
    cosine rerank of the top 50 (the reference's RaBitQ
    quantize-then-rerank shape at a deeper compression point)."""
    e = tpch.table(spark, sf_dir, "embeddings")
    return ann.pq_adc_labeled(
        e, _query_df(spark, sf_dir), k=10, m=8, k_codes=16, rerank_top=50, dim=DIM
    )


@register(
    "knn_rabitq_1bit",
    ann.rabitq_1bit_labeled_sql(k=10, rerank_top=50, dim=DIM),
)
def knn_rabitq_1bit(spark, sf_dir):
    """The reference's RaBitQ shape at its compression point: 1-bit
    sign codes (64 floats → two BIGINT words), Hamming-similarity
    first pass via bit_count(xor) — pure integer ops, bit-identical
    across engines — exact cosine rerank of the survivors."""
    e = tpch.table(spark, sf_dir, "embeddings")
    return ann.rabitq_1bit_labeled(e, _query_df(spark, sf_dir), k=10, rerank_top=50, dim=DIM)


@register(
    "ann_ivf_pq",
    ann.pq_adc_labeled_sql(k=10, m=8, k_codes=16, rerank_top=50, dim=DIM, nprobe=2),
)
def ann_ivf_pq(spark, sf_dir):
    """IVFPQ — the canonical 100 TB ANN layout: the probe prunes the
    scan to nprobe cells (partition pruning at scale), PQ byte codes
    rank inside them (32x less memory traffic), exact cosine reranks
    the survivors. The codebook stays a full-corpus index-build
    artifact."""
    e = tpch.table(spark, sf_dir, "embeddings")
    return ann.pq_adc_labeled(
        e, _query_df(spark, sf_dir), k=10, m=8, k_codes=16, rerank_top=50,
        dim=DIM, nprobe=2,
    )


@register(
    "ivf_cell_maintenance",
    ann.ivf_cell_maintenance_sql(
        tpch.SQL_VECTORS, split_above=52, merge_below=48, cell_col="cluster_label"
    ),
)
def ivf_cell_maintenance(spark, sf_dir):
    """Vector-index maintenance worklist: cells grown past the probe
    budget split, under-filled cells merge — the IVF analog of the
    text index's log-merge scheduling. Plan only; applying it is a
    partitioned rewrite of the named cells."""
    return ann.ivf_cell_maintenance(
        tpch.vectors(spark, sf_dir), split_above=52, merge_below=48
    )


_GEO_Q = 33  # a non-seed query vector


@register(
    "ann_ivf_geometric",
    ann.ivf_geometric_search_sql(query_vec_id=_GEO_Q, k=10, n_cells=8, nprobe=2, dim=DIM),
)
def ann_ivf_geometric(spark, sf_dir):
    """IVF over REAL Voronoi cells (nearest-of-8-seeds assignment)
    instead of the fixture's non-geometric labels — the probe
    provably concentrates true neighbors and its recall is graded by
    ann_ivf_recall."""
    e = tpch.table(spark, sf_dir, "embeddings")
    return ann.ivf_geometric_search(
        e, _query_df(spark, sf_dir, vec_id=_GEO_Q), k=10, n_cells=8, nprobe=2, dim=DIM
    )


@register(
    "ann_ivf_recall",
    ann.ivf_recall_report_sql(query_vec_id=_GEO_Q, k=10, n_cells=8, dim=DIM),
)
def ann_ivf_recall(spark, sf_dir):
    """The recall/cost dial as a graded artifact: recall@10 of the
    geometric probe at every probe depth 1..8 — rises slowly on the
    structureless fixture (IVF pays only when data clusters; the hard
    >=0.95 gate runs over built clusters in tests/test_ann_recall.py)."""
    e = tpch.table(spark, sf_dir, "embeddings")
    return ann.ivf_recall_report(
        e, _query_df(spark, sf_dir, vec_id=_GEO_Q), k=10, n_cells=8, dim=DIM
    )


@register(
    "eval_prefix_ndcg",
    knn.rank_quality_report_sql(
        tpch.SQL_VECTORS,
        "SELECT CAST(vec_id AS INT) AS query_id, embedding AS qvec "
        "FROM embeddings WHERE vec_id < 5",
        DIM,
        k=10,
        first_dims=16,
    ),
)
def eval_prefix_ndcg(spark, sf_dir):
    """Ranking-quality dial: nDCG@10 of the matryoshka prefix
    ranking (first 16 of 64 dims — 1/4 of the vector bytes) against
    the exact full-dim top-10, for 5 query vectors in one scan. The
    order-sensitivity companion to ann_ivf_recall's set-recall."""
    from pyspark.sql import functions as F

    e = tpch.table(spark, sf_dir, "embeddings")
    vectors = e.select(F.col("vec_id").cast("long").alias("rid"),
                       F.col("embedding").alias("vector"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    return knn.rank_quality_report(vectors, queries, k=10, first_dims=16)


_ADAPT_ALLOWED_SQL = (
    "SELECT COUNT(*) FROM documents "
    "WHERE lang = 'en' AND source IN ('src3', 'src7')"
)


@register(
    "ann_ivf_adaptive",
    knn.exact_knn_sql(
        tpch.SQL_VECTORS,
        _QUERY_SQL,
        DIM,
        k=10,
        similarity="cosine",
        where=(
            ann.ivf_cells_adaptive_where_sql(
                tpch.SQL_VECTORS,
                _QUERY_SQL,
                DIM,
                allowed_count_sql=_ADAPT_ALLOWED_SQL,
                total_count_sql="SELECT COUNT(*) FROM documents",
                base_nprobe=2,
                cap=8,
            )
            + " AND rid IN (SELECT CAST(doc_id AS BIGINT) FROM documents "
            "WHERE lang = 'en' AND source IN ('src3', 'src7'))"
        ),
    ),
)
def ann_ivf_adaptive(spark, sf_dir):
    """Filtered ANN with selectivity-scaled probe depth: the ~5%
    prefilter widens nprobe from 2 to the cap (8) so in-filter
    candidates don't starve — the fixed-nprobe failure mode every
    filtered-vector-search deployment hits (serving engines raise the
    exploration budget the same way)."""
    from nucliadb_spark.cache import cached_df
    from nucliadb_spark.operators.ann import cell_centroids

    docs = tpch.table(spark, sf_dir, "documents")
    vectors = _vectors(spark, sf_dir)
    allowed = docs.filter(
        (F.col("lang") == "en") & F.col("source").isin("src3", "src7")
    ).select(F.col("doc_id").cast("long").alias("rid"))
    centroids = cached_df(
        sf_dir, "ivf_centroids", lambda: cell_centroids(vectors)
    )
    return ann.ivf_search_adaptive(
        vectors.withColumnRenamed("cluster_label", "cell"),
        centroids,
        _query_df(spark, sf_dir),
        allowed,
        docs,
        k=10,
        base_nprobe=2,
        cap=8,
    )


@register("vectorset_backfill", vectorsets.backfill_report_sql())
def vectorset_backfill(spark, sf_dir):
    """add_vectorset + backfill (writer/api/v1/vectorsets.py:41-96):
    a vectorset added mid-life covers only part of the corpus; the
    backfill pass anti-joins the corpus against the partial set and
    embeds ONLY the missing rids (embed cost ∝ missing rows, the
    rid-keyed anti-join partition-aligns with every per-rid table).
    Output is the completed set with per-row provenance."""
    flds = tpch.fields(spark, sf_dir).select("rid", "text")
    full = vectorsets.backfill_vectorset(flds, vectorsets.partial_vectorset(flds))
    # driver output contract: no array columns — project a scalar
    # digest of each vector (first component + component sum)
    return full.select(
        "rid",
        "backfilled",
        F.round(F.element_at("vector", 1), 5).alias("v0"),
        F.round(
            F.aggregate("vector", F.lit(0.0), lambda a, x: a + x), 5
        ).alias("vsum"),
    )
