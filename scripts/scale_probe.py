"""Large-corpus probe: generate a deterministic word-soup corpus well
beyond the driver's sf0.1 (default 500k docs ≈ 1000× sf0.001, 60M
tokens, plus 500k dim-64 vectors), build the serving indexes once,
and time the hot query paths. Records the evidence behind SCALE.md's
"Measured scaling" table — run:  python scripts/scale_probe.py [n_docs]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from nucliadb_spark.operators import ann as ann_ops
from nucliadb_spark.operators import bm25, knn
from nucliadb_spark.session import get_session

VOCAB = (
    "the a spark query row data table scan merge part window small hash join "
    "order batch stream dup filter customer line value agg sort column key big "
    "slow fast group supplier shuffle partition spill cache index vector graph "
    "facet token"
).split()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    import os

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_session("scale-probe")
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    docs = spark.range(n_docs).select(
        F.col("id").alias("rid"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.pmod(F.xxhash64("id"), F.lit(100)) + 60).cast("int")),
                lambda i: F.element_at(
                    vocab, (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(VOCAB))) + 1).cast("int")
                ),
            ),
            " ",
        ).alias("text"),
    )
    t0 = time.perf_counter()
    post = bm25.postings(docs).persist()
    n_post = post.count()
    stats = bm25.doc_stats_from_postings(post).persist(); stats.count()
    vocab_df = bm25.vocabulary(post).persist(); vocab_df.count()
    corpus = bm25.corpus_stats(stats).persist(); corpus.count()
    print(f"index build ({n_docs} docs, {n_post} postings): {time.perf_counter()-t0:.1f}s")

    def t(label, fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            s = time.perf_counter(); fn(); ts.append(round(time.perf_counter() - s, 2))
        print(label, ts, flush=True)

    t("bm25 served (3 terms)", lambda: bm25.bm25_search(
        None, "spark join window", top_k=20, mode="any",
        post=post, stats=stats, corpus=corpus, vocab=vocab_df).collect())
    t("bm25 fuzzy served", lambda: bm25.bm25_search(
        None, "spak windoq", top_k=20, fuzzy=True,
        post=post, stats=stats, corpus=corpus, vocab=vocab_df).collect())

    vecs = spark.range(n_docs).select(
        F.col("id").alias("rid"),
        F.col("id").alias("paragraph_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)).cast("double") - 1000.0) / 1000.0,
        ).alias("vector"),
    ).persist()
    vecs.count()
    qvec = vecs.filter(F.col("rid") == 7).select(F.col("vector").alias("qvec"))
    t(f"exact knn ({n_docs} x dim64)", lambda: knn.exact_knn(vecs, qvec, k=10).collect())

    t0 = time.perf_counter()
    assigned, centroids = ann_ops.build_ivf(vecs, k_cells=64)
    assigned = assigned.withColumnRenamed("cell", "cluster_label").persist()
    assigned.count()
    centroids = centroids.persist(); centroids.count()
    print(f"ivf build (64 cells): {time.perf_counter()-t0:.1f}s")

    def probe():
        p = ann_ops.probe_cells(centroids, qvec, nprobe=4)
        v = assigned.join(
            F.broadcast(p), assigned["cluster_label"] == p["cell"], "inner"
        ).drop("cell")
        knn.exact_knn(v, qvec, k=10).collect()

    t("ivf probe (4/64 cells)", probe)

    # IVF + SQ8: int-dot first pass inside the probed cells, exact
    # rerank of the 100x k budget (quantization stats broadcast)
    sq8_stats = assigned.agg(
        F.min(F.array_min("vector")).alias("_lo"),
        F.max(F.array_max("vector")).alias("_hi"),
    ).persist()
    sq8_stats.count()

    def probe_sq8():
        p = ann_ops.probe_cells(centroids, qvec, nprobe=4)
        v = assigned.join(
            F.broadcast(p), assigned["cluster_label"] == p["cell"], "inner"
        ).drop("cell")
        lo, hi = F.col("_lo"), F.col("_hi")

        def q8(col):
            return F.transform(
                col, lambda x: F.round((x - lo) / (hi - lo) * 255.0).cast("int")
            )

        cand = v.crossJoin(F.broadcast(qvec)).crossJoin(F.broadcast(sq8_stats))
        int_dot = F.aggregate(
            F.zip_with(q8(F.col("vector")), q8(F.col("qvec")),
                       lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        )
        first = (cand.withColumn("qs", int_dot)
                 .orderBy(F.col("qs").desc(), F.col("rid").asc()).limit(1000))
        from nucliadb_spark.functions import vector as V
        (first.select("rid", F.round(V.cosine(F.col("vector"), F.col("qvec")), 5)
                      .alias("score"))
         .orderBy(F.col("score").desc(), F.col("rid").asc()).limit(10).collect())

    t("ivf+sq8 probe (4/64 cells, rerank 1000)", probe_sq8)

    # corpus-hygiene ops at probe scale
    from nucliadb_spark.operators import textstats, trainset

    docs2 = docs.select(
        F.col("rid").alias("doc_id"), "text",
        F.concat(F.lit("src"), F.pmod("rid", F.lit(8)).cast("string")).alias("source"),
    ).persist()
    docs2.count()
    t0 = time.perf_counter()
    model = textstats.unigram_model(docs2).persist(); model.count()
    print(f"unigram model build: {time.perf_counter()-t0:.1f}s")
    t("unigram logprob (scored docs)", lambda: textstats.unigram_logprob(
        docs2, model=model).count())
    t("quality funnel", lambda: textstats.quality_funnel(docs2).collect())
    # filter on a window output so Catalyst can't prune the cumsum
    t("pack_sequences (per-source cumsum)", lambda: trainset.pack_sequences(
        docs2, seq_len=2048).filter("n_seqs >= 1").count())

    # round-3b ops at probe scale
    from nucliadb_spark.operators import dedup

    t("token_budget_select (per-source cumsum)", lambda: trainset.
      token_budget_select(docs2, budget=1_000_000).count())
    t("split_assign + audit counts", lambda: trainset.split_assign(docs2)
      .groupBy("split").count().collect())  # md5 bucket forced by the groupBy
    t("dup_span_stats (8-gram self-dup)", lambda: dedup.dup_span_stats(
        docs2.selectExpr("doc_id AS id", "text")).count())

    # PQ-ADC over the full vector corpus (no probe — measures the
    # byte-code first pass itself at n_docs scale)
    qv = vecs.filter(F.col("rid") == 7).select(F.col("vector").alias("qvec"))
    emb = vecs.select(F.col("rid").alias("vec_id"), F.col("vector").alias("embedding"))
    t("pq_adc (m=8, 16 codes, rerank 50)", lambda: ann_ops.pq_adc_labeled(
        emb, qv, k=10).collect())

    # round-3c ops at probe scale. NOTE: aggregate over the COMPUTED
    # columns — a bare count() lets Catalyst eliminate the left join
    # against the per-doc aggregate (unique keys) and skip the whole
    # gram pipeline, timing a pruned plan.
    t("remove_dup_spans (rewrite + md5)", lambda: dedup.remove_dup_spans(
        docs2.selectExpr("doc_id AS id", "text"))
        .agg(F.sum("n_removed"), F.max("cleaned_md5")).collect(), n=1)
    t("bpe_pair_counts (vocab pair agg)", lambda: trainset.bpe_pair_counts(
        docs2).collect())
    t("dsir_weights (hashed-unigram ratios)", lambda: trainset.dsir_weights(
        docs2, target_value="src1").count())


if __name__ == "__main__":
    main()
