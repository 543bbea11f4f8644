"""Batch multi-query BM25 probe: flat-in-query-count evidence at the
2M-doc index, now including the 10^6-query point that the forced
queries-frame broadcast (removed round 4) would have jeopardized —
AQE decides the join strategy per batch size instead.

Run quiet:  python scripts/batch_bm25_probe.py [n_docs]
Records the evidence behind SCALE.md's batch-BM25 table.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from nucliadb_spark.operators import bm25
from nucliadb_spark.session import get_session

VOCAB = (
    "the a spark query row data table scan merge part window small hash join "
    "order batch stream dup filter customer line value agg sort column key big "
    "slow fast group supplier shuffle partition spill cache index vector graph "
    "facet token"
).split()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import os

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_session("batch-bm25-probe")
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
    corpus = bm25.corpus_stats(stats).persist(); corpus.count()
    print(f"index build ({n_docs} docs, {n_post} postings): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    def queries_frame(n_queries: int):
        # 3 pseudo-random terms per query, skewed toward mid-frequency
        return spark.range(n_queries).select(
            F.col("id").alias("query_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(2)),
                    lambda i: F.element_at(
                        vocab,
                        (F.pmod(F.xxhash64(F.col("id"), i, F.lit(7)),
                                F.lit(len(VOCAB))) + 1).cast("int"),
                    ),
                )
            ).alias("term"),
        ).distinct()

    for n_q in (1_000, 100_000, 1_000_000):
        q = queries_frame(n_q).persist()
        q.count()
        top = bm25.batch_bm25(q, post, stats, corpus, k=5, max_df_frac=0.1)
        s = time.perf_counter()
        # aggregate computed columns so Catalyst can't prune the work
        top.agg(F.count("*"), F.max("score")).collect()
        print(f"batch_bm25 {n_q} queries: {time.perf_counter()-s:.1f}s",
              flush=True)
        q.unpersist()


if __name__ == "__main__":
    main()
