"""Flagship end-to-end scale probe: run the served retriever DAGs
(`find_hybrid`, `find_prefiltered_served`) at sf0.1 AND at a 10×
replica ("sf1") of the same corpus, on a quiet machine, and report
the serving-time ratio.

The claim under test: the flagship's serving cost is dominated by
prefilter pruning + per-leg top-k merges, so a 10× corpus should
grow query time SUBLINEARLY (index build is amortized/cached, the
keyword leg touches only matching postings, the semantic leg's
scored scan is top-k-cut before any shuffle).

The sf1 corpus is a deterministic 10× replication of the sf0.1
parquet with remapped primary keys (doc_id/vec_id/p_partkey/... +
rep·N), written once under .scale/sf1/ (gitignored). Replicated
vectors score identically per copy — fine for a cost probe: the
scan/score work is genuinely 10×.

Run quiet:  nohup python scripts/flagship_scale_probe.py > /tmp/flag.log

SCALE_REPS overrides the replication factor (default 10 → .scale/sf1,
kept for the r6/r7 probes); e.g. SCALE_REPS=100 builds a 100× replica
under .scale/x100 — the "would this survive 100×?" datapoint.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPS = int(os.environ.get("SCALE_REPS", "10"))
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(_ROOT, ".scale", "sf1" if REPS == 10 else f"x{REPS}")

# table -> columns to offset by rep*N so keys stay unique
KEYED = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    # tiny dims copied as-is
    "region": [],
    "nation": [],
    "customer": [],
    "supplier": [],
}


def build_sf1(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    os.makedirs(DST, exist_ok=True)
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if keys:
            n = df.count()
            # one broadcast crossJoin with a REPS-row frame beats a
            # REPS-branch union plan (flat plan size at any factor)
            reps = spark.range(REPS).select(F.col("id").alias("_rep"))
            out = df.crossJoin(F.broadcast(reps))
            for k in keys:
                out = out.withColumn(k, (F.col(k) + F.col("_rep") * n).cast("long"))
            out = out.drop("_rep")
        else:
            out = df
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}: {out.count()} rows", flush=True)
    open(os.path.join(DST, "_DONE"), "w").write("ok")


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from nucliadb_spark import registry
    from nucliadb_spark.session import get_session

    spark = get_session("flagship-scale")
    build_sf1(spark)
    qs = registry.queries()

    def timed(name: str, sf_dir: str, n: int = 3) -> list[float]:
        fn = qs[name]
        s = time.perf_counter()
        fn(spark, sf_dir).collect()  # warm: index build + cache
        cold = round(time.perf_counter() - s, 2)
        ts = []
        for _ in range(n):
            s = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - s, 2))
        print(
            f"{name} @ {sf_dir}: cold {cold}s, warm {ts} ({len(rows)} rows)",
            flush=True,
        )
        return ts

    queries = sys.argv[1:] or ["find_hybrid", "find_prefiltered_served"]
    for q in queries:
        a = timed(q, SRC)
        b = timed(q, DST)
        ratio = round(min(b) / min(a), 2)
        print(f"RESULT {q}: sf0.1 min {min(a)}s, sf1(10x) min {min(b)}s, ratio {ratio}x", flush=True)


if __name__ == "__main__":
    main()
