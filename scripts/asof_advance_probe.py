"""Round-11 probe: incremental snapshot-index derivation vs the
from-scratch build — the attack on the one honest-linear serving
cost (the cold per-snapshot index build, 345 s at 100× in r10).

Measures, at sf0.1 and at the prebuilt replicas (.scale/sf1 = 10×,
SCALE_REPS=100 → .scale/x100):
  (a) the S1 base build (the PRIOR snapshot's artifact — amortized,
      in production it already exists),
  (b) advancing S1 → S2 with only the delta ops (the per-snapshot
      marginal cost this round makes incremental),
  (c) the from-scratch S2 build (what every snapshot used to pay).

Run quiet: nohup python scripts/asof_advance_probe.py > /tmp/adv.log
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nucliadb_spark.operators import bm25  # noqa: E402
from nucliadb_spark.session import get_session  # noqa: E402
from nucliadb_spark.sources import tpch  # noqa: E402
from nucliadb_spark.streaming import ingest  # noqa: E402

S1, S2 = 500_000, 3_000_000
REPS = int(os.environ.get("SCALE_REPS", "10"))
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIRS = [
    "/root/testdata/sf0.1",
    os.path.join(_ROOT, ".scale", "sf1" if REPS == 10 else f"x{REPS}"),
]


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_session("asof-advance-probe")
    spark.range(1).count()
    for sf in DIRS:
        log = ingest.cdc_log(tpch.fields(spark, sf))
        # (a) the prior snapshot's index (exists in production)
        t0 = time.perf_counter()
        base_post = bm25.postings(ingest.cdc_live_as_of(log, S1)).persist()
        base_post.count()
        base_stats = bm25.doc_stats_from_postings(base_post).persist()
        base_stats.count()
        t_base = round(time.perf_counter() - t0, 2)
        # (b) the incremental advance (delta-tokenize + rid anti-join)
        t0 = time.perf_counter()
        adv_post, adv_stats = ingest.advance_text_index(
            base_post,
            base_stats,
            log.filter((F.col("seq") > S1) & (F.col("seq") <= S2)),
        )
        n_adv = adv_post.count()
        adv_stats.count()
        t_adv = round(time.perf_counter() - t0, 2)
        # (c) the from-scratch S2 build (the old per-snapshot cost)
        t0 = time.perf_counter()
        scratch = bm25.postings(ingest.cdc_live_as_of(log, S2))
        n_scr = scratch.count()
        bm25.doc_stats_from_postings(scratch).count()
        t_scr = round(time.perf_counter() - t0, 2)
        base_post.unpersist()
        base_stats.unpersist()
        assert n_adv == n_scr, (n_adv, n_scr)
        print(
            f"RESULT {sf}: base(S1) {t_base}s | advance(S1->S2) {t_adv}s | "
            f"from-scratch(S2) {t_scr}s | advance/scratch "
            f"{round(t_adv / t_scr, 2)}x | postings rows {n_scr}",
            flush=True,
        )


if __name__ == "__main__":
    main()
