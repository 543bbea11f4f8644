"""r14 optimization: isolate the multimodal_real_decode repartition.

The 715a387 change repartitioned the (doc_id, text) input to
defaultParallelism so the synthesize+decode Python chain uses all
cores; the after-profile read 2.6 -> 13.4 s wall with summed task
run 2.6 -> 55 s (cpu only 2.3 s: the rest is in-task wait, i.e.
Python worker provisioning, not decode work). A/B the partition
count in ONE process per arm (bench-identical session, warm run +
3 timed runs).

Usage: python scripts/r14_multimodal_probe.py <nparts: 0=no repartition>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from nucliadb_spark.operators import multimodal  # noqa: E402
from nucliadb_spark.session import get_session  # noqa: E402


def main() -> None:
    nparts = int(sys.argv[1])
    print("nparts", nparts, "loadavg", os.getloadavg(), flush=True)
    spark = get_session("mm_probe")
    spark.range(1).count()

    from nucliadb_spark.plans.queries_dataops import _docs

    def q():
        docs = _docs(spark, SF_DIR)
        if nparts:
            docs = docs.repartition(nparts)
        media = multimodal.synthesize_real_media(docs)
        return multimodal.real_decode(media).orderBy("media_id")

    q().collect()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = q().collect()
        times.append(round(time.perf_counter() - t0, 3))
    print("RESULT", nparts, times, "rows", len(rows), "loadavg", os.getloadavg())
    spark.stop()


if __name__ == "__main__":
    main()
