"""r15 diagnosis probe for the stream_windowed_counts regression
(VERDICT r14 item 4: 1.49 s r13 -> 7.5 s @32c / 3.6 s @8c in r14 —
elevated in BOTH driver runs, so not cleared as steal noise).

Hypotheses tested, in one session, steal-stamped:

H1 cold-session cost: the seat is trigger-bound (stream start/stop,
   state-store setup per shuffle partition) — if the cold times match
   r13's 1.5 s band, the machinery itself did not regress.
H2 end-of-bench session state: the seat runs LAST in bench.py; by
   then the session holds the whole sweep's persisted sidecars
   (128->512 cache entries in r14). If times inflate only after the
   session is loaded, the regression is memory pressure/GC from
   cache growth, not the streaming path.

Usage: python scripts/r15_stream_probe.py [n_runs=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def steal():
    with open("/proc/stat") as f:
        v = [float(x) for x in f.readline().split()[1:]]
    return v[7], sum(v)


def timed_runs(spark, q, n):
    s0 = steal()
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        q(spark, SF_DIR).collect()
        out.append(round(time.perf_counter() - t0, 3))
    s1 = steal()
    sp = round(100.0 * (s1[0] - s0[0]) / max(s1[1] - s0[1], 1e-9), 2)
    return out, sp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from nucliadb_spark import registry
    from nucliadb_spark.session import get_session

    spark = get_session("r15_stream_probe")
    spark.range(1).count()
    queries = registry.queries()
    q = queries["stream_windowed_counts"]

    q(spark, SF_DIR).collect()  # warm (bench methodology)
    cold, steal_cold = timed_runs(spark, q, n)

    # now load the session the way the bench does by its last seat:
    # prebuild the serving indexes and run a spread of heavy seats
    import bench

    from nucliadb_spark.cache import cached_df
    from nucliadb_spark.operators import ann as ann_ops
    from nucliadb_spark.operators import find as find_ops
    from nucliadb_spark.plans.queries_text import _fielded_text_index, _text_index
    from nucliadb_spark.sources import tpch

    post, stats = _text_index(spark, SF_DIR)
    post.count(), stats.count()
    tpch.relations_index(spark, SF_DIR).count()
    cached_df(
        SF_DIR, "ivf_centroids",
        lambda: ann_ops.cell_centroids(tpch.vectors(spark, SF_DIR)),
        pinned=True,
    ).count()
    find_ops.stub_embedding_sidecar(spark, SF_DIR).count()
    for ff in _fielded_text_index(spark, SF_DIR):
        ff.count()
    loaded_seats = [
        nm for nm in bench.HEADLINE
        if nm in queries
        and ("as_of" in nm or "fielded" in nm or "drift" in nm or "hybrid" in nm)
    ]
    t0 = time.perf_counter()
    for nm in loaded_seats:
        queries[nm](spark, SF_DIR).collect()
    load_s = round(time.perf_counter() - t0, 1)

    loaded, steal_loaded = timed_runs(spark, q, n)
    print(json.dumps({
        "cold_runs": cold, "cold_steal_pct": steal_cold,
        "session_load_seats": len(loaded_seats), "session_load_s": load_s,
        "loaded_runs": loaded, "loaded_steal_pct": steal_loaded,
        "loadavg": os.getloadavg(),
    }))


if __name__ == "__main__":
    main()
