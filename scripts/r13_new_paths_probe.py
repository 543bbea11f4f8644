"""Round-13 probe: the new serving paths at sf0.1 vs the 10x replica.

Claims under test:
- find_hybrid_as_of_keyword_filtered: the text plane is the SAME
  seq-cut content state the keyword leg scores (cached per snapshot)
  plus one rid semijoin — should scale like find_hybrid_as_of.
- find_secured_as_of (r13 metadata resolution): one rid-keyed max_by
  over the seq-pruned meta log, cached per snapshot — should scale
  like the static-path sibling find_hybrid_as_of_dated it replaced.
- cdc_live_as_of_vacuumed vs the full-log resolve of the same state:
  the vacuumed serve is base+retained (the retained delta is the
  post-horizon ops only), the control re-resolves the whole history.
- segment_autocompaction_plan: one rid window + one segment aggregate
  over the full op log — linear in log size BY DESIGN (a scheduled
  maintenance pass over the sink's whole inventory); recorded to pin
  the slope, not to claim flatness.

Run quiet:  nohup python scripts/r13_new_paths_probe.py > /tmp/np13.log
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nucliadb_spark import registry
from nucliadb_spark.session import get_session

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(_ROOT, ".scale", "sf1")

TARGETS = [
    "find_hybrid_as_of_keyword_filtered",
    "find_hybrid_as_of",        # control: unfiltered snapshot flagship
    "find_secured_as_of",       # r13: metadata-log resolution
    "find_hybrid_as_of_dated",  # control: the static-path sibling
    "cdc_live_as_of_vacuumed",
    "segment_autocompaction_plan",
]


def _full_log_asof_control(spark, sf):
    """The control for the vacuumed serve: resolve the SAME as-of
    corpus from the full op log (what the serve would cost without
    the vacuum's fold)."""
    from nucliadb_spark.sources import tpch
    from nucliadb_spark.streaming import ingest

    log = ingest.cdc_log(tpch.fields(spark, sf))
    ingest.cdc_live_as_of(log, 1_500_000).orderBy("rid").collect()


def bench(spark, sf: str) -> dict[str, float]:
    qs = registry.queries()
    out: dict[str, float] = {}
    for name in TARGETS:
        t0 = time.perf_counter()
        qs[name](spark, sf).collect()
        print(f"  {name} cold: {round(time.perf_counter() - t0, 2)} s", flush=True)
    _full_log_asof_control(spark, sf)  # warm
    for name in TARGETS:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf).collect()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 2)
        print(f"  {name} warm min-of-3: {out[name]} s", flush=True)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _full_log_asof_control(spark, sf)
        runs.append(time.perf_counter() - t0)
    out["full_log_asof_control"] = round(min(runs), 2)
    print(f"  full_log_asof_control warm min-of-3: {out['full_log_asof_control']} s", flush=True)
    return out


def main() -> None:
    assert os.path.exists(os.path.join(SF1, "_DONE"))
    spark = get_session("r13-new-paths-probe")
    spark.range(1).count()
    print("load avg:", os.getloadavg())
    print("== sf0.1 ==")
    base = bench(spark, SF01)
    print("== 10x ==")
    big = bench(spark, SF1)
    print("== ratios (10x / sf0.1) ==")
    for name in [*TARGETS, "full_log_asof_control"]:
        print(f"  {name}: {round(big[name] / base[name], 2)}x")
    print("load avg after:", os.getloadavg())


if __name__ == "__main__":
    main()
