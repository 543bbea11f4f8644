"""Round-14b probe: the stream-maintained substrate serve and the
deletion-list purge plan at sf0.1 vs the 10x replica.

Claims under test:
- cdc_substrate_stream_served: COLD = the two-tranche stream drain +
  two state materializations (a maintenance pass, linear in log
  size); WARM = two durable state-artifact reads — should scale with
  corpus (state) size only, like its vacuumed-substrate sibling
  cdc_live_as_of_vacuumed.
- purge_deletions_plan: one log scan (the inventory tokenizes every
  upsert version — linear BY DESIGN like its sibling
  segment_autocompaction_plan, a scheduled maintenance report) + a
  segment-count-sized plan + a 1-row broadcast cut.

Run quiet: nohup python scripts/r14b_probe.py > /tmp/np14b.log
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nucliadb_spark import registry
from nucliadb_spark.session import get_session

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(_ROOT, ".scale", "sf1")

TARGETS = [
    "cdc_live_as_of_vacuumed",      # control: vacuumed-substrate read
    "cdc_substrate_stream_served",
    "segment_autocompaction_plan",  # control: same inventory scan
    "purge_deletions_plan",
]


def main() -> None:
    spark = get_session("r14b-probe")
    spark.range(1).count()
    qs = registry.queries()
    print("load avg:", os.getloadavg(), flush=True)
    for sf_name, sf in (("sf0.1", SF01), ("10x", SF1)):
        if not os.path.exists(sf):
            print(f"{sf_name}: fixture missing at {sf}", flush=True)
            continue
        for name in TARGETS:
            t0 = time.perf_counter()
            qs[name](spark, sf).collect()
            cold = round(time.perf_counter() - t0, 2)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, sf).collect()
                runs.append(round(time.perf_counter() - t0, 2))
            print(
                f"{sf_name} {name}: cold {cold} s, warm min {min(runs)} s"
                f" (runs {runs})",
                flush=True,
            )
    print("load avg after:", os.getloadavg(), flush=True)


if __name__ == "__main__":
    main()
