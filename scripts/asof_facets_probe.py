"""Round-12 probe: counter-served AS-OF facet read vs the full
per-request label resolution, at sf0.1 and the 10x replica.

Claim: `catalog_facets_as_of` pays a corpus-sized latest-op-wins
resolution per request (grows with the corpus), while
`cdc_catalog_facets_as_of_served` reads the seq-bucketed counter
sidecar + ONE boundary bucket of the op log (checkpoint+delta —
near-flat). The sidecar build is the pay-once streaming drain, timed
separately as the cold.

Run quiet:  nohup python scripts/asof_facets_probe.py > /tmp/afp.log
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
TARGETS = ["catalog_facets_as_of", "cdc_catalog_facets_as_of_served"]


def bench(spark, sf: str) -> dict[str, float]:
    qs = registry.queries()
    out: dict[str, float] = {}
    for name in TARGETS:
        t0 = time.perf_counter()
        qs[name](spark, sf).collect()  # cold: sidecar build for the served one
        print(f"  {name} cold: {round(time.perf_counter() - t0, 2)} s", flush=True)
    for name in TARGETS:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf).collect()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 2)
        print(f"  {name} warm min-of-3: {out[name]} s", flush=True)
    return out


def main() -> None:
    assert os.path.exists(os.path.join(SF1, "_DONE"))
    spark = get_session("asof-facets-probe")
    spark.range(1).count()
    print("load avg:", os.getloadavg())
    print("== sf0.1 ==")
    base = bench(spark, SF01)
    print("== 10x ==")
    big = bench(spark, SF1)
    print("== ratios (10x / sf0.1) ==")
    for name in TARGETS:
        print(f"  {name}: {round(big[name] / base[name], 2)}x")
    print("load avg after:", os.getloadavg())


if __name__ == "__main__":
    main()
