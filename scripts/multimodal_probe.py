"""Scale probe: real-media synthesize → decode → payload features at
200k files (documents exploded 40×), plus /hydrate over every
non-title window. Run on a QUIET machine (see SCALE.md methodology).

Usage: python scripts/multimodal_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nucliadb_spark.operators import hydrate as H  # noqa: E402
from nucliadb_spark.operators import multimodal as mm  # noqa: E402
from nucliadb_spark.session import get_session  # noqa: E402
from nucliadb_spark.sources import tpch  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = int(os.environ.get("MM_COPIES", "40"))


def main() -> None:
    spark = get_session("mm_probe")
    spark.range(1).count()

    docs = tpch.table(spark, SF, "documents")
    big = (
        docs.crossJoin(F.broadcast(spark.range(COPIES).select(F.col("id").alias("c"))))
        .select(
            (F.col("doc_id") * COPIES + F.col("c")).alias("doc_id"),
            "text",
            "n_chars",
        )
    )
    n = big.count()

    media = mm.synthesize_real_media(big)
    t0 = time.perf_counter()
    total_bytes = media.agg(F.sum(F.length("content"))).collect()[0][0]
    t_synth = time.perf_counter() - t0

    t0 = time.perf_counter()
    agg = mm.real_decode(mm.synthesize_real_media(big)).agg(
        F.sum("n_bytes"), F.max("width"), F.max("sample_rate")
    )
    agg.collect()
    t_decode = time.perf_counter() - t0

    t0 = time.perf_counter()
    mm.media_features(mm.synthesize_real_media(big)).agg(
        F.sum("byte_sum"), F.max("byte_max")
    ).collect()
    t_feat = time.perf_counter() - t0

    mb = total_bytes / 1e6
    print(
        f"files={n} bytes={mb:.0f}MB synth+sum={t_synth:.1f}s "
        f"synth+decode={t_decode:.1f}s ({mb / t_decode:.0f} MB/s) "
        f"synth+features={t_feat:.1f}s ({mb / t_feat:.0f} MB/s)"
    )

    # /hydrate at a 10k-id request
    paras = tpch.paragraphs(spark, SF)
    # deterministic request: the frame is referenced twice inside the
    # hydrate DAG (ids + rid set), so a bare limit() would pick two
    # different row sets
    req = paras.filter(F.col("kind") == "TEXT").select("paragraph_id")
    flds, res = tpch.fields(spark, SF), tpch.resources(spark, SF)
    H.hydrate(req, paras, flds, res).count()  # warm
    t0 = time.perf_counter()
    out = H.hydrate(req, paras, flds, res).count()
    print(f"hydrate_all_text rows={out} time={time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
