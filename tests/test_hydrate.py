"""/hydrate endpoint analog: explicit-id hydration + neighbour
semantics (ref: search/api/v1/hydrate.py:56-74,
nucliadb_models/hydration.py:203-290)."""

from pyspark.sql import functions as F

from nucliadb_spark.operators import hydrate as H
from nucliadb_spark.sources import tpch


def test_hydrate_neighbours_come_from_full_sequence(spark, sf_dir):
    """Neighbour text must be the rid's adjacent window even when
    that window is NOT in the request (the related.neighbours
    semantics — before/after walk the field's paragraph sequence)."""
    paras = tpch.paragraphs(spark, sf_dir)
    # request only non-TITLE windows; their prev neighbour is the
    # TITLE window, which is never requested
    req = paras.filter((F.col("rid") % 7 == 3) & (F.col("kind") == "TEXT")).select(
        "paragraph_id"
    )
    out = H.hydrate(
        req, paras, tpch.fields(spark, sf_dir), tpch.resources(spark, sf_dir)
    ).collect()
    assert len(out) > 0
    by_id = {
        (r.rid, r.start): r.text
        for r in paras.filter(F.col("rid") % 7 == 3).collect()
    }
    stride = tpch.PARAGRAPH_STRIDE
    for r in out:
        assert r.kind == "TEXT" and r.start > 0
        assert r.prev_text == by_id[(r.rid, r.start - stride)]
        expected_next = by_id.get((r.rid, r.start + stride))
        assert r.next_text == expected_next
        # field + resource hydration attached
        assert r.field_key == "/t/body" and r.slug is not None


def test_hydrate_only_requested_ids(spark, sf_dir):
    paras = tpch.paragraphs(spark, sf_dir)
    req = paras.filter(F.col("rid") == 3).select("paragraph_id").limit(2)
    want = {r.paragraph_id for r in req.collect()}
    out = H.hydrate(
        req, paras, tpch.fields(spark, sf_dir), tpch.resources(spark, sf_dir)
    ).collect()
    assert {r.paragraph_id for r in out} == want
