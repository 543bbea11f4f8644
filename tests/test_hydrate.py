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


def test_hydrate_multi_field_no_fanout(spark, sf_dir):
    """With ≥2 fields per resource, hydration must attach the OWNING
    field (join on rid + field_id parsed from the 3-segment id,
    nucliadb_models/hydration.py:203-290) — exactly one row per
    requested paragraph, never one per (paragraph × field)."""
    paras = tpch.paragraphs_fielded(spark, sf_dir)
    fields = tpch.fields_multi(spark, sf_dir)
    # the corpus really is multi-field
    per_rid = fields.groupBy("rid").count().agg(F.min("count")).first()[0]
    assert per_rid >= 2
    req = paras.filter(F.col("rid") % 11 == 5).select("paragraph_id")
    resources = tpch.resources(spark, sf_dir)
    # hydration inner-joins resources, so the expected row set is the
    # requested paragraphs whose rid exists there (same as the oracle)
    n_req = (
        req.withColumn("rid", F.split("paragraph_id", "/").getItem(0).cast("long"))
        .join(resources.select("rid"), "rid", "leftsemi")
        .count()
    )
    out = H.hydrate(req, paras, fields, resources).collect()
    assert len(out) == n_req  # exactly one row per requested paragraph — no fan-out
    for r in out:
        fid = r.paragraph_id.split("/")[1]
        # owning field attached, not an arbitrary one
        assert r.field_key == {
            "body": "/t/body",
            "title": "/a/title",
            "link": "/u/link",
        }[fid]
        assert r.field_type == {"body": "t", "title": "a", "link": "u"}[fid]
        if fid in ("title", "link"):
            # neighbours never cross field boundaries: the title and
            # link fields each have a single paragraph, so no
            # neighbours even though the body field's windows share
            # the rid
            assert r.prev_text is None and r.next_text is None


def test_hydrate_neighbour_depth2(spark, sf_dir):
    """before=2/after=2 (ParagraphHydration.related.neighbours) —
    the extra offsets come from the same single window, and the
    depth-2 neighbour is the window two strides away."""
    paras = tpch.paragraphs(spark, sf_dir)
    req = paras.filter((F.col("rid") % 13 == 4) & (F.col("kind") == "TEXT")).select(
        "paragraph_id"
    )
    out = H.hydrate(
        req, paras, tpch.fields(spark, sf_dir), tpch.resources(spark, sf_dir),
        before=2, after=2,
    ).collect()
    assert len(out) > 0
    by_id = {
        (r.rid, r.start): r.text
        for r in paras.filter(F.col("rid") % 13 == 4).collect()
    }
    stride = tpch.PARAGRAPH_STRIDE
    for r in out:
        assert r.prev_text == by_id.get((r.rid, r.start - stride))
        assert r.prev_text2 == by_id.get((r.rid, r.start - 2 * stride))
        assert r.next_text == by_id.get((r.rid, r.start + stride))
        assert r.next_text2 == by_id.get((r.rid, r.start + 2 * stride))


def test_hydrate_only_requested_ids(spark, sf_dir):
    paras = tpch.paragraphs(spark, sf_dir)
    req = paras.filter(F.col("rid") == 3).select("paragraph_id").limit(2)
    want = {r.paragraph_id for r in req.collect()}
    out = H.hydrate(
        req, paras, tpch.fields(spark, sf_dir), tpch.resources(spark, sf_dir)
    ).collect()
    assert {r.paragraph_id for r in out} == want


def test_hydrate_conversation_neighbours_are_adjacent_messages(spark, sf_dir):
    """4-segment conversation ids (rid/field/split/start-end): the
    neighbour window orders by (split, start), so prev/next text are
    the previous/next MESSAGE of the conversation (FieldUid.split —
    nidx_text/src/reader.rs:482-487)."""
    paras = tpch.paragraphs_conversation(spark, sf_dir)
    req = paras.filter(F.col("rid") % 5 == 2).select("paragraph_id")
    out = H.hydrate(
        req, paras, tpch.fields_conversation(spark, sf_dir),
        tpch.resources_conversation(spark, sf_dir),
    ).collect()
    assert out
    for r in out:
        # conversations live in a disjoint rid keyspace with their
        # OWN resources — the hydrated metadata must belong to the
        # conversation, never a part that shares the raw user_id
        cid = r.rid - tpch.CONV_RID_BASE
        assert r.slug == f"conversation-{cid}"
        assert r.title == f"Conversation with user-{cid}"
    by_split = {
        (r.rid, int(r.paragraph_id.split("/")[2])): r.text
        for r in paras.filter(F.col("rid") % 5 == 2).collect()
    }
    for r in out:
        s = r.split
        assert s == int(r.paragraph_id.split("/")[2])
        assert r.prev_text == by_split.get((r.rid, s - 1))
        assert r.next_text == by_split.get((r.rid, s + 1))
        assert r.field_key == "/c/conv" and r.field_type == "c"
