"""Canonical reference fixtures ported to DataFrames.

- knowledge graph: the 18-entity / 17-triple graph from
  nidx/nidx_tests/src/graph.rs:67-130 (FIXTURES.md §5).
- little_prince: the 1-resource / 2-field mini corpus from
  nidx/nidx_tests/src/lib.rs:51-133 (FIXTURES.md §6).
"""

from __future__ import annotations

ENTITIES = {
    "Anastasia": "PERSON",
    "Anna": "PERSON",
    "Apollo": "PROJECT",
    "Cat": "ANIMAL",
    "Climbing": "ACTIVITY",
    "Computer science": "STUDY_FIELD",
    "Dimitri": "PERSON",
    "Erin": "PERSON",
    "Jerry": "ANIMAL",
    "Mr. P": "AGENT",
    "Margaret": "PERSON",
    "Mouse": "ANIMAL",
    "New York": "PLACE",
    "Olympic athlete": "SPORT",
    "Peter": "PERSON",
    "Rocket": "VEHICLE",
    "Tom": "ANIMAL",
    "UK": "PLACE",
}

TRIPLES = [
    ("Anastasia", "IS_FRIEND", "Anna"),
    ("Anna", "FOLLOW", "Erin"),
    ("Anna", "LIVE_IN", "New York"),
    ("Anna", "WORK_IN", "New York"),
    ("Anna", "LOVE", "Cat"),
    ("Apollo", "IS", "Rocket"),
    ("Dimitri", "LOVE", "Anastasia"),
    ("Erin", "BORN_IN", "UK"),
    ("Erin", "IS", "Olympic athlete"),
    ("Erin", "LOVE", "Climbing"),
    ("Jerry", "IS", "Mouse"),
    ("Margaret", "DEVELOPED", "Apollo"),
    ("Margaret", "WORK_IN", "Computer science"),
    ("Mr. P", "ALIAS", "Peter"),
    ("Peter", "LIVE_IN", "New York"),
    ("Tom", "CHASE", "Jerry"),
    ("Tom", "IS", "Cat"),
]

RELATION_TYPES = {"ALIAS": "SYNONYM"}  # everything else is ENTITY


def knowledge_graph(spark):
    rows = [
        (
            s,
            "ENTITY",
            ENTITIES[s],
            RELATION_TYPES.get(r, "ENTITY"),
            r,
            t,
            "ENTITY",
            ENTITIES[t],
        )
        for s, r, t in TRIPLES
    ]
    return spark.createDataFrame(
        rows,
        "source_value string, source_type string, source_subtype string, "
        "relation_type string, relation_label string, "
        "target_value string, target_type string, target_subtype string",
    )


LITTLE_PRINCE_TITLE = "The little prince"
LITTLE_PRINCE_SUMMARY = (
    "The story follows a young prince who visits various planets in space, "
    "including Earth, and addresses themes of loneliness, friendship, love, "
    "and loss."
)


def little_prince(spark, rid: str = "lp01"):
    """fields table rows for the little_prince resource."""
    rows = [
        (rid, "a", "title", f"/a/title", LITTLE_PRINCE_TITLE, "en"),
        (rid, "a", "summary", f"/a/summary", LITTLE_PRINCE_SUMMARY, "en"),
    ]
    return spark.createDataFrame(
        rows,
        "rid string, field_type string, field_id string, field_key string, "
        "text string, language string",
    )
