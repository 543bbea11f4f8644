"""Label facet-path helpers: query-time alias translation.

The public filter API accepts human-readable alias roots
("/classification.labels/...", "/metadata.status/...") that map onto
the compact system facet roots actually indexed ("/l/...", "/n/s/...")
— ref nucliadb_models/src/nucliadb_models/labels.py:39-67
(LABEL_QUERY_ALIASES + translate_alias_to_system_label). Translation
is a driver-side planner rule: by the time a filter compiles to a
Column/SQL predicate it speaks system paths only.
"""

from __future__ import annotations

# alias root → system facet root (public API mapping,
# nucliadb_models/labels.py:39-54)
LABEL_QUERY_ALIASES: dict[str, str] = {
    "icon": "n/i",
    "metadata.status": "n/s",
    "metadata.language": "s/p",
    "metadata.languages": "s/s",
    "origin.tags": "t",
    "origin.metadata": "m",
    "origin.path": "p",
    "origin.source-id": "u/s",
    "classification.labels": "l",
    "entities": "e",
    "field": "f",
    "field-values": "fg",
    "generated.data-augmentation": "g/da",
}

_REVERSED = {v: k for k, v in LABEL_QUERY_ALIASES.items()}


def translate_alias_to_system_label(label: str) -> str:
    """"/classification.labels/type/x" → "/l/type/x"; non-alias paths
    pass through unchanged."""
    parts = label.split("/")
    if len(parts) > 1 and parts[1] in LABEL_QUERY_ALIASES:
        return "/".join(["", LABEL_QUERY_ALIASES[parts[1]], *parts[2:]])
    return label


def translate_system_to_alias_label(label: str) -> str:
    """Inverse translation for response rendering; two-segment system
    roots ("n/s") match before one-segment ones."""
    parts = label.split("/")
    two = "/".join(parts[1:3])
    if len(parts) > 2 and two in _REVERSED:
        return "/".join(["", _REVERSED[two], *parts[3:]])
    if len(parts) > 1 and parts[1] in _REVERSED:
        return "/".join(["", _REVERSED[parts[1]], *parts[2:]])
    return label
