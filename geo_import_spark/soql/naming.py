"""SoQL column-name laundering and dedup (driver-side schema pass —
names are metadata, never per-row work).

Parity targets:
- launder: es6-lib/soql/soql.js:5-18 (trim; snake-case when the name
  is not already all-lowercase or contains a space; '_' prefix when
  the first character is a digit). Goldens: es6-test/unit/soql.js.
- dedupe: es6-lib/decoders/layer.js:58-74 (post-laundering collisions
  get _1, _2, … suffixes, first occurrence keeps the name).
- the_geom attribute rename: es6-lib/decoders/transform.js:56-58
  (an attribute literally named the_geom becomes invalid_the_geom —
  the geometry column owns that name).
"""

from __future__ import annotations

import re

GEOM_NAME = "the_geom"


def snake_case(name: str) -> str:
    """change-case snakeCase equivalent: split camelCase boundaries,
    non-alphanumeric runs -> single underscore, lowercase."""
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", name)
    s = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", s)
    s = re.sub(r"[^A-Za-z0-9]+", "_", s)
    return s.strip("_").lower()


def launder(name: str) -> str:
    name = name.strip()
    starts_digit = bool(name) and name[0].isdigit()
    if name != name.lower() or " " in name:
        name = snake_case(name)
    if starts_digit:
        name = "_" + name
    return name


def rename_attribute(name: str) -> str:
    """Attributes may not claim the geometry column's name."""
    if name.lower() == GEOM_NAME:
        return f"invalid_{GEOM_NAME}"
    return name


def dedupe(names: list[str]) -> list[str]:
    """Sequential collision rename: foo, foo, foo -> foo, foo_1, foo_2."""
    taken: set[str] = set()
    out = []
    for name in names:
        index = 0
        candidate = name
        while candidate in taken:
            base = re.split(r"_\d+$", candidate)[0]
            if base:
                candidate = base
                index += 1
            candidate = f"{candidate}_{index}"
        taken.add(candidate)
        out.append(candidate)
    return out
