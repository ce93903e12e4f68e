"""Avro schema-evolution compatibility checking (public Avro spec,
"Schema Resolution" section) — the contract the reference delegates to the
Confluent registry's compatibility checks.

`can_read(writer, reader)` answers: can data written with `writer` be
decoded by a consumer expecting `reader`? Rules implemented:
- records: match by field name; reader fields missing from writer need a
  default; writer-only fields are skipped (projection-tolerant read).
- primitives: exact match or spec promotion — int→long/float/double,
  long→float/double, float→double, string↔bytes.
- enums: every writer symbol the reader may see must exist in the reader
  (or the reader declares a default symbol per spec 1.9+).
- arrays/maps: item/value types recurse.
- unions: every writer branch must be readable by SOME reader branch; a
  non-union writer reads into a union if any branch accepts it.
"""

from __future__ import annotations

from typing import Any

_PROMOTIONS: dict[str, set[str]] = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


def _type_of(schema: Any) -> str:
    if isinstance(schema, list):
        return "union"
    return schema["type"] if isinstance(schema, dict) else schema


def can_read(writer: Any, reader: Any) -> bool:
    wt, rt = _type_of(writer), _type_of(reader)

    if rt == "union":
        if wt == "union":
            return all(can_read(b, reader) for b in writer)
        return any(can_read(writer, b) for b in reader)
    if wt == "union":
        return all(can_read(b, reader) for b in writer)

    if wt == rt and wt in (
        "null", "boolean", "int", "long", "float", "double", "string", "bytes"
    ):
        return True
    if wt in _PROMOTIONS and rt in _PROMOTIONS[wt]:
        return True

    if wt == "record" and rt == "record":
        wfields = {f["name"]: f for f in writer["fields"]}
        for rf in reader["fields"]:
            wf = wfields.get(rf["name"])
            if wf is None:
                if "default" not in rf:
                    return False  # reader-new field without default
            elif not can_read(wf["type"], rf["type"]):
                return False
        return True

    if wt == "enum" and rt == "enum":
        missing = set(writer["symbols"]) - set(reader["symbols"])
        return not missing or "default" in reader

    if wt == "array" and rt == "array":
        return can_read(writer["items"], reader["items"])
    if wt == "map" and rt == "map":
        return can_read(writer["values"], reader["values"])
    return False


def compat_errors(writer: Any, reader: Any, path: str = "$") -> list[str]:
    """Human-readable incompatibility list (empty = compatible)."""
    errs: list[str] = []
    wt, rt = _type_of(writer), _type_of(reader)
    if rt == "union" or wt == "union":
        if not can_read(writer, reader):
            errs.append(f"{path}: union branches incompatible")
        return errs
    if wt == "record" and rt == "record":
        wfields = {f["name"]: f for f in writer["fields"]}
        for rf in reader["fields"]:
            p = f"{path}.{rf['name']}"
            wf = wfields.get(rf["name"])
            if wf is None:
                if "default" not in rf:
                    errs.append(f"{p}: new reader field has no default")
            else:
                errs.extend(compat_errors(wf["type"], rf["type"], p))
        return errs
    if not can_read(writer, reader):
        errs.append(f"{path}: cannot read {wt} as {rt}")
    return errs
