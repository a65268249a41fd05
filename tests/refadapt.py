"""Shared adapter for the reference validator's container-path conventions.

The engine reports violations at the offending VALUE's JSON Pointer; the
reference reports some codes at the enclosing container and names the member
in the message, and truncates paths inside $ref'd subschemas to the ref
site. These adapters normalize reference errors to the engine convention
where recoverable; '$ref'-truncated paths are not recoverable → compare
codes only for schemas containing $ref (documented refinement)."""

from __future__ import annotations

import json
import re


def adapt(e) -> tuple[str, str]:
    """Reference error → (code, engine-convention path)."""
    code = e.code.name
    if code == "REQUIRED_PROPERTY_MISSING":
        m = re.search(r"property '([^']+)'", e.message)
        return (code, f"{e.path}/{m.group(1)}")
    if code == "DEPENDENCY_MISSING":
        m = re.search(r"depends on '([^']+)'", e.message)
        return (code, f"{e.path}/{m.group(1)}")
    if code == "ADDITIONAL_PROPERTY_NOT_ALLOWED":
        m = re.search(r"property '([^']+)'", e.message)
        return (code, f"{e.path}/{m.group(1)}")
    if code == "ARRAY_ITEMS_NOT_UNIQUE":
        m = re.search(r"index (\d+)", e.message)
        return (code, f"{e.path}/{m.group(1)}")
    return (code, e.path)


def schema_has_ref(schema) -> bool:
    return "$ref" in json.dumps(schema)
