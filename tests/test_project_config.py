"""The reference's hardest scenario: project-config schema with $ref + anyOf
+ additionalProperties escape hatch (reference:
tests/complex_validation_test.py:246-423 and tests/integration_test.py:126-268
— where the reference needs a 'TEMPORARY FIX' (additionalProperties=True) to
pass its own valid config, acknowledged as a design flaw fixed 'in v0.3.0').

This engine implements the parent_properties escape hatch properly
(schema/model._collect_property_names), so the ORIGINAL schema validates the
valid config — no fix needed — while the invalid config produces exactly the
violations the reference test demands (≥5, right codes, precise paths)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/reference")

from json_schema_py_spark.api import JsonValidator

SCHEMA = {
    "additionalProperties": {"$ref": "#/definitions/Project"},
    "type": "object",
    "definitions": {
        "Project": {
            "additionalProperties": False,
            "anyOf": [
                {"properties": {"library": {"enum": [True]}}, "required": ["library"]},
                {"properties": {"executable": {"enum": [True]}}, "required": ["executable"]},
            ],
            "properties": {
                "dependencies": {"items": {"type": "string"}, "type": "array"},
                "description": {"type": "string"},
                "executable": {"type": "boolean"},
                "library": {"type": "boolean"},
                "includes": {"items": {"$ref": "#/definitions/FileGroup"}, "type": "array"},
                "sources": {"items": {"$ref": "#/definitions/FileGroup"}, "type": "array"},
            },
            "type": "object",
        },
        "FileGroup": {
            "additionalProperties": False,
            "anyOf": [{"required": ["public"]}, {"required": ["private"]}],
            "properties": {
                "platform": {
                    "enum": ["any", "windows", "apple", "linux", "posix"],
                    "type": "string",
                },
                "private": {"items": {"type": "string"}, "type": "array"},
                "public": {"items": {"type": "string"}, "type": "array"},
            },
            "required": ["platform"],
            "type": "object",
        },
    },
}

VALID = {
    "core": {
        "description": "core library",
        "library": True,
        "includes": [{"platform": "any", "public": ["include/header.h"]}],
        "sources": [
            {"platform": "any", "private": ["src/implementation.cpp"]},
            {"platform": "windows", "private": ["src/windows/impl.cpp"]},
        ],
        "dependencies": ["utils"],
    },
    "app": {
        "description": "application",
        "executable": True,
        "sources": [{"platform": "any", "private": ["src/main.cpp"]}],
        "dependencies": ["core"],
    },
}

INVALID = {
    "core": {
        "description": "core library",
        "library": "yes",  # should be boolean
        "includes": [{"public": ["include/header.h"]}],  # missing platform
        "sources": [{"platform": "invalid", "private": ["src/implementation.cpp"]}],
    },
    "app": {
        "description": "application",  # missing library/executable
        "sources": [{"platform": "any"}],  # missing public/private
    },
}


def test_valid_config_passes_original_schema():
    """No TEMPORARY FIX required — the escape hatch exempts anyOf-declared
    keys from the Project definition's additionalProperties=False."""
    r = JsonValidator().validate(VALID, SCHEMA)
    assert r.valid, [(e.code.value, e.path) for e in r.errors]


def test_invalid_config_all_violations_precise_paths():
    r = JsonValidator().validate(INVALID, SCHEMA)
    assert not r.valid
    got = {(e.code.value, e.path) for e in r.errors}
    assert got == {
        ("TYPE_ERROR", "/core/library"),
        ("REQUIRED_PROPERTY_MISSING", "/core/includes/0/platform"),
        ("ENUM_MISMATCH", "/core/sources/0/platform"),
        ("ANY_OF_NO_MATCH", "/core"),  # library not True (it's "yes")
        ("ANY_OF_NO_MATCH", "/app/sources/0"),  # neither public nor private
        ("ANY_OF_NO_MATCH", "/app"),  # neither library nor executable
    }
    assert len(r.errors) >= 5  # the reference test's own bar


def test_reference_verdict_agreement_on_fixed_schema():
    """On the schema variant the reference CAN handle (its TEMPORARY FIX),
    verdicts agree."""
    import copy

    from json_schema.api import JsonValidator as RefValidator

    fixed = copy.deepcopy(SCHEMA)
    fixed["definitions"]["Project"]["additionalProperties"] = True
    assert RefValidator().validate(VALID, fixed).valid
    assert JsonValidator().validate(VALID, fixed).valid
    assert not RefValidator().validate(INVALID, SCHEMA).valid
    assert not JsonValidator().validate(INVALID, SCHEMA).valid


def test_spark_engine_matches_pyeval_on_project_config(spark):
    """The same scenario through the Spark JSON paths (MapType root with
    additionalProperties $ref)."""
    import json

    from json_schema_py_spark.plans.json_docs import validate_json_exact

    df = spark.createDataFrame(
        [(1, json.dumps(VALID)), (2, json.dumps(INVALID))], "doc_id long, payload string"
    )
    out = validate_json_exact(df, "payload", SCHEMA, key_col="doc_id")
    rows = out.collect()
    by_doc: dict[int, set] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add((r["rule_id"], r["path"]))
    assert 1 not in by_doc  # valid config: zero violations
    assert len(by_doc[2]) == 6
