"""Differential harness: the engine's violations must match the REFERENCE
validator row-for-row on the derived documents table (the north rule's
parity gate — BASELINE.json: 'exact violation-row parity vs json-schema-py
golden pytest suite', verified via `python -m pytest -x -q`).

Reference error-shape adapters (the reference reports two codes at their
container paths; see tests/refadapt.py for the mapping):
* REQUIRED_PROPERTY_MISSING: at object path + property name from message
* ARRAY_ITEMS_NOT_UNIQUE: at array path + duplicate index from message
* observed compared for scalar-valued codes (reference carries raw values;
  composite renderings legitimately differ)
"""

from __future__ import annotations

import re
import sys

import pytest

sys.path.insert(0, "/root/reference")

SF_DIR = "/root/testdata/sf0.001"
SCALAR_OBS = {
    "NUMBER_TOO_SMALL",
    "NUMBER_TOO_LARGE",
    "NUMBER_NOT_MULTIPLE",
    "STRING_TOO_SHORT",
    "STRING_TOO_LONG",
    "PATTERN_MISMATCH",
    "ENUM_MISMATCH",
    "CONST_MISMATCH",
}


def _adapt_reference_error(e) -> tuple:
    code = e.code.name
    if code == "REQUIRED_PROPERTY_MISSING":
        m = re.search(r"'([^']+)'", e.message)
        return (code, f"{e.path}/{m.group(1)}", "None")
    if code == "ARRAY_ITEMS_NOT_UNIQUE":
        m = re.search(r"index (\d+)", e.message)
        return (code, f"{e.path}/{m.group(1)}", None)
    return (code, e.path, str(e.value) if code in SCALAR_OBS else None)


def _norm_engine(violations: set) -> set:
    keep_obs = SCALAR_OBS | {"REQUIRED_PROPERTY_MISSING"}
    return {(c, p, o if c in keep_obs else None) for c, p, o in violations}


@pytest.fixture(scope="module")
def spans_rows(spark):
    from json_schema_py_spark.sources.synth import spans_documents

    return spans_documents(spark, SF_DIR).collect()


def _engine_violations(spark, schema) -> dict[int, set]:
    from json_schema_py_spark.schema.compiler import validate
    from json_schema_py_spark.sources.synth import spans_documents

    out: dict[int, set] = {}
    df = validate(spans_documents(spark, SF_DIR), schema, key_col="src_id")
    for r in df.collect():
        out.setdefault(r["doc_id"], set()).add((r["rule_id"], r["path"], r["observed"]))
    return out


def _row_to_doc(row) -> dict:
    doc = {}
    if row["doc_id"] is not None:
        doc["doc_id"] = row["doc_id"]
    doc["spans"] = [
        {k: v for k, v in s.asDict().items() if v is not None} for s in row["spans"]
    ]
    return doc


@pytest.mark.parametrize("ruleset_name", ["DOCUMENTS_RULESET", "MEDIA_DEPENDENCY_RULESET"])
def test_full_table_parity(spark, spans_rows, ruleset_name):
    from json_schema.api import JsonValidator  # the reference, /root/reference
    from json_schema_py_spark.sources import synth

    schema = getattr(synth, ruleset_name)
    eng = _engine_violations(spark, schema)
    ref = JsonValidator()
    mismatches = []
    for row in spans_rows:
        expected = {_adapt_reference_error(e) for e in ref.validate(_row_to_doc(row), schema).errors}
        got = _norm_engine(eng.get(row["src_id"], set()))
        if expected != got:
            mismatches.append((row["src_id"], sorted(expected), sorted(got)))
    assert not mismatches, f"{len(mismatches)} docs mismatch; first: {mismatches[:3]}"


def test_scenario_users_table(spark):
    """The reference's complex user-schema scenario as a table
    (tests/complex_validation_test.py:22-105 re-expressed row-wise)."""
    from json_schema.api import JsonValidator
    from json_schema_py_spark.schema.compiler import validate

    schema = {
        "type": "object",
        "required": ["id", "username", "active"],
        "properties": {
            "id": {"type": "integer", "minimum": 1},
            "username": {"type": "string", "minLength": 3, "maxLength": 20,
                         "pattern": "^[a-zA-Z0-9_]+$"},
            "email": {"type": "string",
                      "pattern": "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"},
            "age": {"type": "integer", "minimum": 18},
            "bio": {"type": "string", "maxLength": 500},
            "roles": {"type": "array", "uniqueItems": True,
                      "items": {"enum": ["user", "admin", "editor"]}},
        },
    }
    rows = [
        (1, 10, "alice_01", "a@b.co", 30, "hi", ["user"]),
        (2, 0, "j@hn", "not-an-email", 15, "x", ["user", "user", "unknown"]),
        (3, 5, None, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "rk long, id long, username string, email string, age long, bio string, roles array<string>",
    )
    eng: dict[int, set] = {r[0]: set() for r in rows}
    for r in validate(df, schema, key_col="rk").collect():
        eng[r["doc_id"]].add((r["rule_id"], r["path"], r["observed"]))

    ref = JsonValidator()
    for rk, id_, username, email, age, bio, roles in rows:
        doc = {k: v for k, v in
               dict(id=id_, username=username, email=email, age=age, bio=bio, roles=roles).items()
               if v is not None}
        expected = {_adapt_reference_error(e) for e in ref.validate(doc, schema).errors}
        assert expected == _norm_engine(eng[rk]), f"row {rk}"
