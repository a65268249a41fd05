"""Reference-compatible API surface + CLI (reference entry points 1 & 2)."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/reference")

from json_schema_py_spark.api import JsonValidator
from json_schema_py_spark.errors import ErrorCode

SCENARIOS = [
    # (doc, schema) — drawn from the reference test files' semantics (SURVEY §5)
    ({"age": True}, {"properties": {"age": {"type": "number"}}}),  # bool≠number
    ({"age": 5}, {"properties": {"age": {"type": "number"}}}),  # int⊆number
    ({"x": 2.0}, {"properties": {"x": {"type": "integer"}}}),  # float∉integer
    ({"s": "ab"}, {"properties": {"s": {"minLength": 3, "maxLength": 5}}}),
    ({"s": "abcdefg"}, {"properties": {"s": {"maxLength": 5}}}),
    ({"s": "xcatx"}, {"properties": {"s": {"pattern": "cat"}}}),  # re.search
    ({"n": 5}, {"properties": {"n": {"minimum": 5, "exclusiveMinimum": True}}}),
    ({"n": 0.3}, {"properties": {"n": {"multipleOf": 0.1}}}),  # tolerance pass
    ({"n": 0.37}, {"properties": {"n": {"multipleOf": 0.1}}}),  # tolerance fail
    ({"c": "pink"}, {"properties": {"c": {"enum": ["red", "green"]}}}),
    ({"c": 1}, {"properties": {"c": {"enum": [True]}}}),  # 1 == True quirk
    ({"a": [1, 2, 1]}, {"properties": {"a": {"uniqueItems": True}}}),
    ({"a": []}, {"properties": {"a": {"minItems": 1}}}),
    ({"a": [1, -2]}, {"properties": {"a": {"items": {"minimum": 0}}}}),
    ({}, {"required": ["name"]}),
    ({"card": "x"}, {"dependencies": {"card": ["addr"]}, "properties": {"card": {}}}),
    ({"a": 1, "b": 2, "c": 3}, {"maxProperties": 2}),
    ({"x": 1}, {"properties": {"y": {}}, "additionalProperties": False}),
    ({"v": None}, {"properties": {"v": {"type": "null"}}}),
    ({"v": None}, {"properties": {"v": {"type": "string"}}}),  # null IS a type err
    ({"v": 7}, {"properties": {"v": {"minLength": 1}}}),  # inferred-type enforced
    ({"p": {"age": -1}}, {
        "definitions": {"person": {"properties": {"age": {"minimum": 0}}}},
        "properties": {"p": {"$ref": "#/definitions/person"}}}),
    ({"n": 5}, {"properties": {"n": {"anyOf": [{"minimum": 10}, {"maximum": 3}]}}}),
    ({"n": 5}, {"properties": {"n": {"oneOf": [{"type": "number"}, {"type": "integer"}]}}}),
    ({"n": 5}, {"properties": {"n": {"not": {"minimum": 0}}}}),
]


@pytest.mark.parametrize("doc,schema", SCENARIOS)
def test_jsonvalidator_matches_reference_codes(doc, schema):
    """Same (code, path) multiset as the reference validator (adapted for its
    container-path conventions; codes-only where the reference truncates
    $ref'd paths — ours are a refinement)."""
    from json_schema.api import JsonValidator as RefValidator

    from tests.refadapt import adapt, schema_has_ref

    ours = JsonValidator().validate(doc, schema)
    ref = RefValidator().validate(doc, schema)

    if schema_has_ref(schema):
        assert sorted(e.code.name for e in ref.errors) == sorted(
            e.code.value for e in ours.errors
        )
    else:
        assert sorted(adapt(e) for e in ref.errors) == sorted(
            (e.code.value, e.path) for e in ours.errors
        )
    assert ours.valid == ref.valid


def test_validator_caches_compiled_schema():
    v = JsonValidator()
    schema = {"properties": {"x": {"minimum": 0}}}
    v.validate({"x": 1}, schema)
    assert len(v._cache) == 1
    v.validate({"x": 2}, schema)
    assert len(v._cache) == 1


def test_external_ref_is_resolution_error():
    r = JsonValidator().validate({}, {"$ref": "http://x/y"})
    assert not r.valid
    assert r.errors[0].code == ErrorCode.REFERENCE_RESOLUTION_FAILED


# ----------------------------------------------------------------- CLI


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_cli_exit_codes(tmp_path):
    from json_schema_py_spark.cli import main

    schema = _write(tmp_path, "schema.json", {"required": ["id"], "properties": {"id": {"type": "integer"}}})
    ok = _write(tmp_path, "ok.json", {"id": 3})
    bad = _write(tmp_path, "bad.json", {"id": "x"})
    assert main([ok, schema]) == 0
    assert main([bad, schema]) == 1
    assert main([bad, schema, "--verbose"]) == 1
    assert main([str(tmp_path / "missing.json"), schema]) == 1
    malformed = tmp_path / "m.json"
    malformed.write_text("{not json")
    assert main([str(malformed), schema]) == 1


def test_cli_table_mode(tmp_path, spark):
    """Parquet + --json-col path through main() (the subprocess variant was
    driven manually; this pins the wiring)."""
    import json as _json

    from json_schema_py_spark.cli import main

    schema_p = tmp_path / "s.json"
    schema_p.write_text(_json.dumps({
        "type": "object", "additionalProperties": {"type": "integer", "minimum": 50}}))
    data = spark.createDataFrame(
        [(1, '{"k": 99}'), (2, '{"k": 7}')], "event_id long, props string"
    )
    src = str(tmp_path / "events.parquet")
    data.write.parquet(src)
    out = str(tmp_path / "viol")
    rc = main([src, str(schema_p), "--json-col", "props", "--key-col", "event_id",
               "--exact", "--out", out])
    assert rc == 1
    viol = spark.read.parquet(out).collect()
    assert len(viol) == 1 and viol[0]["doc_id"] == 2  # key dtype preserved (long)


def test_error_messages_reference_phrasing():
    v = JsonValidator()
    r = v.validate({}, {"required": ["name"]})
    assert "Missing required property 'name'" in r.errors[0].message
    r = v.validate({"a": [1, 2, 1]}, {"properties": {"a": {"uniqueItems": True}}})
    assert "duplicate at index 2" in r.errors[0].message
    r = v.validate({"x": 1}, {"properties": {"y": {}}, "additionalProperties": False})
    assert "Additional property 'x' not allowed" in r.errors[0].message


# extra scenarios so message parity covers EVERY code's phrasing branch
# (beyond SCENARIOS' semantics coverage): list-form types, every base-type
# gate, const, both array/object bounds, both oneOf outcomes, invalid
# regexes (pattern + patternProperties), $ref failures
MESSAGE_SCENARIOS = SCENARIOS + [
    ("abc", {"type": "integer"}),
    (42, {"type": "string", "minLength": 3}),
    (3.5, {"type": ["string", "integer"]}),
    ("abc", {"type": ["integer"]}),  # list-of-one still uses JSON type names
    (2.5, {"type": ["integer", "string", "boolean"]}),
    ([], {"type": "object"}),
    ({}, {"type": "array"}),
    (0, {"type": "boolean"}),
    (0, {"type": "null"}),
    (True, {"type": "integer"}),
    (None, {"type": "number"}),
    ({"o": 5}, {"properties": {"o": {"const": 7}}}),
    ({"o": "x"}, {"properties": {"o": {"const": {"a": 1}}}}),
    ({"o": "blue"}, {"properties": {"o": {"enum": [1, 2.5, {"a": 1}]}}}),
    ({"n": 3}, {"properties": {"n": {"minimum": 5}}}),
    ({"n": 9}, {"properties": {"n": {"maximum": 5}}}),
    ({"n": 5}, {"properties": {"n": {"maximum": 5, "exclusiveMaximum": True}}}),
    ({"a": [1, 2, 3]}, {"properties": {"a": {"maxItems": 2}}}),
    ({"a": 1}, {"minProperties": 2}),
    ({"ab": 1}, {"propertyNames": {"minLength": 3}}),
    ({"s": "ab"}, {"properties": {"s": {"pattern": "["}}}),  # invalid regex
    ({"a": 1, "b": 2}, {"patternProperties": {"[": {"type": "integer"}}}),
    ({}, {"patternProperties": {"[": {"type": "integer"}}}),  # empty obj still emits
    (5, {"oneOf": [{"type": "string"}, {"type": "boolean"}]}),
    (5, {"oneOf": [{"type": "integer"}, {"type": "number"}]}),
    ({}, {"$ref": "http://x/y"}),
    ({}, {"$ref": "#/definitions/nope"}),
]


@pytest.mark.parametrize("doc,schema", MESSAGE_SCENARIOS)
def test_error_message_text_parity(doc, schema):
    """FULL message-text equality with the reference across every error
    code's phrasing branch (round-2 VERDICT item 5: codes/paths were
    already the contract; now the message STRINGS match too). Compared as
    sorted multisets — path conventions differ by documented refinement,
    but message text never embeds the path."""
    from json_schema.api import JsonValidator as RefValidator

    ours = JsonValidator().validate(doc, schema)
    ref = RefValidator().validate(doc, schema)
    assert sorted((e.code.name, e.message) for e in ours.errors) == sorted(
        (e.code.name, e.message) for e in ref.errors
    ), f"doc={doc} schema={schema}"
    assert ours.valid == ref.valid


@pytest.mark.parametrize(
    "doc,schema",
    [
        (5, {"allOf": [{"anyOf": [{"type": "string"}, {"minimum": 10}]}]}),
        ("abc", {"anyOf": [{"type": "string", "minLength": 10, "pattern": "^x"},
                           {"type": "integer"}]}),
        ({"a": 3}, {"allOf": [
            {"type": "object", "properties": {"a": {"type": "integer", "minimum": 5}}},
            {"type": "object", "required": ["b"]},
        ]}),
    ],
)
def test_verbose_message_text_parity(doc, schema):
    """Verbose branch-detail messages (prefix chains included) match the
    reference character-for-character."""
    from json_schema.api import JsonValidator as RefValidator

    ours = JsonValidator(verbose=True).validate(doc, schema)
    ref = RefValidator(verbose=True).validate(doc, schema)
    assert sorted((e.code.name, e.message) for e in ours.errors) == sorted(
        (e.code.name, e.message) for e in ref.errors
    ), f"doc={doc} schema={schema}"


def test_verbose_branch_detail_matches_reference():
    """JsonValidator(verbose=True) reproduces the reference's branch-detail
    reporting: allOf branch errors re-emit with an 'allOf[i]: ' message
    prefix and pure codes (reference logical.py:98-103); a failed anyOf
    emits ANY_OF_NO_MATCH then per-branch 'anyOf[i]: ' details
    (logical.py:206-222). Nodes are pure logical ops (the reference
    suppresses sibling keywords at logical-op nodes)."""
    import re as _re
    import sys

    sys.path.insert(0, "/root/reference")
    from json_schema.api import JsonValidator as RefValidator

    from json_schema_py_spark.api import JsonValidator
    from tests.refadapt import adapt

    def prefix_of(e):
        m = _re.match(r"((?:(?:allOf|anyOf)\[\d+\]: )+)", e.message)
        return m.group(1) if m else ""

    cases = [
        (
            {"allOf": [
                {"type": "object", "properties": {"a": {"type": "integer", "minimum": 5}}},
                {"type": "object", "required": ["b"]},
            ]},
            {"a": 3},
        ),
        (
            {"anyOf": [{"type": "string"}, {"type": "integer", "minimum": 10}]},
            5,
        ),
        (  # nested: anyOf inside allOf — prefixes chain
            {"allOf": [
                {"anyOf": [{"type": "string"}, {"type": "integer", "minimum": 10}]},
            ]},
            5,
        ),
    ]
    for schema, doc in cases:
        ref = RefValidator(verbose=True).validate(doc, schema)
        eng = JsonValidator(verbose=True).validate(doc, schema)
        assert eng.valid == ref.valid == False  # noqa: E712
        assert len(eng.errors) == len(ref.errors), (
            f"schema={schema}\n"
            f"eng={[(e.code.name, e.message) for e in eng.errors]}\n"
            f"ref={[(e.code.name, e.message) for e in ref.errors]}"
        )
        for ee, re_ in zip(eng.errors, ref.errors):
            # prefix chain + pure code match exactly
            assert (prefix_of(ee), ee.code.name) == (prefix_of(re_), re_.code.name)
            # paths: the reference truncates branch-error paths to the op
            # node (documented deviation — engine keeps the deep pointer);
            # member-carrying codes recover the full path from the message
            # via the shared adapter, others assert prefix containment
            if re_.code.name in (
                "REQUIRED_PROPERTY_MISSING",
                "DEPENDENCY_MISSING",
                "ADDITIONAL_PROPERTY_NOT_ALLOWED",
                "ARRAY_ITEMS_NOT_UNIQUE",
            ):
                assert ee.path == adapt(re_)[1]
            else:
                assert ee.path.startswith(re_.path)


def test_verbose_multi_failure_branch_emits_all_errors():
    """A branch failing TWO constraints re-emits BOTH errors in the
    reference, not just the first: CombinedConstraint.validate runs every
    sub-constraint without short-circuiting (reference combined.py:38-43),
    and the break-at-first-failing path (logical.py:78-84) only triggers
    for a branch constraint carrying ``validation_order`` — which the
    compiler attaches ONLY to the root (schema_compiler.py:84-87), never to
    a branch, so it is unreachable with >1 effective constraints (probed:
    the root's order holds the single combined root constraint). Pins that
    this engine's re-emit-everything behavior is exact parity, not a
    superset (ADVICE r02)."""
    import re as _re
    import sys

    sys.path.insert(0, "/root/reference")
    from json_schema.api import JsonValidator as RefValidator

    from json_schema_py_spark.api import JsonValidator

    cases = [
        # two failing string keywords in one allOf branch
        ({"allOf": [{"type": "string", "minLength": 10, "pattern": "^x"}]}, "abc"),
        # two failing branches, each with two failing keywords, in anyOf
        (
            {"anyOf": [
                {"type": "string", "minLength": 10, "pattern": "^x"},
                {"type": "integer", "minimum": 100, "multipleOf": 7},
            ]},
            "abc",
        ),
        # $ref-to-definitions branch with two failures (resolved constraint
        # still has no validation_order: not the root)
        (
            {
                "anyOf": [{"$ref": "#/definitions/s"}, {"type": "integer"}],
                "definitions": {"s": {"type": "string", "minLength": 10, "pattern": "^x"}},
            },
            "abc",
        ),
    ]
    for schema, doc in cases:
        ref = RefValidator(verbose=True).validate(doc, schema)
        eng = JsonValidator(verbose=True).validate(doc, schema)
        def sig(errors):
            out = []
            for e in errors:
                m = _re.match(r"((?:(?:allOf|anyOf)\[\d+\]: )+)", e.message)
                out.append((m.group(1) if m else "", e.code.name))
            return out
        assert sig(eng.errors) == sig(ref.errors), (
            f"schema={schema}\n"
            f"eng={[(e.code.name, e.message) for e in eng.errors]}\n"
            f"ref={[(e.code.name, e.message) for e in ref.errors]}"
        )


def test_verbose_default_off_matches_round1_shape():
    """Without verbose, allOf codes stay unprefixed and anyOf emits only the
    single ANY_OF_NO_MATCH (round-1 behavior preserved)."""
    from json_schema_py_spark.api import JsonValidator

    r = JsonValidator().validate(
        5, {"anyOf": [{"type": "string"}, {"type": "integer", "minimum": 10}]}
    )
    assert [e.code.name for e in r.errors] == ["ANY_OF_NO_MATCH"]


def test_verbose_truncated_paths_bit_identical_to_reference():
    """truncate_branch_paths=True: verbose branch errors carry the
    reference's EXACT (code, path, prefix) — including the op-node path
    truncation the default mode deliberately improves on."""
    import re as _re
    import sys

    sys.path.insert(0, "/root/reference")
    from json_schema.api import JsonValidator as RefValidator

    from json_schema_py_spark.api import JsonValidator

    cases = [
        (
            {"allOf": [
                {"type": "object", "properties": {"a": {"type": "integer", "minimum": 5}}},
                {"type": "object", "required": ["b"]},
            ]},
            {"a": 3},
        ),
        (
            {"type": "object", "properties": {"o": {
                "anyOf": [{"type": "string"}, {"type": "integer", "minimum": 10}]
            }}},
            {"o": 5},
        ),
    ]
    for schema, doc in cases:
        ref = RefValidator(verbose=True).validate(doc, schema)
        eng = JsonValidator(verbose=True, truncate_branch_paths=True).validate(doc, schema)
        def sig(errors):
            out = []
            for e in errors:
                m = _re.match(r"((?:(?:allOf|anyOf)\[\d+\]: )+)", e.message)
                out.append((m.group(1) if m else "", e.code.name, e.path))
            return out
        assert sig(eng.errors) == sig(ref.errors), (
            f"eng={[(e.code.name, e.path, e.message) for e in eng.errors]}\n"
            f"ref={[(e.code.name, e.path, e.message) for e in ref.errors]}"
        )


def test_cli_variant_and_auto_modes(tmp_path, spark):
    import json as _json

    from json_schema_py_spark.cli import main

    schema_p = tmp_path / "s.json"
    schema_p.write_text(_json.dumps({
        "type": "object", "additionalProperties": {"type": "integer", "minimum": 50}}))
    data = spark.createDataFrame(
        [(1, '{"k": 99}'), (2, '{"k": 7}'), (3, '{"k": "oops"}')],
        "event_id long, props string",
    )
    src = str(tmp_path / "ev.parquet")
    data.write.parquet(src)
    for flag in ("--variant", "--auto"):
        out = str(tmp_path / f"viol{flag}")
        rc = main([src, str(schema_p), "--json-col", "props", "--key-col", "event_id",
                   flag, "--out", out])
        assert rc == 1
        rows = {r["doc_id"]: r["rule_id"] for r in spark.read.parquet(out).collect()}
        assert rows[2] == "NUMBER_TOO_SMALL"
        if flag == "--variant":  # per-value typing: the typed path would null this out
            assert rows[3] == "TYPE_ERROR"
