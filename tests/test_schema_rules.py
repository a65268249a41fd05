"""Unit tests for the rule compiler, pinning the reference's exact semantics
(file:line citations per case; the reference's own tests are the model —
SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_py_spark.schema.compiler import validate, with_violations
from json_schema_py_spark.schema.model import SchemaCompileError, normalize_schema


def _codes(df):
    return sorted((r["rule_id"], r["path"]) for r in df.collect())


# ----------------------------------------------------------- types


def test_bool_is_not_number(spark):
    # reference: json_schema/utils.py:186-191; tests/basic_validation_test.py:91-132
    df = spark.createDataFrame([(1, True)], "doc_id long, b boolean")
    out = validate(df, {"properties": {"b": {"type": "number"}}})
    assert _codes(out) == [("TYPE_ERROR", "/b")]


def test_integer_is_number(spark):
    # reference: json_schema/utils.py:137-139
    df = spark.createDataFrame([(1, 5)], "doc_id long, n long")
    assert validate(df, {"properties": {"n": {"type": "number"}}}).count() == 0


def test_float_is_not_integer(spark):
    # reference: tests/number_validation_test.py:104-109
    df = spark.createDataFrame([(1, 2.0)], "doc_id long, x double")
    out = validate(df, {"properties": {"x": {"type": "integer"}}})
    assert _codes(out) == [("TYPE_ERROR", "/x")]


def test_null_is_absent_skips_checks(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, s string")
    assert validate(df, {"properties": {"s": {"minLength": 3}}}).count() == 0


# ----------------------------------------------------------- strings


def test_string_bounds_and_pattern_search_semantics(spark):
    # pattern uses re.search (substring), NOT fullmatch
    # reference: json_schema/constraints/strings.py:93
    df = spark.createDataFrame(
        [(1, "ab"), (2, "x" * 9), (3, "has cat inside"), (4, "no feline")],
        "doc_id long, s string",
    )
    schema = {"properties": {"s": {"minLength": 3, "maxLength": 8, "pattern": "cat"}}}
    out = {(r["doc_id"], r["rule_id"]) for r in validate(df, schema).collect()}
    assert out == {
        (1, "STRING_TOO_SHORT"),
        (1, "PATTERN_MISMATCH"),
        (2, "STRING_TOO_LONG"),
        (2, "PATTERN_MISMATCH"),
        (3, "STRING_TOO_LONG"),  # "has cat inside" is 14 chars but matches /cat/
        (4, "STRING_TOO_LONG"),
        (4, "PATTERN_MISMATCH"),
    }


def test_invalid_regex_is_schema_invalid_lazily(spark):
    # reference: json_schema/constraints/strings.py:81-91
    df = spark.createDataFrame([(1, "x")], "doc_id long, s string")
    out = validate(df, {"properties": {"s": {"pattern": "[bad"}}})
    assert _codes(out) == [("SCHEMA_INVALID", "/s")]


# ----------------------------------------------------------- numbers


def test_draft04_exclusive_bounds(spark):
    # reference: json_schema/constraints/numbers.py:59-94, draft-04 booleans
    df = spark.createDataFrame([(1, 5.0), (2, 10.0)], "doc_id long, x double")
    incl = {"properties": {"x": {"minimum": 5, "maximum": 10}}}
    excl = {
        "properties": {
            "x": {
                "minimum": 5,
                "maximum": 10,
                "exclusiveMinimum": True,
                "exclusiveMaximum": True,
            }
        }
    }
    assert validate(df, incl).count() == 0
    out = {(r["doc_id"], r["rule_id"]) for r in validate(df, excl).collect()}
    assert out == {(1, "NUMBER_TOO_SMALL"), (2, "NUMBER_TOO_LARGE")}


def test_multiple_of_float_tolerance(spark):
    # 0.3 passes multipleOf 0.1 (within 1e-10), 0.37 fails
    # reference: json_schema/constraints/numbers.py:97-113;
    # tests/number_validation_test.py:111-132
    df = spark.createDataFrame([(1, 0.3), (2, 0.37), (3, -0.2)], "doc_id long, x double")
    out = validate(df, {"properties": {"x": {"multipleOf": 0.1}}})
    assert {(r["doc_id"], r["rule_id"]) for r in out.collect()} == {
        (2, "NUMBER_NOT_MULTIPLE")
    }


def test_multiple_of_integer(spark):
    df = spark.createDataFrame([(1, 9), (2, 10), (3, -6)], "doc_id long, n long")
    out = validate(df, {"properties": {"n": {"multipleOf": 3}}})
    assert {(r["doc_id"], r["rule_id"]) for r in out.collect()} == {
        (2, "NUMBER_NOT_MULTIPLE")
    }


# ----------------------------------------------------------- enum / const


def test_enum_and_const(spark):
    # Python == semantics: 1 == 1.0 (reference: json_schema/constraints/enums.py:36-39)
    df = spark.createDataFrame([(1, "red", 1.0), (2, "pink", 2.5)], "doc_id long, c string, n double")
    schema = {
        "properties": {"c": {"enum": ["red", "green"]}, "n": {"enum": [1, 2]}}
    }
    out = {(r["doc_id"], r["rule_id"], r["path"]) for r in validate(df, schema).collect()}
    assert out == {(2, "ENUM_MISMATCH", "/c"), (2, "ENUM_MISMATCH", "/n")}
    cdf = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, s string")
    cout = validate(cdf, {"properties": {"s": {"const": "a"}}})
    assert _codes(cout) == [("CONST_MISMATCH", "/s")]


def test_composite_const_and_enum(spark):
    """const/enum with OBJECT or ARRAY values compile on the Column path
    (ADVICE r01: F.lit(dict) used to raise UNSUPPORTED_FEATURE.LITERAL_TYPE)
    and agree with the pure-Python evaluator."""
    from json_schema_py_spark.schema.model import normalize_schema as _norm
    from json_schema_py_spark.schema.pyeval import evaluate

    df = spark.createDataFrame(
        [(1, (2, "x")), (2, (3, "x")), (3, None)],
        "doc_id long, o struct<a:long,b:string>",
    )
    schema = {"properties": {"o": {"const": {"a": 2, "b": "x"}}}}
    out = _codes(validate(df, schema))
    assert out == [("CONST_MISMATCH", "/o")]
    # pyeval agreement (presence semantics: null = absent, skipped)
    rule = _norm(schema)
    assert evaluate(rule, {"o": {"a": 2, "b": "x"}}, "") == []
    assert [e[0] for e in evaluate(rule, {"o": {"a": 3, "b": "x"}}, "")] == [
        "CONST_MISMATCH"
    ]

    # array-valued const; field-order robustness for enum objects
    adf = spark.createDataFrame([(1, [1, 2]), (2, [2, 1])], "doc_id long, a array<long>")
    aout = validate(adf, {"properties": {"a": {"const": [1, 2]}}})
    assert [(r["doc_id"], r["rule_id"]) for r in aout.collect()] == [
        (2, "CONST_MISMATCH")
    ]
    # enum value keys written in NON-schema order still match (renderer
    # follows the struct's field order, as to_json does)
    edf = spark.createDataFrame([(1, (2, "x"))], "doc_id long, o struct<a:long,b:string>")
    assert (
        validate(edf, {"properties": {"o": {"enum": [{"b": "x", "a": 2}]}}}).count()
        == 0
    )
    # a const the column type cannot represent always mismatches when present
    assert _codes(
        validate(edf, {"properties": {"o": {"const": {"zz": 1}}}})
    ) == [("CONST_MISMATCH", "/o")]


def test_composite_enum_double_scientific_rendering(spark):
    """Doubles outside Java's plain-decimal window [1e-3, 1e7) inside a
    composite enum/const: to_json renders them Jackson-style ('1.0E-4'),
    so the literal side must too — Python repr ('0.0001') would make a
    VALID document mismatch forever (ADVICE r02, fixed in
    _to_json_literal)."""
    df = spark.createDataFrame(
        [(1, (0.0001,)), (2, (1e30,)), (3, (0.5,)), (4, (0.25,))],
        "doc_id long, o struct<rate:double>",
    )
    schema = {
        "properties": {"o": {"enum": [{"rate": 0.0001}, {"rate": 1e30}, {"rate": 0.5}]}}
    }
    out = _codes(validate(df, schema))
    # docs 1-3 are valid members; only doc 4 mismatches
    assert out == [("ENUM_MISMATCH", "/o")]
    got = {(r["doc_id"], r["rule_id"]) for r in validate(df, schema).collect()}
    assert got == {(4, "ENUM_MISMATCH")}
    # const form, inside an array element (exercises the ArrayType branch)
    adf = spark.createDataFrame(
        [(1, [0.0001]), (2, [0.0002])], "doc_id long, a array<double>"
    )
    aout = validate(adf, {"properties": {"a": {"const": [0.0001]}}})
    assert [(r["doc_id"], r["rule_id"]) for r in aout.collect()] == [
        (2, "CONST_MISMATCH")
    ]
    # HIGH-PRECISION mantissas (review r03: the old renderer truncated to 7
    # significant digits, so these could never match to_json's rendering)
    hp = spark.createDataFrame(
        [(1, (12345678.9,)), (2, (1.23456789e30,)), (3, (123456789.123456,)),
         (4, (3.141592653589793e20,)), (5, (0.5,))],
        "doc_id long, o struct<rate:double>",
    )
    hschema = {"properties": {"o": {"enum": [
        {"rate": 12345678.9}, {"rate": 1.23456789e30},
        {"rate": 123456789.123456}, {"rate": 3.141592653589793e20},
    ]}}}
    got2 = {(r["doc_id"], r["rule_id"]) for r in validate(hp, hschema).collect()}
    assert got2 == {(5, "ENUM_MISMATCH")}


# ----------------------------------------------------------- arrays


def test_array_bounds_items_unique(spark):
    df = spark.createDataFrame(
        [(1, []), (2, [1, 2, 3, 4]), (3, [1, -2]), (4, [7, 8, 7])],
        "doc_id long, a array<long>",
    )
    schema = {
        "properties": {
            "a": {
                "minItems": 1,
                "maxItems": 3,
                "uniqueItems": True,
                "items": {"minimum": 0},
            }
        }
    }
    out = {(r["doc_id"], r["rule_id"], r["path"]) for r in validate(df, schema).collect()}
    assert out == {
        (1, "ARRAY_TOO_SHORT", "/a"),
        (2, "ARRAY_TOO_LONG", "/a"),
        (3, "NUMBER_TOO_SMALL", "/a/1"),
        (4, "ARRAY_ITEMS_NOT_UNIQUE", "/a/2"),
    }


def test_nested_arrays(spark):
    df = spark.createDataFrame([(1, [["ok"], ["", "x"]])], "doc_id long, a array<array<string>>")
    schema = {"properties": {"a": {"items": {"items": {"minLength": 1}}}}}
    assert _codes(validate(df, schema)) == [("STRING_TOO_SHORT", "/a/1/0")]


# ----------------------------------------------------------- objects


def test_required_and_dependencies(spark):
    # reference: json_schema/constraints/objects.py:94-116
    df = spark.createDataFrame(
        [(1, "x", None, None), (2, None, "cc", None)],
        "doc_id long, name string, card string, addr string",
    )
    schema = {
        "required": ["name"],
        "dependencies": {"card": ["addr"]},
        "properties": {"name": {"type": "string"}},
    }
    out = {(r["doc_id"], r["rule_id"], r["path"]) for r in validate(df, schema).collect()}
    assert out == {
        (2, "REQUIRED_PROPERTY_MISSING", "/name"),
        (2, "DEPENDENCY_MISSING", "/addr"),
    }


def test_min_max_properties_struct(spark):
    df = spark.createDataFrame(
        [(1, ("a", None, None)), (2, ("a", "b", "c"))],
        "doc_id long, o struct<x:string,y:string,z:string>",
    )
    schema = {"properties": {"o": {"minProperties": 2, "maxProperties": 2}}}
    out = {(r["doc_id"], r["rule_id"]) for r in validate(df, schema).collect()}
    assert out == {(1, "OBJECT_TOO_FEW_PROPERTIES"), (2, "OBJECT_TOO_MANY_PROPERTIES")}


def test_map_object_keywords(spark):
    df = spark.createDataFrame(
        [(1, {"alpha": 5, "Bad": -1})], "doc_id long, m map<string,long>"
    )
    schema = {
        "properties": {
            "m": {
                "propertyNames": {"pattern": "^[a-z]+$"},
                "patternProperties": {"^a": {"minimum": 10}},
                "additionalProperties": {"minimum": 0},
            }
        }
    }
    out = {(r["rule_id"], r["path"]) for r in validate(df, schema).collect()}
    # propertyNames surfaces the UNDERLYING code at the key's path (reference
    # behavior: a bad key fails its pattern check, no dedicated code)
    assert out == {
        ("PATTERN_MISMATCH", "/m/Bad"),
        ("NUMBER_TOO_SMALL", "/m/alpha"),
        ("NUMBER_TOO_SMALL", "/m/Bad"),
    }


def test_additional_properties_false_struct(spark):
    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, known string, extra string")
    schema = {
        "properties": {"known": {"type": "string"}, "doc_id": {}},
        "additionalProperties": False,
    }
    assert _codes(validate(df, schema)) == [("ADDITIONAL_PROPERTY_NOT_ALLOWED", "/extra")]


# ----------------------------------------------------------- logical


def test_any_of_silent_success_and_failure(spark):
    # reference: json_schema/constraints/logical.py:187-192
    df = spark.createDataFrame([(1, 5), (2, 200)], "doc_id long, n long")
    schema = {"properties": {"n": {"anyOf": [{"maximum": 10}, {"minimum": 100, "maximum": 150}]}}}
    out = {(r["doc_id"], r["rule_id"]) for r in validate(df, schema).collect()}
    assert out == {(2, "ANY_OF_NO_MATCH")}


def test_one_of_counting(spark):
    # integer matches both number and integer branches → TWO errors
    # reference: json_schema/constraints/logical.py:319-363;
    # tests/logical_validation_test.py:182-207
    df = spark.createDataFrame([(1, 5)], "doc_id long, n long")
    multi = validate(df, {"properties": {"n": {"oneOf": [{"type": "number"}, {"type": "integer"}]}}})
    rows = multi.collect()
    assert len(rows) == 2 and all(r["rule_id"] == "ONE_OF_MULTIPLE_MATCHES" for r in rows)
    none = validate(df, {"properties": {"n": {"oneOf": [{"minimum": 10}, {"maximum": 0}]}}})
    assert _codes(none) == [("ONE_OF_NO_MATCH", "/n")]


def test_all_of_accumulates(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, s string")
    schema = {"properties": {"s": {"allOf": [{"maxLength": 5}, {"pattern": "^z"}]}}}
    out = {r["rule_id"] for r in validate(df, schema).collect()}
    assert out == {"STRING_TOO_LONG", "PATTERN_MISMATCH"}


def test_not(spark):
    # reference: json_schema/constraints/logical.py:377-462
    df = spark.createDataFrame([(1, "abc"), (2, "zz")], "doc_id long, s string")
    out = validate(df, {"properties": {"s": {"not": {"pattern": "^a"}}}})
    assert {(r["doc_id"], r["rule_id"]) for r in out.collect()} == {(1, "NOT_SCHEMA_MATCHED")}


# ----------------------------------------------------------- $ref


def test_local_ref_and_circular(spark):
    # reference: json_schema/schema_compiler.py:553-607 (+ circular cache
    # 563-567, tests/reference_validation_test.py:144-178)
    df = spark.createDataFrame([(1, ("bob", -3))], "doc_id long, p struct<name:string,age:long>")
    schema = {
        "definitions": {"person": {"properties": {"age": {"minimum": 0}}}},
        "properties": {"p": {"$ref": "#/definitions/person"}},
    }
    assert _codes(validate(df, schema)) == [("NUMBER_TOO_SMALL", "/p/age")]
    circular = {
        "definitions": {"node": {"properties": {"next": {"$ref": "#/definitions/node"}}}},
        "properties": {"p": {"$ref": "#/definitions/node"}},
    }
    assert validate(df, circular).count() == 0  # terminates, bounded unroll


def test_external_ref_rejected():
    with pytest.raises(SchemaCompileError):
        normalize_schema({"$ref": "http://x/y.json"})


# ----------------------------------------------------------- inferred types


def test_inferred_type_is_enforced(spark):
    # schema without 'type' but with minLength infers string AND ENFORCES it
    # (reference deviation: json_schema/schema_compiler.py:786-846)
    df = spark.createDataFrame([(1, 7)], "doc_id long, v long")
    out = validate(df, {"properties": {"v": {"minLength": 3}}})
    assert _codes(out) == [("TYPE_ERROR", "/v")]


def test_with_violations_valid_flag(spark):
    df = spark.createDataFrame([(1, "ok"), (2, "")], "doc_id long, s string")
    out = with_violations(df, {"properties": {"s": {"minLength": 1}}})
    flags = {r["doc_id"]: r["valid"] for r in out.collect()}
    assert flags == {1: True, 2: False}
    assert out.schema["violations"].dataType.simpleString().startswith("array<struct")


def test_invalid_pattern_properties_regex_emits_schema_invalid(spark):
    """A Python-invalid patternProperties regex emits SCHEMA_INVALID at the
    OBJECT's path, once per invalid pattern per validated object (reference
    objects.py:147-152) — silently skipping was a round-3 parity find.
    Pinned on both the struct and map Column paths and in pyeval."""
    from json_schema_py_spark.schema.model import normalize_schema as _norm
    from json_schema_py_spark.schema.pyeval import evaluate

    schema = {"patternProperties": {"[": {"type": "integer"}}}
    # struct path
    sdf = spark.createDataFrame([(1, (2,)), (2, None)], "doc_id long, o struct<a:long>")
    out = [
        (r["doc_id"], r["rule_id"], r["path"], r["observed"])
        for r in validate(sdf, {"properties": {"o": schema}}).collect()
    ]
    assert out == [(1, "SCHEMA_INVALID", "/o", "[")]  # absent object: skipped
    # map path
    mdf = spark.createDataFrame(
        [(1, {"a": 1}), (2, {})], "doc_id long, o map<string,long>"
    )
    mout = {
        (r["doc_id"], r["rule_id"], r["path"], r["observed"])
        for r in validate(mdf, {"properties": {"o": schema}}).collect()
    }
    # reference emits even for an EMPTY object (probed)
    assert mout == {
        (1, "SCHEMA_INVALID", "/o", "["),
        (2, "SCHEMA_INVALID", "/o", "["),
    }
    # pyeval agreement, message included
    errs = evaluate(_norm(schema), {"a": 1}, "")
    assert [(e[0], e[1], e[2]) for e in errs] == [("SCHEMA_INVALID", "", "[")]
    assert "Invalid regex pattern '['" in errs[0].msg


def test_regex_dialect_warning(spark):
    """Python-only regex constructs are flagged at compile time (the Column
    engine runs Java rlike; the exact pandas path runs CPython re)."""
    import warnings

    from json_schema_py_spark.schema.regex_dialect import RegexDialectWarning

    df = spark.createDataFrame([(1, "abx"), (2, "zz")], "doc_id long, s string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = validate(df, {"properties": {"s": {"pattern": "(?P<name>ab)"}}}).collect()
    assert any(issubclass(x.category, RegexDialectWarning) for x in w)
    # named group auto-translated to Java spelling: semantics preserved
    assert {(r["doc_id"], r["rule_id"]) for r in out} == {(2, "PATTERN_MISMATCH")}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        validate(df, {"properties": {"s": {"pattern": "^doc-[0-9]+$"}}}).count()
    assert not any(issubclass(x.category, RegexDialectWarning) for x in w)


def test_verbose_column_path_matches_pyeval(spark):
    """validate(..., verbose=True): the Column engine emits the same
    prefixed-rule_id branch detail SEQUENCE as pyeval verbose — allOf[i]:
    prefixes, anyOf[i]: details after ANY_OF_NO_MATCH, chained when nested."""
    from json_schema_py_spark.schema.pyeval import evaluate

    schema = {
        "properties": {
            "v": {
                "allOf": [
                    {"anyOf": [{"minimum": 10}, {"multipleOf": 7}]},
                    {"maximum": 100},
                ]
            }
        }
    }
    df = spark.createDataFrame([(1, 5), (2, 14), (3, 300), (4, 70)], "doc_id long, v long")
    got: dict[int, list] = {}
    for r in validate(df, schema, verbose=True).collect():
        got.setdefault(r["doc_id"], []).append((r["rule_id"], r["path"]))
    rule = normalize_schema(schema)
    for i, v in [(1, 5), (2, 14), (3, 300), (4, 70)]:
        expected = [(c, p) for c, p, _ in evaluate(rule, {"v": v}, "", True)]
        assert got.get(i, []) == expected, f"v={v}"
    # doc 1 exercises the full chain: anyOf no-match inside allOf[0]
    assert got[1] == [
        ("allOf[0]:ANY_OF_NO_MATCH", "/v"),
        ("allOf[0]:anyOf[0]:NUMBER_TOO_SMALL", "/v"),
        ("allOf[0]:anyOf[1]:NUMBER_NOT_MULTIPLE", "/v"),
    ]


def test_map_pattern_properties_exclude_static_and_escape_keys(spark):
    """Review findings r02: (a) patternProperties must NOT re-apply to keys
    matched by static `properties` (pyeval/reference: `if k not in
    rule.properties`); (b) runtime keys escape per RFC-6901 in pointers;
    (c) Python-only named-group patterns translate to the Java dialect
    instead of crashing rlike."""
    import json as _json

    df = spark.createDataFrame(
        [(1, _json.dumps({"beta": 7, "a/b": 1, "x~y": 2}))], "doc_id long, mj string"
    ).select("doc_id", F.from_json("mj", "map<string,bigint>").alias("m"))

    # (a) beta satisfies properties (>=5) and must NOT be re-checked by ^b (<=3)
    schema = {
        "properties": {
            "m": {
                "type": "object",
                "properties": {"beta": {"minimum": 5}},
                "patternProperties": {"^b": {"maximum": 3}},
                "additionalProperties": {"maximum": 1},
            }
        }
    }
    out = {(r["rule_id"], r["path"]) for r in validate(df, schema).collect()}
    # beta: clean (properties only); a/b: ok (<=1); x~y: 2 > 1 with escaped path
    assert out == {("NUMBER_TOO_LARGE", "/m/x~0y")}

    # (b) '/' in a key escapes as ~1
    schema2 = {"properties": {"m": {"type": "object", "additionalProperties": {"minimum": 5}}}}
    out2 = {(r["rule_id"], r["path"]) for r in validate(df, schema2).collect()}
    assert ("NUMBER_TOO_SMALL", "/m/a~1b") in out2
    assert ("NUMBER_TOO_SMALL", "/m/x~0y") in out2

    # (c) Python named group in patternProperties: translated, not crashed
    schema3 = {
        "properties": {
            "m": {"type": "object", "patternProperties": {"(?P<g>^a)": {"minimum": 9}}}
        }
    }
    out3 = {(r["rule_id"], r["path"]) for r in validate(df, schema3).collect()}
    assert out3 == {("NUMBER_TOO_SMALL", "/m/a~1b")}


def test_compile_bind_forms_identical_and_autoselected(spark):
    """Round-7: the whole-stage-codegen (bind_row=False) and row-bound
    (True) ruleset forms must be value-identical, and with_violations must
    pick the codegen form only for plain relation scans."""
    from pyspark.sql import functions as F

    from json_schema_py_spark.schema.compiler import (
        _is_plain_relation,
        compile_ruleset,
        with_violations,
    )
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, spans_documents

    sd = spans_documents(spark, "/root/testdata/sf0.001")
    a = sd.withColumn("v", compile_ruleset(DOCUMENTS_RULESET, sd.schema, bind_row=True))
    b = sd.withColumn("v", compile_ruleset(DOCUMENTS_RULESET, sd.schema, bind_row=False))
    sa = a.select("doc_id", F.explode("v").alias("x")).select("doc_id", "x.*")
    sb = b.select("doc_id", F.explode("v").alias("x")).select("doc_id", "x.*")
    assert sa.exceptAll(sb).count() == 0 and sb.exceptAll(sa).count() == 0
    assert sa.count() > 0
    # plan-shape autoselection
    plain = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert _is_plain_relation(plain)
    assert not _is_plain_relation(sd)
    assert not _is_plain_relation(plain.withColumn("x", F.lit(1)))
