"""Property-based agreement between the two engine paths: the Column-
expression binder (production) and pyeval (parity evaluator) compile the
SAME Rule model — on typed rows they must emit identical violation
SEQUENCES (order-exact, the round-2 parity bar: pyeval emits in the
reference's fixed keyword order, and the Column binder's emitter sequence
mirrors it).

Null convention bridged explicitly: the Column engine treats NULL as ABSENT
(Parquet structs always carry every field); pyeval sees parsed JSON where
absence is key-missing. Rows are converted to dicts with null fields
dropped, exactly like the reference differential (test_differential.py)."""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

ROW_TYPE = T.StructType(
    [
        T.StructField("rk", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("o", T.StructType([
            T.StructField("p", T.StringType()),
            T.StructField("q", T.LongType()),
        ])),
    ]
)

rows = st.tuples(
    st.one_of(st.none(), st.text(alphabet="abx ", max_size=6)),
    st.one_of(st.none(), st.integers(-20, 20)),
    st.one_of(st.none(), st.floats(-20, 20, allow_nan=False)),
    st.one_of(st.none(), st.booleans()),
    st.one_of(st.none(), st.lists(st.one_of(st.none(), st.integers(-5, 5)), max_size=4)),
    st.one_of(
        st.none(),
        st.tuples(st.one_of(st.none(), st.sampled_from(["u", "vv"])),
                  st.one_of(st.none(), st.integers(-5, 5))),
    ),
)

prop_schemas = st.fixed_dictionaries(
    {},
    optional={
        "s": st.sampled_from([
            {"type": "string", "minLength": 2},
            {"maxLength": 3},
            {"pattern": "^a"},
            {"enum": ["ab", "x"]},
        ]),
        "n": st.sampled_from([
            {"type": "integer", "minimum": 0},
            {"maximum": 5, "exclusiveMaximum": True},
            {"multipleOf": 3},
            {"const": 7},
        ]),
        "x": st.sampled_from([
            {"type": "number", "minimum": -1.5},
            {"multipleOf": 0.5},
            {"type": "integer"},  # float is never integer
        ]),
        "b": st.sampled_from([{"type": "boolean"}, {"type": "number"}]),
        "arr": st.sampled_from([
            {"minItems": 1, "maxItems": 3},
            {"uniqueItems": True, "type": "array"},
            {"items": {"minimum": 0}},
        ]),
        "o": st.sampled_from([
            {"required": ["p"]},
            {"properties": {"q": {"minimum": 0}}, "minProperties": 1},
            {"anyOf": [{"required": ["p"]}, {"required": ["q"]}]},
        ]),
    },
)
schemas = st.builds(
    lambda props, req: {"type": "object", "properties": props, "required": req},
    prop_schemas,
    st.lists(st.sampled_from(["s", "n", "b"]), max_size=2, unique=True),
)


def _row_to_doc(row_dict: dict) -> dict:
    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items() if x is not None}
        return v

    return {k: clean(v) for k, v in row_dict.items() if v is not None}


@settings(max_examples=int(os.environ.get("FUZZ_EXAMPLES", "25")), deadline=None)
@given(batch=st.lists(rows, min_size=1, max_size=12), schema=schemas)
def test_column_engine_matches_pyeval(spark, batch, schema):
    from json_schema_py_spark.schema.compiler import validate
    from json_schema_py_spark.schema.model import normalize_schema
    from json_schema_py_spark.schema.pyeval import evaluate

    data = [(i, *r) for i, r in enumerate(batch)]
    df = spark.createDataFrame(data, ROW_TYPE)
    eng: dict[int, list] = {}
    for r in validate(df, schema, key_col="rk").collect():
        eng.setdefault(r["doc_id"], []).append((r["rule_id"], r["path"]))

    rule = normalize_schema(schema)
    for i, row in enumerate(df.collect()):
        doc = _row_to_doc(row.asDict(recursive=True))
        doc.pop("rk", None)
        expected = [(c, p) for c, p, _ in evaluate(rule, doc, "")]
        got = eng.get(i, [])
        assert got == expected, f"row={doc} schema={schema}"


MAP_ROW_TYPE = T.StructType(
    [
        T.StructField("rk", T.LongType()),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
    ]
)

map_rows = st.one_of(
    st.none(),
    st.dictionaries(
        # 'a/b' and 'x~y' exercise RFC-6901 runtime-key escaping; 'beta'
        # exercises the properties/patternProperties overlap
        st.sampled_from(["alpha", "beta", "Bad Key", "x1", "a/b", "x~y"]),
        st.one_of(st.none(), st.integers(-10, 10)),
        max_size=4,
    ),
)

map_schemas = st.builds(
    lambda keywords: {"type": "object", "properties": {"m": {"type": "object", **keywords}}},
    st.fixed_dictionaries(
        {},
        optional={
            "minProperties": st.integers(0, 3),
            "maxProperties": st.integers(1, 3),
            "required": st.lists(st.sampled_from(["alpha", "beta"]), max_size=2, unique=True),
            "propertyNames": st.just({"pattern": "^[a-z]+$"}),
            "properties": st.sampled_from([
                {"alpha": {"minimum": 0}},
                # overlaps patternProperties '^b': pattern must NOT re-apply
                {"beta": {"minimum": 8}},
            ]),
            "patternProperties": st.just({"^b": {"maximum": 5}}),
            "additionalProperties": st.sampled_from([False, {"type": "integer", "minimum": -5}]),
            "dependencies": st.just({"alpha": ["beta"]}),
        },
    ),
)


@settings(max_examples=int(os.environ.get("FUZZ_EXAMPLES", "25")), deadline=None)
@given(batch=st.lists(map_rows, min_size=1, max_size=10), schema=map_schemas)
def test_map_engine_matches_pyeval(spark, batch, schema):
    """Open-keyed objects (MapType) — runtime key machinery vs pyeval.
    Map VALUES keep JSON null semantics (present null), so only null MAPS
    are dropped in the doc conversion.

    Maps are built via from_json (document key order preserved — the
    production ingestion path) rather than createDataFrame, whose py4j dict
    conversion goes through a Java HashMap and scrambles key order; engine
    emission order follows the STORED map order by design."""
    import json as _json

    from pyspark.sql import functions as F

    from json_schema_py_spark.schema.compiler import validate
    from json_schema_py_spark.schema.model import normalize_schema
    from json_schema_py_spark.schema.pyeval import evaluate

    data = [(i, None if m is None else _json.dumps(m)) for i, m in enumerate(batch)]
    df = spark.createDataFrame(data, "rk long, mj string").select(
        "rk", F.from_json("mj", "map<string,bigint>").alias("m")
    )
    eng: dict[int, list] = {}
    for r in validate(df, schema, key_col="rk").collect():
        eng.setdefault(r["doc_id"], []).append((r["rule_id"], r["path"]))

    rule = normalize_schema(schema)
    for i, m in enumerate(batch):
        doc = {} if m is None else {"m": m}
        expected = [(c, p) for c, p, _ in evaluate(rule, doc, "")]
        got = eng.get(i, [])
        assert got == expected, f"map={m} schema={schema}"
