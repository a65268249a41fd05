"""Bind a normalized Rule tree to a Spark schema → Column violation expressions.

The engine's physical layer. Where the reference walks each document with a
per-row recursive CPython interpreter (reference: json_schema/validator.py:31-108),
this binder emits ONE nested ``pyspark.sql.Column`` expression per ruleset that
evaluates every constraint for a row and returns
``array<struct<rule_id:string, path:string, observed:string>>`` — empty when
the row is valid. Everything stays inside whole-stage codegen: higher-order
array functions (transform/filter/exists/flatten) express nested-array
validation with zero shuffles and zero Python in the executor path.

Presence convention: a NULL value is an ABSENT property (Parquet/Iceberg
structs always carry every field). ``required`` = IS NOT NULL; all other
checks skip null values — mirroring the reference, which only validates keys
that are present (reference: json_schema/constraints/objects.py:132-140).

Violation paths are RFC-6901 JSON Pointers built with string concat over
``transform`` indices (reference pointer machinery: json_schema/utils.py:8-119).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_py_spark.errors import ErrorCode
from json_schema_py_spark.schema.model import Rule, normalize_schema

VIOLATION_STRUCT = T.StructType(
    [
        T.StructField("rule_id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("observed", T.StringType()),
    ]
)
VIOLATION_TYPE = T.ArrayType(VIOLATION_STRUCT)

# (value_col, path_col) -> array<violation> column
Binder = Callable[[Column, Column], Column]

FLOAT_TOLERANCE = 1e-10  # reference: json_schema/constraints/numbers.py:97-113


def _empty() -> Column:
    return F.array().cast(VIOLATION_TYPE)


def _viol(code: str, path: Column, observed: Column) -> Column:
    return F.struct(
        F.lit(code).alias("rule_id"),
        path.alias("path"),
        observed.cast("string").alias("observed"),
    )


def _maybe(cond: Column, code: str, path: Column, observed: Column) -> Column:
    """A nullable violation struct: the struct when cond else NULL."""
    return F.when(cond, _viol(code, path, observed))


def _collect(maybes: list[Column], child_arrays: list[Column]) -> Column:
    """Fuse nullable violation structs + child violation arrays into one array."""
    arrs: list[Column] = []
    if maybes:
        arrs.append(
            F.filter(
                F.array(*maybes).cast(VIOLATION_TYPE), lambda x: x.isNotNull()
            )
        )
    arrs.extend(child_arrays)
    if not arrs:
        return _empty()
    return arrs[0] if len(arrs) == 1 else F.concat(*arrs)


def json_type_of(dtype: T.DataType) -> str:
    """Spark static type → JSON type name (reference: json_schema/utils.py:126-134,174-201).

    bool is NOT a number/integer; integer IS a number — both enforced at the
    type-dispatch below (reference: json_schema/utils.py:137-139,186-191)."""
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "number"
    if isinstance(dtype, T.ArrayType):
        return "array"
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dtype, T.NullType):
        return "null"
    if isinstance(dtype, (T.DateType, T.TimestampType)):
        return "string"  # engine extension: temporal columns validate as strings
    return "string"


def _type_matches(json_type: str, allowed: list[str]) -> bool:
    if json_type in allowed:
        return True
    # one-way hierarchy: integer ⊆ number (reference: json_schema/utils.py:137-139)
    if json_type == "integer" and "number" in allowed:
        return True
    return False


def py_str(col: Column, dtype: T.DataType) -> Column:
    """Stringify an observed value, approximating Python str() rendering
    (reference stringifies observed values via str(); SURVEY.md §7 notes the
    exact-parity caveats — booleans and composites are the cases that differ,
    handled here; float scientific-notation corners are documented deviations)."""
    if isinstance(dtype, T.BooleanType):
        return F.when(col, F.lit("True")).otherwise(F.lit("False"))
    if isinstance(dtype, (T.ArrayType, T.StructType, T.MapType)):
        return F.to_json(col)
    if isinstance(dtype, (T.DateType, T.TimestampType)):
        return col.cast("string")
    return col.cast("string")


def _escape_pointer_token(key: str) -> str:
    """RFC-6901 escaping (reference: json_schema/utils.py:8-119)."""
    return key.replace("~", "~0").replace("/", "~1")


def _child_path(path: Column, key: str) -> Column:
    return F.concat(path, F.lit("/" + _escape_pointer_token(key)))


def _index_path(path: Column, idx: Column) -> Column:
    return F.concat(path, F.lit("/"), idx.cast("string"))


def _py_regex_search(pattern: str, s: str) -> bool:
    try:
        return re.search(pattern, s) is not None
    except re.error:
        return False


def _py_string_rule_ok(rule: Rule, s: str) -> bool:
    """Driver-side evaluation of a string-only rule against a static key name
    (used for propertyNames over StructType, whose keys are compile-time
    constants). reference: json_schema/constraints/objects.py:118-123."""
    if rule.types is not None and "string" not in rule.types:
        return False
    if rule.min_length is not None and len(s) < rule.min_length:
        return False
    if rule.max_length is not None and len(s) > rule.max_length:
        return False
    if rule.pattern is not None and not _py_regex_search(rule.pattern, s):
        return False
    if rule.enum is not None and s not in rule.enum:
        return False
    if rule.const_set and s != rule.const:
        return False
    return True


def _enum_compatible(dtype: T.DataType, values: list[Any]) -> list[Any]:
    """Enum values comparable with the column's static type under Python ==
    semantics (1 == True, 1 == 1.0 — reference: json_schema/constraints/enums.py:36-39).
    Typed columns sidestep most cross-type traps; booleans map onto numeric
    truth values for numeric columns, and vice versa."""
    jt = json_type_of(dtype)
    out: list[Any] = []
    for v in values:
        if jt == "string" and isinstance(v, str):
            out.append(v)
        elif jt == "boolean" and isinstance(v, (bool, int, float)) and v in (0, 1):
            out.append(bool(v))
        elif jt in ("integer", "number") and isinstance(v, (bool, int, float)):
            out.append(float(v) if jt == "number" else v)
        elif jt == "array" and isinstance(v, list):
            out.append(v)
        elif jt == "object" and isinstance(v, dict):
            out.append(v)
    return out


class RuleBinder:
    """Compiles a Rule tree against a Spark DataType into a Binder closure."""

    def bind(self, rule: Rule, dtype: T.DataType) -> Binder:
        jt = json_type_of(dtype)

        # --- type gate: static mismatch short-circuits everything, exactly as
        # the reference's type gate skips type-specific checks
        # (reference: json_schema/constraints/base.py:284-289) ---
        if rule.types is not None and not _type_matches(jt, rule.types):
            if jt == "null":
                # NullType column: every value is null == absent; nothing fires
                return lambda col, path: _empty()

            def type_error(col: Column, path: Column) -> Column:
                return _collect(
                    [_maybe(col.isNotNull(), ErrorCode.TYPE_ERROR.value, path, py_str(col, dtype))],
                    [],
                )

            return type_error

        checks: list[Callable[[Column, Column], Optional[Column]]] = []
        children: list[Callable[[Column, Column], Column]] = []

        # --- enum / const ---
        if rule.enum is not None:
            vals = _enum_compatible(dtype, rule.enum)
            if isinstance(dtype, (T.ArrayType, T.StructType, T.MapType)):
                # composite enum: compare via canonical JSON (engine deviation;
                # reference uses Python == — semantics equal for typed data)
                import json as _json

                jvals = [_json.dumps(v, separators=(",", ":"), sort_keys=True) for v in vals]
                checks.append(
                    lambda col, path, jvals=jvals, dt=dtype: _maybe(
                        ~F.to_json(col).isin(jvals) if jvals else F.lit(True),
                        ErrorCode.ENUM_MISMATCH.value,
                        path,
                        py_str(col, dt),
                    )
                )
            else:
                checks.append(
                    lambda col, path, vals=vals, dt=dtype: _maybe(
                        ~col.isin(vals) if vals else F.lit(True),
                        ErrorCode.ENUM_MISMATCH.value,
                        path,
                        py_str(col, dt),
                    )
                )
        if rule.const_set:
            cvals = _enum_compatible(dtype, [rule.const])
            checks.append(
                lambda col, path, cvals=cvals, dt=dtype: _maybe(
                    (col != F.lit(cvals[0])) if cvals else F.lit(True),
                    ErrorCode.CONST_MISMATCH.value,
                    path,
                    py_str(col, dt),
                )
            )

        # --- scalar: string (reference: json_schema/constraints/strings.py:12-118) ---
        if jt == "string":
            if rule.min_length is not None:
                checks.append(
                    lambda col, path, n=rule.min_length: _maybe(
                        F.length(col) < n, ErrorCode.STRING_TOO_SHORT.value, path, col
                    )
                )
            if rule.max_length is not None:
                checks.append(
                    lambda col, path, n=rule.max_length: _maybe(
                        F.length(col) > n, ErrorCode.STRING_TOO_LONG.value, path, col
                    )
                )
            if rule.pattern is not None:
                try:
                    re.compile(rule.pattern)
                    ok = True
                except re.error:
                    ok = False
                if ok:
                    # rlike is search-anchored like re.search
                    # (reference: json_schema/constraints/strings.py:93)
                    checks.append(
                        lambda col, path, p=rule.pattern: _maybe(
                            ~col.rlike(p), ErrorCode.PATTERN_MISMATCH.value, path, col
                        )
                    )
                else:
                    # invalid regex: lazily detected, every validated value flags
                    # SCHEMA_INVALID (reference: json_schema/constraints/strings.py:81-91)
                    checks.append(
                        lambda col, path: _maybe(
                            F.lit(True), ErrorCode.SCHEMA_INVALID.value, path, col
                        )
                    )

        # --- scalar: number (reference: json_schema/constraints/numbers.py:11-137) ---
        if jt in ("integer", "number"):
            num = lambda c: c.cast("double")  # noqa: E731
            if rule.minimum is not None:
                if rule.exclusive_minimum:  # draft-04 boolean exclusive
                    checks.append(
                        lambda col, path, lo=rule.minimum, dt=dtype: _maybe(
                            num(col) <= F.lit(float(lo)),
                            ErrorCode.NUMBER_TOO_SMALL.value,
                            path,
                            py_str(col, dt),
                        )
                    )
                else:
                    checks.append(
                        lambda col, path, lo=rule.minimum, dt=dtype: _maybe(
                            num(col) < F.lit(float(lo)),
                            ErrorCode.NUMBER_TOO_SMALL.value,
                            path,
                            py_str(col, dt),
                        )
                    )
            if rule.maximum is not None:
                if rule.exclusive_maximum:
                    checks.append(
                        lambda col, path, hi=rule.maximum, dt=dtype: _maybe(
                            num(col) >= F.lit(float(hi)),
                            ErrorCode.NUMBER_TOO_LARGE.value,
                            path,
                            py_str(col, dt),
                        )
                    )
                else:
                    checks.append(
                        lambda col, path, hi=rule.maximum, dt=dtype: _maybe(
                            num(col) > F.lit(float(hi)),
                            ErrorCode.NUMBER_TOO_LARGE.value,
                            path,
                            py_str(col, dt),
                        )
                    )
            if rule.multiple_of is not None:
                k = rule.multiple_of
                if jt == "integer" and isinstance(k, int):
                    checks.append(
                        lambda col, path, k=k, dt=dtype: _maybe(
                            F.pmod(col, F.lit(k)) != 0,
                            ErrorCode.NUMBER_NOT_MULTIPLE.value,
                            path,
                            py_str(col, dt),
                        )
                    )
                else:
                    # float-tolerance branch, replicated exactly
                    # (reference: json_schema/constraints/numbers.py:97-113);
                    # pmod matches Python %'s sign-of-divisor convention
                    def mk_mult(k: float, dt: T.DataType) -> Callable:
                        def chk(col: Column, path: Column) -> Column:
                            m = F.pmod(col.cast("double"), F.lit(float(k)))
                            ok = (m < FLOAT_TOLERANCE) | (
                                F.abs(m - F.lit(float(k))) < FLOAT_TOLERANCE
                            )
                            return _maybe(
                                ~ok, ErrorCode.NUMBER_NOT_MULTIPLE.value, path, py_str(col, dt)
                            )

                        return chk

                    checks.append(mk_mult(k, dtype))

        # --- array (reference: json_schema/constraints/arrays.py:52-105) ---
        if jt == "array" and isinstance(dtype, T.ArrayType):
            el_dtype = dtype.elementType
            if rule.min_items is not None:
                checks.append(
                    lambda col, path, n=rule.min_items: _maybe(
                        F.size(col) < n,
                        ErrorCode.ARRAY_TOO_SHORT.value,
                        path,
                        F.size(col).cast("string"),
                    )
                )
            if rule.max_items is not None:
                checks.append(
                    lambda col, path, n=rule.max_items: _maybe(
                        F.size(col) > n,
                        ErrorCode.ARRAY_TOO_LONG.value,
                        path,
                        F.size(col).cast("string"),
                    )
                )
            if rule.unique_items:
                # duplicate = same canonical repr, first duplicate index reported
                # (reference uses Python str() repr equality,
                # json_schema/constraints/arrays.py:72-98; typed columns make
                # repr-equality == value-equality, the 1 vs "1" collision cannot occur)
                def unique_check(col: Column, path: Column, el=el_dtype) -> Column:
                    rep = lambda x: py_str(x, el)  # noqa: E731
                    pairs = F.transform(
                        col, lambda x, i: F.struct(i.alias("i"), rep(x).alias("r"))
                    )
                    dups = F.filter(
                        pairs,
                        lambda p: F.exists(
                            F.slice(col, F.lit(1), p["i"]), lambda y: rep(y) == p["r"]
                        ),
                    )
                    first = F.get(dups, 0)  # null-safe under ANSI mode
                    return _maybe(
                        first.isNotNull(),
                        ErrorCode.ARRAY_ITEMS_NOT_UNIQUE.value,
                        _index_path(path, first["i"]),
                        first["r"],
                    )

                checks.append(unique_check)
            if rule.items is not None:
                item_binder = self.bind(rule.items, el_dtype)

                def items_child(col: Column, path: Column, b=item_binder) -> Column:
                    nested = F.transform(col, lambda x, i: b(x, _index_path(path, i)))
                    return F.flatten(nested)

                children.append(items_child)

        # --- object on StructType (fixed keys) ---
        if jt == "object" and isinstance(dtype, T.StructType):
            fields = {f.name: f.dataType for f in dtype.fields}
            self._bind_object_struct(rule, fields, checks, children)

        # --- object on MapType (open keys) ---
        if jt == "object" and isinstance(dtype, T.MapType):
            self._bind_object_map(rule, dtype, checks, children)

        # --- logical combinators (reference: json_schema/constraints/logical.py) ---
        if rule.all_of:
            branch_binders = [self.bind(b, dtype) for b in rule.all_of]

            def all_of_child(col: Column, path: Column, bs=branch_binders) -> Column:
                # all branches accumulate (reference: logical.py:13-113)
                return F.concat(*[b(col, path) for b in bs]) if len(bs) > 1 else bs[0](col, path)

            children.append(all_of_child)

        if rule.any_of:
            branch_binders = [self.bind(b, dtype) for b in rule.any_of]

            def any_of_check(col: Column, path: Column, bs=branch_binders, dt=dtype) -> Column:
                # success is silent; total failure emits one ANY_OF_NO_MATCH
                # (reference short-circuit: logical.py:187-192)
                all_fail = None
                for b in bs:
                    fail = F.size(b(col, path)) > 0
                    all_fail = fail if all_fail is None else (all_fail & fail)
                return _maybe(all_fail, ErrorCode.ANY_OF_NO_MATCH.value, path, F.lit(""))

            checks.append(any_of_check)

        if rule.one_of:
            branch_binders = [self.bind(b, dtype) for b in rule.one_of]

            def one_of_child(col: Column, path: Column, bs=branch_binders) -> Column:
                # exactly-1 match; >1 emits TWO errors, the second listing the
                # matching branches (reference: logical.py:319-363)
                match_flags = [(F.size(b(col, path)) == 0).cast("int") for b in bs]
                n = match_flags[0]
                for mf in match_flags[1:]:
                    n = n + mf
                idx_list = F.concat_ws(
                    ",",
                    F.filter(
                        F.array(
                            *[
                                F.when(F.size(b(col, path)) == 0, F.lit(str(i)))
                                for i, b in enumerate(bs)
                            ]
                        ),
                        lambda x: x.isNotNull(),
                    ),
                )
                no_match = _maybe(n == 0, ErrorCode.ONE_OF_NO_MATCH.value, path, F.lit(""))
                multi_1 = _maybe(n > 1, ErrorCode.ONE_OF_MULTIPLE_MATCHES.value, path, F.lit(""))
                multi_2 = _maybe(n > 1, ErrorCode.ONE_OF_MULTIPLE_MATCHES.value, path, idx_list)
                return F.filter(
                    F.array(no_match, multi_1, multi_2).cast(VIOLATION_TYPE),
                    lambda x: x.isNotNull(),
                )

            children.append(one_of_child)

        if rule.not_ is not None:
            inner_binder = self.bind(rule.not_, dtype)

            def not_check(col: Column, path: Column, b=inner_binder, dt=dtype) -> Column:
                # inner errors swallowed; inner success = violation
                # (reference: logical.py:377-462)
                return _maybe(
                    F.size(b(col, path)) == 0,
                    ErrorCode.NOT_SCHEMA_MATCHED.value,
                    path,
                    F.lit(""),
                )

            checks.append(not_check)

        def binder(col: Column, path: Column) -> Column:
            maybes = [c(col, path) for c in checks]
            kid_arrays = [c(col, path) for c in children]
            body = _collect(maybes, kid_arrays)
            # null value = absent: nothing at this node fires
            # ('required' fires at the parent object instead)
            return F.when(col.isNull(), _empty()).otherwise(body)

        return binder

    # ------------------------------------------------------------------ #

    def _bind_object_struct(
        self,
        rule: Rule,
        fields: dict[str, T.DataType],
        checks: list,
        children: list,
    ) -> None:
        """Object keywords over a fixed StructType. Keys are compile-time
        constants, so patternProperties / additionalProperties / propertyNames
        partially constant-fold — the reference evaluates all of these per row
        (json_schema/constraints/objects.py:74-187); here Catalyst sees only
        the residual runtime checks. Validation order mirrors the reference:
        min/max properties → required → dependencies → propertyNames →
        properties → patternProperties → additionalProperties."""

        def present_count(col: Column) -> Column:
            cnt = F.lit(0)
            for k in fields:
                cnt = cnt + col.getField(k).isNotNull().cast("int")
            return cnt

        if rule.min_properties is not None:
            checks.append(
                lambda col, path, n=rule.min_properties: _maybe(
                    present_count(col) < n,
                    ErrorCode.OBJECT_TOO_FEW_PROPERTIES.value,
                    path,
                    present_count(col).cast("string"),
                )
            )
        if rule.max_properties is not None:
            checks.append(
                lambda col, path, n=rule.max_properties: _maybe(
                    present_count(col) > n,
                    ErrorCode.OBJECT_TOO_MANY_PROPERTIES.value,
                    path,
                    present_count(col).cast("string"),
                )
            )

        for req in rule.required:
            if req in fields:
                checks.append(
                    lambda col, path, k=req: _maybe(
                        col.getField(k).isNull(),
                        ErrorCode.REQUIRED_PROPERTY_MISSING.value,
                        _child_path(path, k),
                        F.lit("None"),
                    )
                )
            else:
                # key not even in the physical schema: always missing
                checks.append(
                    lambda col, path, k=req: _maybe(
                        F.lit(True),
                        ErrorCode.REQUIRED_PROPERTY_MISSING.value,
                        _child_path(path, k),
                        F.lit("None"),
                    )
                )

        for dep_key, dep_reqs in rule.dependencies.items():
            if dep_key not in fields:
                continue  # trigger key can never be present
            for needed in dep_reqs:
                if needed in fields:
                    checks.append(
                        lambda col, path, a=dep_key, b=needed: _maybe(
                            col.getField(a).isNotNull() & col.getField(b).isNull(),
                            ErrorCode.DEPENDENCY_MISSING.value,
                            _child_path(path, b),
                            F.lit("None"),
                        )
                    )
                else:
                    checks.append(
                        lambda col, path, a=dep_key, b=needed: _maybe(
                            col.getField(a).isNotNull(),
                            ErrorCode.DEPENDENCY_MISSING.value,
                            _child_path(path, b),
                            F.lit("None"),
                        )
                    )

        if rule.property_names is not None:
            # static keys → driver-side check; violations fire when the key is present
            for k in fields:
                if not _py_string_rule_ok(rule.property_names, k):
                    checks.append(
                        lambda col, path, k=k: _maybe(
                            col.getField(k).isNotNull(),
                            ErrorCode.PROPERTY_NAME_INVALID.value,
                            _child_path(path, k),
                            F.lit(k),
                        )
                    )

        matched_keys: set[str] = set()
        for k, sub in rule.properties.items():
            matched_keys.add(k)
            if k not in fields:
                continue  # never present → nothing to validate
            sub_binder = self.bind(sub, fields[k])

            def prop_child(col: Column, path: Column, k=k, b=sub_binder) -> Column:
                return b(col.getField(k), _child_path(path, k))

            children.append(prop_child)

        for pat, sub in rule.pattern_properties.items():
            try:
                cre = re.compile(pat)
            except re.error:
                continue
            for k in fields:
                if cre.search(k):
                    matched_keys.add(k)
                    if k in rule.properties:
                        continue
                    sub_binder = self.bind(sub, fields[k])

                    def pat_child(col: Column, path: Column, k=k, b=sub_binder) -> Column:
                        return b(col.getField(k), _child_path(path, k))

                    children.append(pat_child)

        ap = rule.additional_properties
        if ap is not None:
            extra_keys = [k for k in fields if k not in matched_keys]
            if ap is False:
                for k in extra_keys:
                    checks.append(
                        lambda col, path, k=k, dt=fields[k]: _maybe(
                            col.getField(k).isNotNull(),
                            ErrorCode.ADDITIONAL_PROPERTY_NOT_ALLOWED.value,
                            _child_path(path, k),
                            py_str(col.getField(k), dt),
                        )
                    )
            elif isinstance(ap, Rule):
                for k in extra_keys:
                    sub_binder = self.bind(ap, fields[k])

                    def ap_child(col: Column, path: Column, k=k, b=sub_binder) -> Column:
                        return b(col.getField(k), _child_path(path, k))

                    children.append(ap_child)

    # ------------------------------------------------------------------ #

    def _bind_object_map(
        self, rule: Rule, dtype: T.MapType, checks: list, children: list
    ) -> None:
        """Object keywords over an open-keyed MapType — the dynamic-document
        case (reference validates dict keys at runtime,
        json_schema/constraints/objects.py:74-187). All checks are runtime
        Column expressions over map_keys/map_entries."""
        val_dtype = dtype.valueType

        if rule.min_properties is not None:
            checks.append(
                lambda col, path, n=rule.min_properties: _maybe(
                    F.size(col) < n,
                    ErrorCode.OBJECT_TOO_FEW_PROPERTIES.value,
                    path,
                    F.size(col).cast("string"),
                )
            )
        if rule.max_properties is not None:
            checks.append(
                lambda col, path, n=rule.max_properties: _maybe(
                    F.size(col) > n,
                    ErrorCode.OBJECT_TOO_MANY_PROPERTIES.value,
                    path,
                    F.size(col).cast("string"),
                )
            )

        for req in rule.required:
            checks.append(
                lambda col, path, k=req: _maybe(
                    ~F.map_contains_key(col, F.lit(k)),
                    ErrorCode.REQUIRED_PROPERTY_MISSING.value,
                    _child_path(path, k),
                    F.lit("None"),
                )
            )

        for dep_key, dep_reqs in rule.dependencies.items():
            for needed in dep_reqs:
                checks.append(
                    lambda col, path, a=dep_key, b=needed: _maybe(
                        F.map_contains_key(col, F.lit(a))
                        & ~F.map_contains_key(col, F.lit(b)),
                        ErrorCode.DEPENDENCY_MISSING.value,
                        _child_path(path, b),
                        F.lit("None"),
                    )
                )

        if rule.property_names is not None:
            name_binder = self.bind(rule.property_names, T.StringType())

            def name_child(col: Column, path: Column, b=name_binder) -> Column:
                bad = F.filter(F.map_keys(col), lambda k: F.size(b(k, path)) > 0)
                return F.transform(
                    bad,
                    lambda k: _viol(
                        ErrorCode.PROPERTY_NAME_INVALID.value,
                        F.concat(path, F.lit("/"), k),
                        k,
                    ),
                ).cast(VIOLATION_TYPE)

            children.append(name_child)

        matched_static = list(rule.properties.keys())
        for k, sub in rule.properties.items():
            sub_binder = self.bind(sub, val_dtype)

            def prop_child(col: Column, path: Column, k=k, b=sub_binder) -> Column:
                v = F.try_element_at(col, F.lit(k))
                return F.when(
                    F.map_contains_key(col, F.lit(k)), b(v, _child_path(path, k))
                ).otherwise(_empty())

            children.append(prop_child)

        pattern_list = list(rule.pattern_properties.keys())
        for pat, sub in rule.pattern_properties.items():
            sub_binder = self.bind(sub, val_dtype)

            def patm_child(col: Column, path: Column, p=pat, b=sub_binder) -> Column:
                ks = F.filter(F.map_keys(col), lambda k: k.rlike(p))
                nested = F.transform(
                    ks,
                    lambda k: b(
                        F.try_element_at(col, k), F.concat(path, F.lit("/"), k)
                    ),
                )
                return F.flatten(nested)

            children.append(patm_child)

        ap = rule.additional_properties
        if ap is not None:

            def extra_keys(col: Column) -> Column:
                ks = F.map_keys(col)
                if matched_static:
                    ks = F.filter(ks, lambda k: ~k.isin(matched_static))
                for p in pattern_list:
                    ks = F.filter(ks, lambda k, p=p: ~k.rlike(p))
                return ks

            if ap is False:

                def ap_false_child(col: Column, path: Column) -> Column:
                    return F.transform(
                        extra_keys(col),
                        lambda k: _viol(
                            ErrorCode.ADDITIONAL_PROPERTY_NOT_ALLOWED.value,
                            F.concat(path, F.lit("/"), k),
                            py_str(F.try_element_at(col, k), val_dtype),
                        ),
                    ).cast(VIOLATION_TYPE)

                children.append(ap_false_child)
            elif isinstance(ap, Rule):
                ap_binder = self.bind(ap, val_dtype)

                def ap_rule_child(col: Column, path: Column, b=ap_binder) -> Column:
                    nested = F.transform(
                        extra_keys(col),
                        lambda k: b(
                            F.try_element_at(col, k), F.concat(path, F.lit("/"), k)
                        ),
                    )
                    return F.flatten(nested)

                children.append(ap_rule_child)


# ---------------------------------------------------------------------- #
# public API
# ---------------------------------------------------------------------- #


def compile_ruleset(schema: Any, struct_type: T.StructType) -> Column:
    """Compile a JSON-Schema-subset ruleset against a DataFrame schema.

    Returns a Column producing ``array<struct<rule_id,path,observed>>`` for a
    row treated as the document (root path = ""). The whole compile happens
    driver-side ONCE per run — unlike the reference's recompile-per-validate
    (json_schema/api.py:115-119; compile-once is 5.8x faster even there,
    see BASELINE.md)."""
    rule = schema if isinstance(schema, Rule) else normalize_schema(schema)
    binder = RuleBinder().bind(rule, struct_type)
    root = F.struct(*[F.col(f.name) for f in struct_type.fields])
    return binder(root, F.lit(""))


def with_violations(df: DataFrame, schema: Any, col_name: str = "violations") -> DataFrame:
    """Attach the violations array + per-row ``valid`` flag."""
    relevant = T.StructType([f for f in df.schema.fields])
    v = compile_ruleset(schema, relevant)
    return df.withColumn(col_name, v).withColumn("valid", F.size(F.col(col_name)) == 0)


def validate(
    df: DataFrame, schema: Any, key_col: str = "doc_id"
) -> DataFrame:
    """Exploded violation rows ``(doc_id, rule_id, path, observed)`` —
    the engine's golden-output shape (FIXTURES.md §5)."""
    vdf = with_violations(df, schema)
    return (
        vdf.select(F.col(key_col).alias("doc_id"), F.explode("violations").alias("v"))
        .select(
            "doc_id",
            F.col("v.rule_id").alias("rule_id"),
            F.col("v.path").alias("path"),
            F.col("v.observed").alias("observed"),
        )
    )
