"""Dynamic JSON validation over Spark 4 VariantType — the third path.

Where the TYPED path (from_json, plans/json_docs.py) freezes one Spark type
per field (wrong-typed values silently null out) and the EXACT path runs
CPython per Arrow batch, the VARIANT path keeps each value's own runtime
type (parse_json → open binary encoding) and validates with pure Column
expressions: per-value dynamic type dispatch, presence ≠ JSON null, and
wrong-typed values produce real TYPE_ERRORs — the exact path's dynamic-type
semantics entirely JVM-side. (reference analogue: the per-document dynamic
interpreter, json_schema/validator.py:31-108 — re-realized as expressions.)

When to choose it (measured sf0.1 events, 100k small docs, local[32]):
the exact pandas path is ~1.7x faster on this corpus (0.9s vs 1.5s clean;
1.0s vs 2.5s at 50% violation rate) — per-doc CPython is cheap for small
documents. The variant path wins operationally, not per-row: no Python
workers (no executor memory split, no Arrow hop), it composes into the
same whole-stage plan as adjacent Column work, states Iceberg/Delta
variant-column inputs natively (validate WITHOUT re-serializing to JSON
strings), and its allocation-free boolean gate skips violation
construction for clean documents. For CPython-regex/str()-corner parity
the exact path remains the arbiter (validate_json_auto routes).

Type mapping (CPython json.loads parity): variant BIGINT ⇔ int, DECIMAL/
DOUBLE ⇔ float (so ``1.0`` is a JSON number, never an integer — matching
py_type_of), STRING/BOOLEAN/OBJECT<…>/ARRAY<…>/VOID ⇔ str/bool/dict/list/
None. Presence: ``variant_get(v, '$.k', 'variant')`` is SQL-NULL when the
key is ABSENT and a VOID variant (``is_variant_null``) when the value is a
present JSON null.

Documented deviations from the exact path (use validate_json_exact when
they matter): regex runs under java.util.regex (route via
json_docs.validate_json_auto semantics if needed); observed values render
as compact JSON (variant to_json, object keys SORTED — variant objects
store fields lexicographically); uniqueItems compares to_json renderings
(the reference compares str() reprs — same equivalence classes for JSON
data); open-object iteration order is the variant's sorted key order, not
document order; numeric comparisons (bounds/enum/const/multipleOf) run in
double precision, so integers beyond 2^53 may compare equal when CPython
would distinguish them (see _jt for the integer/number classification
corners above int64).
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_schema_py_spark.errors import ErrorCode
from json_schema_py_spark.schema.compiler import (
    VIOLATION_TYPE,
    _empty,
    _escape_pointer_token,
    _key_path,
    _maybe,
    _viol,
)
from json_schema_py_spark.schema.model import Rule, normalize_schema

def _jt(v: Column) -> Column:
    """Per-VALUE JSON type name from the variant's runtime schema.

    Numeric mapping (empirical, Spark 4.1 parse_json): integer literals
    ≤ int64 → BIGINT; integer literals ABOVE int64 → DECIMAL(p≥19, 0);
    decimal-pointed literals → DECIMAL(p≤18, 0..s) (1.0 normalizes to
    DECIMAL(1,0)); magnitudes beyond DECIMAL(38) → DOUBLE. Hence:
    scale-0 DECIMAL with precision ≥ 19 is a big INTEGER; any other
    DECIMAL/DOUBLE is a number. Documented corners vs CPython json.loads:
    a >int64 integral written WITH a decimal point classifies integer, and
    integers beyond 38 digits degrade to DOUBLE (classify number) — CPython
    keeps arbitrary-precision ints."""
    sch = F.schema_of_variant(v)
    return (
        F.when(F.startswith(sch, F.lit("OBJECT")), F.lit("object"))
        .when(F.startswith(sch, F.lit("ARRAY")), F.lit("array"))
        .when(sch == "STRING", F.lit("string"))
        .when(sch == "BOOLEAN", F.lit("boolean"))
        .when(
            (sch == "BIGINT") | sch.rlike(r"^DECIMAL\((19|2[0-9]|3[0-8]),0\)$"),
            F.lit("integer"),
        )
        .when(
            F.startswith(sch, F.lit("DECIMAL"))
            | sch.isin("DOUBLE", "FLOAT"),
            F.lit("number"),
        )
        .when(sch == "VOID", F.lit("null"))
        .otherwise(F.lit("string"))
    )


def _type_ok(jt: Column, allowed: list[str]) -> Column:
    ok = jt.isin(list(allowed))
    if "number" in allowed:  # integer ⊆ number
        ok = ok | (jt == "integer")
    return ok


def _canon_json(value: Any) -> str:
    import json as _json

    return _json.dumps(value, separators=(",", ":"), sort_keys=True)


def _eq_value(v: Column, jt: Column, target: Any) -> Column:
    """Python == semantics per runtime type (1 == True, 1 == 1.0)."""
    if isinstance(target, bool):
        return (jt == "boolean") & (
            F.try_variant_get(v, "$", "boolean") == F.lit(target)
        ) | (
            jt.isin("integer", "number")
            & (F.try_variant_get(v, "$", "double") == F.lit(1.0 if target else 0.0))
        )
    if isinstance(target, (int, float)):
        num = jt.isin("integer", "number") & (
            F.try_variant_get(v, "$", "double") == F.lit(float(target))
        )
        if target in (0, 1):
            num = num | (
                (jt == "boolean")
                & (F.try_variant_get(v, "$", "boolean") == F.lit(bool(target)))
            )
        return num
    if isinstance(target, str):
        return (jt == "string") & (
            F.try_variant_get(v, "$", "string") == F.lit(target)
        )
    if target is None:
        return jt == "null"
    # dict/list: compact sorted-key JSON equality (variant to_json renders
    # object keys sorted, so renderings align)
    return jt.isin("object", "array") & (F.to_json(v) == F.lit(_canon_json(target)))


_FLOAT_TOL = 1e-10


class VariantBinder:
    """pyeval.evaluate re-realized as Column expressions over variant values.

    bind(rule) → (viol(v, path) -> array<violation>, fires(v) -> boolean);
    ``v`` is a PRESENT variant value (possibly JSON null). Emission order
    mirrors pyeval (type gate → enum/const → type-specific → object keywords
    → logical ops); open-object key iteration follows the variant's sorted
    key order (documented deviation)."""

    def bind(self, rule: Rule):
        # PERF (compiler.py module doc): ``jt`` is a schema_of_variant
        # when-chain referenced by EVERY check at the node — expressions have
        # no CSE, so it must be bound ONCE as a lambda variable via a
        # single-element transform, not inlined per reference.
        def viol(v: Column, path: Column) -> Column:
            def with_jt(jt: Column) -> Column:
                body = self._node_viols(rule, v, jt, path)
                if rule.types is not None:
                    gate = _type_ok(jt, rule.types)
                    terr = F.array(
                        _viol(ErrorCode.TYPE_ERROR.value, path, _obs(v, jt))
                    ).cast(VIOLATION_TYPE)
                    body = F.when(gate, body).otherwise(terr)
                return body

            return F.get(F.transform(F.array(_jt(v)), with_jt), 0)

        def fires(v: Column) -> Column:
            def with_jt(jt: Column) -> Column:
                body = self._node_fires(rule, v, jt)
                if rule.types is not None:
                    return F.when(_type_ok(jt, rule.types), body).otherwise(F.lit(True))
                return body

            return F.get(F.transform(F.array(_jt(v)), with_jt), 0)

        return viol, fires

    # ---------------- node assembly (pyeval emission order) ----------------

    def _node_parts(self, rule: Rule, v: Column, jt: Column, path: Column) -> list[Column]:
        parts: list[Column] = []

        def leaf(cond: Column, code: str, p: Column, obs: Column) -> None:
            parts.append(
                F.filter(
                    F.array(_maybe(cond, code, p, obs)).cast(VIOLATION_TYPE),
                    lambda x: x.isNotNull(),
                )
            )

        # enum / const
        if rule.enum is not None:
            match = (
                reduce(lambda a, b: a | b, [_eq_value(v, jt, e) for e in rule.enum])
                if rule.enum
                else F.lit(False)
            )
            leaf(~match, ErrorCode.ENUM_MISMATCH.value, path, _obs(v, jt))
        if rule.const_set:
            leaf(~_eq_value(v, jt, rule.const), ErrorCode.CONST_MISMATCH.value, path, _obs(v, jt))

        # strings
        s = F.try_variant_get(v, "$", "string")
        is_s = jt == "string"
        if rule.min_length is not None:
            leaf(is_s & (F.length(s) < rule.min_length), ErrorCode.STRING_TOO_SHORT.value, path, s)
        if rule.max_length is not None:
            leaf(is_s & (F.length(s) > rule.max_length), ErrorCode.STRING_TOO_LONG.value, path, s)
        if rule.pattern is not None:
            from json_schema_py_spark.schema.regex_dialect import checked_java_pattern

            jp = checked_java_pattern(rule.pattern)
            if jp is None:  # Python-invalid: lazy SCHEMA_INVALID (reference)
                leaf(is_s, ErrorCode.SCHEMA_INVALID.value, path, s)
            else:
                leaf(is_s & ~s.rlike(jp), ErrorCode.PATTERN_MISMATCH.value, path, s)

        # numbers (bool is never a number: jt dispatch already excludes it)
        d = F.try_variant_get(v, "$", "double")
        is_n = jt.isin("integer", "number")
        if rule.minimum is not None:
            bad = d <= float(rule.minimum) if rule.exclusive_minimum else d < float(rule.minimum)
            leaf(is_n & bad, ErrorCode.NUMBER_TOO_SMALL.value, path, _obs(v, jt))
        if rule.maximum is not None:
            bad = d >= float(rule.maximum) if rule.exclusive_maximum else d > float(rule.maximum)
            leaf(is_n & bad, ErrorCode.NUMBER_TOO_LARGE.value, path, _obs(v, jt))
        if rule.multiple_of is not None:
            k = float(rule.multiple_of)
            m = F.pmod(d, F.lit(k))
            ok = (m < _FLOAT_TOL) | (F.abs(m - F.lit(k)) < _FLOAT_TOL)
            leaf(is_n & ~ok, ErrorCode.NUMBER_NOT_MULTIPLE.value, path, _obs(v, jt))

        # arrays
        arr = F.try_variant_get(v, "$", "array<variant>")
        is_a = jt == "array"
        if rule.min_items is not None:
            leaf(is_a & (F.size(arr) < rule.min_items), ErrorCode.ARRAY_TOO_SHORT.value,
                 path, F.size(arr).cast("string"))
        if rule.max_items is not None:
            leaf(is_a & (F.size(arr) > rule.max_items), ErrorCode.ARRAY_TOO_LONG.value,
                 path, F.size(arr).cast("string"))
        if rule.unique_items:
            # first duplicate index via the same bound-variable probe as the
            # static binder; equality on to_json renderings
            def dup_idx(rs: Column) -> Column:
                js = F.transform(rs, lambda x: F.to_json(x))
                idxs = F.filter(
                    F.transform(js, lambda x, i: i),
                    lambda i: F.exists(
                        F.slice(js, F.lit(1), i), lambda y: y.eqNullSafe(F.get(js, i))
                    ),
                )
                return F.get(idxs, 0)

            di = F.get(F.transform(F.array(arr), dup_idx), 0)
            parts.append(
                F.filter(
                    F.array(
                        _maybe(
                            is_a & di.isNotNull(),
                            ErrorCode.ARRAY_ITEMS_NOT_UNIQUE.value,
                            F.concat(path, F.lit("/"), di.cast("string")),
                            F.to_json(F.get(arr, di)),
                        )
                    ).cast(VIOLATION_TYPE),
                    lambda x: x.isNotNull(),
                )
            )
        if rule.items is not None:
            iv, _if = self.bind(rule.items)
            parts.append(
                F.when(
                    is_a,
                    F.flatten(
                        F.transform(
                            arr,
                            lambda x, i: iv(x, F.concat(path, F.lit("/"), i.cast("string"))),
                        )
                    ),
                ).otherwise(_empty())
            )

        # objects (open: via map<string,variant> cast; keys are SORTED)
        if self._has_object_keywords(rule):
            parts.append(self._object_viols(rule, v, jt, path))

        # logical combinators
        for branch in rule.all_of:
            bv, _bf = self.bind(branch)
            parts.append(bv(v, path))
        if rule.any_of:
            fires = [self.bind(b)[1] for b in rule.any_of]
            all_fail = reduce(lambda a, b: a & b, [f(v) for f in fires])
            leaf(all_fail, ErrorCode.ANY_OF_NO_MATCH.value, path, F.lit(""))
        if rule.one_of:
            fires = [self.bind(b)[1] for b in rule.one_of]
            n = reduce(lambda a, b: a + b, [(~f(v)).cast("int") for f in fires])
            idx_list = F.concat_ws(
                ",",
                F.filter(
                    F.array(*[F.when(~f(v), F.lit(str(i))) for i, f in enumerate(fires)]),
                    lambda x: x.isNotNull(),
                ),
            )
            parts.append(
                F.filter(
                    F.array(
                        _maybe(n == 0, ErrorCode.ONE_OF_NO_MATCH.value, path, F.lit("")),
                        _maybe(n > 1, ErrorCode.ONE_OF_MULTIPLE_MATCHES.value, path, F.lit("")),
                        _maybe(n > 1, ErrorCode.ONE_OF_MULTIPLE_MATCHES.value, path, idx_list),
                    ).cast(VIOLATION_TYPE),
                    lambda x: x.isNotNull(),
                )
            )
        if rule.not_ is not None:
            _nv, nf = self.bind(rule.not_)
            leaf(~nf(v), ErrorCode.NOT_SCHEMA_MATCHED.value, path, F.lit(""))

        return parts

    def _node_viols(self, rule: Rule, v: Column, jt: Column, path: Column) -> Column:
        parts = self._node_parts(rule, v, jt, path)
        if not parts:
            return _empty()
        return parts[0] if len(parts) == 1 else F.concat(*parts)

    def _node_fires(self, rule: Rule, v: Column, jt: Column) -> Column:
        """Allocation-free boolean fast path (static binder doctrine): pure
        predicates only — no structs, paths, or arrays-of-violations. Clean
        values (the common case) never build a violation object."""
        conds: list[Column] = []

        if rule.enum is not None:
            match = (
                reduce(lambda a, b: a | b, [_eq_value(v, jt, e) for e in rule.enum])
                if rule.enum
                else F.lit(False)
            )
            conds.append(~match)
        if rule.const_set:
            conds.append(~_eq_value(v, jt, rule.const))

        s = F.try_variant_get(v, "$", "string")
        is_s = jt == "string"
        if rule.min_length is not None:
            conds.append(is_s & (F.length(s) < rule.min_length))
        if rule.max_length is not None:
            conds.append(is_s & (F.length(s) > rule.max_length))
        if rule.pattern is not None:
            from json_schema_py_spark.schema.regex_dialect import checked_java_pattern

            jp = checked_java_pattern(rule.pattern)
            conds.append(is_s if jp is None else (is_s & ~s.rlike(jp)))

        d = F.try_variant_get(v, "$", "double")
        is_n = jt.isin("integer", "number")
        if rule.minimum is not None:
            bad = d <= float(rule.minimum) if rule.exclusive_minimum else d < float(rule.minimum)
            conds.append(is_n & bad)
        if rule.maximum is not None:
            bad = d >= float(rule.maximum) if rule.exclusive_maximum else d > float(rule.maximum)
            conds.append(is_n & bad)
        if rule.multiple_of is not None:
            k = float(rule.multiple_of)
            m = F.pmod(d, F.lit(k))
            conds.append(is_n & ~((m < _FLOAT_TOL) | (F.abs(m - F.lit(k)) < _FLOAT_TOL)))

        arr = F.try_variant_get(v, "$", "array<variant>")
        is_a = jt == "array"
        if rule.min_items is not None:
            conds.append(is_a & (F.size(arr) < rule.min_items))
        if rule.max_items is not None:
            conds.append(is_a & (F.size(arr) > rule.max_items))
        if rule.unique_items:
            js = F.transform(arr, lambda x: F.to_json(x))
            conds.append(is_a & (F.size(F.array_distinct(js)) < F.size(js)))
        if rule.items is not None:
            _iv, ifires = self.bind(rule.items)
            conds.append(is_a & F.exists(arr, lambda x: ifires(x)))

        if self._has_object_keywords(rule):
            m_expr = F.try_variant_get(v, "$", "map<string,variant>")
            conds.append(
                (jt == "object")
                & F.get(
                    F.transform(
                        F.array(m_expr),
                        lambda m: self._object_fires_bound(rule, m),
                    ),
                    0,
                )
            )

        for branch in rule.all_of:
            _bv, bf = self.bind(branch)
            conds.append(bf(v))
        if rule.any_of:
            fires = [self.bind(b)[1] for b in rule.any_of]
            conds.append(reduce(lambda a, b: a & b, [f(v) for f in fires]))
        if rule.one_of:
            fires = [self.bind(b)[1] for b in rule.one_of]
            n = reduce(lambda a, b: a + b, [(~f(v)).cast("int") for f in fires])
            conds.append(n != 1)
        if rule.not_ is not None:
            _nv, nf = self.bind(rule.not_)
            conds.append(~nf(v))

        if not conds:
            return F.lit(False)
        return reduce(lambda a, b: a | b, conds)

    def _object_fires_bound(self, rule: Rule, m: Column) -> Column:
        keys = F.map_keys(m)
        conds: list[Column] = []
        n = F.size(keys)
        if rule.min_properties is not None:
            conds.append(n < rule.min_properties)
        if rule.max_properties is not None:
            conds.append(n > rule.max_properties)
        for req in rule.required:
            conds.append(~F.map_contains_key(m, F.lit(req)))
        for dep_key, needed in rule.dependencies.items():
            for b in needed:
                conds.append(
                    F.map_contains_key(m, F.lit(dep_key))
                    & ~F.map_contains_key(m, F.lit(b))
                )
        if rule.property_names is not None:
            _nv, nf = self.bind(rule.property_names)
            conds.append(F.exists(keys, lambda k: _string_key_fires(nf, k)))
        matched_static = list(rule.properties.keys())
        for k, sub in rule.properties.items():
            _sv, sf = self.bind(sub)
            conds.append(
                F.map_contains_key(m, F.lit(k)) & sf(F.try_element_at(m, F.lit(k)))
            )
        pattern_list = []
        for pat, sub in rule.pattern_properties.items():
            from json_schema_py_spark.schema.regex_dialect import checked_java_pattern

            jpat = checked_java_pattern(pat)
            if jpat is None:  # Python-invalid: skipped (reference semantics)
                continue
            pattern_list.append(jpat)
            _sv, sf = self.bind(sub)
            skip = tuple(matched_static)

            def pred(kcol: Column, p=jpat, s=skip) -> Column:
                cond = kcol.rlike(p)
                if s:
                    cond = cond & ~kcol.isin(list(s))
                return cond

            conds.append(
                F.exists(F.filter(keys, pred), lambda k: sf(F.try_element_at(m, k)))
            )
        ap = rule.additional_properties
        if ap is not None:
            skip = list(set(matched_static) | set(rule.exempt_properties))

            def extra(kcol: Column) -> Column:
                cond = ~kcol.isin(skip) if skip else F.lit(True)
                for p in pattern_list:
                    cond = cond & ~kcol.rlike(p)
                return cond

            if ap is False:
                conds.append(F.exists(keys, extra))
            elif isinstance(ap, Rule):
                _av, af = self.bind(ap)
                conds.append(
                    F.exists(F.filter(keys, extra), lambda k: af(F.try_element_at(m, k)))
                )
        if not conds:
            return F.lit(False)
        return reduce(lambda a, b: a | b, conds)

    # ---------------- objects ----------------

    @staticmethod
    def _has_object_keywords(rule: Rule) -> bool:
        return bool(
            rule.required
            or rule.properties
            or rule.pattern_properties
            or rule.dependencies
            or rule.property_names is not None
            or rule.min_properties is not None
            or rule.max_properties is not None
            or rule.additional_properties is not None
        )

    def _object_viols(self, rule: Rule, v: Column, jt: Column, path: Column) -> Column:
        # bind the map cast ONCE (lambda variable — see bind() PERF note)
        m_expr = F.try_variant_get(v, "$", "map<string,variant>")
        return F.get(
            F.transform(
                F.array(m_expr), lambda m: self._object_viols_bound(rule, m, jt, path)
            ),
            0,
        )

    def _object_viols_bound(
        self, rule: Rule, m: Column, jt: Column, path: Column
    ) -> Column:
        keys = F.map_keys(m)
        parts: list[Column] = []

        def leaf(cond, code, p, obs):
            parts.append(
                F.filter(
                    F.array(_maybe(cond, code, p, obs)).cast(VIOLATION_TYPE),
                    lambda x: x.isNotNull(),
                )
            )

        n = F.size(keys)
        if rule.min_properties is not None:
            leaf(n < rule.min_properties, ErrorCode.OBJECT_TOO_FEW_PROPERTIES.value,
                 path, n.cast("string"))
        if rule.max_properties is not None:
            leaf(n > rule.max_properties, ErrorCode.OBJECT_TOO_MANY_PROPERTIES.value,
                 path, n.cast("string"))
        for req in rule.required:
            leaf(~F.map_contains_key(m, F.lit(req)), ErrorCode.REQUIRED_PROPERTY_MISSING.value,
                 _child(path, req), F.lit("None"))
        for dep_key, needed in rule.dependencies.items():
            for b in needed:
                leaf(
                    F.map_contains_key(m, F.lit(dep_key)) & ~F.map_contains_key(m, F.lit(b)),
                    ErrorCode.DEPENDENCY_MISSING.value, _child(path, b), F.lit("None"),
                )
        if rule.property_names is not None:
            nv, nf = self.bind(rule.property_names)
            parts.append(
                F.flatten(
                    F.transform(
                        keys,
                        lambda k: _as_string_variant_viols(nv, k, path),
                    )
                )
            )
        matched_static = list(rule.properties.keys())
        for k, sub in rule.properties.items():
            sv, _sf = self.bind(sub)
            child = F.try_element_at(m, F.lit(k))
            parts.append(
                F.when(
                    F.map_contains_key(m, F.lit(k)), sv(child, _child(path, k))
                ).otherwise(_empty())
            )
        pattern_list = []
        for pat, sub in rule.pattern_properties.items():
            from json_schema_py_spark.schema.regex_dialect import checked_java_pattern

            jpat = checked_java_pattern(pat)
            if jpat is None:  # Python-invalid: skipped (reference semantics)
                continue
            pattern_list.append(jpat)
            sv, _sf = self.bind(sub)
            skip = [k for k in matched_static]

            def pkeys(kcol: Column, p=jpat, s=tuple(skip)) -> Column:
                cond = kcol.rlike(p)
                if s:
                    cond = cond & ~kcol.isin(list(s))
                return cond

            parts.append(
                F.flatten(
                    F.transform(
                        F.filter(keys, pkeys),
                        lambda k: sv(
                            F.try_element_at(m, k), _key_path(path, k)
                        ),
                    )
                )
            )
        ap = rule.additional_properties
        if ap is not None:
            skip = list(set(matched_static) | set(rule.exempt_properties))

            def extra(kcol: Column) -> Column:
                cond = ~kcol.isin(skip) if skip else F.lit(True)
                for p in pattern_list:
                    cond = cond & ~kcol.rlike(p)
                return cond

            ek = F.filter(keys, extra)
            if ap is False:
                parts.append(
                    F.transform(
                        ek,
                        lambda k: _viol(
                            ErrorCode.ADDITIONAL_PROPERTY_NOT_ALLOWED.value,
                            _key_path(path, k),
                            # _obs: Python-ish scalar rendering ('x' not '"x"',
                            # 'True' not 'true'), parity with pyeval/py_str;
                            # jt is the BOUND lambda variable (no-CSE rule)
                            F.get(
                                F.transform(
                                    F.array(_jt(F.try_element_at(m, k))),
                                    lambda jt: _obs(F.try_element_at(m, k), jt),
                                ),
                                0,
                            ),
                        ),
                    ).cast(VIOLATION_TYPE)
                )
            elif isinstance(ap, Rule):
                av, _af = self.bind(ap)
                parts.append(
                    F.flatten(
                        F.transform(
                            ek,
                            lambda k: av(
                                F.try_element_at(m, k), _key_path(path, k)
                            ),
                        )
                    )
                )
        body = parts[0] if len(parts) == 1 else (F.concat(*parts) if parts else _empty())
        return F.when(jt == "object", body).otherwise(_empty())


def _child(path: Column, key: str) -> Column:
    return F.concat(path, F.lit("/" + _escape_pointer_token(key)))


def _as_string_variant_viols(nv: Callable, key: Column, path: Column) -> Column:
    """propertyNames: validate each KEY as a string value — wrap the key into
    a variant so the same binder applies (parse_json of the JSON-quoted key)."""
    kv = F.parse_json(F.to_json(F.struct(key.alias("k"))))
    kvar = F.variant_get(kv, "$.k", "variant")
    return nv(kvar, _key_path(path, key))


def _string_key_fires(nf: Callable, key: Column) -> Column:
    kv = F.parse_json(F.to_json(F.struct(key.alias("k"))))
    return nf(F.variant_get(kv, "$.k", "variant"))


def _obs(v: Column, jt: Column) -> Column:
    """Observed-value rendering: Python-ish for scalars, compact JSON for
    composites (variant objects render with sorted keys — documented)."""
    return (
        F.when(jt == "string", F.try_variant_get(v, "$", "string"))
        .when(jt == "boolean",
              F.when(F.try_variant_get(v, "$", "boolean"), F.lit("True")).otherwise(F.lit("False")))
        .when(jt == "null", F.lit("None"))
        .when(
            jt == "integer",
            # >int64 integers live in DECIMAL(p>=19,0) variants — the bigint
            # cast overflows to NULL, so fall back to a decimal rendering
            F.coalesce(
                F.try_variant_get(v, "$", "bigint").cast("string"),
                F.try_variant_get(v, "$", "decimal(38,0)").cast("string"),
            ),
        )
        .when(jt == "number", F.try_variant_get(v, "$", "double").cast("string"))
        .otherwise(F.to_json(v))
    )


def validate_json_variant(
    df: DataFrame, json_col: str, schema: Any, key_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, rule_id, path, observed) via parse_json + the variant binder.

    Per-VALUE dynamic typing: heterogeneous payloads that the typed path
    nulls out produce real TYPE_ERRORs here, presence ≠ JSON null, and the
    whole thing stays JVM-side. Malformed JSON → SCHEMA_INVALID (exact-path
    convention)."""
    rule = schema if isinstance(schema, Rule) else normalize_schema(schema)
    binder = VariantBinder()
    viol, fires = binder.bind(rule)

    # a NULL payload is evaluated as a JSON null document (exact-path
    # convention: json.loads(raw) if raw is not None else None)
    v = F.try_parse_json(F.coalesce(F.col(json_col), F.lit("null")))
    bad = F.col(json_col).isNotNull() & v.isNull()
    violations = (
        F.when(
            bad,
            F.array(
                _viol(
                    ErrorCode.SCHEMA_INVALID.value,
                    F.lit(""),
                    F.substring(F.col(json_col), 1, 256),
                )
            ).cast(VIOLATION_TYPE),
        )
        .when(
            v.isNotNull(),
            # static-binder doctrine: the allocation-free boolean gate runs
            # first; only flagged documents build violation objects
            F.get(
                F.transform(
                    F.array(v),
                    lambda vv: F.when(fires(vv), viol(vv, F.lit(""))).otherwise(
                        _empty()
                    ),
                ),
                0,
            ),
        )
        .otherwise(_empty())
    )
    return (
        df.select(F.col(key_col).alias("doc_id"), violations.alias("violations"))
        .select("doc_id", F.explode("violations").alias("x"))
        .select(
            "doc_id",
            F.col("x.rule_id").alias("rule_id"),
            F.col("x.path").alias("path"),
            F.col("x.observed").alias("observed"),
        )
    )
