"""Driver-side schema compile: JSON-Schema-subset dict → normalized Rule tree.

This is the engine's analogue of the reference's SchemaCompiler
(reference: json_schema/schema_compiler.py:929-952) but produces a pure-data
rule tree that the Spark binder (schema/compiler.py) turns into Column
expressions. Reproduced reference semantics (deliberate spec deviations
included — they ARE the spec here, see SURVEY.md §7):

* ``$ref``: local ``#/...`` JSON-Pointer refs only; external refs fail
  compile (reference: json_schema/schema_compiler.py:597-599). Refs are
  inlined at compile time with a depth bound so circular refs terminate
  (reference: json_schema/schema_compiler.py:563-567).
* draft-04 boolean ``exclusiveMinimum``/``exclusiveMaximum`` flags
  (reference: json_schema/schema_compiler.py:878-892).
* type inference: a schema without an explicit ``type`` gets one inferred
  from its keywords and then ENFORCED (reference deviation,
  json_schema/schema_compiler.py:786-846).
* ``dependencies``: property-dependency (list) form only
  (reference: json_schema/constraints/objects.py:105-116).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional

MAX_REF_DEPTH = 16  # bounds circular-$ref unrolling; typed Spark schemas are finite-depth anyway

_ARRAY_KEYWORDS = ("items", "minItems", "maxItems", "uniqueItems")
_OBJECT_KEYWORDS = (
    "properties",
    "required",
    "patternProperties",
    "additionalProperties",
    "propertyNames",
    "minProperties",
    "maxProperties",
    "dependencies",
)
_STRING_KEYWORDS = ("minLength", "maxLength", "pattern")
_NUMBER_KEYWORDS = ("minimum", "maximum", "multipleOf", "exclusiveMinimum", "exclusiveMaximum")


class SchemaCompileError(ValueError):
    """Raised for unresolvable refs / malformed schemas at compile time.

    ``ref`` carries the offending $ref when one caused the failure — the
    API layer renders the reference's message for it ("No resolver provided
    for reference '<ref>'", references.py:94-95 — probed: both external and
    unresolvable-local refs produce this same phrasing)."""

    def __init__(self, message: str, ref: Optional[str] = None):
        super().__init__(message)
        self.ref = ref


@dataclass
class Rule:
    """One normalized constraint node (the reference's Constraint tree node,
    reference: json_schema/constraints/base.py:224-252, as pure data)."""

    types: Optional[list[str]] = None  # JSON type names; None = untyped
    type_inferred: bool = False
    # schema wrote type as a LIST ("type": ["a","b"]): the reference then
    # routes through TypeConstraintImpl whose message uses sorted JSON type
    # names ("Expected integer, string, got number"); the string form (and
    # inferred types) route through base.py's gate with Python __name__
    # ("Expected integer, got str") — probed, see api/pyeval message parity
    types_from_list: bool = False
    # string (reference: json_schema/constraints/strings.py:12-118)
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    pattern: Optional[str] = None  # re.search semantics (substring match)
    # number (reference: json_schema/constraints/numbers.py:11-137)
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    exclusive_minimum: bool = False  # draft-04 boolean flags
    exclusive_maximum: bool = False
    multiple_of: Optional[float] = None
    # enum / const (reference: json_schema/constraints/enums.py, consts.py)
    enum: Optional[list[Any]] = None
    const_set: bool = False
    const: Any = None
    # array (reference: json_schema/constraints/arrays.py:52-105)
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    unique_items: bool = False
    items: Optional["Rule"] = None
    # object (reference: json_schema/constraints/objects.py:74-187)
    required: list[str] = field(default_factory=list)
    properties: dict[str, "Rule"] = field(default_factory=dict)
    pattern_properties: dict[str, "Rule"] = field(default_factory=dict)
    additional_properties: Any = None  # None | bool | Rule
    property_names: Optional["Rule"] = None
    min_properties: Optional[int] = None
    max_properties: Optional[int] = None
    dependencies: dict[str, list[str]] = field(default_factory=dict)
    # logical (reference: json_schema/constraints/logical.py)
    all_of: list["Rule"] = field(default_factory=list)
    any_of: list["Rule"] = field(default_factory=list)
    one_of: list["Rule"] = field(default_factory=list)
    not_: Optional["Rule"] = None
    # additionalProperties escape hatch: keys declared by SIBLING logical
    # branches (or $ref'd schemas, which normalize inlines) are exempt from
    # this node's additionalProperties check (reference: parent_properties,
    # json_schema/constraints/logical.py:47-55,147-156,267-276 and
    # references.py:112-119)
    exempt_properties: frozenset = frozenset()

    def has_type(self, t: str) -> bool:
        return self.types is not None and t in self.types


def _resolve_pointer(root: dict, ref: str) -> Any:
    """Resolve a local '#/a/b' JSON-Pointer ref against the root schema.

    reference: json_schema/schema_compiler.py:894-925 (resolver closure) and
    json_schema/utils.py:8-119 (pointer machinery). External refs rejected
    (reference: json_schema/schema_compiler.py:597-599).
    """
    if not ref.startswith("#"):
        raise SchemaCompileError(f"external $ref not supported: {ref!r}", ref=ref)
    node: Any = root
    for raw in ref.lstrip("#").strip("/").split("/") if ref not in ("#", "#/") else []:
        token = raw.replace("~1", "/").replace("~0", "~")
        if isinstance(node, dict) and token in node:
            node = node[token]
        elif isinstance(node, list) and token.isdigit() and int(token) < len(node):
            node = node[int(token)]
        else:
            raise SchemaCompileError(f"unresolvable $ref: {ref!r}", ref=ref)
    return node


def _infer_type(schema: dict) -> Optional[str]:
    """Infer a type from keywords, reference deviation: the inferred type is
    then enforced (reference: json_schema/schema_compiler.py:786-846)."""
    if any(k in schema for k in _ARRAY_KEYWORDS):
        return "array"
    if any(k in schema for k in _OBJECT_KEYWORDS):
        return "object"
    if any(k in schema for k in _STRING_KEYWORDS):
        return "string"
    if any(k in schema for k in _NUMBER_KEYWORDS):
        return "number"
    return None


def normalize_schema(schema: Any, root: Optional[dict] = None, depth: int = 0) -> Rule:
    """Normalize a JSON-Schema-subset dict into a Rule tree.

    ``True``/``{}`` → match-anything rule; ``False`` → matches nothing
    (represented as ``not_ = anything``).
    """
    if schema is True or schema == {}:
        return Rule()
    if schema is False:
        return Rule(not_=Rule())
    if not isinstance(schema, dict):
        raise SchemaCompileError(f"schema must be dict/bool, got {type(schema).__name__}")
    if root is None:
        root = schema
    if depth > MAX_REF_DEPTH * 4:
        # circular structure beyond unroll budget: accept-everything fallback,
        # mirroring the reference's ref_cache termination
        # (reference: json_schema/schema_compiler.py:563-567)
        return Rule()

    if "$ref" in schema:
        target = _resolve_pointer(root, schema["$ref"])
        if depth >= MAX_REF_DEPTH:
            return Rule()  # bounded unroll of circular refs
        merged = dict(target)
        for k, v in schema.items():  # sibling keywords beside $ref are honored
            if k != "$ref":
                merged.setdefault(k, v)
        return normalize_schema(merged, root, depth + 1)

    r = Rule()
    t = schema.get("type")
    if t is not None:
        r.types = [t] if isinstance(t, str) else list(t)
        r.types_from_list = not isinstance(t, str)
    else:
        inferred = _infer_type(schema)
        if inferred is not None:
            r.types = [inferred]
            r.type_inferred = True

    # string
    r.min_length = schema.get("minLength")
    r.max_length = schema.get("maxLength")
    r.pattern = schema.get("pattern")
    if r.pattern is not None:
        try:
            re.compile(r.pattern)
        except re.error:
            # reference lazily flags bad regex as SCHEMA_INVALID at validate
            # time (json_schema/constraints/strings.py:81-91); we keep the
            # pattern and let the binder emit SCHEMA_INVALID per row.
            pass

    # number: draft-04 boolean exclusives
    r.minimum = schema.get("minimum")
    r.maximum = schema.get("maximum")
    r.exclusive_minimum = bool(schema.get("exclusiveMinimum", False))
    r.exclusive_maximum = bool(schema.get("exclusiveMaximum", False))
    r.multiple_of = schema.get("multipleOf")

    if "enum" in schema:
        r.enum = list(schema["enum"])
    if "const" in schema:
        r.const_set = True
        r.const = schema["const"]

    # array
    r.min_items = schema.get("minItems")
    r.max_items = schema.get("maxItems")
    r.unique_items = bool(schema.get("uniqueItems", False))
    if isinstance(schema.get("items"), (dict, bool)):
        r.items = normalize_schema(schema["items"], root, depth + 1)
    # tuple-form items is out of scope, matching the reference
    # (json_schema/schema_compiler.py:149-151,461-468)

    # object
    r.required = list(schema.get("required", []))
    for k, sub in schema.get("properties", {}).items():
        r.properties[k] = normalize_schema(sub, root, depth + 1)
    for pat, sub in schema.get("patternProperties", {}).items():
        r.pattern_properties[pat] = normalize_schema(sub, root, depth + 1)
    ap = schema.get("additionalProperties")
    if isinstance(ap, bool):
        r.additional_properties = ap
    elif isinstance(ap, dict):
        r.additional_properties = normalize_schema(ap, root, depth + 1)
    if isinstance(schema.get("propertyNames"), (dict, bool)):
        r.property_names = normalize_schema(schema["propertyNames"], root, depth + 1)
    r.min_properties = schema.get("minProperties")
    r.max_properties = schema.get("maxProperties")
    for k, deps in schema.get("dependencies", {}).items():
        if isinstance(deps, list):  # property-dependency form only (reference parity)
            r.dependencies[k] = list(deps)

    # logical — with the parent_properties escape hatch: every branch's
    # additionalProperties check exempts keys declared by ANY branch
    for kw, target in (("allOf", "all_of"), ("anyOf", "any_of"), ("oneOf", "one_of")):
        raw_branches = schema.get(kw, [])
        if not raw_branches:
            continue
        exempt = frozenset(
            k for b in raw_branches for k in _collect_property_names(b, root)
        )
        branches = []
        for b in raw_branches:
            br = normalize_schema(b, root, depth + 1)
            br.exempt_properties = br.exempt_properties | exempt
            branches.append(br)
        setattr(r, target, branches)
    if "not" in schema:
        r.not_ = normalize_schema(schema["not"], root, depth + 1)

    return r


def _collect_property_names(schema: Any, root: dict, depth: int = 0) -> set[str]:
    """Property names declared by a schema, looking through $refs and up to
    two levels of nested logical operators (reference:
    json_schema/constraints/references.py:31-74)."""
    if depth > 2 or not isinstance(schema, dict):
        return set()
    if "$ref" in schema:
        try:
            target = _resolve_pointer(root, schema["$ref"])
        except SchemaCompileError:
            return set()
        return _collect_property_names(target, root, depth)
    names = set(schema.get("properties", {}).keys())
    for kw in ("allOf", "anyOf", "oneOf"):
        for b in schema.get(kw, []):
            names |= _collect_property_names(b, root, depth + 1)
    return names
