"""CLI entry point (reference: json_schema.py:14 → json_schema/cli.py:79-113).

    python -m json_schema_py_spark data.json schema.json [--verbose]
    python -m json_schema_py_spark docs.parquet schema.json --json-col payload

Single JSON file → driver-side validation, no Spark session (exit 0 valid,
1 invalid or load error — reference exit-code contract). A parquet/jsonl
path → Spark engine over the table, violations printed (and optionally
written with --out).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

log = logging.getLogger("json_schema_py_spark")


def _load_json(path: str):
    try:
        with open(path) as f:
            return json.load(f), None
    except FileNotFoundError:
        return None, f"file not found: {path}"
    except json.JSONDecodeError as e:
        return None, f"malformed JSON in {path}: {e}"


def parse_args(argv):
    p = argparse.ArgumentParser(prog="json_schema_py_spark")
    p.add_argument("data", help="JSON document, .jsonl, or .parquet path")
    p.add_argument("schema", help="JSON-Schema-subset file")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--json-col", default=None, help="column holding raw JSON (table mode)")
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--exact", action="store_true", help="reference-exact pandas path (table mode)")
    p.add_argument("--variant", action="store_true",
                   help="Spark 4 VariantType path: per-value runtime typing, JVM-side (table mode)")
    p.add_argument("--auto", action="store_true",
                   help="dialect-aware router: typed path unless a pattern needs CPython regex (table mode)")
    p.add_argument("--out", default=None, help="write violations parquet here (table mode)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO,
                        format="%(levelname)s %(message)s")

    schema, err = _load_json(args.schema)
    if err:
        log.error(err)
        return 1

    if args.data.endswith((".parquet", ".jsonl", ".json.gz")) or args.json_col:
        return _table_mode(args, schema)

    data, err = _load_json(args.data)
    if err:
        log.error(err)
        return 1

    from json_schema_py_spark.api import JsonValidator

    result = JsonValidator(verbose=args.verbose).validate(data, schema)
    for e in result.errors:
        log.error("%s %s: %r", e.code.value, e.path or "<root>", e.value)
    if result.valid:
        log.info("valid")
        return 0
    log.info("invalid: %d error(s)", len(result.errors))
    return 1


def _table_mode(args, schema) -> int:
    from json_schema_py_spark.session import get_spark

    spark = get_spark(app_name="jsps-cli")
    spark.sparkContext.setLogLevel("ERROR")
    reader = spark.read
    df = (
        reader.parquet(args.data)
        if args.data.endswith(".parquet")
        else reader.json(args.data)
    )
    if args.json_col:
        from json_schema_py_spark.plans.json_docs import (
            validate_json_auto,
            validate_json_exact,
            validate_json_typed,
        )
        from json_schema_py_spark.plans.json_variant import validate_json_variant

        fn = (
            validate_json_exact if args.exact
            else validate_json_variant if args.variant
            else validate_json_auto if args.auto
            else validate_json_typed
        )
        violations = fn(df, args.json_col, schema, key_col=args.key_col)
    else:
        from json_schema_py_spark.schema.compiler import validate

        violations = validate(df, schema, key_col=args.key_col)
    if args.out:
        violations.write.mode("overwrite").parquet(args.out)
    n = violations.count()
    for row in violations.limit(50 if not args.verbose else 1000).collect():
        log.error("%s %s %s: %r", row["doc_id"], row["rule_id"], row["path"], row["observed"])
    log.info("%d violation(s)", n)
    return 0 if n == 0 else 1


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
