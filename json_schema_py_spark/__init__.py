"""json_schema_py_spark — a PySpark-native schema + constraint validation engine.

A from-scratch distributed engine with the rule semantics of the reference
validator (rianlowrey/json-schema-py, see SURVEY.md), re-expressed Spark-first:

* declarative JSON-Schema-subset rulesets compile (driver-side) into a DAG of
  ``pyspark.sql.Column`` boolean expressions producing violation rows
  ``(doc_id, rule_id, path, observed)`` — whole-stage-codegen'd, no per-row
  Python anywhere in the hot path;
* engine-level checks the reference only hints at (per-column stats, HLL
  distinct sketches, quantile sketches, PSI distribution drift, key
  uniqueness, referential integrity) run as fused aggregations and salted
  anti-joins;
* training-data pipeline operators (dedup families, similarity search, text
  analysis, multimodal plumbing) ride the same DataFrame-first design.

Reference semantics documented per-rule in docstrings as
``reference: <file>:<lines>`` citations into /root/reference.
"""

__version__ = "0.1.0"

from json_schema_py_spark.errors import ErrorCode  # noqa: F401
from json_schema_py_spark.schema.model import normalize_schema  # noqa: F401
from json_schema_py_spark.schema.compiler import compile_ruleset  # noqa: F401
