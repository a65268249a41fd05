from json_schema_py_spark.schema.model import Rule, normalize_schema  # noqa: F401
from json_schema_py_spark.schema.compiler import compile_ruleset, VIOLATION_TYPE  # noqa: F401
