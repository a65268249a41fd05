from json_schema_py_spark.plans.validation import run_validation, partition_verdicts  # noqa: F401
from json_schema_py_spark.plans.checkpoint import LineageLog  # noqa: F401
from json_schema_py_spark.plans.json_docs import (  # noqa: F401
    validate_json_auto,
    validate_json_exact,
    validate_json_typed,
)
from json_schema_py_spark.plans.json_variant import validate_json_variant  # noqa: F401
