from json_schema_py_spark.plans.validation import run_validation, partition_verdicts  # noqa: F401
from json_schema_py_spark.plans.checkpoint import LineageLog  # noqa: F401
