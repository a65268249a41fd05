from json_schema_py_spark.sinks.violations import (  # noqa: F401
    read_violations,
    violation_summary,
    write_violations,
)
