from json_schema_py_spark.streaming.validate_stream import (  # noqa: F401
    validate_stream,
    windowed_violation_counts,
)
