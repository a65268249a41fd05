from json_schema_py_spark.operators.stats import column_stats  # noqa: F401
from json_schema_py_spark.operators.drift import histogram, psi  # noqa: F401
from json_schema_py_spark.operators.uniqueness import duplicate_keys, uniqueness_violations  # noqa: F401
from json_schema_py_spark.operators.referential import fk_violations, spans_fk_violations  # noqa: F401
from json_schema_py_spark.operators.spans import span_fingerprints, sequence_mismatches  # noqa: F401
