from json_schema_py_spark.sources.synth import (  # noqa: F401
    DOCUMENTS_RULESET,
    MEDIA_DEPENDENCY_RULESET,
    media_dim,
    spans_documents,
)
from json_schema_py_spark.sources.tables import load_table  # noqa: F401
