from json_schema_py_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    normalize_text,
    text_fingerprint,
    word_shingles,
    stable_hash64,
    quality_metrics,
    lang_id,
)
