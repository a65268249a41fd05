"""Violation sinks: partitioned writes, pruned reads, summaries."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_partitioned_sink_roundtrip_and_pruning(spark, tmp_path):
    from json_schema_py_spark.schema.compiler import validate
    from json_schema_py_spark.sinks import (
        read_violations,
        violation_summary,
        write_violations,
    )
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, spans_documents

    v = validate(spans_documents(spark, SF), DOCUMENTS_RULESET)
    out = str(tmp_path / "viol")
    write_violations(v, out)

    back = read_violations(spark, out)
    assert back.count() == v.count()

    one = read_violations(spark, out, rule_id="ENUM_MISMATCH")
    assert one.count() == 5
    # partition pruning must reach the scan
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "ENUM_MISMATCH" in plan

    summary = {r["rule_id"]: r for r in violation_summary(v).collect()}
    assert summary["ENUM_MISMATCH"]["n_violations"] == 5
    assert summary["ENUM_MISMATCH"]["n_docs"] == 5
    assert summary["ENUM_MISMATCH"]["sample_paths"] == ["/spans/0/kind"]

    # idempotent re-append doubles rows (append mode is the lineage-guarded
    # production default; exactly-once comes from the run_id dedup upstream)
    write_violations(v, out)
    assert read_violations(spark, out).count() == 2 * v.count()


def test_iceberg_bindings_gated(spark):
    """No iceberg runtime in this container: the bindings must probe and
    fail with actionable guidance (never an opaque ClassNotFoundException);
    with the jar present the same entry points are the production path."""
    import pytest

    from json_schema_py_spark.sinks.iceberg import (
        IcebergLineageLog,
        iceberg_available,
        write_violations_iceberg,
    )

    if iceberg_available(spark):  # pragma: no cover - jar not shipped here
        pytest.skip("iceberg runtime present; bindings exercised elsewhere")
    v = spark.createDataFrame([("d1", "X", "/p", "1")], "doc_id string, rule_id string, path string, observed string")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        write_violations_iceberg(v, "lake.db.violations")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergLineageLog(spark, "lake.db.lineage")
