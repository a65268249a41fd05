"""Physical-plan audits: the 100 TB requirements as assertions.

Every claim the scale story makes is checked against the optimizer output:
shuffle-free validation, broadcast FK joins, column pruning reaching the
scan, partial aggregation on cross-row checks, one fused aggregate for
stats. If a refactor regresses a plan shape, these fail before any slow
benchmark would notice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_validation_is_shuffle_free(spark):
    """Per-row validation = pure projection: no Exchange anywhere."""
    from json_schema_py_spark.schema.compiler import with_violations
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, spans_documents

    plan = _physical(with_violations(spans_documents(spark, SF), DOCUMENTS_RULESET))
    assert "Exchange" not in plan
    assert "BatchScan" in plan or "FileScan" in plan or "Scan parquet" in plan


def test_validation_single_scan(spark):
    from json_schema_py_spark.schema.compiler import with_violations
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, spans_documents

    plan = _optimized(with_violations(spans_documents(spark, SF), DOCUMENTS_RULESET))
    assert plan.count("Relation") == 1


def test_fk_join_broadcasts_small_dim(spark):
    from json_schema_py_spark.operators.referential import spans_fk_violations
    from json_schema_py_spark.sources.synth import media_dim, spans_documents

    plan = _physical(
        spans_fk_violations(spans_documents(spark, SF), media_dim(spark))
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_stats_is_one_fused_aggregate_over_one_scan(spark):
    from json_schema_py_spark.operators.stats import column_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = column_stats(docs, ["n_chars", "lang", "source"])
    opt = _optimized(df)
    assert opt.count("Aggregate") == 1
    assert opt.count("Relation") == 1
    phys = _physical(df)
    # partial (map-side) + final aggregate over a single scan
    assert phys.count("HashAggregate") + phys.count("SortAggregate") >= 2


def test_stats_prunes_unwatched_columns(spark):
    from json_schema_py_spark.operators.stats import column_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    phys = _physical(column_stats(docs, ["n_chars"]))
    scan_line = [l for l in phys.splitlines() if "parquet" in l.lower()]
    assert scan_line and "text" not in scan_line[0], "text column must be pruned"


def test_filter_pushdown_reaches_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").where(F.col("doc_id") < 10)
    phys = _physical(docs.select("doc_id"))
    assert "PushedFilters: [" in phys and "LessThan(doc_id" in phys


def test_uniqueness_two_stage_partial_agg(spark):
    from json_schema_py_spark.operators.uniqueness import duplicate_keys
    from json_schema_py_spark.sources.synth import spans_documents

    plan = _physical(duplicate_keys(spans_documents(spark, SF), "doc_id"))
    # salted first stage + final per-key stage; each hash-aggregates partially
    assert plan.count("HashAggregate") >= 3
    assert "Exchange" in plan


def test_fused_pass_stays_whole_stage_codegen(spark):
    """The headline pass must not fall out of codegen except for the HOF
    subtrees (which are interpreted by design)."""
    from json_schema_py_spark.schema.compiler import with_violations
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, spans_documents

    ann = with_violations(spans_documents(spark, SF), DOCUMENTS_RULESET)
    agg = ann.agg(F.count(F.lit(1)), F.sum(F.size("violations")))
    agg.collect()  # AQE only materializes the final plan after execution
    plan = _physical(agg)
    # '*(n)' marks WholeStageCodegen stages in the compact formatting; the
    # aggregates must be codegen'd (the HOF projection is interpreted by design)
    assert "*(" in plan and "*(2) HashAggregate" in plan or "WholeStageCodegen" in plan


def test_no_python_udfs_in_hot_paths(spark):
    """Validation, stats, dedup, similarity: zero Python in the plan
    (BatchEvalPython / ArrowEvalPython / mapInPandas only appear in the two
    designated pandas paths: exact-JSON and multimodal decode)."""
    from json_schema_py_spark.operators.dedup import minhash_lsh_pairs, simhash
    from json_schema_py_spark.operators.similarity import brute_force_topk
    from json_schema_py_spark.operators.stats import column_stats
    from json_schema_py_spark.schema.compiler import with_violations
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, spans_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plans = [
        _physical(with_violations(spans_documents(spark, SF), DOCUMENTS_RULESET)),
        _physical(column_stats(docs, ["n_chars"])),
        _physical(minhash_lsh_pairs(docs)),
        _physical(simhash(docs)),
        _physical(brute_force_topk(emb, emb.limit(5))),
    ]
    from json_schema_py_spark.operators.classifier import (
        score_quality,
        train_nb_classifier,
    )
    from json_schema_py_spark.operators.substring import (
        hot_ngrams,
        strip_duplicate_ngrams,
    )

    labeled = docs.select(
        "doc_id", "text", F.when(F.col("lang") == "en", 1).otherwise(0).alias("label")
    )
    w, b = train_nb_classifier(labeled)
    hot = hot_ngrams(docs.select("doc_id", "text"), k=8, min_count=2)
    plans.append(_physical(score_quality(labeled, w, b)))
    plans.append(_physical(strip_duplicate_ngrams(docs.select("doc_id", "text"), hot, k=8)))
    for p in plans:
        assert "EvalPython" not in p and "InPandas" not in p


def test_lsh_band_exchange_carries_ids_only(spark):
    """minhash_lsh_pairs shuffle diet (round-2): the band-bucket exchange
    ships (band, bkey, id) only — the shingle payload must never ride a
    shuffle of the full table. Shingles re-attach to candidates via
    broadcast joins."""
    from json_schema_py_spark.operators.dedup import minhash_lsh_pairs
    from json_schema_py_spark.sources.synth import spans_documents  # noqa: F401

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _physical(minhash_lsh_pairs(docs))
    # every hash-partitioned exchange on the band key must not project shingles
    for line in plan.splitlines():
        if "Exchange hashpartitioning(band" in line:
            assert "shingles" not in line, line
    # the candidate re-attach is a broadcast (full table never shuffled by id)
    assert "BroadcastHashJoin" in plan
    # no exchange anywhere in the plan carries a shingles projection
    exchanging = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l and "shingles" in l
    ]
    # the only allowed shingle-bearing exchange is the candidate-pair zip
    # (id_a, id_b) — bounded by candidate count, not table size
    for l in exchanging:
        assert "id_a" in l and "id_b" in l, f"table-sized shingle shuffle: {l}"


def test_bucketed_join_eliminates_shuffle(spark):
    """The 100 TB co-location doctrine made concrete: two tables bucketed on
    doc_id join WITHOUT any Exchange — the shuffle happened once at write
    time (bucketBy), every later join/agg on the key reuses it. This is the
    lake layout the uniqueness/FK checks assume for repeated runs."""
    import uuid

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "n_chars")
    other = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    ta, tb = f"bkt_a_{uuid.uuid4().hex[:8]}", f"bkt_b_{uuid.uuid4().hex[:8]}"
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast: at lake scale BOTH sides are huge — the point is
        # the shuffle-free SMJ over pre-bucketed layouts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        docs.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(ta)
        other.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(tb)
        joined = spark.table(ta).join(spark.table(tb), "doc_id")
        plan = _physical(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert joined.count() == docs.count()
        # and a key-aggregation over one bucketed table also skips the shuffle
        agg_plan = _physical(
            spark.table(ta).groupBy("doc_id").agg(F.count(F.lit(1)))
        )
        assert "Exchange hashpartitioning" not in agg_plan, agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_compile_ruleset_cache_returns_same_column(spark):
    """The compiled-Column cache (round 3): repeat compiles of the same
    (schema, struct_type) return the SAME Column object — the driver-side
    py4j expression build (~1.3s for the documents ruleset, 10x the 2M-row
    execution) is paid once per process. Rule-instance schemas skip the
    cache (no stable content key)."""
    from pyspark.sql import types as T

    from json_schema_py_spark.schema.compiler import compile_fires, compile_ruleset
    from json_schema_py_spark.schema.model import normalize_schema

    st = T.StructType([T.StructField("a", T.LongType())])
    schema = {"properties": {"a": {"minimum": 0}}}
    c1 = compile_ruleset(schema, st)
    c2 = compile_ruleset(schema, st)
    assert c1 is c2
    # different struct type or flags -> different cache slots
    st2 = T.StructType([T.StructField("a", T.DoubleType())])
    assert compile_ruleset(schema, st2) is not c1
    assert compile_ruleset(schema, st, verbose=True) is not c1
    f1 = compile_fires(schema, st)
    assert compile_fires(schema, st) is f1 and f1 is not c1
    # Rule instances bypass the cache
    r = normalize_schema(schema)
    assert compile_ruleset(r, st) is not compile_ruleset(r, st)


def test_compile_cache_preserves_property_order(spark):
    """Schemas differing ONLY in properties order must compile separately:
    key order drives the order-exact violation emission, and a sorted-key
    cache key would hand schema B schema A's emission order (review r03)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from json_schema_py_spark.schema.compiler import compile_ruleset

    st = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.LongType())])
    sa = {"properties": {"a": {"minimum": 10}, "b": {"minimum": 10}}}
    sb = {"properties": {"b": {"minimum": 10}, "a": {"minimum": 10}}}
    ca, cb = compile_ruleset(sa, st), compile_ruleset(sb, st)
    assert ca is not cb
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    ra = df.select(F.transform(ca, lambda v: v["path"]).alias("p")).collect()[0]["p"]
    rb = df.select(F.transform(cb, lambda v: v["path"]).alias("p")).collect()[0]["p"]
    assert ra == ["/a", "/b"] and rb == ["/b", "/a"]


def test_compile_cache_survives_session_restart():
    """The cache docstring claims a compiled Column outlives the
    SparkSession that built it (the py4j gateway/JVM is per-process, and a
    Column is an unresolved name-bound tree) — pinned in a subprocess so
    the fixture session is untouched."""
    import subprocess
    import sys

    code = """
from json_schema_py_spark.session import get_spark
from pyspark.sql import types as T
from json_schema_py_spark.schema.compiler import compile_ruleset
st = T.StructType([T.StructField("a", T.LongType())])
schema = {"properties": {"a": {"minimum": 5}}}
s1 = get_spark(cpus=2, app_name="cache-a")
c = compile_ruleset(schema, st)
s1.stop()
s2 = get_spark(cpus=2, app_name="cache-b")
assert compile_ruleset(schema, st) is c  # cache hit across sessions
df = s2.createDataFrame([(1,), (9,)], "a long")
import pyspark.sql.functions as F
n = df.select(F.size(c).alias("n")).collect()
assert [r["n"] for r in n] == [1, 0], n
print("OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr[-2000:]


def test_disk_compile_cache_across_processes(tmp_path):
    """Round-4 (VERDICT r03 item 3): the disk-persisted compile cache. A
    spark-submit job previously paid the ~1.3s py4j expression build once
    per JOB; now process A serializes the unresolved catalyst tree and
    process B restores it with ONE py4j deserialize call. Process B proves
    it never live-builds (RuleBinder.bind is replaced with a bomb) and the
    restored tree produces identical violations."""
    import subprocess
    import sys

    code_a = """
from json_schema_py_spark.session import get_spark
from pyspark.sql import types as T
import pyspark.sql.functions as F
from json_schema_py_spark.schema.compiler import compile_ruleset
s = get_spark(cpus=2, app_name="diskcache-a")
st = T.StructType([T.StructField("a", T.LongType()), T.StructField("s", T.StringType())])
schema = {"properties": {"a": {"minimum": 5}, "s": {"minLength": 2, "pattern": "^x"}},
          "required": ["a"]}
c = compile_ruleset(schema, st)
df = s.createDataFrame([(1, "xy"), (9, "q"), (None, None)], "a long, s string")
rows = df.select(F.transform(c, lambda v: v["rule_id"]).alias("r")).collect()
print("A:", [r["r"] for r in rows])
"""
    code_b = """
from json_schema_py_spark.session import get_spark
from pyspark.sql import types as T
import pyspark.sql.functions as F
import json_schema_py_spark.schema.compiler as C
s = get_spark(cpus=2, app_name="diskcache-b")
def boom(*a, **k): raise AssertionError("live build in process B")
C.RuleBinder.bind = boom
st = T.StructType([T.StructField("a", T.LongType()), T.StructField("s", T.StringType())])
schema = {"properties": {"a": {"minimum": 5}, "s": {"minLength": 2, "pattern": "^x"}},
          "required": ["a"]}
c = C.compile_ruleset(schema, st)
df = s.createDataFrame([(1, "xy"), (9, "q"), (None, None)], "a long, s string")
rows = df.select(F.transform(c, lambda v: v["rule_id"]).alias("r")).collect()
print("B:", [r["r"] for r in rows])
"""
    import os

    env = dict(os.environ, SPARK_SCHEMA_COMPILE_CACHE=str(tmp_path / "cc"))
    outs = []
    for code in (code_a, code_b):
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        outs.append(out.stdout)
    expect = "[['NUMBER_TOO_SMALL'], ['STRING_TOO_SHORT', 'PATTERN_MISMATCH'], ['REQUIRED_PROPERTY_MISSING']]"
    assert f"A: {expect}" in outs[0], outs[0]
    assert f"B: {expect}" in outs[1], outs[1]
    # exactly one cache entry was written, and B added none
    files = list((tmp_path / "cc").glob("*.expr"))
    assert len(files) == 1, files


def test_disk_compile_cache_disabled_and_corrupt_entry(tmp_path, monkeypatch):
    """Cache robustness: SPARK_SCHEMA_COMPILE_CACHE=off disables all disk
    I/O; a corrupt entry is deleted and falls back to a live build."""
    import json_schema_py_spark.schema.compiler as C
    from pyspark.sql import types as T

    st = T.StructType([T.StructField("z", T.LongType())])
    schema = {"properties": {"z": {"maximum": 3}}}

    monkeypatch.setenv("SPARK_SCHEMA_COMPILE_CACHE", "off")
    assert C._disk_cache_dir() is None
    assert C._disk_cache_path(("k",)) is None

    cc = tmp_path / "cc2"
    monkeypatch.setenv("SPARK_SCHEMA_COMPILE_CACHE", str(cc))
    key = C._compile_cache_key(schema, st, "viol:False:bindTrue")
    path = C._disk_cache_path(key)
    path.parent.mkdir(parents=True)
    path.write_bytes(b"not a java object stream")
    C._COMPILE_CACHE.pop(key, None)
    col = C.compile_ruleset(schema, st)  # falls back to live build
    assert col is not None
    assert not path.exists() or path.stat().st_size > 100  # corrupt removed (rewritten by store)


def test_disk_cache_refuses_untrusted_dir_and_sets_modes(tmp_path, monkeypatch, spark):
    """ADVICE r04: cache entries are Java-deserialized, so the disk cache
    (a) creates its dir 0700 / files 0600, (b) refuses to load from or
    seed a group/other-writable dir, and (c) disables itself entirely
    when the engine source is unreadable (zip/egg deployment) instead of
    keying entries on a version-blind filename hash."""
    import os

    import json_schema_py_spark.schema.compiler as C
    from pyspark.sql import types as T

    st = T.StructType([T.StructField("q", T.LongType())])
    schema = {"properties": {"q": {"minimum": 0}}}
    key = C._compile_cache_key(schema, st, "viol:False:bindTrue")

    # (a) fresh dir: store creates it 0700, entry file 0600
    cc = tmp_path / "secure"
    monkeypatch.setenv("SPARK_SCHEMA_COMPILE_CACHE", str(cc))
    C._COMPILE_CACHE.pop(key, None)
    C.compile_ruleset(schema, st)
    files = list(cc.glob("*.expr"))
    assert files, "store should have written an entry"
    assert (cc.stat().st_mode & 0o777) == 0o700
    assert (files[0].stat().st_mode & 0o777) == 0o600

    # (b) world-writable dir: load refuses, store refuses to add entries
    os.chmod(cc, 0o777)
    assert C._trusted_cache_dir() is None
    assert C._disk_cache_load(key) is None
    key2 = C._compile_cache_key({"properties": {"q": {"minimum": 7}}}, st, "viol:False:bindTrue")
    C._COMPILE_CACHE.pop(key2, None)
    C.compile_ruleset({"properties": {"q": {"minimum": 7}}}, st)
    assert len(list(cc.glob("*.expr"))) == 1  # nothing new seeded
    os.chmod(cc, 0o700)
    assert C._trusted_cache_dir() is not None

    # (c) unreadable engine source -> no disk keying at all
    monkeypatch.setattr(C, "_ENGINE_SOURCE_HASH", "")
    assert C._engine_source_hash() is None
    assert C._disk_cache_path(key) is None


def test_dialect_warnings_skip_data_positions():
    """ADVICE r04: the cache-hit warning walk flags 'pattern' only in
    SCHEMA positions — a pattern-shaped key inside const/enum/default
    literal values is data, not a regex; and one bad pattern never
    truncates the remaining warnings."""
    import warnings

    import json_schema_py_spark.schema.compiler as C
    from json_schema_py_spark.schema.regex_dialect import RegexDialectWarning

    data_only = {
        "properties": {
            "a": {"const": {"pattern": "(?P<x>a)"}},
            "b": {"enum": [{"pattern": "(?P<x>a)"}]},
            "c": {"default": {"pattern": "(?P<x>a)"}},
        }
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        C._emit_dialect_warnings(data_only)
    assert not any(issubclass(x.category, RegexDialectWarning) for x in w)

    mixed = {
        "properties": {
            # invalid-in-both-dialects pattern first: must not swallow the
            # warning for the next property
            "a": {"pattern": "("},
            "b": {"pattern": "(?P<x>a)"},
        }
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        C._emit_dialect_warnings(mixed)
    assert any(issubclass(x.category, RegexDialectWarning) for x in w)

    # review r05: a PROPERTY literally named 'default'/'enum' holds a
    # subschema — its patterns must still warn (the data-key skip applies
    # only in schema positions, and properties/$defs keys are names)
    named = {
        "properties": {"default": {"pattern": "(?P<x>a)"}},
        "$defs": {"enum": {"pattern": "(?P<y>b)"}},
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        C._emit_dialect_warnings(named)
    assert sum(issubclass(x.category, RegexDialectWarning) for x in w) >= 2


def _with_auto_broadcast_off(spark):
    """Context manager: disable the size-threshold auto-broadcast so the
    only BroadcastHashJoins left in a plan are explicitly hinted ones."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    return ctx()


def test_tfidf_df_table_is_not_force_broadcast(spark):
    """Round-6 (VERDICT r05 item 2): the document-frequency table is the
    CORPUS VOCABULARY (10^8-10^9 terms at web scale) — it must reach the
    tf frame via a shuffle join, not a forced broadcast. With the
    threshold off, the only broadcast left is the 1-row corpus-size
    aggregate (hinted, genuinely bounded)."""
    from json_schema_py_spark.operators.keywords import tfidf_top_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with _with_auto_broadcast_off(spark):
        plan = _physical(tfidf_top_terms(docs.select("doc_id", "text"), k=3))
    assert "SortMergeJoin" in plan, "df join must survive without broadcast"
    assert "BroadcastHashJoin" not in plan, "no equi-join may be force-broadcast"


def test_lm_bigram_table_is_not_force_broadcast(spark):
    """Round-6 (VERDICT r05 item 2): score_perplexity's bigram table is
    bounded by observed corpus bigrams (up to V^2) — shuffle join on
    (w, w2). The vocab and unigram tables (≤ V rows by construction) stay
    hinted broadcasts."""
    from json_schema_py_spark.operators.lm import score_perplexity, train_bigram_lm

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    vocab, uni, bi = train_bigram_lm(d, vocab_size=50)
    with _with_auto_broadcast_off(spark):
        plan = _physical(score_perplexity(d, vocab, uni, bi))
    assert "SortMergeJoin" in plan, "bigram join must survive without broadcast"
    # the hinted vocab/unigram broadcasts remain
    assert "BroadcastHashJoin" in plan
    # and the bigram join keys really are the shuffle-join keys
    smj_lines = [l for l in plan.splitlines() if "SortMergeJoin" in l]
    assert any("w2" in l for l in smj_lines), smj_lines


def test_lm_vocab_topk_is_two_stage(spark):
    """Round-6 (VERDICT r05 item 3): the vocab ranking must pre-filter
    per-partition (local top-k keyed by spark_partition_id) so the global
    rank sorts bounded survivors, never the full distinct-token table
    through one task."""
    from json_schema_py_spark.operators.lm import train_bigram_lm

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    vocab, _, _ = train_bigram_lm(d, vocab_size=50)
    plan = _physical(vocab)
    assert "hashpartitioning(_pid" in plan, "local-rank stage must shuffle by _pid"
    # the VERDICT r05 criterion verbatim: no single-partition Exchange —
    # Catalyst turns the bounded-survivor global rank into a distributed
    # TakeOrderedAndProject (per-partition top-k + merge), and
    # WindowGroupLimit caps rows BEFORE the _pid exchange too
    assert "SinglePartition" not in plan, "full-table single-task sort is back"
    assert "TakeOrderedAndProject" in plan
    assert "WindowGroupLimit" in plan


def test_curation_drop_lists_are_not_force_broadcast(spark):
    """Round-6 (VERDICT r05 item 2): the exact-dup and combined drop lists
    are corpus-sized in the worst case — both re-attach joins (anti +
    final left) must survive with the auto-broadcast threshold off."""
    from json_schema_py_spark.plans.curation import curate_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet").where(F.col("doc_id") < 200)
    with _with_auto_broadcast_off(spark):
        plan = _physical(
            curate_documents(docs, min_tokens=5, max_tokens=500, lang=None,
                             persist_intermediates=False)
        )
    anti_lines = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti_lines, "expected the exact-drop anti-join in the plan"
    for l in anti_lines:
        assert "Broadcast" not in l, f"anti-join must not broadcast: {l}"
    # the final reason join (LeftOuter on doc_id) must also be shuffle-based
    outer_lines = [l for l in plan.splitlines() if "LeftOuter" in l]
    assert outer_lines, "expected the final reason join in the plan"
    for l in outer_lines:
        assert "Broadcast" not in l, f"reason join must not broadcast: {l}"


def test_classifier_weights_table_is_not_force_broadcast(spark):
    """Round-6: score_quality's weights table is the TRAINING vocabulary —
    small for curated seed sets, but nothing bounds it structurally, so it
    must reach the token stream via a plain shuffle join (Spark's size
    threshold auto-broadcasts genuinely small models). The only hinted
    broadcast is the 1-row bias frame."""
    from json_schema_py_spark.operators.classifier import (
        score_quality,
        train_nb_classifier,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text",
                F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"))
    )
    w, b = train_nb_classifier(docs)
    with _with_auto_broadcast_off(spark):
        plan = _physical(score_quality(docs, w, b))
    assert "SortMergeJoin" in plan, "weights join must survive without broadcast"
    # exactly the hinted 1-row bias/totals broadcasts remain — no
    # BroadcastHashJoin on an unbounded table (bias attaches via a
    # broadcast nested loop over 1 row)
    for l in plan.splitlines():
        if "BroadcastHashJoin" in l:
            raise AssertionError(f"no equi-join may be force-broadcast: {l}")


def test_substring_hot_table_is_not_force_broadcast(spark):
    """Round-6: the hot-shingle table is bounded only by the repetition
    profile of the corpus — shuffle joins everywhere, and the corpus count
    pass must be ONE map-side-combinable aggregate."""
    from json_schema_py_spark.operators.substring import (
        hot_ngrams,
        strip_duplicate_ngrams,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    hot = hot_ngrams(docs, k=8, min_count=2)
    hot_plan = _physical(hot)
    assert "partial_count" in hot_plan, "hot count must map-side combine"
    with _with_auto_broadcast_off(spark):
        plan = _physical(strip_duplicate_ngrams(docs, hot, k=8))
    assert "SortMergeJoin" in plan, "hot joins must survive without broadcast"
    assert "BroadcastHashJoin" not in plan


def test_uniqueness_violation_join_is_not_force_broadcast(spark):
    """Round-7 (VERDICT r06 item 3): the duplicate-key set is corpus-scale
    on a heavily-duplicated corpus — the join back onto the table must
    survive without a forced broadcast; AQE auto-broadcasts small sets."""
    from json_schema_py_spark.operators.uniqueness import uniqueness_violations

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dup = docs.select("doc_id").unionByName(
        docs.select("doc_id").limit(5)
    )
    with _with_auto_broadcast_off(spark):
        plan = _physical(uniqueness_violations(dup, "doc_id"))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan, "no equi-join may be force-broadcast"
