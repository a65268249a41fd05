"""Deterministic sampling + near-dup connected components (round-5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_monotone(spark):
    from json_schema_py_spark.operators.sampling import hash_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s02 = {r["doc_id"] for r in hash_sample(docs, 0.2, seed="t").select("doc_id").collect()}
    # layout-independent: identical sample at any partitioning
    s02b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), 0.2, seed="t").select("doc_id").collect()
    }
    assert s02 == s02b
    # realized count is binomial around fraction*n (500 docs, p=0.2)
    assert 60 <= len(s02) <= 140
    # seed+fraction is a subset relation: growing a sample is monotone
    s05 = {r["doc_id"] for r in hash_sample(docs, 0.5, seed="t").select("doc_id").collect()}
    assert s02 <= s05
    # disjoint seeds decorrelate
    s02o = {r["doc_id"] for r in hash_sample(docs, 0.2, seed="u").select("doc_id").collect()}
    assert s02 != s02o
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, 1.5)
    # no shuffle: a pure filter pushes into the scan stage
    plan = hash_sample(docs, 0.2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_exact_counts(spark):
    from json_schema_py_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = stratified_sample(docs, "source", 10, seed="t")
    per = {r["source"]: r["count"] for r in got.groupBy("source").count().collect()}
    sizes = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    assert per == {s: min(10, n) for s, n in sizes.items()}
    # deterministic at any partitioning
    a = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(7), "source", 10, seed="t")
        .select("doc_id")
        .collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="n_per_stratum"):
        stratified_sample(docs, "source", 0)


def test_dedup_clusters_transitive_families(spark):
    from json_schema_py_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    got = {
        (r["doc_id"], r["cluster_id"]) for r in dedup_clusters(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),  # chain folds to min id transitively
        (10, 10), (11, 10),
        (20, 20), (21, 20),              # duplicate/reversed edges collapse
    }
    # empty graph -> empty result, converges immediately
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_clusters(empty).count() == 0
    # bounded iteration: a diameter-3 chain cannot converge in 1 round
    with pytest.raises(RuntimeError, match="converge"):
        dedup_clusters(
            spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"),
            max_iters=1,
        )


def test_dedup_clusters_on_lsh_pairs(spark):
    """End-to-end: LSH pairs over a corpus with planted clone families
    fold into one cluster per family with the min id as representative."""
    from json_schema_py_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    fam = docs.where(F.col("doc_id") < 5)
    corpus = docs.unionByName(
        fam.withColumn("doc_id", F.col("doc_id") + 100000)
    ).unionByName(fam.withColumn("doc_id", F.col("doc_id") + 200000))
    pairs = minhash_lsh_pairs(corpus, threshold=0.7)
    clusters = dedup_clusters(pairs)
    by_cluster: dict[int, set[int]] = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for i in range(5):
        # each planted family {i, i+100000, i+200000} shares one cluster
        cid = next(c for c, m in by_cluster.items() if i in m)
        assert {i, i + 100000, i + 200000} <= by_cluster[cid]
        assert cid == min(by_cluster[cid])


def test_dedup_clusters_plan_bounded_under_deep_upstream(spark):
    """Round-6 regression: composed inside curate_documents at 2M docs,
    dedup_clusters OOM'd the DRIVER while Spark rendered the plan string —
    persist() caches data but every round's logical plan still nested the
    full upstream lineage.  localCheckpoint must keep the result's plan
    size independent of the caller's plan depth."""
    from json_schema_py_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    # manufacture a deep upstream plan: 120 chained filter/projection layers
    # (linear depth — mimics the curation pipeline's long lineage)
    deep = pairs
    for i in range(120):
        deep = deep.where(F.col("id_a") >= -1 - i).withColumn(
            "id_a", F.col("id_a") + 0
        )
    clusters = dedup_clusters(deep)
    got = {(r["doc_id"], r["cluster_id"]) for r in clusters.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}
    # the checkpoint truncation is what makes this safe: the final plan
    # must not embed the 40-layer upstream (which alone stringifies to
    # hundreds of KB and, at 2M-doc curation depth, to heap exhaustion)
    plan = clusters._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 20_000, f"plan grew with upstream depth: {len(plan)} chars"
    assert "LogicalRDD" in plan  # lineage was truncated to the checkpointed RDD


def test_shuffle_shards_contract(spark):
    """Deterministic global training shuffle: every input row keeps
    exactly one (shard_id, pos); positions are 0..n_shard-1 contiguous
    per shard; the whole assignment is a pure function of (seed, id)."""
    import hashlib

    from json_schema_py_spark.operators.sampling import shuffle_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    got = shuffle_shards(docs, 8, seed="t").select("doc_id", "shard_id", "pos").collect()
    assert len(got) == n
    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r["shard_id"], []).append((r["pos"], r["doc_id"]))
    assert set(by_shard) == set(range(8))  # 500 uniform rows cover all 8
    for shard, rows in by_shard.items():
        assert sorted(p for p, _ in rows) == list(range(len(rows)))
    # hand-recompute the full assignment from the seeded md5
    def h(i):
        return int(hashlib.md5(f"t|{i}".encode()).hexdigest()[:15], 16)

    exp_shard = {r["doc_id"]: h(r["doc_id"]) % 8 for r in got}
    assert {r["doc_id"]: r["shard_id"] for r in got} == exp_shard
    for shard, rows in by_shard.items():
        ids_by_pos = [d for _, d in sorted(rows)]
        assert ids_by_pos == sorted(ids_by_pos, key=lambda d: (h(d), d))
    # layout-independent
    again = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shuffle_shards(docs.repartition(13), 8, seed="t")
        .select("doc_id", "shard_id", "pos")
        .collect()
    }
    assert again == {(r["doc_id"], r["shard_id"], r["pos"]) for r in got}
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(docs, 0)


def test_shuffle_shards_plan_no_global_sort(spark):
    """One hash exchange on the shard key + a partition-local sort — the
    production shard-write shape. A global sort (range partitioning) or a
    single-partition exchange would serialize the corpus."""
    from json_schema_py_spark.operators.sampling import shuffle_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = shuffle_shards(docs, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(shard_id" in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
