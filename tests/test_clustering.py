"""Embedding k-means + diversity sampling (round-6): blob recovery,
deterministic tie-breaks, empty-cluster hold, plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

# three well-separated 3-d blobs; ids 0-2 are one seed per blob (the
# deterministic init picks the k lowest ids)
_BLOBS = [
    (0, [10.0, 0.0, 0.0]),
    (1, [0.0, 10.0, 0.0]),
    (2, [0.0, 0.0, 10.0]),
    (10, [10.2, 0.1, 0.0]),
    (11, [9.8, 0.0, 0.2]),
    (12, [10.1, 0.3, 0.1]),
    (20, [0.1, 10.3, 0.0]),
    (21, [0.2, 9.7, 0.1]),
    (30, [0.0, 0.1, 9.9]),
    (31, [0.3, 0.0, 10.4]),
]


def _emb(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in _BLOBS],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_recovers_blobs(spark):
    from json_schema_py_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    e = _emb(spark)
    cents = kmeans_fit(e, k=3, iters=3)
    assert len(cents) == 3 and all(len(c) == 3 for c in cents)
    got = {r["id"]: r["cluster"] for r in kmeans_assign(e, cents).collect()}
    assert got[0] == got[10] == got[11] == got[12]
    assert got[1] == got[20] == got[21]
    assert got[2] == got[30] == got[31]
    assert {got[0], got[1], got[2]} == {0, 1, 2}  # seeds stay home


def test_kmeans_fit_deterministic(spark):
    from json_schema_py_spark.operators.clustering import kmeans_fit

    e = _emb(spark).repartition(8)
    assert kmeans_fit(e, k=3, iters=3) == kmeans_fit(e, k=3, iters=3)


def test_diversity_sample_caps_and_ranks(spark):
    from json_schema_py_spark.operators.clustering import (
        semantic_diversity_sample,
    )

    e = _emb(spark)
    kept = semantic_diversity_sample(e, k=3, iters=2, n_per_cluster=2).collect()
    by_cluster: dict[int, list] = {}
    for r in kept:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert set(by_cluster) == {0, 1, 2}
    for rows in by_cluster.values():
        assert len(rows) == 2
        rows.sort(key=lambda r: r["rank_in_cluster"])
        # rank 1 is centroid-nearest; ties (exact centroid hits) go to
        # the lowest id
        assert rows[0]["dist"] <= rows[1]["dist"]
    # blob 0 has 4 members -> exactly 2 survive the cap
    ids = {r["id"] for r in kept}
    assert len(ids & {0, 10, 11, 12}) == 2


def test_kmeans_empty_cluster_keeps_seed(spark):
    from json_schema_py_spark.operators.clustering import kmeans_fit

    # both seeds identical: every point ties to cluster 0 (lowest index
    # wins), cluster 1 never receives members and must hold its seed
    e = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.5, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_fit(e, k=2, iters=2)
    assert cents[1] == [1.0, 1.0]


def test_clustering_plan_shapes(spark):
    """Assignment is ONE shuffle-free projection (centroids ride as
    literals); the diversity cap compiles to a Partial WindowGroupLimit
    below the cluster exchange."""
    from json_schema_py_spark.operators.clustering import (
        kmeans_assign,
        semantic_diversity_sample,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = [[0.0] * 64, [0.1] * 64]
    aplan = (
        kmeans_assign(e, cents)._jdf.queryExecution().executedPlan().toString()
    )
    # no KEY shuffle and no Python in the hot path (the only Exchange is
    # ensure_parallelism's RoundRobin small-input compaction)
    assert "hashpartitioning" not in aplan and "pythonudf" not in aplan.lower()
    assert "rangepartitioning" not in aplan
    splan = (
        semantic_diversity_sample(e, n_per_cluster=3, centroids=cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in splan and "Partial" in splan
