#!/usr/bin/env python
"""Round-6 regression attribution (VERDICT r05 item 4, r3 methodology).

BENCH_r05 recorded fused +10%, uniqueness +16%, referential +17%,
minhash_lsh +8.5% vs BENCH_r04 — with git log showing NO code changes on
those hot paths. The r3 rule: a regression on the artifact of record gets
interleaved A/B min-of-6 x2 attribution in the same round. Since the code
is byte-identical on these paths, the A/B here is across TIME BLOCKS on a
quiet host: two interleaved blocks of min-of-6 per query; if block mins
agree with each other and land at-or-below the r4 levels, the r5 artifact
was host-window noise; if they reproduce the r5 levels, something real
changed and the numbers say where.

Also re-runs the 32M-doc fused steady state (r4 2.318M -> r5 2.122M
docs/s) from the cached corpus, min-of-5.

Run ALONE on the host (concurrent JVMs contaminated the first r6 bench
attempt). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

R4 = {"fused": 1.546, "uniqueness": 1.279, "referential": 0.448, "minhash_lsh": 1.983}
R5 = {"fused": 1.705, "uniqueness": 1.486, "referential": 0.524, "minhash_lsh": 2.152}


def main() -> int:
    from json_schema_py_spark.operators.dedup import minhash_lsh_pairs
    from json_schema_py_spark.operators.referential import spans_fk_violations
    from json_schema_py_spark.operators.uniqueness import duplicate_keys
    from json_schema_py_spark.schema.compiler import with_violations
    from json_schema_py_spark.session import get_spark
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, media_dim

    spark = get_spark(app_name="ab-attribution-r6", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    sf = "/root/testdata/sf0.1"
    spans2m = spark.read.parquet("/tmp/bench_spans_sf0.1_400_697d5b6a")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def fused(frame):
        def run():
            ann = with_violations(frame, DOCUMENTS_RULESET)
            ann.agg(
                F.count(F.lit(1)), F.sum(F.size("violations")),
                F.sum(F.col("doc_id").isNull().cast("long")),
                F.min(F.size("spans")), F.max(F.size("spans")),
                F.approx_count_distinct("doc_id", 0.05),
            ).collect()
        return run

    targets = {
        "fused": fused(spans2m),
        "uniqueness": lambda: duplicate_keys(spans2m, "doc_id").count(),
        "referential": lambda: spans_fk_violations(spans2m, media_dim(spark)).count(),
        "minhash_lsh": lambda: minhash_lsh_pairs(docs, threshold=0.7).count(),
    }

    def timed(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    # JIT warm-up outside the measured blocks (the r5 lesson: C2 steady
    # state arrives around rep 7-10; min-of-6 on a cold JVM measures warm-up)
    for fn in targets.values():
        for _ in range(3):
            timed(fn)

    blocks: dict[str, list[float]] = {k: [] for k in targets}
    for _block in range(2):
        for name, fn in targets.items():
            blocks[name].append(round(min(timed(fn) for _ in range(6)), 3))

    out: dict = {}
    for name, mins in blocks.items():
        best = min(mins)
        out[name] = {
            "block_mins": mins,
            "r4": R4[name],
            "r5": R5[name],
            "r6_min": best,
            "vs_r4_pct": round((best / R4[name] - 1) * 100, 1),
            "vs_r5_pct": round((best / R5[name] - 1) * 100, 1),
        }

    # 32M steady state from the cached corpus (fused only, min-of-5)
    p32 = "/tmp/bench_spans_sf0.1_6400_697d5b6a"
    if os.path.exists(p32):
        spans32 = spark.read.parquet(p32)
        n32 = spans32.count()
        f32 = fused(spans32)
        timed(f32)  # warm
        best32 = min(timed(f32) for _ in range(5))
        out["fused_32m"] = {
            "docs": n32,
            "sec": round(best32, 2),
            "docs_per_sec": round(n32 / best32),
            "r4_docs_per_sec": 2318000,
            "r5_docs_per_sec": 2122000,
        }

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
