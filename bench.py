"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.json): PIP-join + tile-assignment throughput
in docs/sec over the synthetic interleaved-span corpus. Per-query wall
seconds land in "queries".

`--scaling` reruns the headline workload at two parallelism levels
(default 8 and 32 cores) in fresh subprocesses and reports throughput
at both plus scaling efficiency (the sandbox stand-in for the north
rule's N vs 4N executor clusters).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_workload(sf_dir: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from geo_import_spark import corpus
    from geo_import_spark.operators import knn as knnmod
    from geo_import_spark.operators import pip as pipmod
    from geo_import_spark.operators import tiling
    from geo_import_spark.session import get_spark
    from geo_import_spark.sources import geojson

    spark = get_spark(cpus=cpus, app=f"geo-import-bench-{cpus}")
    timings: dict[str, float] = {}

    t0 = time.time()
    docs = corpus.documents(spark, sf_dir)
    docs.cache()
    n_docs = docs.count()
    timings["corpus"] = time.time() - t0

    t0 = time.time()
    pts = geojson.point_spans(docs)
    pts.cache()
    n_pts = pts.count()
    timings["parse"] = time.time() - t0

    polys = corpus.polygons(spark, sf_dir)

    t0 = time.time()
    n_hits = pipmod.pip_join(pts, polys).count()
    timings["pip_join"] = time.time() - t0

    t0 = time.time()
    anchors = tiling.first_geometry_anchor(pts)
    n_tiles = tiling.assign_tiles(docs, anchors, z=12).count()
    timings["tile_assign"] = time.time() - t0

    t0 = time.time()
    queries = corpus.knn_queries(spark, sf_dir).filter(
        F.regexp_extract("query_id", r"q-(\d+)", 1).cast("long") <= 120
    )
    n_knn = knnmod.knn_join(queries, pts, k=10, level=6).count()
    timings["knn"] = time.time() - t0

    spark.stop()
    headline = n_docs / (timings["pip_join"] + timings["tile_assign"])
    return {
        "n_docs": n_docs,
        "n_pts": n_pts,
        "n_hits": n_hits,
        "n_tiles": n_tiles,
        "n_knn": n_knn,
        "timings": timings,
        "docs_per_sec": headline,
        "cpus": cpus,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if "--scaling" in sys.argv:
        # Fresh subprocess per parallelism level => clean JVM each run.
        levels = [8, 32]
        results = {}
        for n in levels:
            out = subprocess.run(
                [sys.executable, __file__, "--worker", str(n)],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
                check=True,
            )
            results[n] = json.loads(out.stdout.strip().splitlines()[-1])
        thr = {n: r["docs_per_sec"] for n, r in results.items()}
        eff = (thr[levels[1]] / thr[levels[0]]) / (levels[1] / levels[0])
        print(
            json.dumps(
                {
                    "metric": "pip_tile_docs_per_sec_scaling",
                    "value": round(thr[levels[1]], 1),
                    "unit": "docs/sec",
                    "sf": sf,
                    "throughput": {str(n): round(t, 1) for n, t in thr.items()},
                    "scaling_efficiency": round(eff, 3),
                    "levels": levels,
                }
            )
        )
        return

    if "--worker" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--worker") + 1])

    r = run_workload(sf_dir, cpus)
    print(
        json.dumps(
            {
                "metric": "pip_tile_docs_per_sec",
                "value": round(r["docs_per_sec"], 1),
                "unit": "docs/sec",
                "queries": {k: round(v, 3) for k, v in r["timings"].items()},
                "sf": sf,
                "cpus": r["cpus"],
                "rows": {
                    "docs": r["n_docs"],
                    "points": r["n_pts"],
                    "pip_hits": r["n_hits"],
                    "tiles": r["n_tiles"],
                    "knn": r["n_knn"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
