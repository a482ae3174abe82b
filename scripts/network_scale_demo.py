"""Adaptive-Dijkstra scale demo (VERDICT r03 #1 evidence).

Builds a synthetic continental-scale road lattice IN SPARK (codegen, no
driver materialization): a W×H grid of nodes with 4-neighbour edges —
millions of edges, far above ``DRIVER_MAX_EDGES`` — snaps a PoI sample,
and runs ``bounded_network_distances_auto``.  The dispatcher must
choose the no-broadcast cell-partitioned path (asserted by plan shape),
and the job must complete with bounded memory: the driver never sees
the edge table, only the bounded ``limit(N+1)`` probe.

Appends nothing; prints one JSON line for BENCH/BILLION.md.

Usage: python scripts/network_scale_demo.py [grid_w] [grid_h] [n_pois]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n_pois = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    pitch = 200.0  # metres between lattice nodes

    from greenex_py_spark.operators.network import (
        bounded_network_distances_auto,
        nearest_node,
    )
    from greenex_py_spark.session import get_spark

    spark = get_spark(app_name="net-scale-demo", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    x0, y0 = 100000.0, 450000.0
    nodes = (
        spark.range(w * h)
        .select(
            F.col("id").alias("node_id"),
            (x0 + (F.col("id") % w) * pitch).alias("x"),
            (y0 + F.floor(F.col("id") / w) * pitch).alias("y"),
        )
    )
    right = nodes.filter((F.col("node_id") % w) < w - 1).select(
        F.col("node_id").alias("src"), (F.col("node_id") + 1).alias("dst")
    )
    up = nodes.filter(F.col("node_id") < w * (h - 1)).select(
        F.col("node_id").alias("src"), (F.col("node_id") + w).alias("dst")
    )
    edges = (
        right.unionByName(up)
        .unionByName(
            right.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .unionByName(up.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .withColumn("length", F.lit(pitch))
    )
    n_edges = edges.count()

    pois = (
        spark.range(n_pois)
        .select(
            F.col("id"),
            (x0 + (F.col("id") * 48271 % 1000000) / 1000000.0 * (w - 1) * pitch)
            .alias("x"),
            (y0 + (F.col("id") * 16807 % 1000000) / 1000000.0 * (h - 1) * pitch)
            .alias("y"),
        )
    )

    t0 = time.time()
    snapped = nearest_node(pois, nodes, "id").localCheckpoint()
    reach = bounded_network_distances_auto(snapped, nodes, edges, 450.0, "id")
    plan = reach._jdf.queryExecution().executedPlan().toString()
    took_part_path = "FlatMapCoGroupsInPandas" in plan
    n_reach = reach.count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "grid": f"{w}x{h}",
                "n_nodes": w * h,
                "n_edges": int(n_edges),
                "n_pois": n_pois,
                "radius_m": 450.0,
                "partitioned_path": bool(took_part_path),
                "reach_rows": int(n_reach),
                "wall_s": round(dt, 1),
                "pois_per_s": round(n_pois / dt, 1),
            }
        )
    )
    assert took_part_path, "expected the no-broadcast cogroup path above DRIVER_MAX_EDGES"


if __name__ == "__main__":
    main()
