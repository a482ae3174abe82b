"""Web-graph centrality over document link edges.

Quantized damped PageRank — the canonical web-crawl quality prior
(Page et al. 1999; CommonCrawl ranks hosts the same way to steer crawl
frequency and to prioritize curation).  "Quantized" the way
`clustering.kmeans_fit_predict` is: per-iteration edge contributions are
rounded to exact pico-ints (1e12) before the per-node sum and the rank
vector is re-rounded to 9 dp each round, so the fixpoint iteration is
bit-reproducible across engines and partitionings — the property that
lets the DuckDB oracle unroll the SAME rounds as CTEs and hash-match.

Scale shape per iteration: one equi-join of the edge table to the rank
vector on ``src`` (both sides partitioned by the join key — at web
scale this is the co-partitioned join `engine/bucketing` exists for),
one (dst)-keyed integer-sum aggregation, and two scalar aggregates
(dangling mass, 1 row, broadcast).  Rank lineage is cut with
``localCheckpoint`` each round (CLAUDE.md: iterative DataFrame loops
must checkpoint or Catalyst hangs on plan growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PICO = 1_000_000_000_000.0


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """[node, rank] — damped PageRank after ``n_iters`` quantized
    rounds from the uniform start.  ``edges`` must be distinct directed
    pairs; nodes are everything appearing as src or dst; dangling-node
    mass (nodes with no out-edges) is redistributed uniformly each
    round, summed in pico-ints so the scalar is FP-order independent.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    od = e.groupBy("src").agg(F.count("*").alias("od"))
    eo = e.join(od, "src").localCheckpoint()  # edges + outdeg, reused every round
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), 9).alias("r"))
    base = (1.0 - damping) / n
    for _ in range(n_iters):
        contrib = (
            eo.join(ranks, eo["src"] == ranks["node"])
            .select(
                "dst",
                F.round(F.col("r") / F.col("od") * PICO).cast("long").alias("c"),
            )
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        dang = (
            ranks.join(od, ranks["node"] == od["src"], "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.round(F.col("r") * PICO).cast("long")), F.lit(0)
                ).alias("dgp")
            )
        )
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.round(
                    base
                    + damping * (F.coalesce("s", F.lit(0)) / PICO)
                    + damping * (F.col("dgp") / PICO) / n,
                    9,
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("r").alias("rank"))


def doc_link_edges(df: DataFrame, n_docs: int, id_col: str = "doc_id") -> DataFrame:
    """[src, dst] — deterministic synthetic link graph over the corpus
    (the fixture has no hyperlink column): every document links to
    ``(31·id+7) mod N`` and ``(17·id+3) mod N``, self-links removed,
    distinct.  Affine maps with multipliers coprime-ish to N give a
    connected expander-like digraph — enough structure for PageRank to
    produce a non-uniform, oracle-checkable ranking."""
    d1 = df.select(
        F.col(id_col).alias("src"),
        ((F.col(id_col) * 31 + 7) % n_docs).alias("dst"),
    )
    d2 = df.select(
        F.col(id_col).alias("src"),
        ((F.col(id_col) * 17 + 3) % n_docs).alias("dst"),
    )
    return d1.union(d2).filter(F.col("src") != F.col("dst")).distinct()


def pagerank_oracle_sql(
    n_iters: int = 3, damping: float = 0.85, table: str = "documents"
) -> str:
    """The identical quantized rounds as one DuckDB SQL string (CTE per
    round, unrolled) — generated next to the operator per the
    shared-formula convention so the two sides cannot drift."""
    d = damping
    ctes = [
        f"n AS (SELECT count(*) AS n FROM {table})",
        f"""e0 AS (
  SELECT doc_id AS src, (doc_id * 31 + 7) % n.n AS dst FROM {table} CROSS JOIN n
  UNION ALL
  SELECT doc_id, (doc_id * 17 + 3) % n.n FROM {table} CROSS JOIN n
)""",
        "e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst)",
        "od AS (SELECT src, count(*) AS od FROM e GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM e"
        " UNION SELECT DISTINCT dst FROM e)",
        "r0 AS (SELECT node, round(1.0 / n.n, 9) AS r"
        " FROM nodes CROSS JOIN n)",
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node,
         CAST(round(r{p}.r / od.od * 1000000000000.0) AS BIGINT) AS c
  FROM e JOIN r{p} ON e.src = r{p}.node JOIN od ON od.src = e.src
)"""
        )
        ctes.append(f"s{i} AS (SELECT node, sum(c) AS s FROM c{i} GROUP BY node)")
        ctes.append(
            f"""dg{i} AS (
  SELECT coalesce(sum(CAST(round(r{p}.r * 1000000000000.0) AS BIGINT)), 0) AS dgp
  FROM r{p} LEFT JOIN od ON r{p}.node = od.src WHERE od.src IS NULL
)"""
        )
        ctes.append(
            f"""r{i} AS (
  SELECT nodes.node,
         round((1.0 - {d}) / n.n
               + {d} * (coalesce(s{i}.s, 0) / 1000000000000.0)
               + {d} * (dg{i}.dgp / 1000000000000.0) / n.n, 9) AS r
  FROM nodes LEFT JOIN s{i} ON nodes.node = s{i}.node
  CROSS JOIN n CROSS JOIN dg{i}
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank FROM r{n_iters}"
    )
