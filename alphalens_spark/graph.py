"""Distributed graph analytics on edge-list DataFrames.

Companion to the connected-components resolver in
:mod:`alphalens_spark.scale.dedup`: where components answer "which rows
are the same thing", PageRank answers "which nodes matter" — e.g. rank
event types by their position in user journeys, rank documents in a
link/citation graph before sampling a training mix, or weight dedup
cluster representatives by centrality.

Scale posture: the graph never leaves the cluster. Each PageRank
iteration is one edges⋈ranks equi-join on ``src`` plus one groupBy on
``dst`` — both linear shuffles partitioned by node key — and the two
scalar terms (node count, dangling mass) ride along as 1-row broadcast
joins, never ``collect()``. Lineage is truncated with an eager
``localCheckpoint`` per iteration, the same pattern the
connected-components loop uses, so the plan stays O(1) deep regardless
of ``n_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution.

    ``pr_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} pr_t(u)·w(u,v)/outw(u) + D_t/N)``
    where ``D_t`` is the rank mass sitting on dangling nodes (no
    out-edges) at step t. Fixed ``n_iter`` power iterations from the
    uniform start — deterministic, so the whole computation replays as
    an unrolled SQL CTE chain for the value oracle.

    ``weight_col=None`` treats every edge as weight 1; parallel edges
    accumulate. Output: (node, pagerank), one row per distinct node
    appearing as src or dst. Σ pagerank = 1 at every step.
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        w.cast("double").alias("w"),
    ).groupBy("src", "dst").agg(F.sum("w").alias("w"))

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    norm = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    )
    # Iteration state lives partitioned by node; checkpoint keeps both
    # the lineage and the re-used frames (norm, nodes) from recomputing.
    norm = norm.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("_n"))  # 1 row, broadcast

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("pr")
    )
    has_out = outw.select(F.col("src").alias("node")).distinct()
    dangling_nodes = nodes.join(has_out, "node", "left_anti").localCheckpoint(
        eager=True
    )
    # No dangling nodes (the common case for transition graphs, where
    # every type also appears as a source): D_t ≡ 0, so drop the
    # per-iteration mass aggregation + broadcast entirely. The count is
    # free — dangling_nodes is already materialized.
    any_dangling = dangling_nodes.count() > 0

    for _ in range(n_iter):
        contrib = (
            norm.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("_c"))
            .withColumnRenamed("dst", "node")
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
        )
        if any_dangling:
            dang = dangling_nodes.join(ranks, "node").agg(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dang")
            )  # 1 row
            nxt = nxt.crossJoin(F.broadcast(dang))
            dang_term = F.col("_dang") / F.col("_n")
        else:
            dang_term = F.lit(0.0)
        ranks = (
            nxt.select(
                "node",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + dang_term)
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("pr").alias("pagerank"))


def pagerank_sql(
    edges_cte: str,
    n_iter: int = 10,
    damping: float = 0.85,
    round_dp: int = 6,
) -> str:
    """Unrolled-CTE SQL twin of :func:`pagerank` for DuckDB oracles.

    ``edges_cte`` must be a SELECT producing (src, dst, w). Returns a
    full query emitting (node, pagerank) after ``n_iter`` iterations —
    textbook power iteration written as chained CTEs, one pair per step.
    """
    d = damping
    # Every CTE is AS MATERIALIZED: r{i} is referenced twice per step
    # (dangling mass + contributions), so default inlining would expand
    # the tree 2^n_iter-fold — the exact planner blowup the round-3
    # panel-CTE fix documented. Materialization keeps planning linear.
    parts = [
        f"WITH eraw AS MATERIALIZED ({edges_cte})",
        "e0 AS MATERIALIZED (SELECT src, dst, sum(w) AS w FROM eraw GROUP BY 1, 2)",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e0 UNION SELECT dst FROM e0))",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes)",
        "outw AS MATERIALIZED (SELECT src, sum(w) AS outw FROM e0 GROUP BY 1)",
        "e AS MATERIALIZED (SELECT e0.src, e0.dst, e0.w / outw.outw AS p "
        "FROM e0 JOIN outw ON e0.src = outw.src)",
        "dn AS MATERIALIZED "
        "(SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM e0))",
        "r0 AS MATERIALIZED "
        "(SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT coalesce(sum(pr), 0.0) AS m "
            f"FROM r{i} WHERE node IN (SELECT node FROM dn))"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS node, sum(r.pr * e.p) AS c "
            f"FROM e JOIN r{i} r ON e.src = r.node GROUP BY 1)"
        )
        parts.append(
            f"r{i + 1} AS MATERIALIZED (SELECT n.node, "
            f"(1.0 - {d}) / (SELECT n FROM nn) + {d} * ("
            f"coalesce(c.c, 0.0) + (SELECT m FROM d{i}) / (SELECT n FROM nn)"
            f") AS pr FROM nodes n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, round(pr, {round_dp}) AS pagerank FROM r{n_iter}"
    )
