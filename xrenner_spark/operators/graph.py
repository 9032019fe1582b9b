"""Graph analytics over the extracted knowledge graph.

``entity_pagerank`` ranks canonical entities by PageRank over the
subject->object edge graph of the emitted triples — the natural
consumer-side query for the KG this engine produces ("which entities
does this corpus revolve around").

Determinism contract (the kmeans_lloyd recipe applied to an iterative
graph algorithm): scores live in int64 micro-units (1.0 == 1_000_000).
Per iteration each node sends ``score // out_degree`` to its successors
(integer division — exact), incoming contributions sum as int64 (exact,
order-free), and the damped update ``round(150000 + 0.85 * insum)``
re-quantizes: the single double multiply + round is computed identically
by Spark, DuckDB and any IEEE host, so the driver's value hash matches
with no tolerance.  Dangling nodes simply leak their mass (the common
ranking simplification; full PageRank redistributes it — documented,
not accidental).

Scale shape per iteration: one edges-with-scores hash join (both sides
keyed on the node — AQE co-partitions; at 10^11 edges you'd bucket both
tables on src), one map-side-combined groupBy sum, one left join back
to the node list.  Lineage is truncated with an eager localCheckpoint
per round (the dedup_cluster_assign lesson: persist/unpersist chains
cascade-uncache and recompute their whole history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ITERS = 3
PR_SCALE = 1_000_000      # score micro-units
PR_DAMP_NUM = 0.85        # damping (single double multiply per update)
PR_BASE = 150_000         # (1 - damping) * PR_SCALE


def entity_pagerank(triples: DataFrame) -> DataFrame:
    """(entity, score_q) after PR_ITERS damped iterations over the
    distinct subj->obj edges of ``triples``."""
    edges = (triples.filter(F.col("subj").isNotNull()
                            & F.col("obj").isNotNull())
             .select("subj", "obj").distinct()
             .localCheckpoint(eager=True))
    nodes = (edges.select(F.col("subj").alias("node"))
             .union(edges.select(F.col("obj").alias("node")))
             .distinct().localCheckpoint(eager=True))
    outdeg = edges.groupBy("subj").agg(F.count("*").alias("deg"))

    scores = nodes.select("node", F.lit(PR_SCALE).cast("long").alias("q"))
    for _ in range(PR_ITERS):
        contrib = (edges
                   .join(scores.withColumnRenamed("node", "subj"), "subj")
                   .join(outdeg, "subj")
                   .select(F.col("obj").alias("node"),
                           F.expr("q div deg").alias("c")))
        insum = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        scores = (nodes.join(insum, "node", "left")
                  .select("node",
                          F.round(PR_BASE + PR_DAMP_NUM
                                  * F.coalesce(F.col("s"), F.lit(0)))
                          .cast("long").alias("q"))
                  .localCheckpoint(eager=True))
    return scores.select(F.col("node").alias("entity"),
                         F.col("q").alias("score_q"))


def pagerank_sql(triples_sql: str) -> str:
    """Unrolled-CTE DuckDB twin over the same triples query text."""
    parts = ["""
    WITH t AS ({triples}),
    edges AS (SELECT DISTINCT subj, obj FROM t
              WHERE subj IS NOT NULL AND obj IS NOT NULL),
    nodes AS (SELECT subj AS node FROM edges
              UNION SELECT obj FROM edges),
    outdeg AS (SELECT subj, count(*) AS deg FROM edges GROUP BY subj),
    score0 AS (SELECT node, CAST({scale} AS BIGINT) AS q FROM nodes)
    """.format(triples=triples_sql, scale=PR_SCALE)]
    prev = "score0"
    for it in range(1, PR_ITERS + 1):
        parts.append("""
    , contrib{it} AS (
        SELECT e.obj AS node, s.q // d.deg AS c
        FROM edges e
        JOIN {prev} s ON e.subj = s.node
        JOIN outdeg d ON e.subj = d.subj
    ),
    insum{it} AS (SELECT node, SUM(c) AS s FROM contrib{it} GROUP BY node),
    score{it} AS (
        SELECT n.node,
               CAST(round({base} + {damp} * COALESCE(i.s, 0)) AS BIGINT) AS q
        FROM nodes n LEFT JOIN insum{it} i USING (node)
    )
        """.format(it=it, prev=prev, base=PR_BASE, damp=PR_DAMP_NUM))
        prev = "score%d" % it
    parts.append("SELECT node AS entity, q AS score_q FROM %s" % prev)
    return "".join(parts)
