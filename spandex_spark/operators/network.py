"""Vector-network shortest paths: multi-source SSSP over an edge
DataFrame (the road-graph complement of the raster ``cost_distance``).

Frontier-limited Bellman–Ford, pregel-shaped: each round joins the
just-improved frontier against the edge list, relaxes, and folds the
candidates into the distance state with one ``min(struct(dist,
origin))`` aggregate — so ties break deterministically on origin id.
Rounds ≈ the hop count of the longest shortest path (graph diameter),
NOT |V|: the frontier empties as soon as no label improves.

Scale notes (100 TB / planet road graph): the edge list is partitioned
once on ``src`` and persisted — every round's relaxation join reuses
that partitioning, and only frontier-incident edges produce candidate
rows.  State is node-sized (node, dist, origin), never edge-sized.
Iterates are localCheckpoint-truncated per round (the
``dedup.duplicate_clusters`` precedent) so the plan stays constant-size
across rounds.  Multi-source in one pass: seeding all facilities at
dist 0 yields the nearest-facility field (origin column), the network
analog of ``proximity``/``isochrones`` on rasters.

No reference analog — spandex delegates network work to PostGIS/pgRouting
(SURVEY.md §1.1); semantics follow pgRouting's pgr_dijkstra /
pgr_drivingDistance (nonnegative weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(edges: DataFrame, sources: DataFrame, *,
                   src_col: str = "src", dst_col: str = "dst",
                   weight_col: str = "weight",
                   node_col: str = "node",
                   directed: bool = True,
                   max_cost: float | None = None,
                   max_rounds: int = 200,
                   edge_partitions: int | None = None) -> DataFrame:
    """Multi-source shortest paths.

    ``edges``: (src, dst, weight>=0) rows; ``directed=False`` relaxes
    both ways.  ``sources``: one ``node_col`` row per seed (each seeds
    at distance 0 and labels its tree).  ``max_cost`` prunes the
    frontier (pgr_drivingDistance semantics — service-area queries stop
    expanding at the budget).  Returns (node, dist, origin, parent)
    for every REACHED node — (parent, node) rows ARE the shortest-path
    forest's edge list (parent NULL at sources), so routes reconstruct
    by walking parents and the tree itself is a distributed output,
    not a driver artifact.  Unreachable nodes are absent, as in
    pgr_dijkstra.

    Negative weights are rejected by contract (documented, not scanned:
    a full-pass min() pre-check would cost one extra job at 10^12
    edges; callers own the invariant like they do for pgRouting).
    """
    e = edges.select(F.col(src_col).alias("_s"),
                     F.col(dst_col).alias("_d"),
                     F.col(weight_col).cast("double").alias("_w"))
    if not directed:
        e = e.union(edges.select(F.col(dst_col).alias("_s"),
                                 F.col(src_col).alias("_d"),
                                 F.col(weight_col).cast("double")
                                 .alias("_w")))
    nparts = edge_partitions or e.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    e = e.repartition(int(nparts), "_s").persist()

    ntype = sources.schema[node_col].dataType
    state = (sources
             .select(F.col(node_col).alias("node"))
             .distinct()
             .select("node", F.lit(0.0).alias("dist"),
                     F.col("node").alias("origin"),
                     F.lit(None).cast(ntype).alias("parent"))
             .localCheckpoint(eager=True))
    frontier = state

    try:
        for _ in range(max_rounds):
            cand = (frontier.join(e, frontier.node == e._s)
                    .select(F.col("_d").alias("node"),
                            (F.col("dist") + F.col("_w")).alias("dist"),
                            F.col("origin"),
                            frontier.node.alias("parent")))
            if max_cost is not None:
                cand = cand.filter(F.col("dist") <= float(max_cost))
            # fold candidates into state; keep the per-node best label
            # (parent inside the min struct: equal (dist, origin) ties
            # break to the smallest parent — deterministic trees)
            merged = (state.unionByName(cand)
                      .groupBy("node")
                      .agg(F.min(F.struct("dist", "origin", "parent"))
                           .alias("b"))
                      .select("node", F.col("b.dist").alias("dist"),
                              F.col("b.origin").alias("origin"),
                              F.col("b.parent").alias("parent"))
                      .localCheckpoint(eager=True))
            # the new frontier = nodes whose LABEL STRUCT improved this
            # round — comparing dist alone would strand an equal-dist
            # origin/parent re-label without propagating it, leaving
            # children labeled by the losing tree (found in review:
            # tie at X resolved to origin A, but X never re-expanded,
            # so downstream C kept origin B)
            frontier = (merged.join(
                state.select(F.col("node").alias("node"),
                             F.struct("dist", "origin", "parent")
                             .alias("_old")),
                "node", "left")
                .filter(F.col("_old").isNull()
                        | (F.struct("dist", "origin", "parent")
                           < F.col("_old")))
                .select("node", "dist", "origin", "parent")
                .localCheckpoint(eager=True))
            state = merged
            if frontier.limit(1).count() == 0:  # collect-ok: frontier-emptiness probe (cost_distance precedent)
                return state
        raise RuntimeError(
            f"shortest_paths did not converge within {max_rounds} rounds "
            "(graph diameter exceeds max_rounds; raise it)")
    finally:
        e.unpersist()


def service_areas(edges: DataFrame, facilities: DataFrame, *,
                  max_cost: float, **kw) -> DataFrame:
    """Network service areas (pgr_drivingDistance over every facility
    at once): nodes reachable within ``max_cost`` of their NEAREST
    facility, labeled by it.  One multi-source run, not one per
    facility."""
    return shortest_paths(edges, facilities, max_cost=max_cost, **kw)
