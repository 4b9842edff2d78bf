"""Web link graph: href extraction, host-graph reduction, PageRank.

The web-pipeline quality-weighting classic (no reference analog —
spandex has no web surface, SURVEY.md §1.1): crawl corpora weight
documents by host rank (Common Crawl publishes exactly this artifact),
and the rank is PageRank over the host-to-host link graph.

Scale shapes: `extract_links` is pure JVM regexp (codegen, map-only);
`host_graph` is one aggregate; `pagerank` is the standard power
iteration — each round is one shuffle of (dst, contribution) rows, the
rank vector is node-sized (hosts, not pages), dangling mass is
redistributed uniformly so ranks keep summing to 1 (the classic
correction; skipping it leaks mass every round), and iterates are
localCheckpoint-truncated like `dedup.duplicate_clusters` so the plan
stays constant-size across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_links(pages: DataFrame, *, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """(src_url, dst_url) per absolute http(s) href in the page HTML —
    pure JVM regexp_extract_all, map-only. Absolute links only: the
    host-graph use case needs cross-host edges, which are absolute in
    the wild; relative-URL resolution (RFC 3986 merge) is out of scope
    and documented as such. The html column may be binary (decoded as
    UTF-8) or string; fragments are stripped."""
    h = F.col(html_col)
    html = F.when(h.isNotNull(), h.cast("string"))
    hrefs = F.regexp_extract_all(
        html, F.lit(r"""(?i)href\s*=\s*["'](https?://[^"'\s>#]+)"""), 1)
    return (pages.select(F.col(url_col).alias("src_url"),
                         F.explode(hrefs).alias("dst_url")))


def host_graph(links: DataFrame, *, src_col: str = "src_url",
               dst_col: str = "dst_url") -> DataFrame:
    """Reduce page links to weighted host edges: (src, dst, n_links),
    self-loops dropped, hosts lowercased — one aggregate."""
    src = F.lower(F.parse_url(F.col(src_col), F.lit("HOST")))
    dst = F.lower(F.parse_url(F.col(dst_col), F.lit("HOST")))
    return (links.select(src.alias("src"), dst.alias("dst"))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                    & (F.col("src") != F.col("dst")))
            .groupBy("src", "dst").agg(F.count("*").alias("n_links")))


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 20,
             weight_col: str | None = None) -> DataFrame:
    """PageRank by power iteration. Follows the standard formulation:
    rank = (1-d)/n + d * (in-contributions + dangling_mass/n), with
    each node's contribution split over its out-edges (proportional to
    ``weight_col`` when given, else uniformly). Ranks sum to 1 at
    every iterate (pytested invariant). Deterministic — no sampling,
    no order dependence. Output: (node, rank)."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                      w.alias("w"))
         .groupBy("src", "dst").agg(F.sum("w").alias("w"))
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()  # node-sized (hosts), the teleport scalar
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (ranks.join(outw, ranks["node"] == outw["src"], "inner")
                   .join(e, "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") * F.col("w")
                            / F.col("outw")).alias("c")))
        in_mass = contrib.groupBy("node").agg(F.sum("c").alias("c"))
        # dangling nodes (no out-edges) donate their rank uniformly
        dangling = (ranks.join(outw, ranks["node"] == outw["src"],
                               "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .collect()[0][0])  # collect-ok: 1-row dangling-mass scalar per iteration
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (nodes.join(in_mass, "node", "left")
                 .select("node",
                         (F.lit(base) + F.lit(damping)
                          * F.coalesce(F.col("c"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks


def label_propagation(edges: DataFrame, *, src: str = "src",
                      dst: str = "dst", max_iter: int = 20) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the UNDIRECTED graph — the host-clustering
    companion to `pagerank` (mirror-site families, link farms, and
    boilerplate networks surface as communities).

    Deterministic variant: every node votes with its neighbours'
    labels PLUS its own, takes the most frequent label, ties break to
    the SMALLEST label — no randomized visit order (PostGIS-style
    scan-order nondeterminism is exactly what this engine forbids),
    and the self-vote + min-tie-break damp the classic synchronous
    bipartite oscillation.  Convergence = a round with zero label
    changes (1-row probe), else `max_iter` rounds (LPA has no
    guaranteed fixed point; near-convergence after ~5 rounds is the
    published behaviour).

    Scale shape per round: one (node, label) x edges join shuffle +
    one (node, label) count aggregate; state is node-sized;
    localCheckpoint truncation like pagerank.  Output:
    (node, community) where community = the converged label (the min
    member id in the common case)."""
    e = edges.select(F.col(src).cast("string").alias("a"),
                     F.col(dst).cast("string").alias("b"))
    sym = (e.union(e.select(F.col("b").alias("a"),
                            F.col("a").alias("b")))
           .filter(F.col("a") != F.col("b")).distinct()
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    from pyspark.sql import Window
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(),
                                           F.col("label").asc())
    for _ in range(max_iter):
        votes = (sym.join(labels.withColumnRenamed("node", "a"), "a")
                 .select(F.col("b").alias("node"), "label")
                 .unionByName(labels)                # self vote
                 .groupBy("node", "label")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        new = (votes.withColumn("_rk", F.row_number().over(w))
               .filter(F.col("_rk") == 1).drop("_rk", "cnt")
               .localCheckpoint(eager=True))
        changed = (new.join(labels.withColumnRenamed("label", "_old"),
                            "node")
                   .filter(F.col("label") != F.col("_old")).count())  # collect-ok: 1-row convergence probe (pagerank/duplicate_clusters precedent)
        labels = new
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("community"))
