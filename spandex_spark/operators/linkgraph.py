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
             weight_col: str | None = None,
             teleport: DataFrame | None = None) -> DataFrame:
    """PageRank by power iteration. Follows the standard formulation:
    rank = (1-d)·t + d * (in-contributions + dangling_mass·t), with
    each node's contribution split over its out-edges (proportional to
    ``weight_col`` when given, else uniformly). Ranks sum to 1 at
    every iterate (pytested invariant). Deterministic — no sampling,
    no order dependence. Output: (node, rank).

    ``teleport`` personalizes the restart vector t: a (node, weight)
    DataFrame (weights need not be normalized; non-listed nodes get
    t=0).  Uniform t (the default) is classic PageRank; a trusted
    seed set is TrustRank (Gyöngyi et al. 2004, the link-spam
    demotion classic — spam farms inflate uniform-teleport rank but
    cannot reach mass that only restarts at trusted hosts); a single
    node is personalized PageRank.  The teleport vector is node-sized
    state, joined in-plan each round, same shape as the rank vector
    itself."""
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
    if teleport is None:
        tvec = nodes.withColumn("t", F.lit(1.0 / n))
    else:
        # normalize over weights of nodes PRESENT IN THE GRAPH: seeds
        # absent from the edge set would otherwise shrink Σt below 1
        # and leak rank mass every round (Σrank is a pytested
        # invariant) — restrict first, then normalize
        tw = (teleport.select(F.col("node"),
                              F.col("weight").cast("double").alias("_tw"))
              .groupBy("node").agg(F.sum("_tw").alias("_tw"))
              .join(nodes, "node"))
        tot = tw.agg(F.sum("_tw")).collect()[0][0]  # collect-ok: 1-row teleport normalizer
        if not tot or tot <= 0:
            raise ValueError(
                "teleport weights over graph nodes must sum to > 0 "
                "(are all seeds absent from the edge set?)")
        tvec = (nodes.join(tw, "node", "left")
                .select("node", (F.coalesce(F.col("_tw"), F.lit(0.0))
                                 / F.lit(float(tot))).alias("t")))
    tvec = tvec.localCheckpoint(eager=True)
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ranks = tvec.select("node", F.col("t").alias("rank"))
    for _ in range(iters):
        contrib = (ranks.join(outw, ranks["node"] == outw["src"], "inner")
                   .join(e, "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") * F.col("w")
                            / F.col("outw")).alias("c")))
        in_mass = contrib.groupBy("node").agg(F.sum("c").alias("c"))
        # dangling nodes (no out-edges) donate their rank via t
        dangling = (ranks.join(outw, ranks["node"] == outw["src"],
                               "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .collect()[0][0])  # collect-ok: 1-row dangling-mass scalar per iteration
        ranks = (tvec.join(in_mass, "node", "left")
                 .select("node",
                         (F.col("t") * F.lit(1.0 - damping
                                             + damping * dangling)
                          + F.lit(damping)
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


def extract_anchors(pages: DataFrame, *, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """(src_url, dst_url, anchor) per absolute http(s) ``<a>`` element —
    the anchor-text companion to `extract_links` (anchor text is the
    classic weak-label signal for the target page: retrieval training
    pairs, title synthesis, and spam detection all consume exactly this
    table).  Pure JVM: one regexp_extract_all pulls whole ``<a ...>…
    </a>`` elements, then higher-order `transform` lambdas re-extract
    the href and the tag-stripped, whitespace-collapsed inner text —
    map-only, zero Python, zero shuffle.

    Same contracts as `extract_links`: absolute links only, fragments
    stripped, binary html decoded as UTF-8.  Anchors whose inner text
    is empty after tag-stripping (image links) come out as '' — keep
    them; `anchor_stats` callers filter if they want text-only."""
    h = F.col(html_col)
    html = F.when(h.isNotNull(), h.cast("string"))
    # href must be a whole attribute name: \s before it in both
    # patterns, or data-href="http://tracker" would satisfy the
    # element pattern and mis-attribute the anchor (inside the element
    # string href is always preceded by whitespace because of <a\s)
    elems = F.regexp_extract_all(
        html,
        F.lit(r"""(?is)(<a\s(?:[^>]*\s)?href\s*=\s*["']https?://[^"'\s>]+["'][^>]*>.*?</a>)"""),
        1)
    href = lambda e: F.regexp_extract(  # noqa: E731
        e, r"""(?i)\shref\s*=\s*["'](https?://[^"'\s>#]+)""", 1)
    text = lambda e: F.trim(F.regexp_replace(F.regexp_replace(  # noqa: E731
        F.regexp_extract(e, r"(?is)>(.*)</a>$", 1),
        r"(?s)<[^>]*>", " "), r"\s+", " "))
    return (pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.transform(
            elems, lambda e: F.struct(href(e).alias("dst_url"),
                                      text(e).alias("anchor"))
        )).alias("_a"))
        .select("src_url", "_a.dst_url", "_a.anchor")
        .where(F.col("dst_url") != ""))


def anchor_stats(anchors: DataFrame, *, k: int = 5,
                 dst_col: str = "dst_url", src_col: str = "src_url",
                 anchor_col: str = "anchor") -> DataFrame:
    """Per-target anchor profile: (dst_url, n_refs, n_src_hosts,
    top_anchors) where top_anchors is the k most frequent non-empty
    anchor strings (count desc, text asc — deterministic tie break).

    Scale shape: the anchor-text fan-in for popular targets is the
    classic hot key (a homepage can receive 10^8 anchors), so the
    per-anchor count happens FIRST on (dst, anchor) — map-side combine
    collapses repeated strings before anything wide moves — and only
    then does a row_number window keep k rows per target, so the final
    per-target aggregate collects at most k strings, never the raw
    fan-in.  Distinct source hosts via approx HLL (exact opt-in would
    be one more exchange; same trade as urls.domain_stats)."""
    from pyspark.sql import Window
    d, s, a = F.col(dst_col), F.col(src_col), F.col(anchor_col)
    base = anchors.select(d.alias("dst_url"),
                          F.lower(F.parse_url(s, F.lit("HOST")))
                          .alias("_host"), a.alias("anchor"))
    totals = base.groupBy("dst_url").agg(
        F.count("*").alias("n_refs"),
        F.approx_count_distinct("_host").alias("n_src_hosts"))
    counts = (base.where(F.col("anchor") != "")
              .groupBy("dst_url", "anchor")
              .agg(F.count("*").alias("_n")))
    w = Window.partitionBy("dst_url").orderBy(F.col("_n").desc(),
                                              F.col("anchor").asc())
    top = (counts.withColumn("_rk", F.row_number().over(w))
           .where(F.col("_rk") <= k)
           .groupBy("dst_url")
           .agg(F.array_sort(F.collect_list(
               F.struct("_rk", "anchor"))).alias("_t"))
           .select("dst_url", F.transform(
               F.col("_t"), lambda t: t["anchor"]).alias("top_anchors")))
    return (totals.join(top, "dst_url", "left")
            .select("dst_url", "n_refs", "n_src_hosts",
                    F.coalesce(F.col("top_anchors"),
                               F.array().cast("array<string>"))
                    .alias("top_anchors")))


def hits(edges: DataFrame, *, src: str = "src", dst: str = "dst",
         iters: int = 20) -> DataFrame:
    """Kleinberg HITS hubs-and-authorities by power iteration — the
    PageRank sibling (JACM 1999): auth(v) = Σ hub(u) over in-edges,
    then L2-normalize; hub(u) = Σ auth(v) over out-edges, then
    L2-normalize.  Converges to the principal singular vectors of the
    adjacency matrix; deterministic (uniform init, no sampling).

    Scale shape per round: two edge-sized (node, score) join+agg
    shuffles fused into ONE checkpointed job plus ONE 1-row norm
    collect — normalization is pure scaling, so both L2 divisions
    defer to the round's end bit-identically (hub from unnormalized
    auth spans the same direction; the numpy-parity pytest pins the
    values).  State is node-sized; localCheckpoint truncation keeps
    the plan constant across rounds.  Output: (node, hub, auth) —
    nodes with no out-edges get hub 0, no in-edges auth 0."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    scores = nodes.select("node", F.lit(1.0).alias("hub"),
                          F.lit(1.0).alias("auth"))
    for _ in range(iters):
        auth_raw = (scores.join(e, scores["node"] == e["src"])
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum("hub").alias("auth")))
        hub_raw = (auth_raw.join(e, auth_raw["node"] == e["dst"])
                   .groupBy(F.col("src").alias("node"))
                   .agg(F.sum("auth").alias("hub")))
        raw = (nodes.join(auth_raw, "node", "left")
               .join(hub_raw, "node", "left")
               .select("node",
                       F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
                       F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"))
               .localCheckpoint(eager=True))
        norms = raw.agg(
            F.sqrt(F.sum(F.col("auth") * F.col("auth"))).alias("an"),
            F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("hn")
        ).collect()[0]  # collect-ok: 1-row L2 norm scalars, one per round
        an = float(norms["an"]) if norms["an"] else 1.0
        hn = float(norms["hn"]) if norms["hn"] else 1.0
        # cheap projection over the checkpointed base — no lineage growth
        scores = raw.select("node", (F.col("hub") / F.lit(hn)).alias("hub"),
                            (F.col("auth") / F.lit(an)).alias("auth"))
    return scores.select("node", "hub", "auth")
