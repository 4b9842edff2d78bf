"""Physical-plan audit: dump executed plans of the core operators to
PLANS.md so pushdown/broadcast/codegen claims are checkable evidence, not
assertions. Run: python scripts/explain_audit.py"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKS = {
    "pip_tag (two-phase cell join)": [
        ("BroadcastHashJoin", "polygon side broadcast"),
        ("PushedFilters", "scan-level pushdown present"),
    ],
    "knn broadcast (k=1 agg path)": [
        ("SortAggregate|HashAggregate",
         "partial+final agg (sort-based — struct-ordered min_by has no hash "
         "buffer; map-side combine still applies, which is what matters)"),
        ("BroadcastNestedLoopJoin|BroadcastHashJoin|CartesianProduct",
         "broadcast feature side"),
    ],
    "overlay": [("BroadcastHashJoin", "overlay side broadcast"),
                (r"least\(", "rect×rect fast path is pure JVM arithmetic "
                             "(LEAST/GREATEST inside codegen, no Python)")],
    "knn cells (histogram two-job path)": [
        ("Generate explode", "candidate cells explode (per-query box)"),
        ("HashAggregate|SortAggregate", "k=1 min_by map-side combine"),
    ],
    "nearest_road (linestring kernel)": [
        ("MapInPandas", "vectorized point-to-segment kernel"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — ranks computed in the "
                                  "kernel, no join on the point stream"),
    ],
    "q1 relational": [(r"\*\(\d+\)", "whole-stage codegen spans present"),
                      ("HashAggregate", "hash aggregation"),
                      ("PushedFilters: \\[IsNotNull\\(l_quantity\\), GreaterThan",
                       "filter pushed to parquet scan")],
    "nearest_road (cells two-job path)": [
        ("Generate explode", "candidate cells explode (broadcast-index box)"),
        ("HashAggregate", "stage-1 min-per-(point,line) is HASH aggregate "
                          "with map-side combine — SortAggregate only ever "
                          "sees the tiny per-line reduction"),
    ],
    "asof_join bucketed (skew-safe)": [
        (r"windowspecdefinition\([^)]*_bkt", "carry window keyed by "
         "(group, time bucket) — a hot key splits across its range"),
        ("HashAggregate", "per-(key,bucket) carry summary is hash agg"),
    ],
    "overlay sph_m2 (geodesic)": [
        (r"SIN\(|sin\(", "spherical rect area (R²Δλ·Δsinφ) inside JVM "
                         "codegen — no Python for rect×rect pairs"),
        ("BroadcastHashJoin", "overlay side broadcast"),
    ],
    "dwithin (range join)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators — candidate cells from sequence/explode "
         "column arithmetic, exact predicate in codegen"),
        ("Generate explode", "radius-box candidate cells"),
        (r"pmod", "antimeridian wrap via pmod on the cell column"),
    ],
    "corpus_select (curation pipeline)": [
        (r"Exchange hashpartitioning[\s\S]*sha", "the content-digest dedup "
         "window is the pipeline's shuffle"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators — lang/quality/tokens all codegen"),
    ],
    "union_by (general ST_Union)": [
        ("FlatMapGroupsInPandas", "group-local arrangement union kernel"),
        (r"Exchange hashpartitioning\([^)]*group", "ONE shuffle — the "
         "group-key exchange; nothing else moves"),
    ],
    "erase (ST_Difference by mask)": [
        ("ArrowEvalPython", "vectorized boolean-difference kernel"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — per-row map against the "
                                  "closure mask, embarrassingly parallel"),
    ],
    "intersection_join (pairwise ST_Intersection)": [
        ("BroadcastHashJoin", "overlay side broadcast (refpoint pairs)"),
        (r"ArrowEvalPython|Union", "rect fast path unions with the "
                                   "arrangement-kernel general path"),
    ],
    "make_valid (ST_MakeValid)": [
        ("ArrowEvalPython", "per-row even-odd re-extraction kernel"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — embarrassingly parallel map"),
    ],
    "resample_tiles (bilinear)": [
        ("Generate explode", "halo-bounded input-tile index ranges"),
        ("FlatMapGroupsInPandas", "per-output-tile mosaic + interpolation"),
    ],
    "raster_sample (ST_Value)": [
        ("BroadcastHashJoin", "tile table broadcast (payloads included by "
                              "choice; broadcast_tiles=False for huge "
                              "rasters)"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators — tile index + element_at in codegen"),
    ],
    "erase_join (two-layer ST_Difference)": [
        ("BroadcastHashJoin", "mask side broadcast (refpoint pairs)"),
        ("ArrowEvalPython", "group-local multi-mask difference kernel"),
        (r"^(?![\s\S]*Exchange hashpartitioning)",
         "ZERO shuffle exchanges — the JVM bbox-cover (Generate) and the "
         "broadcast join both preserve the Range source's partitioning on "
         "the target id, so Catalyst proves the groupBy(_tid) co-location "
         "and elides the exchange (partitioning reuse across stages; the "
         "old pandas-UDF cover hid the partitioning and forced a shuffle). "
         "Parquet-sourced targets get the bounded "
         "Exchange hashpartitioning(_tid) back — verified both ways"),
    ],
    "tag_points_bucketed (persisted-shuffle co-located join)": [
        ("SortMergeJoin", "aligned-bucket merge join (auto-broadcast "
         "disabled for the audit — the claim must not rest on the small "
         "fixture broadcasting)"),
        (r"^(?![\s\S]*Exchange)",
         "ZERO exchanges of ANY kind — both tables bucketed on cell at "
         "write time, so the per-query cell shuffle is paid once at "
         "layout time and never again; disjoint tag is zero-shuffle "
         "end-to-end"),
        ("ArrowEvalPython", "NULL-geometry full-cell kernel — interior "
         "candidate rows ship null rings and skip the PIP flops"),
    ],
    "buffer_polygons (concave arrangement path)": [
        ("ArrowEvalPython", "per-row offset-strip/fan arrangement union"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — embarrassingly parallel map"),
    ],
    "wkb round-trip (to_wkb → from_wkb)": [
        ("ArrowEvalPython", "Arrow-batched codec, runs where the data lives"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — geometry bytes never "
                                  "route through the driver"),
    ],
    "reproject_inverse (LCC → 4326)": [
        ("ArrowEvalPython", "vectorized Snyder inverse series"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — pure per-row math"),
    ],
    "map_algebra (per-pixel zip_with)": [
        (r"zip_with", "pixel math inside JVM codegen"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators"),
    ],
    "spatial_predicate_join (interior_intersects)": [
        ("BroadcastHashJoin", "other side broadcast (refpoint pairs)"),
        ("ArrowEvalPython", "exact inclusion-exclusion area predicate"),
    ],
    "ingest_pages (crawl ingest: extract + url dedup)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators — html→text extraction is a "
         "decode+regexp_replace codegen chain, url canonicalization is "
         "regexp, earliest-wins url dedup is min_by"),
        (r"^(?!([\s\S]*Exchange hashpartitioning){3})",
         "EXACTLY ONE hash exchange — the canonical-url groupBy; "
         "extraction and normalization are mapped onto the scan "
         "(the AQE dump prints Final+Initial, so one physical exchange "
         "appears twice; two would appear four times)"),
    ],
    "line_dedup (corpus-wide line dedup)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators — split/posexplode/sha2/window/"
         "collect_list+array_sort/concat_ws, all codegen"),
        ("RunningWindowFunction|Window",
         "the first-occurrence rank partitions by the 32-byte line "
         "digest — line BODIES never shuffle as keys"),
    ],
    "gopher_rules (quality filter)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators"),
        (r"^(?![\s\S]*Exchange)",
         "ZERO shuffles — a pure projection over the scan"),
    ],
    "read_bbox (spatial scan planning)": [
        (r"PushedFilters: \[[^\]]*cell",
         "the SAME cell intervals that pruned files at the manifest level "
         "go down as pushed parquet filters — row-group stats prune within "
         "kept files"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — scan planning is file "
                                  "skip + pushed filters, nothing moves"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators"),
    ],
    "scrub_pii + pii_stats (redaction chain)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators — regexp_replace/regexp_count codegen"),
        (r"^(?![\s\S]*Exchange)",
         "ZERO shuffles — a pure projection over the scan"),
    ],
    "rasterize (vector->raster burn)": [
        ("BroadcastHashJoin", "polygon cell side broadcast"),
        ("MapInPandas", "values are BORN in the final burn map stage — "
                        "no pixel array ever shuffles"),
    ],
    "focal slope (halo exchange)": [
        ("FlatMapGroupsInPandas", "halo assembly + Horn kernel"),
        (r"^(?!(?:[\s\S]*Exchange hashpartitioning){2,})[\s\S]*"
         r"Exchange hashpartitioning",
         "exactly ONE shuffle — the tile halo exchange on (tx, ty)"),
    ],
    "sessionize (gap sessions)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "pure JVM lag + running-sum window chain — zero Python"),
        (r"windowspecdefinition", "single window partitioning, one shuffle"),
    ],
    "decontaminate (eval-set n-gram overlap)": [
        ("BroadcastHashJoin", "benchmark gram keys broadcast — the corpus "
                              "never shuffles for the probe"),
        ("xxhash64", "8-byte gram keys, not strings"),
    ],
    "tfidf_top_terms (keyword extraction)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python"),
        ("BroadcastHashJoin|BroadcastNestedLoopJoin",
         "corpus size N rides along as a broadcast 1-row aggregate — "
         "no driver-side count scan"),
    ],
    "sample_fraction (map-only Bernoulli)": [
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — a hex-prefix compare "
                                    "filter"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython))", "zero Python"),
    ],
    "stratified_sample (cap per stratum)": [
        (r"windowspecdefinition", "row_number per stratum — one shuffle"),
        ("md5", "engine-portable hash order (row-for-row SQL parity)"),
    ],
    "affine rotate (pure codegen)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"Exchange))", "zero Python, zero shuffle"),
        (r"zip_with", "vertex transform is a zip_with array expression"),
    ],
    "focal_stats (NxN halo window)": [
        ("MapInPandas", "strip emission is map-side"),
        ("FlatMapGroupsInPandas", "ONE groupBy assembles the padded tile"),
    ],
    "region_group (two-level CCL)": [
        ("MapInPandas apply_map", "relabel is one Arrow pass per tile"),
        ("BroadcastHashJoin", "the seam-label canonical map is broadcast — "
                              "tile arrays never shuffle for the relabel "
                              "(the seam FlatMapGroupsInPandas ran in the "
                              "checkpointed CC jobs, upstream of this plan)"),
    ],
    "morans_i (global autocorrelation)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — pair join + scalar aggregates all codegen"),
        ("BroadcastHashJoin|BroadcastNestedLoopJoin",
         "1-row global-stats rows broadcast back in-plan"),
    ],
    "tile_pyramid (slippy rollup)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — tile math is floor/ln/tan codegen"),
        ("Generate explode", "zoom-level fan-out via explode(sequence)"),
        ("HashAggregate", "partial agg collapses the fan-out map-side"),
    ],
    "idw_grid (surface interpolation)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — lattice from range, weights in codegen"),
        ("Range", "output lattice generated in-plan (no driver list)"),
    ],
    "bm25_rank (relevance scoring)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — tokenize/intersect/idf all codegen"),
        ("array_intersect", "pre-explode query-term prune: non-matching "
                            "docs emit zero exploded rows"),
    ],
    "lm_perplexity (CCNet scoring)": [
        ("MapInPandas", "Arrow-batched model scoring (documented Python "
                        "path: per-char dict lookup has no JVM expression)"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — map-only scoring"),
    ],
    "make_line (ST_MakeLine per group)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — collect_list/array_sort/transform codegen"),
        ("HashAggregate|SortAggregate|ObjectHashAggregate",
         "one group aggregate builds the track"),
    ],
    "trip_stats (track rollup)": [
        (r"windowspecdefinition", "lag window computes step distances"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — JVM haversine steps"),
    ],
    "robots_filter (RFC 9309 gate)": [
        ("BroadcastHashJoin", "per-host rule arrays broadcast; the page "
                              "corpus never shuffles"),
        ("MapInPandas", "the ONLY Python is the rule-side parser — "
                        "rule-sized input, broadcast output; the page "
                        "stream itself is regexp_like codegen"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython))",
         "no per-row Python eval on the page stream"),
    ],
    "hexbin (cube-round density)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — cube rounding is a three-way CASE"),
        ("HashAggregate", "one (q, r) groupBy with map-side combine"),
    ],
    "extract_metadata (head metadata)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"Exchange))", "zero Python, zero shuffle — regexp codegen"),
    ],
    "od_matrix (origin-destination flows)": [
        (r"windowspecdefinition", "per-entity lag window in time order"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python"),
    ],
    "apply_quality_model (learned filter)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"Exchange))", "zero Python, zero shuffle — the logistic "
                        "score is one codegen dot product"),
    ],
    "tin_grid (Delaunay linear)": [
        ("MapInPandas", "lattice-side barycentric rasterization; the "
                        "bounded station set triangulated driver-side"),
        ("Range", "output lattice generated in-plan"),
    ],
    "stratified_fraction_sample (rebalance)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"Exchange))", "zero Python, zero shuffle — md5 compare under "
                        "a literal CASE map"),
    ],
    "frontier_batches (crawl scheduling)": [
        (r"windowspecdefinition", "row_number per host — one shuffle"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python"),
    ],
    "map_match (HMM Viterbi)": [
        ("FlatMapGroupsInPandas", "per-track Viterbi; road layer rides "
                                  "the closure broadcast"),
        ("Exchange", "ONE shuffle: the track groupBy (AQE renders the "
                     "tiny audit fixture as SinglePartition; at scale "
                     "it is hashpartitioning(trip))"),
    ],
    "warp_tiles (gdalwarp nearest)": [
        ("ArrowEvalPython", "the Snyder inverse series is the only "
                            "Python (lattice-sized, map-only)"),
        ("BroadcastHashJoin", "raster_sample's tile broadcast"),
        ("Range", "output lattice generated in-plan"),
    ],
    "curvature (Zevenbergen-Thorne)": [
        ("MapInPandas", "strip emission is map-side"),
        ("FlatMapGroupsInPandas", "halo assembly + quadric kernel"),
    ],
    "parse_sitemap (frontier feeder)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — regexp_extract_all + explode codegen"),
        ("Generate explode", "block explode"),
    ],
    "label_propagation (communities)": [
        ("ExistingRDD|LogicalRDD|Scan", "final plan reads the converged "
         "checkpoint — per-round vote join/agg ran in checkpointed jobs"),
    ],
    "entropy_stats (token information)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "zero Python — explode + two hash aggregates"),
        ("HashAggregate", "map-side-combined (id, term) counts"),
    ],
    "cost_distance (iterative halo rounds)": [
        ("ExistingRDD|LogicalRDD|Scan", "the final plan READS the "
         "checkpoint-materialized state — the per-round MapInPandas/"
         "FlatMapGroupsInPandas exchanges ran in the checkpointed jobs "
         "upstream (the region_group relabel convention)"),
        (r"^(?![\s\S]*Exchange)", "no residual shuffle after the last "
                                    "round's checkpoint"),
    ],
    "bloom_build (bitmap build)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — xxhash64 positions + shiftleft masks "
         "in codegen"),
        ("HashAggregate", "per-word bit_or with map-side combine"),
    ],
    "bloom_probe (membership join)": [
        ("BroadcastHashJoin", "bitmap broadcast while it fits (shuffle "
         "path available via broadcast_filter=False)"),
        (r"min\(\(isnotnull", "k-probe AND rollup per key (Catalyst "
         "rewrites bool_and to min over booleans)"),
    ],
    "kn_score (distributed LM serving)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — n-gram explode + one join per order, "
         "interpolation folded into a codegen expression"),
        ("HashAggregate", "per-doc log-prob rollup"),
    ],
    "split_by_lines (arrangement face walk)": [
        ("FlatMapGroupsInPandas", "per-target face kernel over Arrow "
         "groups (only actually-cut targets reach it)"),
        ("BroadcastHashJoin", "blade cell-cover broadcast"),
    ],
    "kriging_grid (local OK solves)": [
        ("FlatMapGroupsInPandas", "per-cell ordinary-kriging solve "
         "(Arrow groups, k-nearest truncation inside)"),
        ("Generate explode", "cell-bucketed neighbor gather"),
    ],
    "empirical_variogram (pair binning)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — pair join + lag binning in codegen"),
        ("HashAggregate", "per-lag gamma aggregate"),
    ],
    "viewshed (ray sampling)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — rays/steps from sequence explode, "
         "elevation via the tile-key join, occlusion in a window"),
        ("windowspecdefinition", "running-horizon window per "
         "(observer, ray)"),
        ("BroadcastHashJoin", "tile payloads broadcast "
         "(raster_sample contract)"),
    ],
    "fill_sinks (block-Jacobi minimax)": [
        ("ExistingRDD|LogicalRDD|Scan", "the final plan READS the "
         "checkpoint-materialized fixpoint state (cost_distance "
         "convention)"),
        (r"^(?![\s\S]*Exchange)", "no residual shuffle after the "
         "fixpoint round"),
    ],
    "simplify_topology (shared-arc fabric)": [
        ("FlatMapGroupsInPandas", "per-fabric arc kernel over Arrow "
         "groups"),
        (r"^(?![\s\S]*(?:BroadcastHashJoin|SortMergeJoin))",
         "ONE groupBy, no joins — arcs shared via the group, not a "
         "shuffle"),
    ],
    "adaptive_cells (density-balanced keys)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — codegen cell keys, count aggregate, "
         "broadcast overfull list"),
        ("ExistingRDD|LogicalRDD|Scan", "final plan reads the "
         "checkpoint-materialized rounds (iterative convention)"),
    ],
    "snap_to_layer (conflation join)": [
        ("FlatMapGroupsInPandas", "per-target snap kernel over Arrow "
         "groups (only targets near the reference reach it)"),
        ("BroadcastHashJoin", "reference cell-cover broadcast"),
    ],
    "raster_pyramid (overview levels)": [
        ("FlatMapGroupsInPandas", "per-parent-tile 2x2 merge+pool "
         "kernel"),
        ("Union", "levels union into one frame (level column)"),
    ],
    "erode_polygons (negative buffer)": [
        ("ArrowEvalPython", "per-row capsule+arrangement kernel (the "
         "documented Python pass; geometry never shuffles)"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — erosion is per-row"),
    ],
    "zone_transitions_batch (geofence backfill twin)": [
        ("Window", "one lag window per entity"),
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators on the batch path"),
    ],
    "interval_join (binned 1-D range join)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas))",
         "ZERO Python operators — bins from floor/sequence column "
         "arithmetic, BETWEEN refine in codegen"),
        ("Generate explode", "interval→bin explode is JVM-side"),
        ("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
         "the narrow branch is a real equi-join on the bin key"),
        (r"^(?![\s\S]*CartesianProduct)",
         "no cartesian anywhere — wide outliers ride "
         "BroadcastNestedLoopJoin, never a cross product"),
    ],
    "raster_profile (line stations)": [
        ("ArrowEvalPython", "arc-length station kernel (the one "
         "documented Python pass)"),
        ("BroadcastHashJoin", "elevation via the raster_sample "
         "tile-key join"),
        ("Generate posexplode", "stations explode JVM-side"),
    ],
    "perplexity_buckets (CCNet head/middle/tail)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — one percent_rank window"),
        ("windowspecdefinition", "per-language rank window"),
    ],
    "substring_dedup (ExactSubstr span surgery)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — rolling window hashes and the "
         "filter(tokens, ...) rebuild are all codegen"),
        ("Generate posexplode", "window-hash explode is JVM-side"),
        ("partial_min|partial_count|partialmerge",
         "map-side combine on the per-hash canonical-occurrence agg"),
    ],
    "resolve_toponyms (two-pass coherence resolver)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — candidate join, prior window, "
         "context avg, haversine rescore all codegen"),
        ("BroadcastHashJoin", "the gazetteer and the doc-context "
         "table broadcast onto the candidate stream"),
        ("windowspecdefinition", "per-(doc, mention) argmax windows"),
    ],
    "emerging_hotspots (space-time cube Gi* + MK)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — binning, zero-fill, grid Gi*, and "
         "the Mann-Kendall pair join are all codegen"),
        ("Generate explode", "neighbor offsets explode JVM-side"),
        ("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
         "grid neighborhoods via equi-join on (cell, slice) keys — "
         "never a distance join over raw events"),
    ],
    "temperature_resample (mC4 source mixing)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — literal rate map + md5 Bernoulli + "
         "sequence explode"),
        (r"^(?![\s\S]*Exchange)",
         "no data-sized shuffle — resampling is map-only (the count "
         "map collected once upstream)"),
    ],
    "apply_unigram (Viterbi subword encoder)": [
        ("ArrowEvalPython", "the Viterbi encode kernel (the one "
         "documented Python pass, model in closure — apply_bpe "
         "convention)"),
        (r"^(?![\s\S]*Exchange)", "ZERO shuffles — encoding is "
         "map-only"),
    ],
    "mine_bitext (margin-scored pair mining)": [
        ("MapInPandas", "the two ANN retrieval scans (the documented "
         "Python kernels; everything after is DataFrame algebra)"),
        ("windowspecdefinition", "best-margin-per-source selection"),
        (r"^(?![\s\S]*CartesianProduct)",
         "no cross product — candidates come from top-k retrieval, "
         "scored via joins on pair keys"),
    ],
    "dsir_weights (hashed n-gram importance)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — md5 gram buckets, log-ratio table, "
         "weight sum all codegen"),
        ("BroadcastHashJoin", "the bucket-sized log-ratio table "
         "broadcasts onto the gram stream"),
        ("partial_count|partialmerge",
         "bucket counts collapse map-side before anything moves"),
    ],
    "pack_chunks (concat-and-chunk sequence packing)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — md5 bucket, per-bucket cumsum "
         "window, sequence() span explode, all codegen"),
        ("windowspecdefinition.*_bkt",
         "prefix sum is PARTITIONED by bucket — parallel, never a "
         "single global sort"),
        ("Generate explode", "pack spans explode JVM-side"),
    ],
    "anchor_stats (per-target anchor profile)": [
        (r"^(?![\s\S]*(?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
         r"FlatMapGroupsInPandas))",
         "ZERO Python operators — regexp extraction, counts, and the "
         "top-k window are all codegen"),
        ("partial_count|partialmerge",
         "map-side combine on the (dst, anchor) count BEFORE the "
         "top-k window — hot targets collapse early"),
        ("windowspecdefinition", "row_number top-k per target"),
    ],
    "flow_accumulation (tile topo rounds)": [
        ("ExistingRDD|LogicalRDD|Scan", "the final plan READS the "
         "checkpoint-materialized fixpoint state — the per-round "
         "mapInPandas exchanges ran in the checkpointed jobs upstream "
         "(cost_distance convention)"),
        (r"^(?![\s\S]*Exchange)", "no residual shuffle after the "
         "fixpoint round"),
    ],
}


def main():
    from pyspark.sql import functions as F
    from spandex_spark.session import get_spark
    from spandex_spark.operators import tag_points, knn_join, proportion_overlap
    from spandex_spark.sources.grids import (
        derived_points, zones_df, parcels_df, gazetteer_grid_df)

    spark = get_spark("explain_audit", master="local[4]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    pts = derived_points(
        spark.read.parquet(f"{sf}/customer.parquet").select("c_custkey"),
        "c_custkey")

    plans = {}
    plans["pip_tag (two-phase cell join)"] = tag_points(
        pts, zones_df(spark), poly_id_col="zone_id",
        point_id_col="c_custkey", level=9)
    plans["knn broadcast (k=1 agg path)"] = knn_join(
        pts, gazetteer_grid_df(spark), k=1,
        query_id_col="c_custkey", feature_id_col="poi_k")
    plans["overlay"] = proportion_overlap(
        parcels_df(spark), zones_df(spark), target_id_col="parcel_id",
        overlay_id_col="zone_id", level=8)
    plans["knn cells (histogram two-job path)"] = knn_join(
        pts, gazetteer_grid_df(spark), k=1,
        query_id_col="c_custkey", feature_id_col="poi_k",
        strategy="cells", level=7)
    from spandex_spark.operators.lines import nearest_line_join
    from spandex_spark.sources.grids import roads_df
    plans["nearest_road (linestring kernel)"] = nearest_line_join(
        pts, roads_df(spark), k=1,
        point_id_col="c_custkey", line_id_col="road_id")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    plans["q1 relational"] = (
        li.filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(F.sum("l_extendedprice").alias("rev")))
    plans["nearest_road (cells two-job path)"] = nearest_line_join(
        pts, roads_df(spark), k=1, point_id_col="c_custkey",
        line_id_col="road_id", strategy="cells", level=7)
    from spandex_spark.operators.timeseries import asof_join
    ev = spark.read.parquet(f"{sf}/events.parquet")
    views = (ev.filter(F.col("event_type") == "view")
             .groupBy("user_id", "ts").agg(F.max("event_id").alias("v")))
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts")
    plans["asof_join bucketed (skew-safe)"] = asof_join(
        purchases, views, on="ts", by="user_id", right_cols=("v",),
        bucket_seconds=86400)
    plans["overlay sph_m2 (geodesic)"] = proportion_overlap(
        parcels_df(spark), zones_df(spark), target_id_col="parcel_id",
        overlay_id_col="zone_id", level=8, area_unit="sph_m2")
    from spandex_spark.operators.distance import within_distance_join
    plans["dwithin (range join)"] = within_distance_join(
        pts, gazetteer_grid_df(spark), radius=0.5, point_id_col="c_custkey",
        feature_id_col="poi_k", metric="planar")
    from spandex_spark.corpus import corpus_select
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    plans["corpus_select (curation pipeline)"] = corpus_select(
        docs, langs=("en", "fr"), min_quality=0.45, min_tokens=5)
    from spandex_spark.operators.zonal import raster_sample
    from spandex_spark.sources.grids import raster_tiles_df
    plans["raster_sample (ST_Value)"] = raster_sample(
        pts, raster_tiles_df(spark), point_id_col="c_custkey",
        origin_x=-10.0, origin_y=-10.0)
    import numpy as np
    from spandex_spark.operators.dissolve import union_by
    from spandex_spark.operators.trim import erase
    p4 = parcels_df(spark).withColumn(
        "group_id", (F.col("parcel_id") % 50).cast("long"))
    plans["union_by (general ST_Union)"] = union_by(p4, key_col="group_id")
    plans["erase (ST_Difference by mask)"] = erase(
        parcels_df(spark), np.array([-6.0, 6.0, 6.0, 0.0, 0.0, -6.0]),
        np.array([-6.0, -6.0, 0.0, 0.0, 6.0, 6.0]))
    from spandex_spark.operators.overlay import intersection_join
    from spandex_spark.operators.validate import make_valid
    from spandex_spark.operators.zonal import resample_tiles
    from spandex_spark.sources.grids import donut_zones_df, validity_zoo_df
    plans["intersection_join (pairwise ST_Intersection)"] = intersection_join(
        parcels_df(spark), donut_zones_df(spark),
        target_id_col="parcel_id", overlay_id_col="dz_id", level=7)
    plans["make_valid (ST_MakeValid)"] = make_valid(validity_zoo_df(spark))
    plans["resample_tiles (bilinear)"] = resample_tiles(
        raster_tiles_df(spark), x0_out=-9.0, y0_out=-9.0, res_out=0.07,
        nx_out=100, ny_out=100, origin_x=-10.0, origin_y=-10.0)
    from spandex_spark.operators.trim import erase_join
    plans["erase_join (two-layer ST_Difference)"] = erase_join(
        parcels_df(spark), donut_zones_df(spark),
        target_id_col="parcel_id", level=7)
    from spandex_spark.operators.buffer import buffer_polygons
    lshape = spark.createDataFrame(
        [(1, {"kind": 3, "xs": [0.0, 2.0, 2.0, 1.0, 1.0, 0.0],
              "ys": [0.0, 0.0, 1.0, 1.0, 2.0, 2.0],
              "ring_offsets": [0, 6],
              "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 2.0, "maxy": 2.0}})],
        "pid long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
    plans["buffer_polygons (concave arrangement path)"] = buffer_polygons(
        lshape, radius=0.2, segments=8)
    from spandex_spark.sources.wkb import from_wkb, to_wkb
    plans["wkb round-trip (to_wkb → from_wkb)"] = from_wkb(
        to_wkb(donut_zones_df(spark), geom_col="geom", out_col="wkb",
               srid=4326), wkb_col="wkb", out_col="geom2")
    from spandex_spark.operators.reproject import reproject, reproject_inverse
    plans["reproject_inverse (LCC → 4326)"] = reproject_inverse(
        reproject(pts, to_srid=26943), from_srid=26943,
        lon_col="lon2", lat_col="lat2")
    from spandex_spark.operators.zonal import map_algebra
    ra = raster_tiles_df(spark)
    plans["map_algebra (per-pixel zip_with)"] = map_algebra(
        ra, ra, lambda x, y: (x - y) / (x + y + F.lit(1.0)))
    from spandex_spark.operators.predicates import spatial_predicate_join
    plans["spatial_predicate_join (interior_intersects)"] = \
        spatial_predicate_join(parcels_df(spark), donut_zones_df(spark),
                               predicate="interior_intersects",
                               target_id_col="parcel_id",
                               other_id_col="dz_id", level=7)

    import tempfile

    import pandas as pd

    from spandex_spark import cells
    from spandex_spark.tables import IcebergishTable
    _rng = np.random.default_rng(9)
    _lon = _rng.uniform(-10, 10, 20000)
    _lat = _rng.uniform(-10, 10, 20000)
    _bbt = IcebergishTable(tempfile.mkdtemp() + "/bb")
    _bbt.append(spark.createDataFrame(pd.DataFrame(
        {"lon": _lon, "lat": _lat, "cell": cells.cell_of(_lon, _lat, 12)})))
    _bbt.compact(spark, "cell", n_files=16)
    plans["read_bbox (spatial scan planning)"] = _bbt.read_bbox(
        spark, (1.0, 2.0, 1.5, 2.4), lon_col="lon", lat_col="lat")

    from spandex_spark.operators.dedup import line_dedup
    from spandex_spark.operators.textstats import gopher_rules
    from spandex_spark.pipeline import ingest_pages
    _raw = spark.range(5000).select(
        F.concat(F.lit("http://s"), (F.col("id") % 97).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string"))
        .alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>page "),
                          F.col("id").cast("string"),
                          F.lit("</body></html>")), "UTF-8").alias("html"))
    plans["ingest_pages (crawl ingest: extract + url dedup)"] = \
        ingest_pages(_raw)
    _docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("BANNER\nbody line "),
                 F.col("id").cast("string")).alias("text"))
    plans["line_dedup (corpus-wide line dedup)"] = line_dedup(_docs)
    plans["gopher_rules (quality filter)"] = gopher_rules(_docs)

    from spandex_spark.operators.pii import pii_stats, scrub_pii
    plans["scrub_pii + pii_stats (redaction chain)"] = pii_stats(
        scrub_pii(_docs))
    from spandex_spark.operators.rasterize import rasterize
    _rspec = spark.range(16).select(
        F.col("id").alias("tile_id"),
        (-10.0 + (F.col("id") % 4) * 5.0).alias("x0"),
        (-10.0 + F.floor(F.col("id") / 4) * 5.0).alias("y0"),
        F.lit(0.1).alias("res"), F.lit(50).cast("int").alias("nx"),
        F.lit(50).cast("int").alias("ny"))
    plans["rasterize (vector->raster burn)"] = rasterize(
        zones_df(spark), _rspec, value_col="zone_id")
    from spandex_spark.operators.focal import slope as _slope
    _ftiles = _rspec.withColumn(
        "values", F.array_repeat(F.lit(1.0), 50 * 50))
    plans["focal slope (halo exchange)"] = _slope(
        _ftiles, origin_x=-10.0, origin_y=-10.0)

    from spandex_spark.bucketing import (tag_points_bucketed,
                                         write_points_bucketed,
                                         write_polygons_bucketed)
    _bdir = tempfile.mkdtemp()
    write_points_bucketed(derived_points(
        spark.range(4000).select(F.col("id").alias("pt_id")), "pt_id"),
        "audit_pts_b", level=9, n_buckets=8, path=os.path.join(_bdir, "p"))
    write_polygons_bucketed(zones_df(spark), "audit_zones_b",
                            poly_id_col="zone_id", level=9, n_buckets=8,
                            path=os.path.join(_bdir, "z"))
    # run + capture the bucketed plan EAGERLY under the narrowed conf, then
    # restore it: the main loop collects every other dataset afterwards and
    # AQE reads the live session conf at that point
    _old_abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    _bdf = tag_points_bucketed(spark, "audit_pts_b", "audit_zones_b",
                               poly_id_col="zone_id", point_id_col="pt_id",
                               assume_disjoint=True)
    _bdf.collect()
    rendered = {"tag_points_bucketed (persisted-shuffle co-located join)":
                _bdf._jdf.queryExecution().executedPlan().toString()}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _old_abt)

    from spandex_spark.operators.timeseries import sessionize
    plans["sessionize (gap sessions)"] = sessionize(
        ev, gap_seconds=900, order_cols=("event_id",))
    from spandex_spark.operators.dedup import decontaminate
    plans["decontaminate (eval-set n-gram overlap)"] = decontaminate(
        docs.filter("doc_id >= 5"), docs.filter("doc_id < 5").select("text"),
        n=8)
    from spandex_spark.operators.textstats import tfidf_top_terms
    plans["tfidf_top_terms (keyword extraction)"] = tfidf_top_terms(docs, k=3)
    from spandex_spark.operators.sampling import (sample_fraction,
                                                  stratified_sample)
    plans["sample_fraction (map-only Bernoulli)"] = sample_fraction(
        docs, fraction=0.25, id_col="doc_id")
    plans["stratified_sample (cap per stratum)"] = stratified_sample(
        docs, strata_col="lang", n=5, id_col="doc_id")
    from spandex_spark.operators.affine import rotate as _rotate
    plans["affine rotate (pure codegen)"] = _rotate(
        parcels_df(spark), radians=0.3, origin=(0.0, 0.0))
    from spandex_spark.operators.focal import focal_stats as _fstats
    plans["focal_stats (NxN halo window)"] = _fstats(
        _ftiles, origin_x=-10.0, origin_y=-10.0, stat="mean", window=5)
    from spandex_spark.operators.regions import region_group as _rgroup
    plans["region_group (two-level CCL)"] = _rgroup(
        _ftiles, origin_x=-10.0, origin_y=-10.0)

    from spandex_spark.operators.spatialstats import morans_i as _morans
    _valued = derived_points(
        spark.range(4000).select(F.col("id").alias("pt_id")), "pt_id") \
        .withColumn("v", (F.col("pt_id") % 13).cast("double"))
    plans["morans_i (global autocorrelation)"] = _morans(
        _valued, radius=0.4, value_col="v", id_col="pt_id")
    from spandex_spark.operators.tiles import tile_pyramid as _tpyr
    plans["tile_pyramid (slippy rollup)"] = _tpyr(
        _valued, min_zoom=2, max_zoom=8, weight_col="v")
    from spandex_spark.operators.interpolate import idw_grid as _idw
    plans["idw_grid (surface interpolation)"] = _idw(
        _valued, value_col="v", origin_x=-10.0, origin_y=-10.0,
        step=1.0, nx=20, ny=20, radius=1.5)
    from spandex_spark.operators.search import bm25_rank as _bm25
    plans["bm25_rank (relevance scoring)"] = _bm25(
        docs, ["data", "quality", "zone"])
    from spandex_spark.operators.langmodel import (lm_perplexity as _lmp,
                                                   train_char_lm as _lmt)
    plans["lm_perplexity (CCNet scoring)"] = _lmp(
        docs, _lmt(docs, sample_rows=50), text_col="text")

    from spandex_spark.operators.trajectory import (make_line as _mkl,
                                                    od_matrix as _odm,
                                                    trip_stats as _tst)
    _trk = ev.select(
        (F.col("user_id") % 50).alias("uid"), "ts",
        ((F.col("event_id") % 360) - 180.0).cast("double").alias("lon"),
        ((F.col("event_id") % 170) - 85.0).cast("double").alias("lat"),
        F.col("event_type").alias("zone"))
    plans["make_line (ST_MakeLine per group)"] = _mkl(
        _trk, group_col="uid")
    plans["trip_stats (track rollup)"] = _tst(_trk, group_col="uid")
    plans["od_matrix (origin-destination flows)"] = _odm(
        _trk, group_col="uid", loc_col="zone")
    from spandex_spark.operators.robots import (parse_robots as _prb,
                                                robots_filter as _rbf)
    _rbt = spark.createDataFrame(
        [("example.com", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string")
    _urls = spark.range(2000).select(
        F.concat(F.lit("http://example.com/p/"),
                 F.col("id").cast("string")).alias("url"))
    plans["robots_filter (RFC 9309 gate)"] = _rbf(
        _urls, _prb(_rbt), keep_denied=True)
    from spandex_spark.operators.hexbin import hexbin as _hxb
    plans["hexbin (cube-round density)"] = _hxb(_valued, size=0.7)
    from spandex_spark.operators.html import extract_metadata as _emd
    _htmlpg = spark.range(2000).select(
        F.concat(F.lit("http://s.example/"),
                 F.col("id").cast("string")).alias("url"),
        F.encode(F.concat(
            F.lit("<html lang='en'><title>t"), F.col("id").cast("string"),
            F.lit("</title><body>x</body></html>")), "UTF-8")
        .alias("html"))
    plans["extract_metadata (head metadata)"] = _emd(_htmlpg)
    from spandex_spark.operators.costdist import cost_distance as _cdst
    _cost = _rspec.withColumn(
        "values", F.array_repeat(F.lit(1.0), 50 * 50))
    from spandex_spark.operators.quality_model import (
        apply_quality_model as _aqm, train_quality_model as _tqm)
    _lbl = docs.withColumn("label", (F.col("doc_id") % 2).cast("int"))
    plans["apply_quality_model (learned filter)"] = _aqm(
        docs, _tqm(_lbl, label_col="label", sample_rows=200))
    from spandex_spark.operators.interpolate import tin_grid as _tin
    plans["tin_grid (Delaunay linear)"] = _tin(
        derived_points(spark.range(200).select(
            F.col("id").alias("sid")), "sid").withColumn(
            "v", (F.col("sid") % 5).cast("double")),
        value_col="v", origin_x=-10.0, origin_y=-10.0, step=0.5,
        nx=40, ny=40)
    from spandex_spark.operators.sampling import (
        stratified_fraction_sample as _sfs)
    plans["stratified_fraction_sample (rebalance)"] = _sfs(
        docs, fractions={"en": 0.1, "fr": 1.0}, strata_col="lang",
        id_col="doc_id")
    from spandex_spark.operators.urls import frontier_batches as _fbt
    plans["frontier_batches (crawl scheduling)"] = _fbt(
        _urls, per_host=10)
    from spandex_spark.operators.mapmatch import map_match as _mmt
    _rd = roads_df(spark)
    _mtk = ev.limit(2000).select(
        (F.col("user_id") % 20).alias("trip"), "ts",
        ((F.col("event_id") % 100) / 50.0 - 1.0).alias("lon"),
        ((F.col("event_id") % 80) / 40.0 - 1.0).alias("lat"))
    plans["map_match (HMM Viterbi)"] = _mmt(
        _mtk, _rd, group_col="trip", road_id_col="road_id")
    from spandex_spark.operators.warp import warp_tiles as _wrp
    plans["warp_tiles (gdalwarp nearest)"] = _wrp(
        raster_tiles_df(spark), from_srid_of_output=3857,
        x0_out=-1113194.0, y0_out=-1113194.0, res_out=50000.0,
        nx_out=40, ny_out=40, origin_x=-10.0, origin_y=-10.0)
    from spandex_spark.operators.focal import curvature as _curv
    plans["curvature (Zevenbergen-Thorne)"] = _curv(
        _ftiles, origin_x=-10.0, origin_y=-10.0, kind="plan")
    from spandex_spark.operators.urls import parse_sitemap as _psm
    _sm = spark.createDataFrame(
        [("https://e.com/s.xml",
          "<urlset><url><loc>https://e.com/a</loc></url></urlset>")],
        "url string, xml string")
    plans["parse_sitemap (frontier feeder)"] = _psm(_sm)
    from spandex_spark.operators.linkgraph import (
        label_propagation as _lpa)
    _lpe = spark.range(300).select(
        F.concat(F.lit("h"), (F.col("id") % 60).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("id") * 7) % 60).cast("string"))
        .alias("dst"))
    plans["label_propagation (communities)"] = _lpa(_lpe, max_iter=3)
    from spandex_spark.operators.textstats import entropy_stats as _ent
    plans["entropy_stats (token information)"] = _ent(docs)
    plans["cost_distance (iterative halo rounds)"] = _cdst(
        _cost, spark.createDataFrame([(0.0, 0.0)],
                                     "lon double, lat double"),
        origin_x=-10.0, origin_y=-10.0)

    from spandex_spark.operators.bloom import (bloom_build as _bb,
                                               bloom_probe as _bp)
    _burls = spark.range(500).select(
        F.col("id"), F.concat(F.lit("https://h.example/"),
                              F.col("id")).alias("url"))
    _bloom = _bb(_burls, "url", m_bits=1 << 13, k=5)
    plans["bloom_build (bitmap build)"] = _bloom
    plans["bloom_probe (membership join)"] = _bp(
        _burls, "url", _bloom, id_col="id", m_bits=1 << 13, k=5)
    from spandex_spark.operators.knlm import (kn_score as _ksc,
                                              train_kn_lm as _tkn)
    plans["kn_score (distributed LM serving)"] = _ksc(
        docs, _tkn(docs.limit(50), n=2))
    from spandex_spark.operators.split import split_by_lines as _spl
    _sblades = spark.createDataFrame(
        [(1, {"kind": 2, "xs": [1.0, 1.0], "ys": [-1.0, 3.0],
              "ring_offsets": [0, 2],
              "bbox": {"minx": 1.0, "miny": -1.0, "maxx": 1.0,
                       "maxy": 3.0}})],
        "lid long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
    plans["split_by_lines (arrangement face walk)"] = _spl(
        lshape, _sblades, target_id_col="pid")
    from spandex_spark.operators.kriging import (
        empirical_variogram as _evg, kriging_grid as _kgr)
    _kpts = derived_points(
        spark.range(300).select(F.col("id").alias("sid")), "sid"
    ).withColumn("v", (F.col("sid") % 7).cast("double"))
    plans["kriging_grid (local OK solves)"] = _kgr(
        _kpts, value_col="v",
        variogram={"model": "exponential", "nugget": 0.0, "psill": 1.0,
                   "range": 2.0},
        origin_x=-10.0, origin_y=-10.0, step=2.0, nx=5, ny=5, radius=4.0)
    plans["empirical_variogram (pair binning)"] = _evg(
        _kpts, value_col="v", id_col="sid", max_dist=2.0)
    from spandex_spark.operators.viewshed import viewshed as _vsh
    _vtiles = raster_tiles_df(spark)
    _vobs = spark.createDataFrame([(1, -5.2, -5.3), (2, 3.1, 2.7)],
                                  "obs_id long, lon double, lat double")
    plans["viewshed (ray sampling)"] = _vsh(
        _vobs, _vtiles, observer_id_col="obs_id", origin_x=-10.0,
        origin_y=-10.0, max_dist=1.0, step=0.1, n_rays=16)
    from spandex_spark.operators.regions import flow_accumulation as _fac
    _d8 = _rspec.withColumn("values", F.array_repeat(F.lit(1.0), 50 * 50))
    plans["flow_accumulation (tile topo rounds)"] = _fac(
        _d8, origin_x=-10.0, origin_y=-10.0)
    from spandex_spark.operators.hydrology import fill_sinks as _fsk
    plans["fill_sinks (block-Jacobi minimax)"] = _fsk(
        _ftiles, origin_x=-10.0, origin_y=-10.0)
    from spandex_spark.operators.toposimplify import (
        simplify_topology as _stp)
    _fabric = spark.createDataFrame(
        [(1, 1, {"kind": 3, "xs": [0.0, 1.0, 1.0, 0.0],
                 "ys": [0.0, 0.0, 1.0, 1.0], "ring_offsets": [0, 4],
                 "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 1.0,
                          "maxy": 1.0}}),
         (1, 2, {"kind": 3, "xs": [1.0, 2.0, 2.0, 1.0],
                 "ys": [0.0, 0.0, 1.0, 1.0], "ring_offsets": [0, 4],
                 "bbox": {"minx": 1.0, "miny": 0.0, "maxx": 2.0,
                          "maxy": 1.0}})],
        "grp int, pid long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
    plans["simplify_topology (shared-arc fabric)"] = _stp(
        _fabric, tolerance=0.1, group_cols=("grp",), id_col="pid")
    from spandex_spark.operators.zonal import raster_profile as _rpf
    _pline = spark.createDataFrame(
        [(1, {"kind": 2, "xs": [-9.0, 5.0], "ys": [-5.0, -5.0],
              "ring_offsets": [0, 2],
              "bbox": {"minx": -9.0, "miny": -5.0, "maxx": 5.0,
                       "maxy": -5.0}})],
        "lid long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
    plans["raster_profile (line stations)"] = _rpf(
        _pline, raster_tiles_df(spark), line_id_col="lid", step=0.5,
        origin_x=-10.0, origin_y=-10.0)
    from spandex_spark.operators.langmodel import (
        perplexity_buckets as _ppb)
    plans["perplexity_buckets (CCNet head/middle/tail)"] = _ppb(
        docs.withColumn("perplexity",
                        (F.col("doc_id") % 97).cast("double")))
    from spandex_spark.operators.adaptive import adaptive_cells as _adc
    plans["adaptive_cells (density-balanced keys)"] = _adc(
        pts, max_per_cell=40, base_level=3, max_level=12)
    from spandex_spark.operators.snap import snap_to_layer as _snp
    plans["snap_to_layer (conflation join)"] = _snp(
        parcels_df(spark), zones_df(spark), tolerance=0.01,
        target_id_col="parcel_id")
    from spandex_spark.operators.zonal import raster_pyramid as _rpy
    plans["raster_pyramid (overview levels)"] = _rpy(
        raster_tiles_df(spark), levels=2, origin_x=-10.0,
        origin_y=-10.0)
    from spandex_spark.operators.buffer import erode_polygons as _erp
    plans["erode_polygons (negative buffer)"] = _erp(
        parcels_df(spark), radius=0.1)
    from spandex_spark.streaming.geofence import zone_transitions_batch \
        as _ztb
    _gfe = spark.range(4000).select(
        F.format_string("u%04d", F.col("id") % 400).alias("user_id"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
         + F.make_interval(secs=(F.col("id") / 400).cast("int"))).alias("ts"),
        (F.abs(F.xxhash64("id")) % 8).alias("zone_id"))
    plans["zone_transitions_batch (geofence backfill twin)"] = _ztb(_gfe)
    from spandex_spark.operators.rangejoin import interval_join as _ivj
    _facts = spark.range(20000).select(
        F.col("id").alias("fid"),
        ((F.col("id") * 7919) % 1000000).cast("double").alias("v"))
    _ivs = spark.range(800).select(
        F.col("id").alias("iid"),
        (F.col("id") * 1250.0).alias("lo"),
        (F.col("id") * 1250.0 + 1249.0).alias("hi"))
    plans["interval_join (binned 1-D range join)"] = _ivj(
        _facts, _ivs, value_col="v", lo_col="lo", hi_col="hi",
        bin_size=1250.0)
    from spandex_spark.operators.dedup import substring_dedup as _ssd
    _sdocs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array_join(F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda i: F.format_string("w%d", i)), " "),
            F.format_string(" tail%d", F.col("id"))).alias("text"))
    plans["substring_dedup (ExactSubstr span surgery)"] = _ssd(
        _sdocs, k=50)
    from spandex_spark.operators.linkgraph import (
        extract_anchors as _xa, anchor_stats as _ast)
    _apages = spark.range(200).select(
        F.format_string("http://s%d.com/p", F.col("id") % 40).alias("url"),
        F.format_string(
            "<a href='http://t%d.com/'>label %d</a>"
            "<a href='http://hub.com/'>home</a>",
            F.col("id") % 10, F.col("id") % 3).alias("html"))
    plans["anchor_stats (per-target anchor profile)"] = _ast(
        _xa(_apages), k=3)
    from spandex_spark.operators.packing import pack_chunks as _pck
    _pdocs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 1).alias("n_tokens"))
    plans["pack_chunks (concat-and-chunk sequence packing)"] = _pck(
        _pdocs, context_len=2048, buckets=8)
    from spandex_spark.operators.dsir import dsir_weights as _dsw
    _draw = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.format_string("sample text number %d about topic %d",
                        F.col("id"), F.col("id") % 7).alias("text"))
    _dtgt = spark.range(50).select(
        F.format_string("sample text about topic %d",
                        F.col("id") % 3).alias("text"))
    plans["dsir_weights (hashed n-gram importance)"] = _dsw(
        _draw, _dtgt, ngram=2, buckets=500)
    from spandex_spark.operators.bitext import mine_bitext as _mbx
    _bsrc = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda j: F.sin(F.col("id") * j * 0.7))
        .alias("embedding"))
    _btgt = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda j: F.cos(F.col("id") * j * 0.3))
        .alias("embedding"))
    plans["mine_bitext (margin-scored pair mining)"] = _mbx(
        _bsrc, _btgt, k=3)
    from spandex_spark.operators.unigram import apply_unigram as _apu
    _utexts = spark.range(300).select(
        F.format_string("sample text %d repeated tokens", F.col("id"))
        .alias("text"))
    from spandex_spark.operators.hotspots import emerging_hotspots as _ehs
    _hev = spark.range(40000).select(
        ((F.col("id") % 9) + 0.5).alias("lon"),
        (((F.col("id") / 9) % 9).cast("long") + 0.5).alias("lat"),
        (F.col("id") % 8).alias("t"))
    plans["emerging_hotspots (space-time cube Gi* + MK)"] = _ehs(
        _hev, cell_size=1.0, slice_col="t")
    from spandex_spark.operators.toponym import resolve_toponyms as _rtp
    _tmen = spark.range(5000).select(
        (F.col("id") % 800).alias("doc_id"),
        F.format_string("place%d", F.col("id") % 40).alias("mention"))
    _tgaz = spark.range(120).select(
        F.format_string("place%d", F.col("id") % 40).alias("name"),
        F.col("id").alias("gaz_id"),
        (F.col("id") * 1000.0 + 500).alias("population"),
        ((F.col("id") * 7) % 360 - 180.0).alias("lon"),
        ((F.col("id") * 3) % 170 - 85.0).alias("lat"))
    plans["resolve_toponyms (two-pass coherence resolver)"] = _rtp(
        _tmen, _tgaz)
    from spandex_spark.operators.sampling import temperature_resample \
        as _trs
    _tdf = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "en").otherwise("sw")
        .alias("source"))
    plans["temperature_resample (mC4 source mixing)"] = _trs(
        _tdf, source_col="source", id_col="doc_id", alpha=0.3,
        target_total=10000)
    plans["apply_unigram (Viterbi subword encoder)"] = _apu(
        _utexts, [("sam", -2.0), ("ple", -2.2), ("te", -1.9),
                  ("xt", -2.4)] + [(c, -4.0) for c in
                                   "abcdefghijklmnopqrstuvwxyz0123456789"])

    out = io.StringIO()
    out.write("# PLANS — physical-plan audit (generated by "
              "scripts/explain_audit.py)\n\n")
    import re
    for name, df in list(plans.items()) + [(k, None) for k in rendered]:
        if df is None:
            plan = rendered[name]
        else:
            df.collect()  # run THIS dataset so AQE finalizes its own plan
            plan = df._jdf.queryExecution().executedPlan().toString()
        out.write(f"## {name}\n\n")
        # checks read the FINAL plan; AQE's toString appends an
        # "== Initial Plan ==" section that double-counts exchanges
        check_plan = plan.split("== Initial Plan ==")[0]
        for pattern, why in CHECKS.get(name, []):
            ok = bool(re.search(pattern, check_plan))
            out.write(f"- {'✅' if ok else '❌'} `{pattern}` — {why}\n")
        out.write("\n```\n")
        out.write(plan[:4000])
        out.write("\n```\n\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write(out.getvalue())
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
