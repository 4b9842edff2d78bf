"""O4 trim/clip + O11 compaction tests."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.trim import trim
from spandex_spark.tables import IcebergishTable


class TestTrim:
    def test_clip_to_window(self, spark, fixture_dir):
        parcels = spark.read.parquet(os.path.join(fixture_dir, "parcels.parquet"))
        # boundary: [0, 5]^2 — parcels straddle / fall outside it
        bx = np.array([0.0, 5.0, 5.0, 0.0])
        by = np.array([0.0, 0.0, 5.0, 5.0])
        out = trim(parcels, bx, by).collect()
        assert len(out) == parcels.count()  # every row kept
        for r in out:
            g = r.geom_trimmed
            p = r.geom
            inside_any = (p.bbox.maxx > 0 and p.bbox.minx < 5
                          and p.bbox.maxy > 0 and p.bbox.miny < 5)
            if not inside_any:
                assert g is None
            else:
                assert g is not None
                assert g.bbox.minx >= -1e-12 and g.bbox.maxx <= 5 + 1e-12
                assert g.bbox.miny >= -1e-12 and g.bbox.maxy <= 5 + 1e-12
                # clipped area == rectangle-intersection arithmetic
                want = ((min(p.bbox.maxx, 5) - max(p.bbox.minx, 0))
                        * (min(p.bbox.maxy, 5) - max(p.bbox.miny, 0)))
                xs = np.array(g.xs)
                ys = np.array(g.ys)
                got = abs(0.5 * np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))
                assert got == pytest.approx(want, abs=1e-12)

    def test_nonconvex_boundary_triangulated(self, spark, fixture_dir):
        """Round 2: non-convex boundaries are supported (ear-clip tiling);
        trimmed area must equal the exact intersection kernel's."""
        from spandex_spark import geom as G
        parcels = spark.read.parquet(os.path.join(fixture_dir, "parcels.parquet"))
        lx = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0])
        ly = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0])
        out = trim(parcels, lx, ly).collect()
        n_clipped = 0
        for r in out:
            sx = np.asarray(r.geom.xs, float)
            sy = np.asarray(r.geom.ys, float)
            want = G.polygon_intersection_area(sx, sy, lx, ly)
            g = r.geom_trimmed
            if g is None:
                assert want == pytest.approx(0.0, abs=1e-12)
            else:
                n_clipped += 1
                got = G.rings_area(np.asarray(g.xs, float),
                                   np.asarray(g.ys, float),
                                   np.asarray(g.ring_offsets))
                assert got == pytest.approx(want, abs=1e-9)
        assert n_clipped > 0

    def test_dissolve_unit(self):
        """Two triangles tiling the unit square dissolve to one 4-vertex
        ring with the same area; a square ring plus a disjoint one stay
        two rings (nothing to cancel)."""
        from spandex_spark import geom as G
        t1 = (np.array([0.0, 1.0, 1.0]), np.array([0.0, 0.0, 1.0]))
        t2 = (np.array([0.0, 1.0, 0.0]), np.array([0.0, 1.0, 1.0]))
        rings = G.dissolve_rings([t1, t2])
        assert len(rings) == 1
        rx, ry = rings[0]
        assert rx.shape[0] == 4
        assert G.shoelace_area(rx, ry) == pytest.approx(1.0)
        sq = (np.array([3.0, 4.0, 4.0, 3.0]), np.array([0.0, 0.0, 1.0, 1.0]))
        rings = G.dissolve_rings([t1, t2, sq])
        assert len(rings) == 2
        assert sum(G.shoelace_area(rx, ry) for rx, ry in rings) == \
            pytest.approx(2.0)

    def test_nonconvex_dissolved_minimal_and_area_exact(self, spark,
                                                        fixture_dir):
        """dissolve=True: same region/area as the tiled output, but pieces
        merged to minimal rings — a parcel fully inside the L-boundary
        comes back as ONE 4-vertex ring, and a parcel straddling the
        notch dissolves to a single ring too."""
        from spandex_spark import geom as G
        parcels = spark.read.parquet(os.path.join(fixture_dir, "parcels.parquet"))
        lx = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0])
        ly = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0])
        out = {r.parcel_id: r.geom_trimmed
               for r in trim(parcels, lx, ly, dissolve=True).collect()}
        tiled = {r.parcel_id: r.geom_trimmed
                 for r in trim(parcels, lx, ly).collect()}
        n_multi_tiled = n_multi_diss = 0
        for pid, g in out.items():
            t = tiled[pid]
            assert (g is None) == (t is None)
            if g is None:
                continue
            ga = G.rings_area(np.asarray(g.xs, float), np.asarray(g.ys, float),
                              np.asarray(g.ring_offsets))
            ta = G.rings_area(np.asarray(t.xs, float), np.asarray(t.ys, float),
                              np.asarray(t.ring_offsets))
            assert ga == pytest.approx(ta, rel=1e-12)
            n_multi_tiled += len(t.ring_offsets or [0, 0]) > 2
            n_multi_diss += len(g.ring_offsets or [0, 0]) > 2
            # every dissolved ring is simple enough to have >= 3 vertices
            offs = np.asarray(g.ring_offsets or [0, len(g.xs)])
            assert (np.diff(offs) >= 3).all()
        # the tiling produced multi-piece rows; dissolve merged them all
        # (the L is simply connected, so each clip is one ring)
        assert n_multi_tiled > 0
        assert n_multi_diss == 0


class TestCompaction:
    def test_compact_rewrites_and_preserves_rows(self, spark, tmp_path):
        t = IcebergishTable(str(tmp_path / "tbl"))
        for i in range(3):
            t.append(spark.range(i * 100, (i + 1) * 100)
                     .select(F.col("id").alias("cell"),
                             (F.col("id") * 2).alias("v")))
        assert len(t.snapshots()) == 3
        t.compact(spark, "cell", n_files=4)
        snaps = t.snapshots()
        assert snaps[-1]["kind"] == "rewrite"
        assert t.total_rows() == 300
        df = t.read(spark)
        assert df.count() == 300
        got = {r.cell: r.v for r in df.collect()}
        assert all(got[i] == 2 * i for i in range(300))
        # append after compaction still visible
        t.append(spark.range(300, 310).select(F.col("id").alias("cell"),
                                              (F.col("id") * 2).alias("v")))
        assert t.read(spark).count() == 310


class TestDissolveBy:
    def test_holes_participate_ringwise(self, spark):
        """Two donut halves sharing their middle edges dissolve into one
        outer ring + one hole ring; area = outer - hole."""
        from spandex_spark import geom as G
        from spandex_spark.operators.dissolve import dissolve_by
        # left half: outer [0,2]x[0,4] with hole-half [1,2]x[1,3] cut as
        # rings; right half mirrored — constructed so shared edges match
        def rect(x0, y0, x1, y1, cw=False):
            xs = [x0, x1, x1, x0]
            ys = [y0, y0, y1, y1]
            return (xs[::-1], ys[::-1]) if cw else (xs, ys)
        rows = []
        for gid, (x0, x1) in ((0, (0.0, 2.0)), (0, (2.0, 4.0))):
            oxs, oys = rect(x0, 0.0, x1, 4.0)
            hxs, hys = rect(max(x0, 1.0), 1.0, min(x1, 3.0), 3.0, cw=True)
            rows.append((gid, {
                "kind": 6, "xs": list(map(float, oxs + hxs)),
                "ys": list(map(float, oys + hys)),
                "ring_offsets": [0, 4, 8],
                "bbox": {"minx": x0, "miny": 0.0, "maxx": x1, "maxy": 4.0}}))
        df = spark.createDataFrame(
            rows, "gid long, geom struct<kind:tinyint, xs:array<double>,"
            " ys:array<double>, ring_offsets:array<int>,"
            " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
        out = dissolve_by(df, key_col="gid").collect()
        assert len(out) == 1
        g = out[0].geom
        assert len(g.ring_offsets) - 1 == 2     # one outer + one hole
        area = G.rings_area(np.asarray(g.xs), np.asarray(g.ys),
                            np.asarray(g.ring_offsets))
        assert area == pytest.approx(4.0 * 4.0 - 2.0 * 2.0)

    def test_full_cancellation_gives_null(self, spark):
        from spandex_spark.operators.dissolve import dissolve_by
        sq = {"kind": 3, "xs": [0.0, 1.0, 1.0, 0.0],
              "ys": [0.0, 0.0, 1.0, 1.0], "ring_offsets": [0, 4],
              "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 1.0, "maxy": 1.0}}
        rv = {"kind": 3, "xs": [0.0, 1.0, 1.0, 0.0][::-1],
              "ys": [0.0, 0.0, 1.0, 1.0][::-1], "ring_offsets": [0, 4],
              "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 1.0, "maxy": 1.0}}
        df = spark.createDataFrame(
            [(7, sq), (7, rv)],
            "gid long, geom struct<kind:tinyint, xs:array<double>,"
            " ys:array<double>, ring_offsets:array<int>,"
            " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
        out = dissolve_by(df, key_col="gid").collect()
        assert len(out) == 1 and out[0].geom is None


class TestTimeTravel:
    def test_as_of_snapshot_sequence_and_timestamp(self, spark, tmp_path):
        t = IcebergishTable(str(tmp_path / "tt"))
        ids = []
        for i in range(3):
            ids.append(t.append(spark.range(i * 10, (i + 1) * 10)
                                .select(F.col("id").alias("v"))))
        snaps = t.snapshots()
        # VERSION AS OF by snapshot_id and by sequence
        assert t.read(spark, as_of=ids[0]).count() == 10
        assert t.read(spark, as_of_seq=1).count() == 20
        assert t.read(spark, as_of=ids[2]).count() == 30
        # TIMESTAMP AS OF: cutoff at the middle snapshot's timestamp
        assert t.read(spark, as_of_ts=snaps[1]["timestamp_ms"]).count() == 20
        # a bare int as_of (the old magnitude heuristic) is rejected
        import pytest as _pt0
        with _pt0.raises(TypeError):
            t.read(spark, as_of=1)
        with _pt0.raises(TypeError):
            t.read(spark, as_of=ids[0], as_of_seq=1)
        # compaction preserves pre-rewrite states
        t.compact(spark, "v", n_files=2)
        assert t.read(spark).count() == 30
        assert t.read(spark, as_of=ids[1]).count() == 20
        # as-of AFTER the rewrite reads only the rewrite
        rw = t.snapshots()[-1]
        assert t.read(spark, as_of=rw["snapshot_id"]).count() == 30
        import pytest as _pt
        with _pt.raises(KeyError):
            t.read(spark, as_of="nope")


class TestUnionBy:
    def test_overlapping_chain_and_frame(self, spark):
        """union_by handles the overlapping case dissolve_by excludes:
        chains of overlapping rects -> one rect; a 4-rect frame -> outer
        ring + hole, closed-form areas."""
        from spandex_spark.operators.dissolve import union_by
        import numpy as np

        def rect_row(gid, x0, y0, x1, y1):
            x0, y0, x1, y1 = float(x0), float(y0), float(x1), float(y1)
            return (gid, {"kind": 3, "xs": [x0, x1, x1, x0],
                          "ys": [y0, y0, y1, y1], "ring_offsets": [0, 4],
                          "bbox": {"minx": x0, "miny": y0,
                                   "maxx": x1, "maxy": y1}})

        rows = [rect_row(1, i * 0.5, 0.0, i * 0.5 + 0.75, 1.0)
                for i in range(4)]                       # chain: 2.25 x 1
        rows += [rect_row(2, 0, 0, 3, 1), rect_row(2, 2, 0, 3, 3),
                 rect_row(2, 0, 2, 3, 3), rect_row(2, 0, 0, 1, 3)]  # frame
        df = spark.createDataFrame(
            rows, "gid long, geom struct<kind:tinyint, xs:array<double>,"
            " ys:array<double>, ring_offsets:array<int>,"
            " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
        got = {r.gid: r.geom for r in union_by(df, key_col="gid").collect()}
        from spandex_spark import geom as G
        g1 = got[1]
        a1 = G.rings_area(np.array(g1["xs"]), np.array(g1["ys"]),
                          np.array(g1["ring_offsets"]))
        assert len(g1["ring_offsets"]) - 1 == 1
        assert a1 == pytest.approx((3 * 0.5 + 0.75) * 1.0, abs=1e-9)
        g2 = got[2]
        a2 = G.rings_area(np.array(g2["xs"]), np.array(g2["ys"]),
                          np.array(g2["ring_offsets"]))
        assert len(g2["ring_offsets"]) - 1 == 2
        assert a2 == pytest.approx(8.0, abs=1e-9)

    def test_matches_dissolve_on_tilings(self, spark):
        """On an edge-sharing tiling (dissolve_by's contract) union_by must
        agree with dissolve_by: same region, same area, same ring count."""
        from spandex_spark.operators.dissolve import dissolve_by, union_by
        import numpy as np
        from spandex_spark import geom as G
        rows = []
        for gid in range(3):
            for i in range(2):
                for j in range(2):
                    x0, y0 = float(gid * 10 + i), float(j)
                    rows.append((gid, {"kind": 3,
                                       "xs": [x0, x0 + 1.0, x0 + 1.0, x0],
                                       "ys": [y0, y0, y0 + 1.0, y0 + 1.0],
                                       "ring_offsets": [0, 4],
                                       "bbox": {"minx": x0, "miny": y0,
                                                "maxx": x0 + 1.0,
                                                "maxy": y0 + 1.0}}))
        df = spark.createDataFrame(
            rows, "gid long, geom struct<kind:tinyint, xs:array<double>,"
            " ys:array<double>, ring_offsets:array<int>,"
            " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
        for fn in (dissolve_by, union_by):
            got = {r.gid: r.geom for r in fn(df, key_col="gid").collect()}
            for gid in range(3):
                g = got[gid]
                a = G.rings_area(np.array(g["xs"]), np.array(g["ys"]),
                                 np.array(g["ring_offsets"]))
                assert len(g["ring_offsets"]) - 1 == 1
                assert a == pytest.approx(4.0, abs=1e-9)


class TestErase:
    def test_erase_complements_trim(self, spark, fixture_dir):
        """ST_Difference: erase(parcel, L) + trim(parcel, L) areas must sum
        to the parcel area row-by-row (partition identity), and the erased
        geometry must lie outside the L (PIP spot check)."""
        from spandex_spark import geom as G
        from spandex_spark.operators.trim import erase, trim
        parcels = spark.read.parquet(
            os.path.join(fixture_dir, "parcels.parquet"))
        lx = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0])
        ly = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0])
        er = {r.parcel_id: r.geom_erased
              for r in erase(parcels, lx, ly).collect()}
        tr = {r.parcel_id: r.geom_trimmed
              for r in trim(parcels, lx, ly).collect()}
        full = {r.parcel_id: r.geom for r in parcels.collect()}
        checked_interior = 0
        for pid, g in full.items():
            want = abs(G.shoelace_area(np.asarray(g.xs), np.asarray(g.ys)))
            ea = (G.rings_area(np.asarray(er[pid].xs), np.asarray(er[pid].ys),
                               np.asarray(er[pid].ring_offsets))
                  if er[pid] is not None else 0.0)
            ta = (G.rings_area(np.asarray(tr[pid].xs), np.asarray(tr[pid].ys),
                               np.asarray(tr[pid].ring_offsets))
                  if tr[pid] is not None else 0.0)
            assert ea + ta == pytest.approx(want, abs=1e-7), pid
            if er[pid] is not None and ta > 0:
                # partially-erased parcel: the erased region's area
                # centroid must lie OUTSIDE the L mask
                e = er[pid]
                cx, cy = G.rings_centroid(np.asarray(e.xs),
                                          np.asarray(e.ys),
                                          np.asarray(e.ring_offsets))
                assert not G.points_in_rings(np.array([cx]), np.array([cy]),
                                             lx, ly, None)[0]
                checked_interior += 1
        assert checked_interior > 0


class TestEraseJoin:
    def test_multi_mask_difference_closed_form(self, spark):
        """erase_join: target minus the UNION of overlapping masks. Two
        overlapping mask squares cut a known region from each target;
        untouched targets pass through; a fully-covered target drops
        (drop_empty) or comes back NULL."""
        from spandex_spark import geom as G
        from spandex_spark.operators.trim import erase_join

        def rect(i, x0, y0, x1, y1):
            return (i, {"kind": 3, "xs": [x0, x1, x1, x0],
                        "ys": [y0, y0, y1, y1],
                        "ring_offsets": [0, 4],
                        "bbox": {"minx": x0, "miny": y0,
                                 "maxx": x1, "maxy": y1}})

        schema = ("tid long, geom struct<kind:tinyint, xs:array<double>,"
                  " ys:array<double>, ring_offsets:array<int>,"
                  " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
        targets = spark.createDataFrame(
            [rect(1, 0.0, 0.0, 4.0, 4.0),      # cut by both masks
             rect(2, 10.0, 10.0, 12.0, 12.0),  # untouched
             rect(3, 20.25, 20.25, 20.75, 20.75)],  # fully inside mask C
            schema)
        masks = spark.createDataFrame(
            [rect(100, 1.0, 1.0, 3.0, 2.0),    # A
             rect(101, 2.0, 1.5, 3.5, 3.0),    # B (overlaps A)
             rect(102, 20.0, 20.0, 21.0, 21.0)],  # C
            schema)
        out = {r.tid: r.geom_erased
               for r in erase_join(targets, masks,
                                   target_id_col="tid").collect()}
        # union(A,B) = 2 + 2.25 - 0.5 = 3.75 cut from target 1
        a1 = G.rings_area(np.asarray(out[1].xs), np.asarray(out[1].ys),
                          np.asarray(out[1].ring_offsets))
        assert a1 == pytest.approx(16.0 - 3.75, abs=1e-9)
        a2 = G.rings_area(np.asarray(out[2].xs), np.asarray(out[2].ys),
                          np.asarray(out[2].ring_offsets))
        assert a2 == pytest.approx(4.0, abs=1e-12)
        assert out[3] is None
        dropped = erase_join(targets, masks, target_id_col="tid",
                             drop_empty=True).collect()
        assert sorted(r.tid for r in dropped) == [1, 2]

    def test_matches_single_mask_erase(self, spark, fixture_dir):
        """With ONE mask, erase_join must agree with the driver-side
        erase() row-by-row (area equality)."""
        from spandex_spark import geom as G
        from spandex_spark.operators.trim import erase, erase_join
        parcels = spark.read.parquet(
            os.path.join(fixture_dir, "parcels.parquet"))
        lx = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0])
        ly = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0])
        mask = spark.createDataFrame(
            [(0, {"kind": 3, "xs": lx.tolist(), "ys": ly.tolist(),
                  "ring_offsets": [0, 6],
                  "bbox": {"minx": 0.0, "miny": 0.0,
                           "maxx": 2.0, "maxy": 2.0}})],
            "mid long, geom struct<kind:tinyint, xs:array<double>,"
            " ys:array<double>, ring_offsets:array<int>,"
            " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
        a = {r.parcel_id: r.geom_erased
             for r in erase(parcels, lx, ly).collect()}
        b = {r.parcel_id: r.geom_erased
             for r in erase_join(parcels, mask,
                                 target_id_col="parcel_id").collect()}
        assert set(a) == set(b)
        for pid in a:
            if a[pid] is None:
                assert b[pid] is None
                continue
            aa = G.rings_area(np.asarray(a[pid].xs), np.asarray(a[pid].ys),
                              np.asarray(a[pid].ring_offsets))
            ba = G.rings_area(np.asarray(b[pid].xs), np.asarray(b[pid].ys),
                              np.asarray(b[pid].ring_offsets))
            assert ba == pytest.approx(aa, abs=1e-9), pid


class TestUnionByTree:
    def test_two_level_matches_single_stage(self, spark):
        """prepartition_level (the huge-group tree path) must produce the
        same region as the single-stage union: same area, same even-odd
        PIP on probe points — on overlapping chains that straddle cell
        boundaries."""
        from spandex_spark import geom as G
        from spandex_spark.operators.dissolve import union_by
        import numpy as np

        rows = []
        rng = np.random.default_rng(17)
        for gid in range(4):
            for i in range(12):
                x0 = float(rng.uniform(-60, 60))
                y0 = float(rng.uniform(-40, 40))
                w, h = float(rng.uniform(5, 25)), float(rng.uniform(5, 25))
                rows.append((gid, {"kind": 3,
                                   "xs": [x0, x0 + w, x0 + w, x0],
                                   "ys": [y0, y0, y0 + h, y0 + h],
                                   "ring_offsets": [0, 4],
                                   "bbox": {"minx": x0, "miny": y0,
                                            "maxx": x0 + w, "maxy": y0 + h}}))
        df = spark.createDataFrame(
            rows, "gid long, geom struct<kind:tinyint, xs:array<double>,"
            " ys:array<double>, ring_offsets:array<int>,"
            " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
        flat = {r.gid: r.geom for r in union_by(df, key_col="gid").collect()}
        tree = {r.gid: r.geom
                for r in union_by(df, key_col="gid",
                                  prepartition_level=4).collect()}
        px = rng.uniform(-70, 90, 5000)
        py = rng.uniform(-50, 60, 5000)
        for gid in range(4):
            a, b = flat[gid], tree[gid]
            aa = G.rings_area(np.asarray(a.xs), np.asarray(a.ys),
                              np.asarray(a.ring_offsets))
            ba = G.rings_area(np.asarray(b.xs), np.asarray(b.ys),
                              np.asarray(b.ring_offsets))
            assert ba == pytest.approx(aa, rel=1e-9)
            pa = G.points_in_rings(px, py, np.asarray(a.xs),
                                   np.asarray(a.ys), np.asarray(a.ring_offsets))
            pb = G.points_in_rings(px, py, np.asarray(b.xs),
                                   np.asarray(b.ys), np.asarray(b.ring_offsets))
            assert (pa == pb).all()


class TestManifestPruning:
    def test_between_prunes_files_and_preserves_rows(self, spark, tmp_path):
        """Manifest-level lower/upper-bound pruning: after compaction
        (range-partitioned + sorted by cell), a narrow cell range must
        plan a strict subset of data files, and the pruned read filtered
        row-level must equal the full read filtered row-level."""
        t = IcebergishTable(str(tmp_path / "pt"))
        for i in range(4):
            t.append(spark.range(i * 250, (i + 1) * 250)
                     .select(F.col("id").alias("cell"),
                             (F.col("id") * 3).alias("v")))
        t.compact(spark, "cell", n_files=8)
        all_files = t.files_for()
        pruned_files = t.files_for(between=("cell", 100, 140))
        assert len(pruned_files) < len(all_files)
        full = (t.read(spark).filter((F.col("cell") >= 100)
                                     & (F.col("cell") <= 140)).collect())
        pr = (t.read(spark, between=("cell", 100, 140))
              .filter((F.col("cell") >= 100) & (F.col("cell") <= 140))
              .collect())
        assert sorted((r.cell, r.v) for r in pr) == \
            sorted((r.cell, r.v) for r in full)
        assert len(full) == 41

    def test_temporal_between_prunes(self, spark, tmp_path):
        """Timestamp columns participate in manifest pruning: footer
        datetime stats are recorded as epoch millis, and between= accepts
        datetime bounds (ADVICE r4 — the advertised temporal pruning
        previously never engaged)."""
        import datetime as dt
        t = IcebergishTable(str(tmp_path / "ptts"))
        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        for i in range(4):
            t.append(spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("k"),
                (F.lit(int(base.timestamp())).cast("long")
                 + F.col("id") * 3600).cast("timestamp").alias("ts")))
        all_files = t.files_for()
        lo = base + dt.timedelta(hours=150)
        hi = base + dt.timedelta(hours=160)
        pruned = t.files_for(between=("ts", lo, hi))
        assert 0 < len(pruned) < len(all_files)
        rows = (t.read(spark, between=("ts", lo, hi))
                .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
                .count())
        assert rows == 11

    def test_delete_where_copy_on_write(self, spark, tmp_path):
        """Row-level COW delete: only stat-overlapping files rewrite,
        the rest carry by reference; pre-delete snapshots stay readable."""
        t = IcebergishTable(str(tmp_path / "del"))
        for i in range(4):
            t.append(spark.range(i * 250, (i + 1) * 250)
                     .select(F.col("id").alias("cell"),
                             (F.col("id") * 3).alias("v")))
        pre_seq = t.current_snapshot()["sequence"]
        assert t.row_count() == 1000
        res = t.delete_where(spark, "cell", 100, 140)
        assert res["deleted_rows"] == 41
        assert res["rewritten"] >= 1 and res["carried"] >= 1
        assert t.row_count() == 959
        live = t.read(spark)
        assert live.count() == 959
        assert live.filter((F.col("cell") >= 100)
                           & (F.col("cell") <= 140)).count() == 0
        # time travel: the pre-delete state is intact
        old = t.read(spark, as_of_seq=pre_seq)
        assert old.count() == 1000
        # a no-op range publishes nothing
        seq = t.current_snapshot()["sequence"]
        res2 = t.delete_where(spark, "cell", 5000, 6000)
        assert res2["deleted_rows"] == 0
        assert t.current_snapshot()["sequence"] == seq

    def test_pruning_is_safe_without_stats_overlap_semantics(self, spark,
                                                             tmp_path):
        """Files whose [min,max] merely TOUCHES the range boundary are
        kept; an empty plan raises a clear error."""
        t = IcebergishTable(str(tmp_path / "pt2"))
        t.append(spark.range(0, 100).select(F.col("id").alias("cell")))
        assert len(t.files_for(between=("cell", 99, 200))) >= 1
        import pytest as _pt
        with _pt.raises(FileNotFoundError):
            t.read(spark, between=("cell", 5000, 6000))


class TestBboxScanPlanning:
    def test_read_bbox_prunes_files_and_matches_full_scan(self, spark,
                                                          tmp_path):
        """GiST-window-scan analog: after compact(sort_col='cell'), a
        city-block bbox must plan a strict subset of data files, and
        read_bbox with the exact lon/lat refine must equal the full scan
        filtered row-level."""
        import numpy as np
        import pandas as pd
        from spandex_spark import cells
        rng = np.random.default_rng(11)
        lon = rng.uniform(-10, 10, 20000)
        lat = rng.uniform(-10, 10, 20000)
        pdf = pd.DataFrame({
            "pid": np.arange(20000, dtype=np.int64),
            "lon": lon, "lat": lat,
            "cell": cells.cell_of(lon, lat, 12)})
        t = IcebergishTable(str(tmp_path / "bbt"))
        t.append(spark.createDataFrame(pdf))
        t.compact(spark, "cell", n_files=16)
        bbox = (1.0, 2.0, 1.5, 2.4)
        planned = t.files_for_bbox(bbox)
        assert 0 < len(planned) < len(t.files_for())
        got = t.read_bbox(spark, bbox, lon_col="lon", lat_col="lat")
        want = t.read(spark).filter(
            F.col("lon").between(1.0, 1.5) & F.col("lat").between(2.0, 2.4))
        assert sorted(r.pid for r in got.collect()) == \
            sorted(r.pid for r in want.collect())
        assert got.count() > 0
        # without the refine columns, the result is a cell-coarse SUPERSET
        coarse = t.read_bbox(spark, bbox).count()
        assert coarse >= got.count()
        # the interval disjunction reaches the Parquet scan, so row-group
        # stats prune WITHIN the kept (cell-sorted) files too
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "cell" in plan.split(
            "PushedFilters")[1][:400]

    def test_read_bbox_guards(self, spark, tmp_path):
        """No cell stats -> actionable error; mixed levels -> error; a
        bbox missing every file -> FileNotFoundError."""
        import numpy as np
        import pandas as pd
        from spandex_spark import cells
        t = IcebergishTable(str(tmp_path / "bbg"))
        t.append(spark.range(10).select(F.col("id").alias("k")))
        with pytest.raises(ValueError, match="no manifest stats"):
            t.read_bbox(spark, (0, 0, 1, 1))
        lon = np.array([5.0, 6.0]); lat = np.array([5.0, 6.0])
        t2 = IcebergishTable(str(tmp_path / "bbm"))
        t2.append(spark.createDataFrame(pd.DataFrame(
            {"lon": lon, "lat": lat, "cell": cells.cell_of(lon, lat, 10)})))
        t2.append(spark.createDataFrame(pd.DataFrame(
            {"lon": lon, "lat": lat, "cell": cells.cell_of(lon, lat, 12)})))
        with pytest.raises(ValueError, match="mixed cell levels"):
            t2.read_bbox(spark, (0, 0, 1, 1))
        t3 = IcebergishTable(str(tmp_path / "bbf"))
        t3.append(spark.createDataFrame(pd.DataFrame(
            {"lon": lon, "lat": lat, "cell": cells.cell_of(lon, lat, 12)})))
        with pytest.raises(FileNotFoundError):
            t3.read_bbox(spark, (-170.0, -80.0, -169.0, -79.0))


class TestExpireSnapshots:
    def test_expire_deletes_unreferenced_files_only(self, spark, tmp_path):
        """GC: pre-compaction snapshots expire (manifests + their data
        files go), the compacted state is untouched, and time travel to
        an expired snapshot raises."""
        t = IcebergishTable(str(tmp_path / "gc"))
        for i in range(3):
            t.append(spark.range(i * 100, (i + 1) * 100)
                     .select(F.col("id").alias("k")))
        t.compact(spark, "k", n_files=4)
        pre_files = [p for p in t.files_for()]
        old_seq0 = t.snapshots()[0]["sequence"]
        res = t.expire_snapshots(keep_last=0)
        assert res["expired_snapshots"] == 3
        assert res["deleted_files"] >= 3
        # live read unchanged
        assert t.read(spark).count() == 300
        assert sorted(t.files_for()) == sorted(pre_files)
        # expired manifests are gone -> time travel raises
        with pytest.raises(KeyError):
            t.read(spark, as_of_seq=old_seq0)
        # expired data files are really off disk
        import glob
        live = set(t.files_for())
        on_disk = set(glob.glob(os.path.join(t.root, "data", "*", "*.parquet")))
        assert on_disk == live

    def test_keep_last_retains_history(self, spark, tmp_path):
        t = IcebergishTable(str(tmp_path / "gck"))
        for i in range(3):
            t.append(spark.range(i * 10, (i + 1) * 10)
                     .select(F.col("id").alias("k")))
        t.compact(spark, "k", n_files=2)
        res = t.expire_snapshots(keep_last=2)
        assert res["expired_snapshots"] == 1
        # the two retained historical snapshots still time-travel
        seqs = [s["sequence"] for s in t.snapshots()]
        assert t.read(spark, as_of_seq=seqs[1]).count() == 20

    def test_carried_by_reference_files_survive(self, spark, tmp_path):
        """A delete_where rewrite carries untouched files BY REFERENCE;
        expiring the snapshot that originally wrote them must NOT delete
        them."""
        t = IcebergishTable(str(tmp_path / "gcc"))
        t.append(spark.range(0, 100).coalesce(1)
                 .select(F.col("id").alias("k")))
        t.append(spark.range(100, 200).coalesce(1)
                 .select(F.col("id").alias("k")))
        out = t.delete_where(spark, "k", 150, 160)
        assert out["carried"] == 1 and out["rewritten"] == 1
        res = t.expire_snapshots(keep_last=0)
        assert res["expired_snapshots"] == 2
        # first append's file was carried: still on disk, read intact
        assert t.read(spark).count() == 189
        assert sorted(r.k for r in t.read(spark).collect())[:3] == [0, 1, 2]


class TestRegionScanPlanning:
    def test_read_region_skips_notch_files(self, spark, tmp_path):
        """An L-shaped window over a compacted table plans fewer files
        than its own bbox would, and the coarse superset contains every
        region row."""
        import numpy as np
        import pandas as pd
        from spandex_spark import cells, geom
        rng = np.random.default_rng(13)
        lon = rng.uniform(0, 8, 30000); lat = rng.uniform(0, 8, 30000)
        t = IcebergishTable(str(tmp_path / "rgt"))
        t.append(spark.createDataFrame(pd.DataFrame(
            {"pid": np.arange(30000, dtype=np.int64), "lon": lon,
             "lat": lat, "cell": cells.cell_of(lon, lat, 14)})))
        t.compact(spark, "cell", n_files=32)
        xs = np.array([0.0, 8.0, 8.0, 4.0, 4.0, 0.0])
        ys = np.array([0.0, 0.0, 4.0, 4.0, 8.0, 8.0])
        region_files = t.files_for_region(xs, ys)
        bbox_files = t.files_for_bbox((0.0, 0.0, 8.0, 8.0))
        assert 0 < len(region_files) < len(bbox_files)
        got = {r.pid for r in t.read_region(spark, xs, ys).collect()}
        inside = set(np.nonzero(
            geom.points_in_polygon(lon, lat, xs, ys))[0].tolist())
        assert inside <= got  # coarse superset, no false negatives
