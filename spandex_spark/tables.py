"""Iceberg-style table module (SURVEY.md §1.3).

PySpark here ships no Iceberg runtime jar and there is no network, so this
implements the subset of Iceberg semantics the north rule exercises:
Parquet data files + a JSON manifest per snapshot (schema, partition spec,
per-file row counts, parent snapshot pointer) giving atomic append,
snapshot listing for resume, and partition-granularity file pruning.
Swapping in real Iceberg is a config change if a jar appears.

Reference analog: spandex/io.py::df_to_db / ::db_to_df (PostGIS tables are
the reference's storage layer; Parquet+manifest is ours).
"""

from __future__ import annotations

import datetime
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stat_value(v):
    """Normalize a Parquet footer statistic to a JSON-storable, totally
    ordered value. Numerics pass through; timestamps/dates (pyarrow hands
    back datetime objects) become epoch MILLISECONDS (UTC) — the same
    canonical form Iceberg uses for temporal lower/upper bounds — so
    ``between=(ts_col, lo, hi)`` actually prunes on temporal columns.
    Returns None for types that don't participate in pruning."""
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1000)
    if isinstance(v, datetime.date):
        return int(datetime.datetime(
            v.year, v.month, v.day,
            tzinfo=datetime.timezone.utc).timestamp() * 1000)
    return None


def _file_column_stats(md) -> dict:
    """Per-file min/max for numeric/temporal columns, aggregated over row
    groups from the Parquet footer — the Iceberg manifest `lower_bounds` /
    `upper_bounds` analog that drives file-level pruning without opening
    data pages. Temporal stats are stored as epoch millis (`_stat_value`)."""
    stats: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = _stat_value(st.min), _stat_value(st.max)
            if lo is None or hi is None:
                continue
            name = col.path_in_schema
            if name in stats:
                stats[name] = [min(stats[name][0], lo),
                               max(stats[name][1], hi)]
            else:
                stats[name] = [lo, hi]
    return stats


class IcebergishTable:
    """A directory of Parquet files governed by JSON snapshot manifests.

    Layout::

        <root>/data/<snapshot>-<n>.parquet     (one per appended partition set)
        <root>/metadata/snap-<seq>-<id>.json   (immutable snapshot manifests)
        <root>/metadata/current                (atomically replaced pointer)
    """

    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "metadata")

    # ------------------------------------------------------------ write

    def append(self, df: DataFrame, partition_values: dict | None = None,
               kind: str = "append") -> str:
        """Atomic append: write Parquet to a fresh subdir, then publish a new
        snapshot manifest and flip the ``current`` pointer (rename = atomic).
        ``kind='rewrite'`` marks a snapshot that REPLACES all prior data
        (compaction); reads then start from the latest rewrite."""
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)
        snap_id = uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, snap_id)
        df.write.mode("overwrite").parquet(out)
        files, total = self._scan_written(out)
        return self._publish(snap_id, kind, df.schema.jsonValue(),
                             partition_values, files, total)

    def _publish(self, snap_id: str, kind: str, schema_json,
                 partition_values: dict | None, files: list[dict],
                 total: int) -> str:
        """Write an immutable snapshot manifest and atomically flip the
        ``current`` pointer (rename)."""
        parent = self.current_snapshot()
        seq = (parent["sequence"] + 1) if parent else 0
        manifest = {
            "snapshot_id": snap_id,
            "kind": kind,
            "sequence": seq,
            "parent": parent["snapshot_id"] if parent else None,
            "timestamp_ms": int(time.time() * 1000),
            "schema": schema_json,
            "partition_values": partition_values or {},
            "files": files,
            "total_rows": total,
        }
        tmp = os.path.join(self.meta_dir, f".tmp-{snap_id}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        final = os.path.join(self.meta_dir, f"snap-{seq:06d}-{snap_id}.json")
        os.rename(tmp, final)
        ptr_tmp = os.path.join(self.meta_dir, f".ptr-{snap_id}")
        with open(ptr_tmp, "w") as fh:
            fh.write(os.path.basename(final))
        os.rename(ptr_tmp, os.path.join(self.meta_dir, "current"))
        return snap_id

    def _scan_written(self, out: str) -> tuple[list[dict], int]:
        """Collect manifest entries (path/rows/stats) for a freshly
        written parquet directory."""
        import pyarrow.parquet as pq
        files = []
        total = 0
        for fn in sorted(os.listdir(out)):
            if fn.endswith(".parquet"):
                p = os.path.join(out, fn)
                md = pq.read_metadata(p)
                if md.num_rows == 0:
                    # empty part-files carry no stats, so they would
                    # conservatively defeat every file-level prune;
                    # they contribute nothing — skip them
                    continue
                files.append({"path": os.path.relpath(p, self.root),
                              "rows": md.num_rows,
                              "stats": _file_column_stats(md)})
                total += md.num_rows
        return files, total

    def delete_where(self, spark: SparkSession, col: str, lo, hi) -> dict:
        """Copy-on-write row-level DELETE of rows with ``lo <= col <= hi``
        (the Iceberg COW ``DELETE WHERE`` analog): only data files whose
        manifest [min, max] bounds for ``col`` overlap the range are
        rewritten (their surviving rows land in new files); every other
        live file carries into the new snapshot BY REFERENCE — at 100 TB
        a narrow delete rewrites a handful of files, never the table.
        Prior snapshots stay readable (time travel) until GC.

        Returns {"rewritten": n_files, "carried": n_files,
        "deleted_rows": n}; a no-op range publishes nothing."""
        live = [f for s in self._live_snapshots() if s for f in s["files"]]
        touched = self._prune_files(live, col, lo, hi)
        # files with no stats for col are conservatively in `touched`
        # (must be scanned — their rows may match)
        touched_paths = {f["path"] for f in touched}
        carried = [f for f in live if f["path"] not in touched_paths]
        if not touched:
            return {"rewritten": 0, "carried": len(carried),
                    "deleted_rows": 0}
        snap_id = uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, snap_id)
        paths = [os.path.join(self.root, f["path"]) for f in touched]
        src = spark.read.parquet(*paths)
        survivors = src.filter(
            ~((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
            | F.col(col).isNull())
        survivors.write.mode("overwrite").parquet(out)
        new_files, new_total = self._scan_written(out)
        schema_json = self.current_snapshot()["schema"]
        carried_total = sum(f["rows"] for f in carried)
        deleted = (sum(f["rows"] for f in touched)) - new_total
        self._publish(snap_id, "rewrite", schema_json,
                      {"delete_where": [col, str(lo), str(hi)]},
                      new_files + carried, new_total + carried_total)
        return {"rewritten": len(touched), "carried": len(carried),
                "deleted_rows": int(deleted)}

    # ------------------------------------------------------------ read

    def snapshots(self) -> list[dict]:
        if not os.path.isdir(self.meta_dir):
            return []
        out = []
        for fn in sorted(os.listdir(self.meta_dir)):
            if fn.startswith("snap-") and fn.endswith(".json"):
                with open(os.path.join(self.meta_dir, fn)) as fh:
                    out.append(json.load(fh))
        return out

    def current_snapshot(self) -> dict | None:
        ptr = os.path.join(self.meta_dir, "current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            name = fh.read().strip()
        with open(os.path.join(self.meta_dir, name)) as fh:
            return json.load(fh)

    def _live_snapshots(self) -> list[dict]:
        """Snapshots contributing to the current table state: everything
        from the most recent 'rewrite' (compaction) onward."""
        snaps = self.snapshots()
        for i in range(len(snaps) - 1, -1, -1):
            if snaps[i].get("kind") == "rewrite":
                return snaps[i:]
        return snaps

    def read(self, spark: SparkSession, *, all_snapshots: bool = True,
             as_of: str | None = None, as_of_seq: int | None = None,
             as_of_ts: int | None = None,
             between: tuple | None = None) -> DataFrame:
        """Read the table (union of live snapshot files — append log since
        the last compaction), or only the current snapshot's files.

        Time travel (the Iceberg `VERSION AS OF` / `TIMESTAMP AS OF`
        analog) takes exactly one of three EXPLICIT keywords — a magnitude
        heuristic over a bare int would silently misread a small timestamp
        as a sequence number:

        * ``as_of`` — a snapshot_id string;
        * ``as_of_seq`` — a sequence number (exact match);
        * ``as_of_ts`` — a timestamp_ms cutoff (latest snapshot at or
          before that time).

        ``between=(col, lo, hi)`` prunes at the MANIFEST level (the
        Iceberg lower/upper-bounds scan-planning analog): only data files
        whose recorded [min, max] for ``col`` overlaps [lo, hi] are passed
        to the Parquet reader at all — on a compacted (range-partitioned,
        sorted) table a narrow range touches one file instead of the whole
        table. The row-level filter is still the caller's job; files
        lacking stats for ``col`` are read (safe).

        Old files survive compaction on disk precisely to keep every
        pre-rewrite state readable until a GC removes them."""
        given = [k for k, v in (("as_of", as_of), ("as_of_seq", as_of_seq),
                                ("as_of_ts", as_of_ts)) if v is not None]
        if len(given) > 1:
            raise TypeError(f"pass at most one of as_of/as_of_seq/as_of_ts,"
                            f" got {given}")
        if as_of is not None and not isinstance(as_of, str):
            raise TypeError(
                "as_of takes a snapshot_id string; use as_of_seq= for a "
                "sequence number or as_of_ts= for a timestamp_ms")
        if given:
            snaps = self._snapshots_as_of(as_of, as_of_seq, as_of_ts)
        else:
            snaps = (self._live_snapshots() if all_snapshots
                     else [self.current_snapshot()])
        files = [f for s in snaps if s for f in s["files"]]
        if between is not None:
            files = self._prune_files(files, *between)
        paths = [os.path.join(self.root, f["path"]) for f in files]
        if not paths:
            raise FileNotFoundError(
                f"empty Icebergish table at {self.root}"
                + (f" (every file pruned by {between})" if between else ""))
        return spark.read.parquet(*paths)

    @staticmethod
    def _prune_files(files: list[dict], col: str, lo, hi) -> list[dict]:
        # datetime/date bounds are normalized exactly like the recorded
        # stats, so temporal between= works with either datetimes or
        # pre-converted epoch-millis ints.
        lo = _stat_value(lo) if isinstance(lo, datetime.date) else lo
        hi = _stat_value(hi) if isinstance(hi, datetime.date) else hi
        kept = []
        for f in files:
            st = (f.get("stats") or {}).get(col)
            if st is None or (st[0] <= hi and st[1] >= lo):
                kept.append(f)
        return kept

    def files_for_bbox(self, bbox: tuple, *, cell_col: str = "cell",
                       max_ranges: int = 64) -> list[str]:
        """Paths a :meth:`read_bbox` would touch (diagnostics / tests)."""
        files = [f for s in self._live_snapshots() for f in s["files"]]
        ranges = self._bbox_ranges(files, bbox, cell_col, max_ranges)
        kept = self._prune_files_ranges(files, cell_col, ranges)
        return [os.path.join(self.root, f["path"]) for f in kept]

    def read_bbox(self, spark: SparkSession, bbox: tuple, *,
                  cell_col: str = "cell", lon_col: str | None = None,
                  lat_col: str | None = None,
                  max_ranges: int = 64) -> DataFrame:
        """Spatial scan planning — the GiST-index range-scan analog
        (spandex queries its PostGIS geometry index for a window; here
        the ``cell`` column IS the index, SURVEY.md O11).

        ``bbox = (minx, miny, maxx, maxy)`` in degrees. The stored cell
        level is read off the manifests' ``cell_col`` min stats (zero
        data-file IO), the bbox becomes at most ``max_ranges`` contiguous
        cell-id intervals (`cells.bbox_cell_ranges`), and pruning happens
        twice with the SAME intervals: data files whose recorded
        [min, max] misses every interval are never handed to the Parquet
        reader (manifest level), and the interval disjunction is applied
        as a JVM filter so Parquet row-group stats prune WITHIN kept
        files — on a `compact(sort_col=cell_col)` layout a city-block
        query touches one file and a few row groups out of a 100 TB
        table. With ``lon_col``/``lat_col`` the exact bbox filter is
        applied too (cell intervals overhang at coarse levels);
        otherwise the result is the cell-coarse superset and exact
        refinement stays the caller's job (PIP tag, kNN, ...).

        Files lacking ``cell_col`` stats are read (safe), and a table
        with mixed stored levels raises — reindex via ``compact``.
        """
        files = [f for s in self._live_snapshots() if s for f in s["files"]]
        ranges = self._bbox_ranges(files, bbox, cell_col, max_ranges)
        kept = self._prune_files_ranges(files, cell_col, ranges)
        paths = [os.path.join(self.root, f["path"]) for f in kept]
        if not paths:
            raise FileNotFoundError(
                f"empty Icebergish table at {self.root} "
                f"(every file pruned by bbox {bbox})")
        df = spark.read.parquet(*paths)
        cond = None
        for lo, hi in ranges:
            c = F.col(cell_col).between(F.lit(lo), F.lit(hi))
            cond = c if cond is None else cond | c
        df = df.filter(cond)
        if lon_col is not None and lat_col is not None:
            minx, miny, maxx, maxy = bbox
            df = df.filter(F.col(lon_col).between(minx, maxx)
                           & F.col(lat_col).between(miny, maxy))
        return df

    def files_for_region(self, xs, ys, *, ring_offsets=None,
                         cell_col: str = "cell",
                         max_ranges: int = 64) -> list[str]:
        """Paths a :meth:`read_region` would touch (diagnostics / tests)."""
        from . import cells as _cells
        files = [f for s in self._live_snapshots() for f in s["files"]]
        level = self._stored_level(files, cell_col)
        ranges = _cells.polygon_cell_ranges(xs, ys, level,
                                            ring_offsets=ring_offsets,
                                            max_ranges=max_ranges)
        kept = self._prune_files_ranges(files, cell_col, ranges)
        return [os.path.join(self.root, f["path"]) for f in kept]

    def read_region(self, spark: SparkSession, xs, ys, *,
                    ring_offsets=None, cell_col: str = "cell",
                    max_ranges: int = 64) -> DataFrame:
        """:meth:`read_bbox` for an arbitrary polygon window: the coarse
        cover is exact vs the REGION (`cells.polygon_cell_ranges`), so a
        lake-shaped query skips files inside the lake's bbox but outside
        the lake. The result is the cell-coarse SUPERSET of the region's
        rows — exact refinement (PIP tag) is deliberately the caller's
        job, matching the engine's two-phase join shape. Same
        manifest-then-row-group double pruning and guards as read_bbox."""
        from . import cells as _cells
        files = [f for s in self._live_snapshots() if s for f in s["files"]]
        level = self._stored_level(files, cell_col)
        ranges = _cells.polygon_cell_ranges(xs, ys, level,
                                            ring_offsets=ring_offsets,
                                            max_ranges=max_ranges)
        kept = self._prune_files_ranges(files, cell_col, ranges)
        paths = [os.path.join(self.root, f["path"]) for f in kept]
        if not paths:
            raise FileNotFoundError(
                f"empty Icebergish table at {self.root} "
                f"(every file pruned by the region window)")
        cond = None
        for lo, hi in ranges:
            c = F.col(cell_col).between(F.lit(lo), F.lit(hi))
            cond = c if cond is None else cond | c
        return spark.read.parquet(*paths).filter(cond)

    @staticmethod
    def _stored_level(files: list[dict], cell_col: str) -> int:
        import numpy as np

        from . import cells as _cells
        levels = {int(_cells.cell_level(np.int64(st[0])))
                  for f in files
                  for st in [(f.get("stats") or {}).get(cell_col)]
                  if st is not None}
        if not levels:
            raise ValueError(
                f"no manifest stats for {cell_col!r} — append/compact with "
                f"the cell column present to enable bbox scan planning")
        if len(levels) > 1:
            raise ValueError(
                f"mixed cell levels {sorted(levels)} in {cell_col!r} — "
                f"compact() to a single level before read_bbox")
        return levels.pop()

    @staticmethod
    def _bbox_ranges(files: list[dict], bbox: tuple, cell_col: str,
                     max_ranges: int) -> list:
        from . import cells as _cells
        level = IcebergishTable._stored_level(files, cell_col)
        minx, miny, maxx, maxy = bbox
        return _cells.bbox_cell_ranges(minx, miny, maxx, maxy,
                                       level, max_ranges=max_ranges)

    @staticmethod
    def _prune_files_ranges(files: list[dict], col: str,
                            ranges: list) -> list[dict]:
        kept = []
        for f in files:
            st = (f.get("stats") or {}).get(col)
            if st is None or any(st[0] <= hi and st[1] >= lo
                                 for lo, hi in ranges):
                kept.append(f)
        return kept

    def row_count(self) -> int:
        """Total rows across live snapshot files, computed from the
        manifests alone (no data-file scan) — the Iceberg
        row-count-from-manifest analog. Feed it to
        ``train_ivf_centroids(approx_rows=...)`` (and through
        ``ann_ivf``/``semantic_dedup``) so sample sizing costs zero jobs
        instead of a full-corpus ``count()``."""
        return sum(f["rows"] for s in self._live_snapshots() if s
                   for f in s["files"])

    def files_for(self, between: tuple | None = None) -> list[str]:
        """Paths the next live read would touch (diagnostics / tests)."""
        files = [f for s in self._live_snapshots() for f in s["files"]]
        if between is not None:
            files = self._prune_files(files, *between)
        return [os.path.join(self.root, f["path"]) for f in files]

    def _snapshots_as_of(self, as_of: str | None, as_of_seq: int | None,
                         as_of_ts: int | None) -> list[dict]:
        """Snapshots contributing to the state as of a snapshot_id, a
        sequence number, or a timestamp_ms cutoff."""
        snaps = self.snapshots()
        cut = None
        for i, s in enumerate(snaps):
            if as_of is not None:
                if s["snapshot_id"] == as_of:
                    cut = i
                    break
            elif as_of_ts is not None:
                if s["timestamp_ms"] <= as_of_ts:
                    cut = i
            elif s["sequence"] == as_of_seq:
                cut = i
                break
        if cut is None:
            sel = as_of if as_of is not None else (
                f"seq={as_of_seq}" if as_of_seq is not None
                else f"ts={as_of_ts}")
            raise KeyError(f"no snapshot matching as_of={sel!r}")
        upto = snaps[:cut + 1]
        for i in range(len(upto) - 1, -1, -1):
            if upto[i].get("kind") == "rewrite":
                return upto[i:]
        return upto

    def expire_snapshots(self, *, keep_last: int = 1,
                         older_than_ms: int | None = None) -> dict:
        """Iceberg `expire_snapshots` analog — the GC step every other
        docstring defers to. Removes HISTORICAL snapshot manifests (those
        before the latest compaction/rewrite, i.e. not contributing to
        the current table state) and then deletes data files that no
        RETAINED snapshot references — a file carried into a rewrite BY
        REFERENCE (``delete_where``'s untouched files) survives even when
        the snapshot that wrote it expires.

        ``keep_last`` historical snapshots are retained for time travel
        (default 1); with ``older_than_ms`` only snapshots whose
        ``timestamp_ms`` is strictly below the cutoff expire. Live
        snapshots can never expire. Time travel to an expired snapshot
        then raises (its manifest is gone) — exactly the Iceberg
        contract. Returns ``{"expired_snapshots", "deleted_files",
        "retained_snapshots"}``."""
        snaps = self.snapshots()
        live_ids = {s["snapshot_id"] for s in self._live_snapshots()}
        historical = [s for s in snaps if s["snapshot_id"] not in live_ids]
        expire = historical[:max(0, len(historical) - keep_last)]
        if older_than_ms is not None:
            expire = [s for s in expire
                      if s["timestamp_ms"] < older_than_ms]
        expire_ids = {s["snapshot_id"] for s in expire}
        referenced = {f["path"] for s in snaps
                      if s["snapshot_id"] not in expire_ids
                      for f in s["files"]}
        deleted_files = 0
        for s in expire:
            for f in s["files"]:
                if f["path"] in referenced:
                    continue
                p = os.path.join(self.root, f["path"])
                if os.path.exists(p):
                    os.remove(p)
                    deleted_files += 1
                d = os.path.dirname(p)
                if os.path.isdir(d) and not os.listdir(d):
                    os.rmdir(d)
            mf = os.path.join(
                self.meta_dir,
                f"snap-{s['sequence']:06d}-{s['snapshot_id']}.json")
            if os.path.exists(mf):
                os.remove(mf)
        return {"expired_snapshots": len(expire),
                "deleted_files": deleted_files,
                "retained_snapshots": len(snaps) - len(expire)}

    def total_rows(self) -> int:
        return sum(s["total_rows"] for s in self._live_snapshots())

    def compact(self, spark: SparkSession, sort_col: str,
                n_files: int = 16) -> str:
        """O11 (VACUUM/index maintenance analog): rewrite the live data
        range-partitioned + sorted by ``sort_col`` (the cell column — a
        Z-order-ish layout so parquet row-group min/max stats prune cell
        ranges), publishing a 'rewrite' snapshot. Old files stay on disk for
        time travel until a GC step removes them."""
        df = self.read(spark)
        compacted = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
        return self.append(compacted, kind="rewrite")

    def merge(self, spark: SparkSession, source: DataFrame,
              key_cols: list[str] | str, *, mode: str = "upsert") -> dict:
        """Copy-on-write MERGE (the Iceberg ``MERGE INTO`` analog).

        ``mode``:

        * ``'upsert'``  — matched target rows are REPLACED by their
          source row, unmatched source rows are inserted (WHEN MATCHED
          UPDATE + WHEN NOT MATCHED INSERT);
        * ``'update'``  — replace matched only, never insert;
        * ``'delete'``  — drop matched target rows (WHEN MATCHED DELETE).

        File-level pruning like `delete_where`: only live data files
        whose manifest [min, max] for the FIRST key column overlaps the
        source's key range are rewritten; every other file carries into
        the new snapshot by reference — a narrow merge against a
        compacted 100 TB table rewrites a handful of files. Prior
        snapshots stay readable (time travel) until GC.

        Source keys must be unique (the Iceberg cardinality rule — a
        target row matched twice is non-deterministic); checked with
        one aggregate, ValueError if violated. If the TARGET holds
        several rows with one key (plain append() allows it), all of
        them match: delete drops them all, update/upsert replaces them
        all with THE single source row (the output is keyed — an
        upsert's contract — which collapses such duplicates; counted
        exactly in "matched").

        Returns {"matched", "inserted", "deleted", "rewritten",
        "carried"} — matched counts replaced target rows in
        update/upsert and equals deleted in delete mode. All counts are
        derived from manifest row totals (exact, no extra jobs beyond
        one semi-join count and, for upsert, one source count).
        """
        if mode not in ("upsert", "update", "delete"):
            raise ValueError(f"unknown merge mode {mode!r}")
        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        source = source.cache()
        try:
            return self._merge_impl(spark, source, keys, mode)
        finally:
            source.unpersist()

    def _merge_impl(self, spark: SparkSession, source: DataFrame,
                    keys: list[str], mode: str) -> dict:
        dup = (source.groupBy(*keys).count()
               .filter(F.col("count") > 1).limit(1).collect())  # collect-ok: <=1-row cardinality-violation probe
        if dup:
            raise ValueError(
                f"merge source has duplicate keys, e.g. "
                f"{[dup[0][k] for k in keys]}")

        # key-range prune on the first key column (source range is a
        # 2-scalar aggregate; files without stats stay conservatively in)
        k0 = keys[0]
        rng = source.agg(F.min(k0), F.max(k0)).collect()[0]  # collect-ok: 2-scalar source key range
        live = [f for s in self._live_snapshots() if s for f in s["files"]]
        touched = (self._prune_files(live, k0, rng[0], rng[1])
                   if rng[0] is not None else [])
        touched_paths = {f["path"] for f in touched}
        carried = [f for f in live if f["path"] not in touched_paths]
        touched_rows = sum(f["rows"] for f in touched)

        if touched:
            tgt = spark.read.parquet(
                *[os.path.join(self.root, f["path"]) for f in touched])
            matched_src = source.join(tgt.select(*keys), keys,
                                      "left_semi").count()
            survivors = tgt.join(source.select(*keys), keys, "left_anti")
        else:
            matched_src, survivors = 0, None

        no_op = {"matched": 0, "inserted": 0, "deleted": 0,
                 "rewritten": 0, "carried": len(carried)}
        if mode == "delete":
            if not touched:
                return no_op
            new_data, n_src_written = survivors, 0
            inserted = 0
        elif mode == "update":
            if matched_src == 0:
                # nothing to replace: rewriting byte-identical files
                # and publishing a snapshot would be pure waste
                return no_op
            src = source.join(tgt.select(*keys).distinct(), keys,
                              "left_semi")
            n_src_written, inserted = matched_src, 0
            schema_json = self.current_snapshot()["schema"]
            cols = [f["name"] for f in schema_json["fields"]]
            new_data = survivors.unionByName(src.select(*cols))
        else:  # upsert
            n_src_written = source.count()
            inserted = n_src_written - matched_src
            schema_json = self.current_snapshot()["schema"]
            cols = [f["name"] for f in schema_json["fields"]]
            src = source.select(*cols)
            new_data = (survivors.unionByName(src)
                        if survivors is not None else src)

        snap_id = uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, snap_id)
        new_data.write.mode("overwrite").parquet(out)
        new_files, new_total = self._scan_written(out)
        carried_total = sum(f["rows"] for f in carried)
        self._publish(snap_id, "rewrite",
                      self.current_snapshot()["schema"],
                      {"merge": [mode] + keys},
                      new_files + carried, new_total + carried_total)
        # exact under duplicate-key targets: survivors = new_total minus
        # the source rows written, so replaced/deleted TARGET rows are
        # touched_rows - survivors
        survivors_rows = new_total - n_src_written
        matched_tgt = touched_rows - survivors_rows
        return {"matched": int(matched_tgt), "inserted": int(inserted),
                "deleted": int(matched_tgt) if mode == "delete" else 0,
                "rewritten": len(touched), "carried": len(carried)}
