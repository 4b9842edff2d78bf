"""O12 — column-lazy cached table view.

Reference semantics: spandex/io.py::TableFrame — a DataFrame-like wrapper
over a database table that fetches columns lazily and caches what it has
fetched, so repeated model code never re-queries the store.

Spark translation: a wrapper over an Icebergish/parquet table that builds
a column-pruned DataFrame per access (so parquet reads only the requested
columns — check ReadSchema in the plan) and persists each pruned
projection once; repeated access to the same columns returns the cached
projection."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


class TableFrame:
    def __init__(self, spark: SparkSession, path: str, *, index_col: str,
                 storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK):
        self._spark = spark
        self._path = path
        self.index_col = index_col
        self._storage = storage_level
        self._cache: dict[tuple[str, ...], DataFrame] = {}
        self._base = spark.read.parquet(path)
        self.columns = self._base.columns

    def __getitem__(self, cols) -> DataFrame:
        """tf["a", "b"] → cached (index_col, a, b) projection."""
        if isinstance(cols, str):
            cols = (cols,)
        key = tuple(sorted(set(cols)))
        if key not in self._cache:
            proj = self._base.select(self.index_col, *key) \
                .persist(self._storage)
            self._cache[key] = proj
        return self._cache[key]

    def df(self, *cols: str) -> DataFrame:
        return self[cols] if cols else self._base

    def update_col(self, name: str, values_df: DataFrame) -> None:
        """spandex TableFrame-style column mirror: attach a computed column
        (keyed by index_col) so later reads see it; invalidates overlapping
        cached projections."""
        self._base = self._base.drop(name).join(
            values_df.select(self.index_col, name), self.index_col, "left")
        self.columns = self._base.columns
        stale = [k for k in self._cache if name in k]
        for k in stale:
            self._cache[k].unpersist()
            del self._cache[k]

    def unpersist(self) -> None:
        for df in self._cache.values():
            df.unpersist()
        self._cache.clear()
