"""Local stand-in for the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB at sf0.01; compare row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(selected=None):
    import __spark_entry__ as e
    from spandex_spark.session import get_spark

    spark = get_spark("parity", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if selected and name not in selected:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols} "
                  f"({t1-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = frame_hash(srows, scols)
        oh = frame_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK  " if (ok_count and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {len(srows)}/{len(orows)} "
              f"cols_match={ok_cols} hash {sh}/{oh} ({t1-t0:.1f}s)")
        if not ok_cols:
            print(f"     spark cols: {scols}\n     duck cols: {ocols}")
        if ok_count and ok_cols and not ok_hash:
            # show first differing rows for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ss = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
            oo = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
            for a, b in zip(ss, oo):
                if a != b:
                    print(f"     spark: {a}\n     duck : {b}")
                    break
    print("FAILURES:", failures)
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(set(sys.argv[1:]) or None) else 0)
