"""Pre-validate late-wave r6/r7 driver-window candidates (c4_clean,
resolve_toponyms) against DuckDB oracle SQL at sf0.01 — the exact
compare the driver runs (row count, sorted column names, value hash),
same purpose as scripts/r6_oracle_candidates.py for the earlier wave.

Both candidates CONSTRUCT their interesting input in-query from
integer ranges / the documents table, identically in both engines —
the fixture docs have no newlines or terminal punctuation, so a
plain pass-through would never exercise the line rules.

Run: python scripts/r6_late_candidates.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_parity import frame_hash  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

# synthetic multi-line pages keyed on doc_id: line 1 always passes the
# C4 line rules; line 2 is too short; line 3 rotates through the page
# failure modes (fine / javascript / lorem / brace / unterminated)
_PAGE_SQL = r"""
  SELECT doc_id,
         'This is the first proper sentence for document '
           || CAST(doc_id AS VARCHAR) || ' with many words.' || chr(10)
           || 'Too short.' || chr(10)
           || CASE doc_id % 5
              WHEN 0 THEN 'Another complete sentence closes this clean page nicely.'
              WHEN 1 THEN 'Please enable javascript to view all the things here.'
              WHEN 2 THEN 'Some lorem ipsum filler text is sitting right here today.'
              WHEN 3 THEN 'A brace appears in this otherwise fine sentence { here.'
              ELSE 'this line never terminates so it gets dropped'
              END AS text
  FROM documents
"""

C4_SQL = r"""
WITH pages AS (%s),
lines AS (
  SELECT doc_id, text,
         list_filter(
           string_split(text, chr(10)),
           ln -> regexp_matches(trim(ln), '[.!?"”]$')
                 AND len(list_filter(regexp_split_to_array(trim(ln), '\s+'),
                                     w -> w <> '')) >= 5
                 AND NOT regexp_matches(lower(ln), '\bjavascript\b')
         ) AS kept
  FROM pages),
cleaned AS (
  SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text
  FROM lines)
SELECT doc_id, clean_text,
       (len(string_split_regex(clean_text, '[.!?]')) - 1 >= 2) AS c4_sentences,
       NOT contains(lower(clean_text), 'lorem ipsum') AS c4_no_lorem,
       NOT contains(clean_text, '{') AS c4_no_brace,
       TRUE AS c4_no_blockword,
       COALESCE((len(string_split_regex(clean_text, '[.!?]')) - 1 >= 2)
                AND NOT contains(lower(clean_text), 'lorem ipsum')
                AND NOT contains(clean_text, '{'), FALSE) AS c4_pass
FROM cleaned ORDER BY doc_id
""" % _PAGE_SQL

# toponym oracle: mentions and an ambiguous gazetteer built from
# integer ranges; two-pass prior+coherence replicated as plain SQL
# (windows + haversine); iterations=1 (the classic heuristic)
TOPO_SQL = r"""
WITH mentions AS (
  SELECT CAST(doc_id % 500 AS BIGINT) AS doc_id,
         'place' || CAST(doc_id % 40 AS VARCHAR) AS mention
  FROM documents),
gaz AS (
  SELECT 'place' || CAST(g % 40 AS VARCHAR) AS name,
         CAST(g AS BIGINT) AS gaz_id,
         CAST((g * 131) % 9973 AS DOUBLE) AS population,
         CAST((g * 7) % 360 - 180 AS DOUBLE) AS lon,
         CAST((g * 3) % 170 - 85 AS DOUBLE) AS lat
  FROM range(120) t(g)),
maxp AS (SELECT max(population) AS mp FROM gaz),
cands AS (
  SELECT m.doc_id, m.mention, g.gaz_id, g.population, g.lon, g.lat
  FROM mentions m JOIN gaz g ON lower(m.mention) = g.name),
prior AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (
      PARTITION BY doc_id, mention
      ORDER BY population DESC, gaz_id ASC) AS rk
    FROM cands c) WHERE rk = 1),
ctx AS (
  SELECT doc_id, avg(lon) AS clon, avg(lat) AS clat
  FROM prior GROUP BY doc_id),
scored AS (
  SELECT c.doc_id, c.mention, c.gaz_id, c.population, c.lon, c.lat,
         1.0 * log10(c.population + 1) / log10((SELECT mp FROM maxp) + 1)
         - 1.0 * (2 * 6371.0088 * asin(sqrt(
             sin(radians(x.clat - c.lat) / 2) ^ 2
             + cos(radians(c.lat)) * cos(radians(x.clat))
               * sin(radians(x.clon - c.lon) / 2) ^ 2))) / 2000.0
           AS score
  FROM cands c JOIN ctx x USING (doc_id))
SELECT doc_id, mention, gaz_id, lon, lat, round(score, 9) + 0.0 AS score
FROM (
  SELECT s.*, row_number() OVER (
    PARTITION BY doc_id, mention
    ORDER BY score DESC, population DESC, gaz_id ASC) AS rk
  FROM scored s) WHERE rk = 1
ORDER BY doc_id, mention
"""


def main():
    import duckdb
    from pyspark.sql import functions as F

    from spandex_spark.operators.textstats import c4_clean
    from spandex_spark.operators.toponym import resolve_toponyms
    from spandex_spark.session import get_spark

    spark = get_spark("r6late", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")

    def compare(name, sdf, sql):
        srows = sdf.collect()
        scols = sdf.columns
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        sh = frame_hash(srows, scols)
        oh = frame_hash(orows, ocols)
        ok = (len(srows) == len(orows)
              and sorted(scols) == sorted(ocols) and sh == oh)
        print(f"{'OK  ' if ok else 'FAIL'} {name}: rows "
              f"{len(srows)}/{len(orows)} hash {sh}/{oh}", flush=True)
        return ok

    line3 = (F.when(F.col("doc_id") % 5 == 0,
                    "Another complete sentence closes this clean page "
                    "nicely.")
             .when(F.col("doc_id") % 5 == 1,
                   "Please enable javascript to view all the things "
                   "here.")
             .when(F.col("doc_id") % 5 == 2,
                   "Some lorem ipsum filler text is sitting right here "
                   "today.")
             .when(F.col("doc_id") % 5 == 3,
                   "A brace appears in this otherwise fine sentence { "
                   "here.")
             .otherwise("this line never terminates so it gets dropped"))
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("This is the first proper sentence for document "),
                 F.col("doc_id").cast("string"),
                 F.lit(" with many words.\n"),
                 F.lit("Too short.\n"), line3).alias("text"))
    sdf = (c4_clean(pages, min_sentences=2)
           .select("doc_id", "clean_text", "c4_sentences", "c4_no_lorem",
                   "c4_no_brace", "c4_no_blockword", "c4_pass")
           .orderBy("doc_id"))
    ok1 = compare("c4_clean", sdf, C4_SQL)

    mentions = docs.select(
        (F.col("doc_id") % 500).alias("doc_id"),
        F.concat(F.lit("place"),
                 (F.col("doc_id") % 40).cast("string")).alias("mention"))
    gaz = spark.range(120).select(
        F.concat(F.lit("place"), (F.col("id") % 40).cast("string"))
        .alias("name"),
        F.col("id").alias("gaz_id"),
        ((F.col("id") * 131) % 9973).cast("double").alias("population"),
        ((F.col("id") * 7) % 360 - 180.0).alias("lon"),
        ((F.col("id") * 3) % 170 - 85.0).alias("lat"))
    tdf = (resolve_toponyms(mentions.distinct(), gaz)
           .withColumn("score", F.round("score", 9) + 0.0)
           .orderBy("doc_id", "mention"))
    ok2 = compare("resolve_toponyms", tdf, TOPO_SQL)
    spark.stop()
    sys.exit(0 if ok1 and ok2 else 1)


if __name__ == "__main__":
    main()
