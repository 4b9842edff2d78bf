"""Pre-validate the two r6 driver-window candidates (line_dedup,
scrub_pii) against their DuckDB oracle SQL at sf0.01 — the exact
compare the driver runs (row count, sorted column names, value hash)
so wiring them into `queries()`/`oracle_sql()` next round is a pure
copy-paste with zero discovery risk.

Run: python scripts/r6_oracle_candidates.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_parity import frame_hash  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

# scrub_pii oracle: DuckDB regexp_replace with 'g' runs the IDENTICAL
# patterns (Java∩RE2 chain, tests/test_pii.py pre-validated the
# per-pattern semantics); order matters and matches _check_kinds
# the fixture docs carry NO pii and NO duplicate lines (verified), so
# both candidate queries CONSTRUCT their interesting input in-query,
# identically in both engines — otherwise the oracle would pass as a
# trivial identity and never exercise the operator
SCRUB_SQL = r"""
WITH docs2 AS (
  SELECT doc_id,
         text || ' reach user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 10.0.0.'
              || CAST(doc_id % 256 AS VARCHAR) AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b',
             '<IP>', 'g'),
           '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
         PHONE_PATTERN, '<PHONE>', 'g') AS text
FROM docs2 ORDER BY doc_id
"""

# line_dedup oracle: split to lines with ordinality, rank first
# occurrence per line content (len >= min_chars), reassemble kept
# lines in position order
PPL_BUCKETS_SQL = r"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST((doc_id * 37) % 101 AS DOUBLE) AS perplexity
  FROM documents)
SELECT doc_id, lang, perplexity,
       CASE WHEN pr < 1.0/3.0 THEN 'head'
            WHEN pr < 2.0/3.0 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM (SELECT *, percent_rank() OVER (PARTITION BY lang
                                     ORDER BY perplexity) AS pr
      FROM scored)
ORDER BY doc_id
"""

SURT_SQL = r"""
WITH urls AS (
  SELECT doc_id,
         'https://WWW.Host' || CAST(doc_id % 7 AS VARCHAR)
         || '.Example.org/Path' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0
                 THEN '?q=' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END
         AS url
  FROM documents)
SELECT doc_id,
       array_to_string(list_reverse(string_split(
           regexp_replace(lower(regexp_extract(url,
               '^[a-z]+://([^/?#]+)', 1)), '^www\.', ''), '.')), ',')
       || ')'
       || lower(CASE WHEN url LIKE '%?%'
                THEN regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1)
                     || '?' || regexp_extract(url, '\?([^#]*)', 1)
                ELSE CASE WHEN regexp_extract(url,
                         '^[a-z]+://[^/?#]+([^?#]*)', 1) = ''
                     THEN '/' ELSE regexp_extract(url,
                         '^[a-z]+://[^/?#]+([^?#]*)', 1) END END)
       AS surt
FROM urls ORDER BY doc_id
"""

LINE_DEDUP_SQL = r"""
WITH documents2 AS (
  SELECT doc_id,
         text || chr(10) || 'SHARED BOILERPLATE ' || lang
              || chr(10) || text AS text
  FROM documents),
lines AS (
  SELECT doc_id, u.line, u.pos
  FROM documents2,
       LATERAL (SELECT UNNEST(string_split(text, chr(10))) AS line,
                       generate_subscripts(string_split(text, chr(10)), 1) AS pos) u
  WHERE text IS NOT NULL
), ranked AS (
  SELECT doc_id, line, pos,
         CASE WHEN length(line) < 1 THEN 1
              ELSE row_number() OVER (PARTITION BY
                     CASE WHEN length(line) >= 1 THEN line END
                   ORDER BY doc_id, pos) END AS rk
  FROM lines
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce((SELECT string_agg(line, chr(10) ORDER BY pos)
                           FROM ranked r
                           WHERE r.doc_id = d.doc_id AND r.rk = 1), '')
       END AS text
FROM documents2 d ORDER BY d.doc_id
"""


def main():
    import duckdb

    from spandex_spark.operators.dedup import line_dedup
    from spandex_spark.operators.pii import PII_RULES, scrub_pii
    from spandex_spark.session import get_spark

    spark = get_spark("r6cand", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")

    phone = dict((n, p) for n, p, _ in PII_RULES)["phone"]
    scrub_sql = SCRUB_SQL.replace("PHONE_PATTERN",
                                  "'" + phone.replace("'", "''") + "'")

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
              f"{len(srows)}/{len(orows)} hash {sh}/{oh}")
        return ok

    from pyspark.sql import functions as F
    pii_in = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" reach user"),
                         F.col("doc_id").cast("string"),
                         F.lit("@example.com or 10.0.0."),
                         (F.col("doc_id") % 256).cast("string")))
    ok1 = compare("scrub_pii",
                  scrub_pii(pii_in).select("doc_id", "text")
                  .orderBy("doc_id"), scrub_sql)
    dup_in = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit("\n"),
                         F.lit("SHARED BOILERPLATE "), F.col("lang"),
                         F.lit("\n"), F.col("text")))
    ok2 = compare("line_dedup",
                  line_dedup(dup_in).select("doc_id", "text")
                  .orderBy("doc_id"), LINE_DEDUP_SQL)
    # closing-session candidates (SURVEY.md 11.11-11.12)
    from spandex_spark.operators.langmodel import perplexity_buckets
    from spandex_spark.sources.cdx import surt_key
    ppl_in = docs.select(
        "doc_id", "lang",
        ((F.col("doc_id") * 37) % 101).cast("double").alias("perplexity"))
    ok3 = compare("perplexity_buckets",
                  perplexity_buckets(ppl_in)
                  .select("doc_id", "lang", "perplexity", "ppl_bucket")
                  .orderBy("doc_id"), PPL_BUCKETS_SQL)
    surt_in = docs.select(
        "doc_id",
        F.concat(F.lit("https://WWW.Host"),
                 (F.col("doc_id") % 7).cast("string"),
                 F.lit(".Example.org/Path"),
                 F.col("doc_id").cast("string"),
                 F.when(F.col("doc_id") % 3 == 0,
                        F.concat(F.lit("?q="),
                                 (F.col("doc_id") % 5).cast("string")))
                 .otherwise(F.lit(""))).alias("url"))
    ok4 = compare("surt_key",
                  surt_in.select("doc_id",
                                 surt_key(F.col("url")).alias("surt"))
                  .orderBy("doc_id"), SURT_SQL)
    spark.stop()
    sys.exit(0 if (ok1 and ok2 and ok3 and ok4) else 1)


if __name__ == "__main__":
    main()
