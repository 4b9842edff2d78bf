"""robots.txt parsing and crawl-permission filtering (RFC 9309).

Reference semantics: the Robots Exclusion Protocol, RFC 9309 — the
gate every compliant crawl corpus (Common Crawl included) applies
before a page may be kept.  Semantics implemented exactly as the RFC
+ Google's reference parser document them:

* groups = consecutive `User-agent:` lines sharing the following
  Allow/Disallow rules; the group evaluated is the LONGEST exact
  product-token match for the caller's agent, else the `*` group;
* rule patterns anchor at the path start, `*` matches any run, `$`
  anchors the end; matching is against path + '?' + query;
* the MOST SPECIFIC (longest-pattern) matching rule decides; on an
  exact length tie Allow beats Disallow; no matching rule (or no
  rules for the host at all) means allowed — robots.txt is
  deny-by-exception;
* an empty `Disallow:` value matches nothing (allow-all idiom).

Spark realization:

* `parse_robots` is the only Python step (string parsing has no JVM
  expression): one Arrow batch pass over the per-host robots bodies
  emitting (host, allow, plen, regex) rule rows — output is
  RULE-sized, thousands of times smaller than the page corpus;
* `robots_filter` is pure JVM: pages join rules on host (rule side
  aggregates to one array per host and BROADCASTS by default — the
  whole web's robots rules for one agent fit executor memory; the
  page corpus never shuffles), then a single `filter`+`reduce` array
  expression finds the most specific matching rule per page.  The
  verdict is codegen `rlike` over the translated patterns.

Scale shape: map-only over pages (zero page shuffle), one tiny
aggregate over rules.  Pattern translation happens once per rule at
parse time, never per page row.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, IntegerType,
                               StringType, StructField, StructType)

__all__ = ["parse_robots", "robots_filter"]


def _pattern_regex(pattern: str) -> str:
    """Translate a robots path pattern to an anchored Java regex:
    `*` -> `.*`, trailing `$` -> end anchor, everything else literal."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = "^" + ".*".join(parts)
    if anchored_end:
        rx += "$"
    return rx


def _parse_one(text: str, agent: str) -> list[tuple[bool, int, str]]:
    """(allow, pattern_len, regex) rules of the group governing
    `agent`.  Group selection per RFC 9309 §2.2.1: longest exact
    user-agent token match, else the `*` group."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agents = True
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            in_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if val:                      # empty Disallow matches nothing
                cur_rules.append((key == "allow", val))
        # other keys (crawl-delay, sitemap) are outside RFC 9309 matching
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    agent = agent.lower()
    best_rules, best_len = None, -1
    for agents, rules in groups:
        if agent in agents and len(agent) > best_len:
            best_rules, best_len = rules, len(agent)
    if best_rules is None:                # no exact match: fall to '*'
        for agents, rules in groups:
            if "*" in agents:
                best_rules = rules
                break
    if best_rules is None:
        return []
    return [(allow, len(pat), _pattern_regex(pat))
            for allow, pat in best_rules]


def parse_robots(robots: DataFrame, *, host_col: str = "host",
                 text_col: str = "robots_txt",
                 agent: str = "*") -> DataFrame:
    """Rule rows (host, allow, plen, regex) for `agent`.  Hosts whose
    file yields no applicable rules emit nothing (= allow all)."""
    schema = StructType([
        StructField("host", StringType()),
        StructField("allow", BooleanType()),
        StructField("plen", IntegerType()),
        StructField("regex", StringType()),
    ])

    def run(batches):
        for pdf in batches:
            out = []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                for allow, plen, rx in _parse_one(text, agent):
                    out.append((host, allow, plen, rx))
            yield pd.DataFrame(out, columns=[f.name for f in schema])

    return robots.mapInPandas(run, schema=schema)


def robots_filter(pages: DataFrame, rules: DataFrame, *,
                  url_col: str = "url", keep_denied: bool = False,
                  broadcast_rules: bool = True) -> DataFrame:
    """Append `crawl_allowed` (and keep only allowed rows unless
    `keep_denied`).  `rules` is `parse_robots` output.  The rule side
    collapses to ONE array per host and broadcasts; the page corpus
    stays map-only.  Pages whose URL has no host (malformed) are
    allowed-by-absence like unlisted hosts."""
    per_host = (rules.groupBy("host")
                .agg(F.array_sort(F.collect_list(F.struct(
                    F.col("plen"), F.col("allow"), F.col("regex"))))
                    .alias("_rules")))
    if broadcast_rules:
        per_host = F.broadcast(per_host)
    host = F.lower(F.expr(f"parse_url({url_col}, 'HOST')"))
    path = F.coalesce(F.expr(f"parse_url({url_col}, 'PATH')"), F.lit("/"))
    q = F.expr(f"parse_url({url_col}, 'QUERY')")
    target = F.when(q.isNotNull(), F.concat(path, F.lit("?"), q)) \
        .otherwise(path)
    tagged = (pages.withColumn("_host", host)
              .join(per_host.withColumnRenamed("host", "_host"),
                    "_host", "left")
              .withColumn("_target", target))
    # most specific matching rule: rules sorted by (plen, allow) asc,
    # so a reverse scan's FIRST match is longest (allow wins ties);
    # aggregate keeps the last matching element = that rule
    matched = F.aggregate(
        F.filter(F.col("_rules"),
                 lambda r: F.regexp_like(F.col("_target"), r["regex"])),
        F.lit(None).cast("struct<plen:int,allow:boolean,regex:string>"),
        lambda acc, r: r)
    verdict = F.when(F.col("_rules").isNull(), F.lit(True)) \
        .otherwise(F.coalesce(matched["allow"], F.lit(True)))
    out = tagged.withColumn("crawl_allowed", verdict) \
        .drop("_host", "_rules", "_target")
    if not keep_denied:
        out = out.filter(F.col("crawl_allowed")).drop("crawl_allowed")
    return out
