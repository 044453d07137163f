"""robots.txt parsing + crawl-politeness filtering.

A crawl-derived corpus is expected to honor robots exclusions (C4 and every
serious crawl pipeline filter on them — and retroactive robots compliance
is a recurring dataset-curation task). This module implements the RFC 9309
group model over the literal-prefix rule subset:

* groups are selected by User-agent — the group naming our agent exactly
  wins over the ``*`` group; multiple agent lines may head one group;
* Allow/Disallow values are matched as path prefixes, longest match wins,
  Allow wins length ties, no matching rule means allowed, and an empty
  Disallow value allows everything (the classic idiom);
* wildcard (``*``/``$``) rules are NOT interpreted — they are rare, and a
  silent wrong match is worse than a documented subset; such rules are
  skipped (conservative toward allowing, exactly what a filter that also
  keeps a blocklist wants).

Spark shape: robots bodies live on the (tiny) per-host dimension; parsing
runs once per host, the URL-side work is a broadcast join host→rules, an
explode over each host's few rules, a prefix match, and a per-URL longest-
match top-1 — all Column expressions after the parse, no per-URL Python.

Reference: no counterpart (the reference ingests drive files); part of the
beyond-the-reference web-corpus surface (htmlmini, urls).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """robots.txt body → ordered [(allow, path_prefix)] rules for ``agent``
    (exact-name group preferred, else the ``*`` group, RFC 9309 §2.2.1).
    Wildcard-bearing values are skipped (documented subset)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_body:  # a new group starts
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(value.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if "*" in value or value.endswith("$"):
                continue  # wildcard subset: skip, stay conservative
            if key == "disallow" and value == "":
                continue  # empty Disallow = allow all (no rule)
            rules.append((key == "allow", value))
        else:
            in_group_body = in_group_body or bool(agents)
    if agents:
        groups.append((agents, rules))
    for want in (agent.lower(), "*"):
        for group_agents, group_rules in groups:
            if want in group_agents:
                return group_rules
    return []


ROBOTS_RULE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("allow", T.BooleanType()),
        T.StructField("prefix", T.StringType()),
    ]
)


def robots_rules(robots_df: DataFrame, host_col: str = "host",
                 text_col: str = "robots_txt", agent: str = "*") -> DataFrame:
    """(host, robots_txt) dimension → one row per (host, allow, prefix)
    rule. Parsing is per-host (the dimension is small next to the URL
    fact side); hosts whose file yields no rules emit no rows — the
    longest-match join then defaults them to allowed."""
    narrow = robots_df.select(F.col(host_col).alias("host"), F.col(text_col).alias("txt"))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            hosts, allows, prefixes = [], [], []
            for host, txt in zip(pdf["host"], pdf["txt"]):
                for allow, prefix in parse_robots(txt or "", agent=agent):
                    hosts.append(host)
                    allows.append(allow)
                    prefixes.append(prefix)
            yield pd.DataFrame({"host": hosts, "allow": allows, "prefix": prefixes})

    return narrow.mapInPandas(run, schema=ROBOTS_RULE_SCHEMA)


def robots_filter(urls: DataFrame, rules: DataFrame,
                  host_col: str = "host", path_col: str = "path") -> DataFrame:
    """Annotate every URL row with ``allowed``: longest matching prefix
    rule wins, Allow wins ties, no match → allowed. The rules side is
    broadcast (it is the per-host dimension); the per-URL top-1 uses a
    max_by over (prefix length, allow) — a partial-aggregable reduction,
    not a window sort, so the fact side shuffles once at most."""
    from pyspark.sql import Window

    u = urls.withColumn("__uid", F.monotonically_increasing_id())
    m = (
        u.join(F.broadcast(rules), [host_col], "left")
        .withColumn(
            "__match",
            F.col("prefix").isNotNull() & F.col(path_col).startswith(F.col("prefix")),
        )
    )
    w = Window.partitionBy("__uid").orderBy(
        F.when(F.col("__match"), F.length("prefix")).otherwise(-1).desc(),
        F.col("allow").desc_nulls_last(),
    )
    best = (
        m.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            "allowed",
            F.when(F.col("__match"), F.col("allow")).otherwise(F.lit(True)),
        )
        .drop("__rn", "__match", "allow", "prefix", "__uid")
    )
    return best
