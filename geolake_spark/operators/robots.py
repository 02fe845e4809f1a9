"""robots.txt parsing + URL permission checks (RFC 9309, crawl tier).

The gatekeeper of every crawl pipeline: before a page may enter the
corpus the crawler must evaluate the host's robots.txt for its agent.
This module parses robots bodies RELATIONALLY — no per-row Python — and
evaluates page URLs against the extracted rules:

* ``robots_rules``: robots.txt text -> one row per applicable
  Allow/Disallow rule.  Line split + comment strip + directive extract
  are codegen expressions; GROUP structure (consecutive ``User-agent``
  lines head a group; following rules belong to it) is recovered with a
  lag + running-sum window — the classic relational sessionization
  trick, ONE shuffle on host; the per-group agent-set aggregation
  reuses that window's hash partitioning (the trips.py precedent).
* ``robots_check``: pages joined to rules by host; pattern matching is
  RFC 9309's ``*`` (any chars) and trailing ``$`` (end anchor), compiled
  per-rule into a regex by ESCAPING metacharacters with regexp_replace
  and translating ``*`` -> ``.*`` — the compiled pattern is data, so
  matching uses regexp_like(path, rx_col).  Longest-pattern-wins with
  Allow beating Disallow on ties (the RFC's precedence), decided by a
  single struct max — deterministic in both engines.

Scale shape at 10^12 pages: the rules table is per-host (tiny next to
the page table) — the host equi-join broadcasts under AQE for real
crawls; per-URL rule evaluation and the winner agg are map-side-partial
on url.  A mega-host with 10^5 rules makes matched-rule fan-out that
host's pages x its rules — bounded by robots.txt size caps (crawlers
read at most 500 KiB), stated.

Contract notes (documented tier limits): agent selection is by literal
token match (``*`` or the exact agent name, case-insensitive) — no
product-token prefix matching; paths are compared as-is (no
percent-encoding normalization); rules before any User-agent line are
invalid per the RFC and ignored.

Reference analogue: none — geolake has no web operators; this is the
repo's LLM-training-data / crawl surface (SURVEY.md LLM table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geolake_spark.functions import text as tx

# every regex metacharacter except '*' (translated to '.*' afterwards);
# '$' is escaped here too — the end-anchor form is split off BEFORE
# escaping, so any remaining '$' is literal
_META_CLASS = r'([\.\+\?\(\)\[\]\{\}\^\|\$\\])'
_DIRECTIVE_RE = (r'(?i)^(user-agent|allow|disallow|sitemap|crawl-delay)'
                 r'\s*:\s*(.*)$')
# path+query of an absolute URL (everything from the first '/' after
# the authority, fragment dropped); '' when the URL has no path
_URL_PATHQ_RE = r'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)'


def _rx_col(pat):
    """Compile a robots path pattern column to an anchored regex column:
    split a trailing '$' (end anchor) off first, escape every regex
    metacharacter in the body, then translate '*' -> '.*'."""
    ends = pat.endswith("$")
    body = F.when(ends, pat.substr(F.lit(1), F.length(pat) - 1)).otherwise(pat)
    esc = F.regexp_replace(body, _META_CLASS, "\\\\$1")
    return F.concat(F.lit("^"), F.replace(esc, F.lit("*"), F.lit(".*")),
                    F.when(ends, F.lit("$")).otherwise(F.lit("")))


def _rx_sql(pat: str) -> str:
    """DuckDB mirror of :func:`_rx_col` (RE2 rewrite needs \\\\ + \\1)."""
    ends = f"({pat} LIKE '%$')"
    body = (f"(CASE WHEN {ends} THEN substring({pat}, 1, length({pat}) - 1) "
            f"ELSE {pat} END)")
    esc = f"regexp_replace({body}, '{_META_CLASS}', '\\\\\\1', 'g')"
    return (f"('^' || replace({esc}, '*', '.*') || "
            f"(CASE WHEN {ends} THEN '$' ELSE '' END))")


def _grouped_lines(robots: DataFrame, host_col: str,
                   body_col: str) -> DataFrame:
    """Parsed robots lines with group ids: ``(host, pos, dir, val,
    grp)`` — the shared front half of every robots operator.  One
    shuffle on host (the window); downstream aggs key on (host, grp)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"))
    parsed = lines.select(
        "host", "pos",
        F.lower(F.regexp_extract(
            F.trim(F.regexp_replace("raw", "#.*$", "")),
            _DIRECTIVE_RE, 1)).alias("dir"),
        F.trim(F.regexp_extract(
            F.trim(F.regexp_replace("raw", "#.*$", "")),
            _DIRECTIVE_RE, 2)).alias("val"))
    w = Window.partitionBy("host").orderBy("pos")
    return parsed.withColumn(
        "grp",
        F.sum(((F.col("dir") == "user-agent")
               & (F.lag("dir", 1, "").over(w) != "user-agent"))
              .cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))


def _selected_groups(grouped: DataFrame, agent: str) -> DataFrame:
    """(host, grp) of the groups that apply to ``agent`` — RFC 9309
    most-specific rule: when any group on the host names the agent
    literally, the '*' groups are IGNORED for that host."""
    ga = (grouped.filter(F.col("dir") == "user-agent")
          .groupBy("host", "grp")
          .agg(F.collect_set(F.lower(F.col("val"))).alias("agents"))
          .select("host", "grp",
                  F.array_contains("agents", agent).alias("has_agent"),
                  F.array_contains("agents", "*").alias("has_star")))
    hw = Window.partitionBy("host")
    return (ga.withColumn("spec", F.max("has_agent").over(hw))
            .filter(F.when(F.col("spec"), F.col("has_agent"))
                    .otherwise(F.col("has_star")))
            .select("host", "grp"))


def robots_rules(robots: DataFrame, agent: str = "*",
                 host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """One row per Allow/Disallow rule applicable to ``agent``:
    ``(host, allow boolean, path, pattern_len, rx)``.

    Group recovery: a ``User-agent`` line whose PREVIOUS line is not a
    ``User-agent`` line starts a new group (consecutive UA lines share
    one group header, per the RFC); rules bind to the current group.
    Group selection follows the RFC's most-specific rule: if any group
    on the host names ``agent`` literally (case-insensitive), only those
    groups apply; otherwise the ``*`` groups do.  Empty-valued rules
    (``Disallow:`` with no path == allow everything) contribute no rule
    row."""
    agent = agent.strip().lower()
    grouped = _grouped_lines(robots, host_col, body_col)
    # ONE aggregation collects each group's agent set AND its rule lines
    # together (conditional collect_set/collect_list skip the nulls), so
    # the parse + group window run once instead of once per consumer and
    # the old (host, grp) self-join disappears; group selection is the
    # same most-specific-agent logic as _selected_groups, applied before
    # the rules re-explode.  (r6: the two-consumer shape re-ran the
    # regex parse and paid an extra join exchange — ~2x the robots parse
    # cost on the 70k-host bench corpus.)
    ga = (grouped.filter(F.col("grp") >= 1)
          .groupBy("host", "grp")
          .agg(F.collect_set(F.when(F.col("dir") == "user-agent",
                                    F.lower(F.col("val")))).alias("agents"),
               F.collect_list(F.when(
                   F.col("dir").isin("allow", "disallow")
                   & (F.col("val") != ""),
                   F.struct((F.col("dir") == "allow").alias("allow"),
                            F.col("val").alias("path")))).alias("rls")))
    hw = Window.partitionBy("host")
    rules = (ga.withColumn("has_agent", F.array_contains("agents", agent))
             .withColumn("has_star", F.array_contains("agents", "*"))
             .withColumn("spec", F.max("has_agent").over(hw))
             .filter(F.when(F.col("spec"), F.col("has_agent"))
                     .otherwise(F.col("has_star")))
             .select("host", F.explode("rls").alias("_r"))
             .select("host", F.col("_r.allow").alias("allow"),
                     F.col("_r.path").alias("path")))
    # plain = no '*' anywhere and no end anchor: the fast path matches
    # by prefix compare instead of a per-row-compiled regex (a mid-
    # pattern '$' is literal, so startswith handles it)
    plain = (~F.col("path").contains("*")) & (~F.col("path").endswith("$"))
    return rules.select(
        "host", "allow", "path",
        F.length("path").cast("int").alias("pattern_len"),
        plain.alias("plain"),
        _rx_col(F.col("path")).alias("rx"))


def robots_check(pages: DataFrame, robots: DataFrame, agent: str = "*",
                 url_col: str = "url", host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """Evaluate every page URL against its host's robots rules:
    ``(url, allowed boolean, rule)`` — ONE OUTPUT ROW PER INPUT PAGE ROW
    (duplicate URLs stay duplicated; distinct the input for per-URL
    facts).  ``rule`` is the winning pattern ('' when no rule matched —
    allowed by default, including hosts with no robots.txt at all).
    Precedence: longest pattern wins; on equal length Allow beats
    Disallow (RFC 9309).

    Plan shape: rules are collapsed to ONE array row per host, so the
    page side takes a single (broadcast-able) equi-join and the winner
    is a map-side HOF fold over the matched rules — the page table is
    NEVER shuffled (the first version's per-URL groupBy moved every
    page row through an exchange; this one moves none)."""
    rules = robots_rules(robots, agent, host_col, body_col)
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("pattern_len", "allow", "path",
                                "plain", "rx")).alias("_rules"))
    pathq = F.regexp_extract(F.col(url_col), _URL_PATHQ_RE, 1)
    pagep = pages.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(F.col(url_col), tx._URL_AUTH_RE, 1))
        .alias("host"),
        F.when(pathq == "", F.lit("/")).otherwise(pathq).alias("_path"))
    j = pagep.join(per_host, "host", "left")
    path = F.col("_path")

    def matched(r):
        return F.when(r["plain"], path.startswith(r["path"])) \
            .otherwise(F.regexp_like(path, r["rx"]))

    hits = F.filter(F.coalesce(
        F.col("_rules"),
        F.array().cast("array<struct<pattern_len:int,allow:boolean,"
                       "path:string,plain:boolean,rx:string>>")), matched)
    null_best = F.lit(None).cast(
        "struct<pattern_len:int,allow:boolean,path:string>")
    best = F.aggregate(
        hits, null_best,
        lambda acc, r: F.when(
            acc.isNull()
            | (F.struct(r["pattern_len"], r["allow"], r["path"]) > acc),
            F.struct(r["pattern_len"].alias("pattern_len"),
                     r["allow"].alias("allow"),
                     r["path"].alias("path"))).otherwise(acc))
    return j.select(
        "url",
        F.coalesce(best["allow"], F.lit(True)).alias("allowed"),
        F.coalesce(best["path"], F.lit("")).alias("rule"))


def robots_rules_sql(robots_sql: str, agent: str = "*",
                     host_expr: str = "host",
                     body_expr: str = "robots_txt") -> str:
    """DuckDB mirror of :func:`robots_rules`."""
    agent = agent.strip().lower().replace("'", "''")
    return f"""
WITH _rb_l AS (
  SELECT {host_expr} AS host, u.pos - 1 AS pos,
         trim(regexp_replace(u.raw, '#.*$', '')) AS ln
  FROM ({robots_sql}) r, LATERAL (
    SELECT unnest(list_transform(
      list_zip(string_split({body_expr}, chr(10)),
               range(1, len(string_split({body_expr}, chr(10))) + 1)),
      z -> {{'raw': z[1], 'pos': z[2]}}), recursive := true)) u
), _rb_p AS (
  SELECT host, pos,
         lower(coalesce(regexp_extract(ln, '{_DIRECTIVE_RE}', 1), ''))
           AS dir,
         trim(coalesce(regexp_extract(ln, '{_DIRECTIVE_RE}', 2), ''))
           AS val
  FROM _rb_l
), _rb_f AS (
  -- DuckDB disallows nesting lag() inside the running sum's window
  SELECT *, (CASE WHEN dir = 'user-agent' AND
             coalesce(lag(dir) OVER (PARTITION BY host ORDER BY pos), '')
               <> 'user-agent' THEN 1 ELSE 0 END) AS _new
  FROM _rb_p
), _rb_g AS (
  SELECT host, pos, dir, val,
         sum(_new) OVER (PARTITION BY host ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS grp
  FROM _rb_f
), _rb_ga AS (
  SELECT host, grp,
         bool_or(lower(val) = '{agent}') AS has_agent,
         bool_or(lower(val) = '*') AS has_star
  FROM _rb_g WHERE dir = 'user-agent'
  GROUP BY host, grp
), _rb_a AS (
  -- RFC 9309 most-specific-group rule: specific-agent groups shadow '*'
  SELECT host, grp FROM (
    SELECT host, grp, has_agent, has_star,
           max(has_agent) OVER (PARTITION BY host) AS spec
    FROM _rb_ga)
  WHERE (CASE WHEN spec THEN has_agent ELSE has_star END)
)
SELECT g.host, (dir = 'allow') AS allow, val AS path,
       cast(length(val) AS INTEGER) AS pattern_len,
       (NOT contains(val, '*') AND NOT val LIKE '%$') AS plain,
       {_rx_sql('val')} AS rx
FROM _rb_g g JOIN _rb_a a ON g.host = a.host AND g.grp = a.grp
WHERE dir IN ('allow', 'disallow') AND val <> '' AND g.grp >= 1"""


def robots_check_sql(pages_sql: str, robots_sql: str, agent: str = "*",
                     url_expr: str = "url", host_expr: str = "host",
                     body_expr: str = "robots_txt") -> str:
    """DuckDB mirror of :func:`robots_check`."""
    rules = robots_rules_sql(robots_sql, agent, host_expr, body_expr)
    pathq = f"coalesce(regexp_extract({url_expr}, '{_URL_PATHQ_RE}', 1), '')"
    host = (f"lower(coalesce(regexp_extract({url_expr}, "
            f"'{tx._URL_AUTH_RE}', 1), ''))")
    return f"""
WITH _rc_r AS ({rules}),
_rc_p AS (
  SELECT {url_expr} AS url, {host} AS host,
         (CASE WHEN {pathq} = '' THEN '/' ELSE {pathq} END) AS _path
  FROM ({pages_sql})
), _rc_b AS (
  -- per-row correlated evaluation == the Spark HOF fold (one output
  -- row per input page row; no GROUP BY)
  SELECT p.url,
         (SELECT max(struct_pack(pattern_len := r.pattern_len,
                                 allow := r.allow, path := r.path))
          FROM _rc_r r
          WHERE r.host = p.host AND
            (CASE WHEN r.plain THEN starts_with(p._path, r.path)
                  ELSE regexp_matches(p._path, r.rx) END)) AS best
  FROM _rc_p p
)
SELECT url, coalesce(best.allow, true) AS allowed,
       coalesce(best.path, '') AS rule
FROM _rc_b"""


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    body_col: str = "robots_txt") -> DataFrame:
    """``(host, sitemap_url)`` from ``Sitemap:`` lines — the discovery
    link between robots.txt and the sitemap tier (feed the URLs to
    :func:`links.sitemap_entries` after fetching).  Per RFC 9309 §2.3
    the directive is group-INDEPENDENT: every Sitemap line applies,
    wherever it sits in the file.  Distinct per (host, url)."""
    grouped = _grouped_lines(robots, host_col, body_col)
    return (grouped.filter((F.col("dir") == "sitemap")
                           & (F.col("val") != ""))
            .select("host", F.col("val").alias("sitemap_url"))
            .distinct())


def robots_crawl_delays(robots: DataFrame, agent: str = "*",
                        host_col: str = "host",
                        body_col: str = "robots_txt") -> DataFrame:
    """``(host, crawl_delay double)`` for ``agent`` — the de-facto
    (non-RFC) politeness directive.  Group-scoped like Allow/Disallow
    (same most-specific agent selection); when several applicable
    groups set it, the MINIMUM wins (deterministic, and the fetcher
    schedule it feeds treats delay as a floor).  Unparseable values
    are ignored (try-cast null)."""
    agent = agent.strip().lower()
    grouped = _grouped_lines(robots, host_col, body_col)
    agents = _selected_groups(grouped, agent)
    return (grouped
            .filter((F.col("dir") == "crawl-delay") & (F.col("grp") >= 1))
            .join(agents, ["host", "grp"])
            .select("host",
                    F.col("val").try_cast("double").alias("crawl_delay"))
            .filter(F.col("crawl_delay").isNotNull())
            .groupBy("host")
            .agg(F.min("crawl_delay").alias("crawl_delay")))


def _grouped_lines_sql(robots_sql: str, host_expr: str,
                       body_expr: str) -> str:
    """Shared CTE chain (_rb_l/_rb_p/_rb_f/_rb_g) for the SQL mirrors."""
    return f"""
_rb_l AS (
  SELECT {host_expr} AS host, u.pos - 1 AS pos,
         trim(regexp_replace(u.raw, '#.*$', '')) AS ln
  FROM ({robots_sql}) r, LATERAL (
    SELECT unnest(list_transform(
      list_zip(string_split({body_expr}, chr(10)),
               range(1, len(string_split({body_expr}, chr(10))) + 1)),
      z -> {{'raw': z[1], 'pos': z[2]}}), recursive := true)) u
), _rb_p AS (
  SELECT host, pos,
         lower(coalesce(regexp_extract(ln, '{_DIRECTIVE_RE}', 1), ''))
           AS dir,
         trim(coalesce(regexp_extract(ln, '{_DIRECTIVE_RE}', 2), ''))
           AS val
  FROM _rb_l
), _rb_f AS (
  SELECT *, (CASE WHEN dir = 'user-agent' AND
             coalesce(lag(dir) OVER (PARTITION BY host ORDER BY pos), '')
               <> 'user-agent' THEN 1 ELSE 0 END) AS _new
  FROM _rb_p
), _rb_g AS (
  SELECT host, pos, dir, val,
         sum(_new) OVER (PARTITION BY host ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS grp
  FROM _rb_f
)"""


def robots_sitemaps_sql(robots_sql: str, host_expr: str = "host",
                        body_expr: str = "robots_txt") -> str:
    """DuckDB mirror of :func:`robots_sitemaps`."""
    return (f"WITH {_grouped_lines_sql(robots_sql, host_expr, body_expr)} "
            f"SELECT DISTINCT host, val AS sitemap_url FROM _rb_g "
            f"WHERE dir = 'sitemap' AND val <> ''")


def robots_crawl_delays_sql(robots_sql: str, agent: str = "*",
                            host_expr: str = "host",
                            body_expr: str = "robots_txt") -> str:
    """DuckDB mirror of :func:`robots_crawl_delays`."""
    agent = agent.strip().lower().replace("'", "''")
    return f"""
WITH {_grouped_lines_sql(robots_sql, host_expr, body_expr)},
_rb_ga AS (
  SELECT host, grp,
         bool_or(lower(val) = '{agent}') AS has_agent,
         bool_or(lower(val) = '*') AS has_star
  FROM _rb_g WHERE dir = 'user-agent'
  GROUP BY host, grp
), _rb_a AS (
  SELECT host, grp FROM (
    SELECT host, grp, has_agent, has_star,
           max(has_agent) OVER (PARTITION BY host) AS spec
    FROM _rb_ga)
  WHERE (CASE WHEN spec THEN has_agent ELSE has_star END)
)
SELECT g.host, min(TRY_CAST(val AS DOUBLE)) AS crawl_delay
FROM _rb_g g JOIN _rb_a a ON g.host = a.host AND g.grp = a.grp
WHERE dir = 'crawl-delay' AND g.grp >= 1
  AND TRY_CAST(val AS DOUBLE) IS NOT NULL
GROUP BY g.host"""


def fetch_schedule(frontier: DataFrame, delays: DataFrame,
                   default_delay_s: int = 1, start_us: int = 0,
                   url_col: str = "url",
                   host_col: str = "host") -> DataFrame:
    """Politeness-aware fetch plan: URLs of one host are serialized
    ``crawl_delay`` seconds apart (RFC 9309 Crawl-delay, per-host
    lookup with a default), hosts run in parallel.  Returns ``(url,
    host, slot, fetch_at_us)`` with ``slot`` the 0-based per-host
    position in URL order and ``fetch_at_us = start + slot*delay`` —
    the integer-exact schedule a distributed fetcher shards by host.

    One window over the frontier (partition host, order url) + a
    hosts-sized broadcast join.  Per-host state is a row_number — no
    driver loops, no Python."""
    from pyspark.sql import Window
    from ..functions.text import url_host_col
    f = frontier.select(F.col(url_col).alias("url"),
                        url_host_col(F.col(url_col)).alias("host"))
    d = delays.select(F.col(host_col).alias("host"),
                      F.col("crawl_delay").cast("bigint").alias("_d"))
    j = f.join(F.broadcast(d), "host", "left")
    delay_us = (F.coalesce(F.col("_d"), F.lit(int(default_delay_s)))
                * F.lit(1_000_000))
    slot = F.row_number().over(
        Window.partitionBy("host").orderBy("url")) - 1
    return (j.select("url", "host", slot.alias("slot"), delay_us.alias("_dus"))
            .select("url", "host", "slot",
                    (F.lit(int(start_us)) + F.col("slot") * F.col("_dus"))
                    .alias("fetch_at_us")))


def fetch_schedule_sql(frontier_sql: str, delays_sql: str,
                       default_delay_s: int = 1, start_us: int = 0,
                       url_expr: str = "url") -> str:
    """DuckDB mirror of :func:`fetch_schedule`."""
    from ..functions.text import url_host_sql
    return f"""
WITH _fs_f AS (
  SELECT url, {url_host_sql('url')} AS host
  FROM (SELECT {url_expr} AS url FROM ({frontier_sql}))
), _fs_j AS (
  SELECT f.url, f.host,
         coalesce(d.crawl_delay, {int(default_delay_s)}) * 1000000
           AS dus,
         row_number() OVER (PARTITION BY f.host ORDER BY f.url) - 1
           AS slot
  FROM _fs_f f LEFT JOIN ({delays_sql}) d ON d.host = f.host
)
SELECT url, host, slot, {int(start_us)} + slot * dus AS fetch_at_us
FROM _fs_j"""
