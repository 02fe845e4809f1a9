"""Link extraction + link graph (functions/text.py, operators/links.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geolake_spark.functions import text as tx
from geolake_spark.operators import links


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_hrefs_contract(spark):
    html = ('<a href="https://a.com/x">one</a>'
            "<a href='https://sq.com/'>single-quoted ignored</a>"
            '<A HREF="HTTPS://UP.COM/Y">case-insensitive tag</A>'
            '<a class="z" href="/rel">attr before href</a>'
            '<a href="#frag">kept by extractor</a>')
    df = _pages(spark, [("https://base.com/p", html)])
    out = df.select(tx.extract_hrefs_col(F.col("html")).alias("h")) \
        .collect()[0]["h"]
    assert out == ["https://a.com/x", "HTTPS://UP.COM/Y", "/rel", "#frag"]


def test_resolve_link_shapes(spark):
    base = "https://User:pw@Host.Example.COM:443/dir/page?x=1#f"
    cases = [
        ("https://abs.com/p?a=1", "https://abs.com/p?a=1"),
        ("HTTP://abs.com/", "HTTP://abs.com/"),       # kept verbatim
        ("//cdn.net/lib.js", "https://cdn.net/lib.js"),
        # resolution lowercases/strips userinfo but keeps the port —
        # default-port dropping is canonicalization's job downstream
        ("/root/path", "https://host.example.com:443/root/path"),
        ("#top", ""),
        ("javascript:void(0)", ""),
        ("mailto:a@b.c", ""),
        ("rel/path.html", ""),                        # directory-relative
        ("", ""),
    ]
    df = spark.createDataFrame([(h, base) for h, _ in cases],
                               "href string, base string")
    got = [r[0] for r in df.select(
        tx.resolve_link_col(F.col("href"), F.col("base"))).collect()]
    assert got == [want for _, want in cases]
    # base without a scheme -> everything drops
    df2 = spark.createDataFrame([("/x", "not-a-url")],
                                "href string, base string")
    assert df2.select(tx.resolve_link_col(
        F.col("href"), F.col("base"))).collect()[0][0] == ""


def test_page_links_and_graph(spark):
    rows = [
        ("https://www.a.com/1",
         '<a href="https://b.com/x?utm_source=s&z=2&a=1">b</a>'
         '<a href="/local">nav</a><a href="#f">frag</a>'),
        ("https://sub.a.com/2", '<a href="//b.com/y">b2</a>'),
        ("https://b.com/3", '<a href="https://www.a.com/1/">a</a>'),
    ]
    pl = links.page_links(_pages(spark, rows)).collect()
    by_url = {}
    for r in pl:
        by_url.setdefault(r["url"], []).append(r["link_url"])
    # canonicalization: tracking param dropped, params sorted
    assert by_url["https://www.a.com/1"] == [
        "https://b.com/x?a=1&z=2", "https://www.a.com/local"]
    assert by_url["https://sub.a.com/2"] == ["https://b.com/y"]
    # trailing slash collapsed by canonicalization
    assert by_url["https://b.com/3"] == ["https://www.a.com/1"]

    g = {(r["src"], r["dst"]): r["weight"]
         for r in links.link_graph(_pages(spark, rows)).collect()}
    # self-domain nav edge (a.com -> a.com) dropped; subdomain folds in
    assert g == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}


def test_link_graph_url_grain_external_only(spark):
    rows = [("https://a.com/1",
             '<a href="https://a.com/2">in</a><a href="https://b.com/">out</a>')]
    g = links.link_graph(_pages(spark, rows), grain="url",
                         external_only=True).collect()
    assert [(r["src"], r["dst"], r["weight"]) for r in g] == [
        ("https://a.com/1", "https://b.com/", 1)]  # root path stays '/'
    g2 = links.link_graph(_pages(spark, rows), grain="url").collect()
    assert len(g2) == 2  # internal edge kept without the flag


def test_anchor_text_pairs(spark):
    html = ('<a href="https://a.com/">Read <b>more</b>\n here</a>'
            '<a href="/x">plain</a>')
    df = _pages(spark, [("https://base.com/", html)])
    out = df.select(tx.anchor_text_pairs_col(F.col("html"))
                    .alias("p")).collect()[0]["p"]
    assert [(r["href"], r["anchor"]) for r in out] == [
        ("https://a.com/", "Read more here"), ("/x", "plain")]


def test_web_graph_job_resume(spark, tmp_path):
    """jobs/web_graph.py logic: edges commit per bucket through the
    snapshot layer; a resumed run skips every committed bucket and the
    PageRank read-back ranks the same graph either way."""
    from geolake_spark.catalog import IcebergishTable
    from geolake_spark.operators import graph
    from geolake_spark.write import write_snapshot
    rows = [(f"https://s{i % 5}.com/p{i}",
             f'<a href="https://s{(i + 1) % 5}.com/x">n</a>'
             f'<a href="https://hub.com/">h</a>')
            for i in range(40)]
    pages = spark.createDataFrame(rows, "url string, html string")
    edges = links.link_graph(pages, grain="domain").withColumn(
        "bucket", F.pmod(F.xxhash64("src"), F.lit(4)))
    t = IcebergishTable(str(tmp_path / "webgraph"))
    first = write_snapshot(edges, t, ["bucket"], resume=True)
    again = write_snapshot(edges, t, ["bucket"], resume=True)
    assert first["written_partitions"] >= 1
    assert again["written_partitions"] == 0
    committed = spark.read.parquet(t.data_dir)
    # 5 site domains each -> next site + hub; weights survive the commit
    assert committed.count() == 10
    ranks = graph.pagerank(committed.select("src", "dst"), n_iter=5)
    top = ranks.orderBy(F.desc("rank")).first()
    assert top["node"] == "hub.com"  # everyone links to the hub


def test_extract_hrefs_ignores_data_href(spark):
    html = ('<a data-href="https://phantom.com/">no real href</a>'
            '<a data-href="https://x.com/" href="https://real.com/">r</a>')
    df = _pages(spark, [("https://base.com/", html)])
    out = df.select(tx.extract_hrefs_col(F.col("html")).alias("h")) \
        .collect()[0]["h"]
    assert out == ["https://real.com/"]


# ---------------------------------------------------------------------------
# crawl policies (meta robots + rel=canonical)
# ---------------------------------------------------------------------------


def _policies(spark, rows):
    out = links.crawl_policies(_pages(spark, rows))
    return {r.url: (r.robots, r.noindex, r.nofollow, r.canonical_url)
            for r in out.collect()}


def test_robots_both_orders_and_variants(spark):
    got = _policies(spark, [
        ("https://a.com/1",
         '<head><meta name="robots" content="noindex, follow"></head>'),
        ("https://a.com/2",
         '<head><meta content="INDEX, NoFollow" name="robots"></head>'),
        ("https://a.com/3",
         '<head><META NAME="robots" CONTENT="NOINDEX"></head>'),
        ("https://a.com/4",
         '<head><meta name="robots" content=" none "></head>'),
        ("https://a.com/5",
         '<head><meta name="viewport" content="width=device-width"></head>'),
        ("https://a.com/6", "<head></head>"),
    ])
    assert got["https://a.com/1"] == ("noindex,follow", True, False, "")
    assert got["https://a.com/2"] == ("index,nofollow", False, True, "")
    assert got["https://a.com/3"] == ("noindex", True, False, "")
    assert got["https://a.com/4"] == ("none", True, True, "")   # shorthand
    assert got["https://a.com/5"] == ("", False, False, "")     # decoy
    assert got["https://a.com/6"] == ("", False, False, "")


def test_robots_tag_isolation(spark):
    # one tag's content= must never pair with another tag's name=
    html = ('<meta content="leak" name="viewport">'
            '<meta name="robots" content="noindex">')
    got = _policies(spark, [("https://a.com/x", html)])
    assert got["https://a.com/x"][0] == "noindex"


def test_canonical_both_orders_resolution_and_decoy(spark):
    got = _policies(spark, [
        # rel-first, messy absolute -> canonicalized
        ("https://b.com/p/1",
         '<link rel="stylesheet" href="/css/m.css">'
         '<link rel="canonical" href="HTTPS://B.COM:443/p/0?utm_source=f">'),
        # href-first, root-relative -> resolved against the page URL
        ("https://b.com/p/2", '<link href="/p/0" rel="canonical">'),
        # directory-relative canonical is unresolvable -> ''
        ("https://b.com/p/3", '<link rel="canonical" href="other.html">'),
        ("https://b.com/p/4", '<link rel="stylesheet" href="/css/m.css">'),
    ])
    assert got["https://b.com/p/1"][3] == "https://b.com/p/0"
    assert got["https://b.com/p/2"][3] == "https://b.com/p/0"
    assert got["https://b.com/p/3"][3] == ""
    assert got["https://b.com/p/4"][3] == ""


def test_canonical_collapse_groups_and_noindex(spark):
    rows = [
        ("https://c.com/p/1", '<link rel="canonical" href="/canon">'),
        ("https://c.com/p/2", '<link href="/canon" rel="canonical">'),
        # noindex page declaring the same canonical: excluded
        ("https://c.com/p/3",
         '<meta name="robots" content="noindex">'
         '<link rel="canonical" href="/canon">'),
        # no canonical -> own canonicalized URL is the group key
        ("https://c.com/p/4/", ""),
    ]
    out = {r.canonical_url: (r.n_pages, r.keeper_url)
           for r in links.canonical_collapse(_pages(spark, rows)).collect()}
    assert out == {
        "https://c.com/canon": (2, "https://c.com/p/1"),
        "https://c.com/p/4": (1, "https://c.com/p/4/"),
    }


# ---------------------------------------------------------------------------
# sitemap parsing
# ---------------------------------------------------------------------------


def test_sitemap_entries_and_children(spark):
    urlset = ('<?xml version="1.0"?><urlset>'
              "<url><loc>\n  https://a.com/x \n</loc>"
              "<lastmod>2026-01-02</lastmod></url>"
              "<url><loc>https://a.com/y</loc></url>"
              "<url><priority>0.5</priority></url>"       # no loc: dropped
              "</urlset>")
    index = ('<sitemapindex>'
             "<sitemap><loc>https://a.com/sitemap-1.xml</loc>"
             "<lastmod>2026-02-03</lastmod></sitemap>"
             "<sitemap><loc>https://a.com/sitemap-2.xml</loc></sitemap>"
             "</sitemapindex>")
    df = spark.createDataFrame([("a.com", urlset), ("a.com", index)],
                               "host string, xml string")
    ents = {(r.url, r.lastmod)
            for r in links.sitemap_entries(df).collect()}
    assert ents == {("https://a.com/x", "2026-01-02"),
                    ("https://a.com/y", "")}
    kids = {(r.url, r.lastmod)
            for r in links.sitemap_children(df).collect()}
    assert kids == {("https://a.com/sitemap-1.xml", "2026-02-03"),
                    ("https://a.com/sitemap-2.xml", "")}


def test_anchor_index_hand_checked(spark):
    rows = [
        ("https://a.com/p1",
         '<a href="https://b.com/x">Great Search Engine</a>'
         '<a href="https://b.com/x">great again</a>'
         '<a href="/self">my own nav</a>'          # self-domain, not self-URL
         '<a href="https://a.com/p1">home</a>'     # self-link: dropped
         '<a href="https://c.com/"><img src="i.png"/></a>'),  # empty anchor
        ("https://a.com/p2",
         '<a href="https://b.com/x">great</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {(r.target_url, r.term): r.weight
           for r in links.anchor_index(df).collect()}
    assert got == {
        ("https://b.com/x", "great"): 3,
        ("https://b.com/x", "search"): 1,
        ("https://b.com/x", "engine"): 1,
        ("https://b.com/x", "again"): 1,
        ("https://a.com/self", "my"): 1,
        ("https://a.com/self", "own"): 1,
        ("https://a.com/self", "nav"): 1,
    }


def test_crawl_policies_plan_is_map_only(spark):
    # pure codegen map stage: no Exchange, no Python eval in the plan
    df = _pages(spark, [("https://a.com/x", "<html></html>")])
    plan = links.crawl_policies(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_anchor_index_single_exchange(spark):
    # extraction+resolution are map-side; the only shuffle is the
    # (target, term) groupBy with a map-side partial agg before it
    df = _pages(spark, [("https://a.com/x",
                         '<a href="https://b.com/">go there</a>')])
    plan = links.anchor_index(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_crawl_diff_statuses(spark):
    old = spark.createDataFrame(
        [("https://a.com/1", "alpha"), ("https://a.com/2", "beta"),
         ("https://a.com/3/", "gamma"),           # trailing slash variant
         ("https://a.com/dup?utm_source=x", "v1"),
         ("https://a.com/dup", "v1")],            # canonical collapse
        "url string, text string")
    new = spark.createDataFrame(
        [("https://a.com/1", "alpha"),            # unchanged
         ("https://a.com/3", "gamma CHANGED"),    # changed (canon match)
         ("https://a.com/dup", "v1"),             # unchanged after collapse
         ("https://a.com/4", "delta")],           # added
        "url string, text string")
    got = {r.url: r.status for r in links.crawl_diff(old, new).collect()}
    assert got == {
        "https://a.com/1": "unchanged",
        "https://a.com/2": "gone",
        "https://a.com/3": "changed",
        "https://a.com/dup": "unchanged",
        "https://a.com/4": "added",
    }


# ----------------------------------------------------------- crawl_budget

def test_crawl_budget_sums_exactly_and_is_proportional(spark):
    from geolake_spark.operators import links as lk
    # host a: 5 pages, b: 3, c: 1 -> 10 slots: exact shares 5.55/3.33/1.11
    pages = ([(f"https://a.com/{i}",) for i in range(5)]
             + [(f"https://b.com/{i}",) for i in range(3)]
             + [("https://c.com/0",)])
    df = spark.createDataFrame(pages, "url string")
    out = {r.host: r.slots for r in lk.crawl_budget(df, 10).collect()}
    assert sum(out.values()) == 10
    # bases 5/3/1 = 9; remainders .55/.33/.11 -> the extra goes to a.com
    assert out == {"a.com": 6, "b.com": 3, "c.com": 1}


def test_crawl_budget_fewer_slots_than_hosts(spark):
    from geolake_spark.operators import links as lk
    pages = [(f"https://h{i}.com/x",) for i in range(7)]
    df = spark.createDataFrame(pages, "url string")
    out = {r.host: r.slots for r in lk.crawl_budget(df, 3).collect()}
    assert sum(out.values()) == 3 and set(out.values()) == {0, 1}
    # equal weights: remainder ties break host-ascending
    assert out["h0.com"] == 1 and out["h1.com"] == 1 and out["h2.com"] == 1


def test_resolve_redirects_chain_cycle_and_bound(spark):
    from geolake_spark.operators import links
    edges = [
        # chain 3 -> 2 -> 1 -> 0 (terminal)
        (3, 2), (2, 1), (1, 0),
        # 2-cycle
        (10, 11), (11, 10),
        # feeds the cycle
        (12, 10),
        # multi-target source keeps the MIN target
        (20, 21), (20, 25), (21, 0),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.src: (r.target, r.hops, r.unresolved)
           for r in links.resolve_redirects(df, rounds=4).collect()}
    assert got[3] == (0, 3, False)
    assert got[2] == (0, 2, False)
    assert got[1] == (0, 1, False)
    assert got[10] == (None, None, True)
    assert got[11] == (None, None, True)
    assert got[12] == (None, None, True)
    assert got[20] == (0, 2, False)      # min(21, 25) = 21 -> 0
    # a straight chain longer than 2**rounds hops is flagged, shorter
    # chains resolve: rounds=1 bounds at 2 hops
    short = links.resolve_redirects(
        spark.createDataFrame([(3, 2), (2, 1), (1, 0)],
                              "src long, dst long"), rounds=1)
    g2 = {r.src: (r.target, r.unresolved) for r in short.collect()}
    assert g2[2] == (0, False) and g2[3] == (None, True)
