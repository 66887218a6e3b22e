"""URL normalization, URL-level dedup, and per-domain curation ops for
web-corpus pipelines (SURVEY.md §2.11 extensions; not in the reference).

Common Crawl-style curation dedups by normalized URL before any content
dedup (it is free — no text is read) and enforces per-domain quotas so a
handful of mega-domains cannot dominate the training mix.

100 TB shapes: normalization is a pure JVM expression (mapper);
URL-dedup is one groupBy on the normalized URL (64-bit hash key);
per-domain caps use a two-phase shape — domains under the cap pass
through via a broadcast-joined "small domain" whitelist when possible,
and only over-cap domains pay the per-domain ranking shuffle.  Zero
Python UDFs.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F
from ..session import pin_eager

# query parameters that never change page content — the standard
# tracking/click-id strip list
TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid",
    "ref", "ref_src", "spm", "yclid", "_ga",
]


def url_parts(url: Column) -> Column:
    """``(scheme, host, port, path, query, fragment)`` struct via one
    regex pass (Spark's ``parse_url`` needs 4 expression calls and
    throws on malformed input; one rlike-guarded regex is cheaper and
    total).  Unparseable rows get NULL host."""
    u = F.trim(url)
    scheme = F.lower(F.nullif(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1),
                              F.lit("")))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(F.nullif(F.regexp_extract(hostport, r"^([^:@]*@)?([^:]*)", 2),
                            F.lit("")))
    port = F.nullif(F.regexp_extract(hostport, r":(\d+)$", 1), F.lit(""))
    path = F.regexp_extract(rest, r"^[^/?#]*(/[^?#]*)?", 1)
    query = F.nullif(F.regexp_extract(rest, r"\?([^#]*)", 1), F.lit(""))
    frag = F.nullif(F.regexp_extract(rest, r"#(.*)$", 1), F.lit(""))
    return F.struct(scheme.alias("scheme"), host.alias("host"),
                    port.alias("port"), path.alias("path"),
                    query.alias("query"), frag.alias("fragment"))


def normalize_url(url: Column,
                  strip_params: Optional[List[str]] = None) -> Column:
    """Canonical URL for dedup:

    - scheme and host lowercased; ``www.`` and trailing dots stripped
      from the host; default ports (80/443) dropped;
    - fragment dropped (never sent to the server);
    - tracking query params (``utm_*``, click ids, …) removed, the rest
      SORTED so param order doesn't split identical pages;
    - trailing ``/`` stripped from non-root paths; empty path → ``/``.

    NULL for rows with no parseable host.  Pure expression — a mapper."""
    strip = [p.lower() for p in (strip_params or TRACKING_PARAMS)]
    p = url_parts(url)
    host = F.regexp_replace(F.regexp_replace(p["host"], r"^www\.", ""),
                            r"\.$", "")
    scheme = F.coalesce(p["scheme"], F.lit("http"))
    port = F.when(
        ((scheme == "http") & (p["port"] == "80"))
        | ((scheme == "https") & (p["port"] == "443")), F.lit(None)) \
        .otherwise(p["port"])
    path = F.when(F.coalesce(p["path"], F.lit("")) == "", F.lit("/")) \
            .otherwise(F.regexp_replace(p["path"], r"/+$", ""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    kept = F.filter(
        F.split(F.coalesce(p["query"], F.lit("")), "&"),
        lambda kv: (F.length(kv) > 0)
        & ~F.lower(F.regexp_extract(kv, r"^([^=]*)", 1)).isin(*strip)
        & ~F.lower(kv).rlike(r"^utm_"))
    query = F.when(F.size(kept) > 0,
                   F.concat(F.lit("?"),
                            F.array_join(F.array_sort(kept), "&"))) \
             .otherwise(F.lit(""))
    out = F.concat(scheme, F.lit("://"), host,
                   F.when(port.isNotNull(), F.concat(F.lit(":"), port))
                    .otherwise(F.lit("")),
                   path, query)
    return F.when(_valid_host(host), out).otherwise(F.lit(None))


def _valid_host(host: Column) -> Column:
    """Hostname sanity: dotted labels of [a-z0-9-] (an IPv4 literal also
    matches).  Rejects free text that fell through the regexes."""
    return host.isNotNull() & host.rlike(r"^[a-z0-9-]+(\.[a-z0-9-]+)+$")


def domain_of(url: Column) -> Column:
    """Registrable-ish domain: last two host labels (three when the TLD
    looks like a ccTLD second-level, e.g. ``co.uk``).  A heuristic — a
    real pipeline plugs in the public-suffix list; the plan shape is
    identical (pure expression)."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    take3 = (n >= 3) & second.isin("co", "com", "org", "net", "ac", "gov",
                                   "edu") & (F.length(F.element_at(labels, -1)) == 2)
    dom = F.when(take3, F.concat_ws(".", F.slice(labels, n - 2, 3))) \
           .when(n >= 2, F.concat_ws(".", F.slice(labels, n - 1, 2))) \
           .otherwise(host)
    return F.when(_valid_host(host), dom).otherwise(F.lit(None))


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """One row per normalized URL (deterministic representative: min id)
    → ``(norm_url, id)``.  Rows with unparseable URLs are kept (NULL
    norm_url groups would collide — they pass through untouched).

    One shuffle keyed by the normalized URL string; text never moves."""
    norm = df.select(normalize_url(F.col(url_col)).alias("norm_url"),
                     F.col(id_col).alias("id"))
    good = norm.where(F.col("norm_url").isNotNull()) \
               .groupBy("norm_url").agg(F.min("id").alias("id"))
    bad = norm.where(F.col("norm_url").isNull())
    return good.unionByName(bad)


def domain_counts(df: DataFrame, url_col: str) -> DataFrame:
    """Docs per registrable domain, descending — the mix dashboard."""
    return (df.select(domain_of(F.col(url_col)).alias("domain"))
              .where(F.col("domain").isNotNull())
              .groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
              .orderBy(F.col("n_docs").desc(), "domain"))


def cap_per_domain(df: DataFrame, url_col: str, id_col: str,
                   cap: int = 1000) -> DataFrame:
    """Keep at most ``cap`` documents per registrable domain, selected
    by a DETERMINISTIC per-domain hash rank (not arrival order), so
    re-runs keep the same rows → original columns, filtered.

    Two-phase skew shape: a first aggregate finds the (few) over-cap
    domains; under-cap rows pass through with no per-row ranking, and
    ONLY over-cap rows pay the per-domain window sort.  The over-cap
    domain list is typically tiny → broadcast semi-join; the window
    shuffle then ranks only the heavy slice.  AQE's skew-join splitting
    handles a single mega-domain inside that slice."""
    d = df.withColumn("__dom", domain_of(F.col(url_col)))
    sizes = (d.where(F.col("__dom").isNotNull())
              .groupBy("__dom").agg(F.count(F.lit(1)).alias("__n")))
    heavy = sizes.where(F.col("__n") > cap).select("__dom")
    light_rows = d.join(F.broadcast(heavy), "__dom", "left_anti")
    heavy_rows = d.join(F.broadcast(heavy), "__dom", "left_semi")
    w = Window.partitionBy("__dom") \
              .orderBy(F.xxhash64(F.col(id_col).cast("string")), id_col)
    kept_heavy = heavy_rows.withColumn("__rk", F.row_number().over(w)) \
                           .where(F.col("__rk") <= cap).drop("__rk")
    return light_rows.unionByName(kept_heavy).drop("__dom")


def domain_authority(links: DataFrame, src_url: str = "src_url",
                     dst_url: str = "dst_url", *, damping: float = 0.85,
                     max_iter: int = 10) -> DataFrame:
    """Domain-level PageRank from a page-level hyperlink frame →
    ``(domain STRING, rank DOUBLE)`` descending — the Common-Crawl-style
    domain ranking a curation pipeline joins against its corpus as a
    quality prior (CCNet/RefinedWeb lineage).

    Page URLs collapse to registrable domains FIRST (``domain_of``),
    intra-domain links drop, and the walk runs on 8-byte domain-hash
    ids — so the iteration cost scales with the number of DOMAINS
    (~10⁷ on the full web), not pages (~10¹¹), and only the domain
    dictionary ever holds strings.
    """
    from ..operators.graphrank import pagerank

    pairs = (links.select(domain_of(F.col(src_url)).alias("sd"),
                          domain_of(F.col(dst_url)).alias("dd"))
             .where(F.col("sd").isNotNull() & F.col("dd").isNotNull()
                    & (F.col("sd") != F.col("dd")))
             .transform(pin_eager))
    edges = pairs.select(F.xxhash64("sd").alias("src"),
                         F.xxhash64("dd").alias("dst"))
    domains = (pairs.select(F.col("sd").alias("domain"))
               .unionAll(pairs.select(F.col("dd").alias("domain")))
               .distinct()
               .select(F.xxhash64("domain").alias("node"), "domain"))
    ranks = pagerank(edges, damping=damping, max_iter=max_iter)
    return (ranks.join(domains, "node")
            .select("domain", "rank")
            .orderBy(F.desc("rank"), "domain"))
