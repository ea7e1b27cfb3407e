"""Web-corpus ingest operators: URL canonicalization / URL-keyed dedup
and HTML boilerplate removal.

A crawl-derived pretraining corpus is keyed by URL before it is keyed by
content: the first dedup pass any web pipeline runs is "same page,
different tracking params / fragment / host casing", and the first
text-quality pass is "strip the markup, scripts, and boilerplate before
measuring anything". Both passes here are pure column expressions
(regexp + concat — whole-stage codegen, no UDF), so at 100 TB they run
inside the scan stage and the only shuffle is the vocabulary-narrow
canonical-URL groupBy.

Regex dialect note: every pattern below is written in the common subset
of Java regex (Spark) and RE2 (DuckDB oracle twin) — no backreferences
(RE2 has none; the script/style blocks are matched by two separate
non-greedy patterns instead of ``</\\1>``), and case-insensitivity via
the inline ``(?i)`` flag both engines accept. The reference has no web
surface (pasta1_etl/src/main.py stops at parquet relations); this module
is part of the north-star corpus extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_url", "url_dedup", "strip_html"]

# Common-subset patterns (Java regex ∩ RE2). Keep in sync with the
# DuckDB twins in __spark_entry__.oracle_sql (q_url_canonicalize /
# q_html_strip) — drift silently breaks oracle parity.
_FRAGMENT = "#.*$"
# tracking rules run ONLY on the query-string slice (first '?' onward),
# so '&utm' byte sequences in the PATH are preserved. Within the query
# string: the '&' rule strips non-first utm params globally; then the
# '?' rules fix a utm param left in FIRST position — promote the next
# param ('?utm_a=1&b=2' → '?b=2') or drop an only-param query
# ('?utm_a=1' → ''). All global in both engines (a '?' can legally
# recur inside param values).
_TRACKING = "(?i)&utm_[a-z_]+=[^&#]*"
_TRACKING_LEAD_MID = "(?i)\\?utm_[a-z_]+=[^&#]*&"
_TRACKING_LEAD_END = "(?i)\\?utm_[a-z_]+=[^&#]*$"
# one pattern for both extract (group 1) and strip — regexp_replace
# ignores the capture group, so a single constant cannot drift
_SCHEME_HOST = "(?i)^(https?://[^/?#]*)"
_SCRIPT_BLOCK = "(?is)<script[^>]*>.*?</script>"
_STYLE_BLOCK = "(?is)<style[^>]*>.*?</style>"
_TAG = "<[^>]+>"
_WS_RUN = "\\s+"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for dedup keying: fragment dropped,
    ``utm_*`` tracking params removed from the query string (and ONLY
    from the query string — the path is byte-preserved, paths ARE
    case-sensitive), scheme+authority lowercased (hosts are
    case-insensitive — RFC 3986 §6.2.2.1; the authority slice also
    covers port and any userinfo, which is vanishingly rare in crawl
    URLs and documented as folded here).

    Pure codegen expression — at 100 TB this is computed in the scan
    stage of the crawl table, and the canonical key (not the raw URL)
    is what every downstream groupBy/join shuffles on.
    """
    u = F.regexp_replace(url, _FRAGMENT, "")
    qpos = F.instr(u, "?")  # 1-based, 0 if no query string
    pre = F.when(qpos > 0, F.substr(u, F.lit(1), qpos - 1)).otherwise(u)
    qs = F.when(qpos > 0, F.substr(u, qpos)).otherwise(F.lit(""))
    qs = F.regexp_replace(qs, _TRACKING, "")
    qs = F.regexp_replace(qs, _TRACKING_LEAD_MID, "?")
    qs = F.regexp_replace(qs, _TRACKING_LEAD_END, "")
    u = F.concat(pre, qs)
    host = F.lower(F.regexp_extract(u, _SCHEME_HOST, 1))
    rest = F.regexp_replace(u, _SCHEME_HOST, "")
    return F.concat(host, rest)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-keyed exact dedup: group by :func:`canonical_url`, keep the
    smallest id as the canonical copy (deterministic keep-first), count
    the copies. Returns ``(canonical_url, first_doc, n_docs)``.

    Scale shape: identical to the text exact-dedup stack — one hash
    exchange on the canonical string (or its xxhash64 for fixed-width
    shuffle rows at 100 TB), map-side partial aggregation; duplicate
    groups are read off with a count filter, never a self-join.
    """
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("first_doc"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def strip_html(html: Column) -> Column:
    """Visible text of an HTML payload: script and style blocks removed
    wholesale (their CONTENT is not text), remaining tags replaced by a
    space, the four entities that appear in attribute-free prose
    (``&amp; &lt; &gt; &nbsp;``) unescaped, whitespace runs collapsed,
    ends trimmed.

    This is the regex tier of boilerplate removal — the right tool for
    the bulk strip at 100 TB because it stays inside codegen. A real
    pipeline layers a DOM-aware extractor (trafilatura-class) behind an
    Arrow ``mapInPandas`` for the pages that need it, exactly like the
    multimodal decoders in :mod:`.multimodal`; the regex tier here is
    the one that touches every byte, so it is the one that must not be
    a Python UDF. ``&amp;`` is unescaped LAST so ``&amp;lt;`` decodes
    to the literal ``&lt;`` a correct serializer meant (double-escape
    order, HTML5 §13.1.4).
    """
    t = F.regexp_replace(html, _SCRIPT_BLOCK, " ")
    t = F.regexp_replace(t, _STYLE_BLOCK, " ")
    t = F.regexp_replace(t, _TAG, " ")
    t = F.replace(t, F.lit("&nbsp;"), F.lit(" "))
    t = F.replace(t, F.lit("&lt;"), F.lit("<"))
    t = F.replace(t, F.lit("&gt;"), F.lit(">"))
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))
    t = F.regexp_replace(t, _WS_RUN, " ")
    return F.trim(t)
