"""Web-corpus operators (operators/web.py): URL canonicalization,
URL-keyed dedup, HTML boilerplate removal — plus the token-entropy
quality signal (operators/corpus.py) added in the same wave."""

import math

from pyspark.sql import functions as F

from nyc_tlc_trip_data_pipelines_spark.operators import corpus as CP
from nyc_tlc_trip_data_pipelines_spark.operators import web as WB


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(WB.canonical_url(F.col("url")).alias("c")).first()["c"]


def test_canonical_url_lowercases_scheme_host_only(spark):
    assert (
        _canon(spark, "HTTPS://Host.Example.COM/CaseSensitive/Path")
        == "https://host.example.com/CaseSensitive/Path"
    )


def test_canonical_url_strips_fragment_and_tracking(spark):
    got = _canon(
        spark,
        "https://h.com/p?id=7&utm_source=feed&utm_campaign=c3#section-2",
    )
    assert got == "https://h.com/p?id=7"


def test_canonical_url_strips_multiple_tracking_params(spark):
    got = _canon(spark, "http://h.com/p?a=1&utm_a=x&b=2&utm_b=y")
    assert got == "http://h.com/p?a=1&b=2"


def test_canonical_url_strips_first_position_tracking(spark):
    # utm as the FIRST query param: the next param is promoted
    assert _canon(spark, "https://h.com/p?utm_a=x&b=2") == "https://h.com/p?b=2"
    # utm as the ONLY query param: the query string disappears
    assert _canon(spark, "https://h.com/p?utm_a=x") == "https://h.com/p"
    # several leading utm params collapse through the '&' rule first
    assert _canon(spark, "https://h.com/p?utm_a=x&utm_b=y&c=3") == "https://h.com/p?c=3"


def test_canonical_url_strips_uppercase_tracking_params(spark):
    """r5 advice: real crawls carry UTM_SOURCE=... variants — the
    tracking patterns are case-insensitive (in lockstep with the
    DuckDB oracle twin)."""
    got = _canon(spark, "https://h.com/p?id=7&UTM_Source=feed&UTM_CAMPAIGN=c#x")
    assert got == "https://h.com/p?id=7"
    assert _canon(spark, "https://h.com/p?Utm_a=x&b=2") == "https://h.com/p?b=2"
    assert _canon(spark, "https://h.com/p?UTM_A=x") == "https://h.com/p"


def test_canonical_url_preserves_utm_like_path_bytes(spark):
    # tracking strip is scoped to the query string: '&utm' sequences in
    # the PATH must survive byte-for-byte (two distinct pages must NOT
    # collapse to one canonical key)
    assert (
        _canon(spark, "https://h.com/a&utm_x=1/b") == "https://h.com/a&utm_x=1/b"
    )
    assert _canon(spark, "https://h.com/a&utm_x=1/b?utm_s=f&id=2") == (
        "https://h.com/a&utm_x=1/b?id=2"
    )


def test_canonical_url_passes_through_schemeless(spark):
    # no scheme://host prefix → nothing to lowercase, URL survives
    # (minus fragment/tracking) byte-for-byte
    assert _canon(spark, "/relative/Path#frag") == "/relative/Path"


def test_url_dedup_collapses_spurious_variants(spark):
    rows = [
        (1, "https://a.com/x?id=1"),
        (2, "HTTPS://A.COM/x?id=1&utm_source=s"),
        (3, "https://a.com/x?id=1#frag"),
        (4, "https://a.com/y?id=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["canonical_url"]: (r["first_doc"], r["n_docs"])
        for r in WB.url_dedup(df).collect()
    }
    assert got == {
        "https://a.com/x?id=1": (1, 3),
        "https://a.com/y?id=2": (4, 1),
    }


def _strip(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(WB.strip_html(F.col("html")).alias("t")).first()["t"]


def test_strip_html_drops_script_and_style_content(spark):
    got = _strip(
        spark,
        "<head><script>if (a<b && c>d) { x(); }</script>"
        "<style>.k{color:#333}</style></head><body>keep me</body>",
    )
    assert got == "keep me"


def test_strip_html_script_blocks_are_non_greedy(spark):
    # two script blocks: non-greedy .*? must not swallow the text between
    got = _strip(spark, "<script>a()</script>mid<script>b()</script>end")
    assert got == "mid end"


def test_strip_html_tags_become_word_boundaries(spark):
    assert _strip(spark, "one<b>two</b>three") == "one two three"


def test_strip_html_entities_and_double_escapes(spark):
    # &amp; is unescaped LAST: '&amp;lt;' must decode to the literal
    # '&lt;' the serializer meant, NOT to '<'
    got = _strip(spark, "a &amp; b&nbsp;c &lt;tag&gt; d &amp;lt;")
    assert got == "a & b c <tag> d &lt;"


def test_token_entropy_hand_computed(spark):
    rows = [(1, "a a b b"), (2, "a a a a"), (3, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in CP.token_entropy(df).collect()}
    # doc 1: uniform over 2 tokens → H = ln 2, ratio 1
    assert got[1]["n_tokens"] == 4 and got[1]["n_distinct"] == 2
    assert abs(got[1]["entropy"] - round(math.log(2), 4)) < 1e-9
    assert got[1]["entropy_ratio"] == 1.0
    # doc 2: single distinct token → H = 0, ratio undefined (NULL)
    assert got[2]["entropy"] == 0.0 and got[2]["entropy_ratio"] is None
    # doc 3: uniform over 4 tokens → H = ln 4, ratio 1
    assert abs(got[3]["entropy"] - round(math.log(4), 4)) < 1e-9
    assert got[3]["entropy_ratio"] == 1.0
