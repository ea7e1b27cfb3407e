"""Round-7 curation/retrieval operators: DSIR selection, RRF fusion,
hard-negative mining, kNN label-noise voting."""

from pyspark.sql import functions as F

from nyc_tlc_trip_data_pipelines_spark.operators import corpus as CP
from nyc_tlc_trip_data_pipelines_spark.operators import text as TX
from nyc_tlc_trip_data_pipelines_spark.operators import vectors as V


def test_dsir_prefers_target_like_candidates(spark):
    # target speaks "alpha beta"; candidates 0-4 mimic it, 5-9 don't —
    # importance weights must rank the mimics first regardless of the
    # Gumbel noise (log-weight gap >> Gumbel spread here)
    rows = [(100 + i, "alpha beta alpha beta", "tgt") for i in range(8)]
    rows += [(i, "alpha beta alpha", "cand") for i in range(5)]
    rows += [(i, "zig zag zig zag zag", "cand") for i in range(5, 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = CP.dsir_select(df, F.col("source") == "tgt", top_n=5, seed=13).collect()
    assert len(out) == 5
    # no target doc is ever a candidate
    assert all(r.doc_id < 100 for r in out)
    assert {r.doc_id for r in out} == {0, 1, 2, 3, 4}
    # weights: target-like docs have positive log-ratio sums
    w = {r.doc_id: r.log_weight for r in out}
    assert all(w[i] > 0 for i in range(5))


def test_dsir_is_deterministic(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} filler", "s" + str(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = CP.dsir_select(df, F.col("source") == "s0", top_n=10).collect()
    b = CP.dsir_select(df, F.col("source") == "s0", top_n=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_rrf_fuse_combines_and_handles_missing(spark):
    r1 = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double"
    )
    r2 = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, score double"
    )
    out = {r.doc_id: r for r in TX.rrf_fuse([r1, r2], top_k=10).collect()}
    # doc 2: rank 2 in r1, rank 1 in r2
    assert out[2].n_rankers == 2
    assert abs(out[2].rrf - (1 / 62 + 1 / 61)) < 1e-6
    # doc 4 only in r2 at rank 2
    assert out[4].n_rankers == 1
    assert abs(out[4].rrf - 1 / 62) < 1e-6
    # two-ranker doc outranks every single-ranker doc here
    top = max(out.values(), key=lambda r: r.rrf)
    assert top.doc_id == 2


def test_hard_negatives_only_cross_label(spark):
    # one tight blob, two labels -> every anchor's hard negatives are
    # the other label's members, ranked by cosine
    rows = [
        (i, [1.0 + 0.001 * i, 0.5], i % 2) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = V.hard_negative_pairs(df, k=1, iterations=1, per_anchor=2).collect()
    assert out, "expected pairs"
    for r in out:
        assert r.anchor_label != r.nlabel
        assert 1 <= r.rank <= 2
    # every anchor got its quota (4 other-label candidates available)
    from collections import Counter

    per = Counter(r.anchor for r in out)
    assert set(per.values()) == {2}


def test_knn_label_vote_flags_planted_noise(spark):
    # two well-separated blobs with consistent labels, except one
    # deliberately mislabeled vector — the vote must flag exactly it
    rows = [(i, [0.0 + 0.01 * i, 1.0], 0) for i in range(6)]
    rows += [(10 + i, [10.0 + 0.01 * i, 1.0], 1) for i in range(6)]
    rows[0] = (0, rows[0][1], 1)  # plant: blob-0 vector labeled 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.vec_id: r for r in V.knn_label_vote(df, k=2, iterations=2, n_neighbors=3).collect()}
    assert not out[0].agree and out[0].vote_label == 0
    flagged = [i for i, r in out.items() if not r.agree]
    assert flagged == [0]


def test_zipf_fit_slope_near_minus_one_on_zipfian_counts(spark):
    # construct a corpus whose counts are exactly c/rank — the fit
    # must recover slope ~ -1 with r2 ~ 1
    rows = []
    for rank in range(1, 21):
        cnt = 1200 // rank
        rows.extend((0, f"w{rank:02d}") for _ in range(cnt))
    df = spark.createDataFrame(
        [(i, " ".join(w for _, w in rows[i::50])) for i in range(50)],
        "doc_id long, text string",
    )
    out = TX.zipf_fit(df, "text", top_n=1000).collect()[0]
    assert out.n_words == 20
    assert abs(out.slope + 1.0) < 0.05
    assert out.r2 > 0.99
