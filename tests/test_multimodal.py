"""Multimodal plumbing tests: schema, Arrow batch path, frame sampling.

Decode kernels are stubbed (no codecs in container) — these tests verify
the Spark-side plumbing is real: binary columns survive the round trip,
mapInPandas batches flow, output schema is typed.
"""

from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as MM


def test_fake_media_roundtrip(spark, tmp_path):
    df = MM.make_fake_media(spark, n=12)
    path = str(tmp_path / "media")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.schema == MM.MEDIA_SCHEMA
    assert back.count() == 12
    payload = back.filter("media_id = 3").collect()[0].payload
    assert isinstance(payload, bytearray | bytes) and len(payload) > 0


def test_extract_features_shapes(spark):
    df = MM.make_fake_media(spark, n=10)
    feats = MM.extract_features(df, dim=8)
    rows = feats.collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.feature) == 8
        assert r.n_bytes > 0


def test_extract_features_deterministic(spark):
    df = MM.make_fake_media(spark, n=5)
    a = {r.media_id: r.feature for r in MM.extract_features(df).collect()}
    b = {r.media_id: r.feature for r in MM.extract_features(df).collect()}
    assert a == b


def test_video_frame_sampling(spark):
    df = MM.make_fake_media(spark, n=9)
    frames = MM.sample_video_frames(df, every_ms=500)
    rows = frames.collect()
    assert all(r.frame_ts_ms % 500 == 0 for r in rows)
    # every video contributes duration/500 + 1 frames
    vids = {r.media_id for r in rows}
    assert vids == {i for i in range(9) if i % 3 == 2}


def test_resize_images_shape_and_determinism(spark):
    df = MM.make_fake_media(spark, n=9)
    out = MM.resize_images(df, 16, 8).collect()
    # only image rows pass through, payload resized to exactly w*h bytes
    assert {r.media_id for r in out} == {i for i in range(9) if i % 3 == 0}
    assert all(len(r.payload) == 16 * 8 for r in out)
    again = MM.resize_images(df, 16, 8).collect()
    assert {r.media_id: bytes(r.payload) for r in out} == {
        r.media_id: bytes(r.payload) for r in again
    }


def test_resize_stub_rejects_bad_geometry():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        MM.resize_image_stub(b"abc", 0, 8)


def test_wav_decode_roundtrip(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_wav_media(spark, 6)
    rows = {r.media_id: r for r in M.decode_audio_features(media).collect()}
    assert len(rows) == 6
    # closed-form check for one clip
    import math

    samples = M._wav_samples(2, 400 + (2 % 5) * 100)
    assert rows[2].n_samples == len(samples)
    assert rows[2].sample_rate == 8000
    assert rows[2].peak == max(abs(s) for s in samples)
    exp_rms = round(math.sqrt(sum(float(s) * s for s in samples) / len(samples)), 6)
    assert rows[2].rms == exp_rms


def test_bmp_decode_roundtrip(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_bmp_media(spark, 4)
    rows = {r.media_id: r for r in M.decode_image_features(media).collect()}
    assert len(rows) == 4
    r = rows[3]
    assert (r.width, r.height) == (M._BMP_W, M._BMP_H)
    exp_r = round(
        sum(M._bmp_pixel(3, x, y)[0] for x in range(16) for y in range(12)) / 192.0, 6
    )
    assert r.mean_r == exp_r


def test_bmp_resize_roundtrip(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_bmp_media(spark, 3)
    small = M.resize_bmp_images(media, factor=2)
    rows = {r.media_id: r for r in M.decode_image_features(small).collect()}
    assert rows[0].width == M._BMP_W // 2 and rows[0].height == M._BMP_H // 2
    # closed form: floor-mean of 2x2 blocks of the pixel formula
    exp_g = round(
        sum(
            sum(M._bmp_pixel(1, 2 * X + dx, 2 * Y + dy)[1] for dx in (0, 1) for dy in (0, 1)) // 4
            for X in range(8)
            for Y in range(6)
        )
        / 48.0,
        6,
    )
    assert rows[1].mean_g == exp_g


def test_y4m_decode_roundtrip(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_y4m_media(spark, 6)
    rows = {r.media_id: r for r in M.decode_video_features(media).collect()}
    assert len(rows) == 6
    r = rows[4]
    nf = M._y4m_frames(4)
    assert (r.n_frames, r.width, r.height, r.fps) == (nf, 16, 12, 25.0)
    exp_y = round(
        sum(M._y4m_luma(4, f, x, y) for f in range(nf) for y in range(12) for x in range(16))
        / (nf * 192.0),
        6,
    )
    exp_u = round(
        sum(M._y4m_chroma_u(4, f, cx, cy) for f in range(nf) for cy in range(6) for cx in range(8))
        / (nf * 48.0),
        6,
    )
    assert r.mean_y == exp_y and r.mean_u == exp_u


def test_y4m_frame_sampling_stride_and_stats(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_y4m_media(spark, 6)
    rows = M.sample_y4m_frames(media, every_n=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, rs in by_id.items():
        nf = M._y4m_frames(mid)
        assert sorted(r.frame for r in rs) == list(range(0, nf, 2))
    r0 = next(r for r in rows if r.media_id == 1 and r.frame == 2)
    exp = round(sum(M._y4m_luma(1, 2, x, y) for y in range(12) for x in range(16)) / 192.0, 6)
    assert r0.mean_y == exp


def test_y4m_rejects_non_420(spark):
    import pytest as _pytest
    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    bad = b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + bytes(48)
    with _pytest.raises(NotImplementedError):
        M._y4m_planes(bad)


def test_wav_resample_decimates_exactly(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_wav_media(spark, 4)
    rows = {r.media_id: r for r in M.decode_audio_features(M.resample_wav_media(media, 2)).collect()}
    import math

    n = 400 + (3 % 5) * 100
    kept = M._wav_samples(3, n)[::2]
    r = rows[3]
    assert r.n_samples == len(kept) and r.sample_rate == 4000
    assert r.peak == max(abs(s) for s in kept)
    assert r.rms == round(math.sqrt(sum(float(s) * s for s in kept) / len(kept)), 6)


def test_real_image_features_vector(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_bmp_media(spark, 4)
    rows = {r.media_id: r for r in M.extract_image_features(media).collect()}
    r = rows[2]
    px = [M._bmp_pixel(2, x, y) for x in range(16) for y in range(12)]
    reds = [p[0] for p in px]
    assert r.feature[0] == 16.0 and r.feature[1] == 12.0
    assert r.feature[2] == round(sum(reds) / 192.0, 6)
    assert r.feature[5] == float(max(reds) - min(reds))
