"""Video frame-sampling + audio feature plumbing tests (multimodal brief:
opaque binary columns, typed metadata, mapInPandas decode)."""

from __future__ import annotations

import numpy as np
import pytest

from geomesa_spark.raster.media import (audio_features, decode_audio,
                                        decode_video, encode_audio,
                                        encode_video, sample_frames)


def _video(seed, n=6, w=16, h=8):
    return np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8)


class TestCodecs:
    def test_video_roundtrip(self):
        v = _video(1)
        assert np.array_equal(decode_video(encode_video(v), 6, 16, 8), v)

    def test_audio_roundtrip(self):
        pcm = np.random.default_rng(2).integers(-32768, 32767, 1000) \
            .astype(np.int16)
        assert np.array_equal(decode_audio(encode_audio(pcm)), pcm)

    def test_real_formats_stubbed(self):
        try:
            import av  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError):
                encode_video(_video(0), fmt="mp4")
            with pytest.raises(NotImplementedError):
                decode_audio(b"", fmt="mp3")


class TestFrameSampling:
    @pytest.fixture(scope="class")
    def videos(self, spark):
        rows = [(f"v-{i}", bytearray(encode_video(_video(i))), 6, 16, 8,
                 "rawv") for i in range(5)]
        return spark.createDataFrame(
            rows, "media_id string, bytes binary, n_frames int, w int, "
                  "h int, fmt string")

    def test_every_2nd_frame(self, spark, videos):
        out = sample_frames(videos, every=2).collect()
        assert len(out) == 5 * 3  # frames 0, 2, 4 per video
        by_vid = {}
        for r in out:
            by_vid.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert all(sorted(v) == [0, 2, 4] for v in by_vid.values())
        r0 = next(r for r in out if r["media_id"] == "v-1"
                  and r["frame_idx"] == 2)
        want = _video(1)[2]
        got = np.frombuffer(bytes(r0["frame"]), dtype=np.uint8) \
            .reshape(8, 16, 3)
        assert np.array_equal(got, want)

    def test_thumbnail_resize(self, spark, videos):
        out = sample_frames(videos, every=3, thumb_px=4).collect()
        assert all(r["w"] == 4 and r["h"] == 4 for r in out)
        assert all(len(bytes(r["frame"])) == 4 * 4 * 3 for r in out)


class TestAudioFeatures:
    def test_features_match_numpy(self, spark):
        rng = np.random.default_rng(3)
        pcm = (rng.standard_normal(8000) * 1000).astype(np.int16)
        df = spark.createDataFrame(
            [("a-0", bytearray(encode_audio(pcm)), "rawa", 8000)],
            "media_id string, bytes binary, fmt string, sample_rate int")
        r = audio_features(df).collect()[0]
        assert r["duration_s"] == pytest.approx(1.0)
        f = pcm.astype(np.float64)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(f ** 2))))
        assert r["peak"] == int(np.abs(f).max())
        assert 0.0 < r["zero_cross_rate"] < 1.0


class TestDeterministicFixtures:
    """The driver-gate fixtures (media_fixtures.py): SQL-regenerable
    counter-mode sha256 samples, distributed synthesis."""

    def test_pcm_deterministic_and_bounded(self):
        from geomesa_spark.raster.media_fixtures import (audio_samples,
                                                         reference_pcm)
        a, b = reference_pcm(7), reference_pcm(7)
        assert np.array_equal(a, b)
        assert len(a) == audio_samples(7)
        assert a.min() >= -2000 and a.max() <= 2000

    def test_video_deterministic_shape(self):
        from geomesa_spark.raster.media_fixtures import (reference_video,
                                                         video_frames)
        v = reference_video(5)
        n, w, h = video_frames(5)
        assert v.shape == (n, h, w, 3)
        assert np.array_equal(v, reference_video(5))

    def test_audio_df_roundtrip(self, spark):
        from geomesa_spark.raster.media_fixtures import (audio_df,
                                                         reference_pcm)
        rows = {r["media_id"]: r for r in audio_df(spark, 8).collect()}
        assert len(rows) == 8
        pcm = decode_audio(bytes(rows["au-000000000003"]["bytes"]))
        assert np.array_equal(pcm, reference_pcm(3))

    def test_frame_stats_exact_division(self, spark):
        from geomesa_spark.raster.media import frame_stats
        from geomesa_spark.raster.media_fixtures import (reference_video,
                                                         videos_df)
        vids = videos_df(spark, 4)
        out = {(r["media_id"], r["frame_idx"]): r["mean_value"]
               for r in frame_stats(sample_frames(vids, every=2)).collect()}
        v = reference_video(2)
        f0 = v[0].astype(np.int64)
        want = int(f0.sum()) / f0.size
        assert out[("vid-000000000002", 0)] == want  # bit-exact, no approx
