"""Raster layer tests: codec round-trips, fixture invariants (decoded-pixel
PSNR >= 40 dB for lossy, caption byte-equality — BASELINE.json input_hint),
and tile assignment vs a brute-force numpy oracle (the reference's
cartesian-oracle pattern, SparkSQLDataTest.scala:344-351)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.cells import PARTITION_RES, cell_id
from geomesa_spark.raster.codec import (decode_image, encode_image, mean_pool,
                                        psnr)
from geomesa_spark.raster.fixtures import (image_batch, image_row, images_df,
                                           reference_pixels)

N_IMAGES = 64


@pytest.fixture(scope="module")
def images(spark):
    return images_df(spark, N_IMAGES, partitions=4).cache()


def _rand_pixels(seed, w=23, h=17):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3),
                                                dtype=np.uint8)


class TestCodec:
    def test_raw_lossless(self):
        px = _rand_pixels(1)
        assert np.array_equal(decode_image(encode_image(px, "raw"), 23, 17,
                                           "raw"), px)

    def test_rawz_lossless(self):
        px = _rand_pixels(2)
        assert np.array_equal(decode_image(encode_image(px, "rawz"), 23, 17,
                                           "rawz"), px)

    def test_q5_psnr_above_40db(self):
        for seed in range(5):
            px = _rand_pixels(seed)
            got = decode_image(encode_image(px, "q5"), 23, 17, "q5")
            assert psnr(px, got) >= 40.0

    def test_q5_deterministic(self):
        px = _rand_pixels(3)
        assert encode_image(px, "q5") == encode_image(px.copy(), "q5")

    def test_unknown_format_raises(self):
        with pytest.raises(ValueError):
            encode_image(_rand_pixels(0), "gif")

    def test_real_codecs_gated(self):
        try:
            import PIL  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError):
                encode_image(_rand_pixels(0), "png")

    def test_mean_pool_constant_image(self):
        px = np.full((32, 48, 3), 77, dtype=np.uint8)
        assert np.array_equal(mean_pool(px, 8, 8),
                              np.full((8, 8, 3), 77, dtype=np.uint8))

    def test_mean_pool_halving_exact(self):
        px = _rand_pixels(9, w=16, h=16)
        got = mean_pool(px, 8, 8)
        want = px.reshape(8, 2, 8, 2, 3).mean(axis=(1, 3)).round().astype(np.uint8)
        assert np.array_equal(got, want)


class TestFixture:
    def test_deterministic(self):
        a, b = image_row(5), image_row(5)
        assert a == b

    def test_per_row_invariant_local(self):
        """input_hint invariant: lossless byte-equal; lossy PSNR >= 40dB;
        caption embeds the coordinates exactly."""
        for i in range(16):
            r = image_row(i)
            ref = reference_pixels(i)
            got = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
            if r["fmt"] == "rawz":
                assert np.array_equal(got, ref)
            else:
                assert psnr(ref, got) >= 40.0
            assert r["caption"] == \
                f"caption {i}: synthetic image at ({r['lon']:.6f},{r['lat']:.6f})"

    def test_distributed_matches_local(self, images):
        rows = {r["image_id"]: r for r in images.collect()}
        assert len(rows) == N_IMAGES
        for i in (0, 7, 33, 63):
            local = image_row(i)
            got = rows[local["image_id"]].asDict()
            assert bytes(got["bytes"]) == local["bytes"]
            assert got["caption"] == local["caption"]
            assert got["phash"] == local["phash"]
            assert got["lon"] == pytest.approx(local["lon"])

    def test_hot_cluster_rows(self):
        r = image_row(10)  # i % 10 == 0 -> city cluster 1 (Paris)
        assert abs(r["lon"] - 2.35) < 3.0 and abs(r["lat"] - 48.85) < 3.0


class TestTiles:
    def test_assignment_matches_oracle(self, spark, images):
        from geomesa_spark.operators.tiles import tile_counts
        got = {(r["tile"], r["n_images"])
               for r in tile_counts(images).collect()}
        pdf = image_batch(0, N_IMAGES)
        cells = cell_id(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                        PARTITION_RES)
        vals, cnts = np.unique(cells, return_counts=True)
        assert got == {(int(v), int(c)) for v, c in zip(vals, cnts)}

    def test_image_features(self, spark, images):
        from geomesa_spark.operators.tiles import image_features
        feats = {r["image_id"]: r for r in image_features(images).collect()}
        assert len(feats) == N_IMAGES
        r = image_row(3)
        ref = reference_pixels(3)
        if r["fmt"] != "rawz":
            ref = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        want = ref.reshape(-1, 3).mean(axis=0)
        got = feats[r["image_id"]]
        assert got["mean_r"] == pytest.approx(float(want[0]))
        assert got["brightness"] == pytest.approx(float(want.mean()))

    def test_mosaic_deterministic_and_complete(self, spark, images):
        from geomesa_spark.operators.tiles import tile_mosaic
        a = {r["tile"]: (r["n_images"], r["checksum"], bytes(r["px"]))
             for r in tile_mosaic(images, tile_px=32, thumb_px=4).collect()}
        b = {r["tile"]: (r["n_images"], r["checksum"], bytes(r["px"]))
             for r in tile_mosaic(
                 images.repartition(7), tile_px=32, thumb_px=4).collect()}
        assert a == b  # shuffle-order independent
        assert sum(v[0] for v in a.values()) == N_IMAGES
        for _, _, body in a.values():
            assert len(body) == 32 * 32 * 3

    def test_footprint_duplicates_spanning_geoms(self, spark):
        from geomesa_spark.geo import Polygon, to_wkb
        from geomesa_spark.operators.tiles import assign_tiles_footprint
        # a box spanning several partition-res cells must land in >1 tile
        box = Polygon([[-10, -10], [50, -10], [50, 40], [-10, 40], [-10, -10]])
        df = spark.createDataFrame(
            [("a", bytearray(to_wkb(box)))], "id string, geom binary")
        tiles = [r["tile"] for r in assign_tiles_footprint(df).collect()]
        assert len(tiles) > 1 and len(set(tiles)) == len(tiles)


class TestTilePyramid:
    def test_levels_consistent(self, spark, images):
        from geomesa_spark.operators.tiles import tile_counts, tile_pyramid
        pyr = {(r["res"], r["tile"]): r["n_images"]
               for r in tile_pyramid(images, max_res=4, min_res=1).collect()}
        finest = {r["tile"]: r["n_images"]
                  for r in tile_counts(images, res=4).collect()}
        # finest level == tile_counts
        assert {t: n for (res, t), n in pyr.items() if res == 4} == finest
        # each level's total preserves the row count
        totals = {}
        for (res, t), n in pyr.items():
            totals[res] = totals.get(res, 0) + n
        assert set(totals.values()) == {sum(finest.values())}
        # parent count = sum of its children
        for (res, t), n in pyr.items():
            if res < 4:
                kids = sum(v for (r2, t2), v in pyr.items()
                           if r2 == res + 1 and (t2 >> 2) == t)
                assert kids == n, (res, t)
