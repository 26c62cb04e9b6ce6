"""Image perceptual-hash near-dup: planted near-identical images found,
banded blocking exact vs brute force, cross-container hash invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mehari_spark.operators.imagehash import (
    ahash64,
    dhash64,
    decode_raster,
    image_near_dup,
    image_phash,
    phash_near_dup,
)
from mehari_spark.operators.multimodal import (
    bmp_raster,
    ppm_raster,
    synth_bmp_bytes,
    synth_ppm_bytes,
)


def _noise_rgb(seed: int, h: int = 32, w: int = 48) -> np.ndarray:
    """Deterministic high-entropy image (unlike the synth gradient, whose
    dHash is seed-invariant by construction)."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def _ppm_bytes(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def _perturb(rgb: np.ndarray, n_px: int, seed: int = 99) -> np.ndarray:
    out = rgb.copy()
    rng = np.random.RandomState(seed)
    h, w = rgb.shape[:2]
    for _ in range(n_px):
        out[rng.randint(h), rng.randint(w)] = rng.randint(0, 256, 3)
    return out


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _media(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


class TestPerceptualHashKernel:
    def test_same_image_two_containers_identical_hash(self):
        """The SAME gradient serialized as PPM and as BMP decodes to the
        same raster and hashes identically — container-invariance."""
        for seed in (1, 7, 42):
            ppm = decode_raster(synth_ppm_bytes(seed))
            bmp = decode_raster(synth_bmp_bytes(seed))
            assert np.array_equal(ppm, bmp)
            assert dhash64(ppm) == dhash64(bmp)
            assert ahash64(ppm) == ahash64(bmp)

    def test_perturbation_moves_few_bits(self):
        base = _noise_rgb(3)
        near = _perturb(base, n_px=4)
        far = _noise_rgb(4)
        d_near = _hamming(dhash64(base), dhash64(near))
        d_far = _hamming(dhash64(base), dhash64(far))
        assert d_near <= 7
        assert d_far > 7  # independent noise: ~32 expected

    def test_tiny_and_odd_sizes(self):
        """Images smaller than the 9x8 target are integer-upsampled, never
        crash; hash is deterministic."""
        one = np.full((1, 1, 3), 200, dtype=np.uint8)
        assert dhash64(one) == dhash64(one)
        tall = _noise_rgb(5, h=100, w=3)
        wide = _noise_rgb(6, h=2, w=100)
        assert isinstance(dhash64(tall), int)
        assert isinstance(ahash64(wide), int)

    def test_brightness_shift_invariance_dhash(self):
        """dHash compares neighbors, so a uniform brightness shift (no
        clipping) leaves it unchanged; aHash thresholds on the mean and is
        likewise shift-invariant."""
        base = (_noise_rgb(8).astype(np.int64) % 200).astype(np.uint8)
        brighter = (base.astype(np.int64) + 40).astype(np.uint8)
        assert dhash64(base) == dhash64(brighter)


class TestImageNearDupOperator:
    def test_planted_near_identical_found_exact_blocking(self, spark):
        """20 distinct noise images + 3 perturbed copies: the operator
        reports EXACTLY the brute-force pair set at hamming <= 7."""
        rows = []
        rasters = {}
        for i in range(20):
            rgb = _noise_rgb(100 + i)
            rasters[i] = rgb
            rows.append((i, "image", _ppm_bytes(rgb)))
        for j, src in enumerate((0, 5, 11)):
            near = _perturb(rasters[src], n_px=3, seed=7 + j)
            rows.append((100 + src, "image", _ppm_bytes(near)))
        media = _media(spark, rows)
        got = {
            (r.media_a, r.media_b, r.hamming)
            for r in image_near_dup(media, max_hamming=7, bands=8).collect()
        }
        # brute force over the same hashes
        hs = {r.media_id: r.phash for r in image_phash(media).collect()}
        want = set()
        ids = sorted(hs)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = _hamming(hs[ids[x]], hs[ids[y]])
                if d <= 7:
                    want.add((ids[x], ids[y], d))
        assert got == want
        assert {(a, b) for a, b, _ in got} >= {(0, 100), (5, 105), (11, 111)}

    def test_corrupt_and_non_image_skipped(self, spark):
        media = _media(
            spark,
            [
                (1, "image", b"not an image at all"),
                (2, "audio", synth_ppm_bytes(1)),
                (3, "image", None),
                (4, "image", synth_ppm_bytes(2)),
            ],
        )
        got = image_phash(media).collect()
        assert {r.media_id for r in got} == {4}

    def test_blocking_guard(self, spark):
        media = _media(spark, [(1, "image", synth_ppm_bytes(1))])
        with pytest.raises(ValueError):
            image_near_dup(media, max_hamming=9, bands=8)

    def test_registry_entry_runs(self, spark):
        from mehari_spark.plans.queries import QUERIES

        fn, oracle = QUERIES["media_image_near_dup"]
        assert oracle is None
        df = fn(spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert set(df.columns) == {"media_a", "media_b", "hamming"}
        assert all(r.hamming <= 7 for r in rows)
        assert all(r.media_a < r.media_b for r in rows)
