"""Real WAV/PPM codec path: spec-conformant payloads, numpy decode inside
mapInPandas, exact feature round-trips — the WAV side cross-checked against
Python's stdlib ``wave`` reader (an independent decoder)."""

from __future__ import annotations

import io
import wave

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mehari_spark.operators.multimodal import (
    decode_media,
    synth_ppm_bytes,
    synth_real_media,
    synth_wav_bytes,
)

from .conftest import SF_UNIT


class TestWavCodec:
    def test_wav_bytes_accepted_by_stdlib_wave(self):
        for seed in (0, 2, 8, 314, 4096):
            with wave.open(io.BytesIO(synth_wav_bytes(seed))) as w:
                assert w.getframerate() == 8000
                assert w.getnchannels() == 1
                assert w.getsampwidth() == 2
                assert w.getnframes() == 800 + (seed % 5) * 80

    def test_decode_matches_stdlib_samples(self):
        # our numpy parser and the stdlib reader must see identical PCM
        from mehari_spark.operators.multimodal import _parse_wav

        buf = synth_wav_bytes(42)
        sr, n, dur, rms = _parse_wav(buf)
        with wave.open(io.BytesIO(buf)) as w:
            frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        assert sr == 8000 and n == len(frames)
        want_rms = int(
            round(float(np.sqrt(np.mean((frames / 32768.0) ** 2))) * 1000)
        )
        assert rms == want_rms


class TestPpmCodec:
    def test_ppm_roundtrip_exact(self):
        from mehari_spark.operators.multimodal import _parse_ppm

        for seed in (1, 3, 7, 1001):
            w, h, r, g, b = _parse_ppm(synth_ppm_bytes(seed))
            assert (w, h) == (8 + seed % 16, 6 + seed % 10)
            # recompute the gradient means from first principles
            yy, xx = np.mgrid[0:h, 0:w]
            base = (xx + yy + seed).astype(np.int64)
            assert r == int((base % 256).mean())
            assert g == int(((base * 3) % 256).mean())
            assert b == int(((base * 7) % 256).mean())


class TestMulawCodec:
    def test_encode_decode_involution_all_codes(self):
        """encode(decode(b)) == b for every 8-bit code — the classic G.711
        involution check (each code maps to a distinct quantization cell)."""
        from mehari_spark.operators.multimodal import mulaw_decode, mulaw_encode

        codes = np.arange(256, dtype=np.uint8)
        # 0x7F/0xFF both decode to 0 and re-encode to 0xFF (+0): skip the
        # negative-zero alias, assert the rest round-trips bit-exact
        keep = codes != 0x7F
        assert np.array_equal(mulaw_encode(mulaw_decode(codes))[keep], codes[keep])

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32635, max_value=32635), min_size=1, max_size=200
        )
    )
    def test_roundtrip_error_bounded(self, xs):
        """decode(encode(x)) within one top-segment quantization step."""
        from mehari_spark.operators.multimodal import mulaw_decode, mulaw_encode

        x = np.asarray(xs, dtype=np.int16)
        err = np.abs(mulaw_decode(mulaw_encode(x)).astype(np.int32) - x)
        assert int(err.max()) <= 1024

    def test_mulaw_wav_parses_with_sane_rms(self):
        from mehari_spark.operators.multimodal import (
            _parse_wav,
            synth_mulaw_wav_bytes,
        )

        for seed in (0, 2, 8, 314):
            sr, n, dur, rms = _parse_wav(synth_mulaw_wav_bytes(seed))
            assert sr == 8000 and n == 800 + (seed % 5) * 80
            assert 350 <= rms <= 357  # 0.5-amp sine RMS survives companding


class TestBmpCodec:
    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=0, max_value=100_000))
    def test_bmp_roundtrip_exact(self, seed):
        from mehari_spark.operators.multimodal import _parse_bmp, synth_bmp_bytes

        w, h, r, g, b = _parse_bmp(synth_bmp_bytes(seed))
        assert (w, h) == (8 + seed % 16, 6 + seed % 10)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx + yy + seed).astype(np.int64)
        assert r == int((base % 256).mean())
        assert g == int(((base * 3) % 256).mean())
        assert b == int(((base * 7) % 256).mean())

    def test_top_down_variant(self):
        """Negative height = top-down row order; means are order-invariant
        so both orientations must decode identically."""
        import struct

        from mehari_spark.operators.multimodal import _parse_bmp, synth_bmp_bytes

        buf = bytearray(synth_bmp_bytes(9))
        (off,) = struct.unpack("<I", bytes(buf[10:14]))
        w, h = struct.unpack("<ii", bytes(buf[18:26]))
        row = (w * 3 + 3) // 4 * 4
        body = bytes(buf[off:])
        flipped = b"".join(
            body[i * row : (i + 1) * row] for i in reversed(range(h))
        )
        buf[18:26] = struct.pack("<ii", w, -h)
        buf[off:] = flipped
        assert _parse_bmp(bytes(buf)) == _parse_bmp(synth_bmp_bytes(9))

    def test_malformed_soft_fails(self):
        from mehari_spark.operators.multimodal import _parse_bmp, synth_bmp_bytes

        good = synth_bmp_bytes(3)
        assert _parse_bmp(b"BMgarbage") is None
        assert _parse_bmp(good[:40]) is None  # truncated header
        assert _parse_bmp(good[:-10]) is None  # truncated raster


class TestDecodeMediaSpark:
    def test_full_corpus_decodes_exactly(self, spark):
        docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet")
        out = decode_media(synth_real_media(docs)).localCheckpoint(eager=True)
        assert out.count() == docs.count()
        assert out.filter(F.col("kind") == "corrupt").count() == 0
        # audio: duration/size follow the generator's formulas exactly
        bad_audio = out.filter(
            (F.col("kind") == "audio")
            & (
                (F.col("sample_rate") != 8000)
                | (F.col("n_samples") != 800 + F.pmod("media_id", F.lit(5)) * 80)
                | (F.col("duration_ms") != F.col("n_samples") * 1000 / 8000)
            )
        )
        assert bad_audio.count() == 0
        # sine RMS = amp/sqrt(2) = 0.3535... -> ~353-354 milli for every tone
        rng = out.filter(F.col("kind") == "audio").agg(
            F.min("rms_milli"), F.max("rms_milli")
        ).first()
        assert 350 <= rng[0] <= rng[1] <= 357
        # images: dimensions follow the generator exactly
        bad_img = out.filter(
            (F.col("kind") == "image")
            & (
                (F.col("width") != 8 + F.pmod("media_id", F.lit(16)))
                | (F.col("height") != 6 + F.pmod("media_id", F.lit(10)))
            )
        )
        assert bad_img.count() == 0

    def test_corrupt_payload_soft_fails(self, spark):
        media = spark.createDataFrame(
            [
                (1, "audio", bytearray(b"not a riff file")),
                (2, "image", bytearray(b"P6 garbage")),
                (4, "audio", bytearray(synth_wav_bytes(4))),
            ],
            "media_id long, kind string, payload binary",
        )
        got = {r.media_id: r.kind for r in decode_media(media).collect()}
        assert got == {1: "corrupt", 2: "corrupt", 4: "audio"}
