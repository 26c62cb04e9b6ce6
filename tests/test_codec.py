"""Real WAV/PPM codec path: spec-conformant payloads, numpy decode inside
mapInPandas, exact feature round-trips — the WAV side cross-checked against
Python's stdlib ``wave`` reader (an independent decoder)."""

from __future__ import annotations

import io
import wave

import numpy as np
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
