"""Pure-numpy WAV codec + the real multimodal AUDIO decode path it
unlocks: round trips at the supported encodings, RIFF quirks (odd-size
chunk padding, extra chunks), deterministic signal features, the Spark
kind-dispatched ``use_real_decode=True`` path, and the env gate for
non-WAV audio."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from mysql_data_quality_spark.functions import audioio as AIO
from mysql_data_quality_spark.operators import multimodal as MM


def _sine(freq=440.0, rate=8000, frames=800, channels=1):
    t = np.arange(frames) / rate
    mono = 0.5 * np.sin(2 * math.pi * freq * t)
    return np.tile(mono[:, None], (1, channels))


class TestWavCodec:
    def test_round_trip_16bit(self):
        a = _sine()
        out, rate = AIO.decode_wav(AIO.encode_wav(a, 8000))
        assert rate == 8000 and out.shape == a.shape
        assert np.abs(out - a).max() < 1.0 / 32767

    def test_stereo_shape(self):
        a = _sine(channels=2)
        out, _ = AIO.decode_wav(AIO.encode_wav(a, 8000))
        assert out.shape == (800, 2)

    def test_8bit_unsigned_and_float32(self):
        # hand-build an 8-bit PCM file: silence = 128
        body = bytes([128, 255, 0, 128])
        hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        hdr += b"data" + struct.pack("<I", len(body))
        out, rate = AIO.decode_wav(hdr + body)
        assert out[:, 0] == pytest.approx(
            [0.0, 127 / 128, -1.0, 0.0]
        )
        # float32 (format 3)
        f = np.array([0.25, -0.75], dtype="<f4")
        body = f.tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        hdr += b"data" + struct.pack("<I", len(body))
        out, _ = AIO.decode_wav(hdr + body)
        assert out[:, 0] == pytest.approx([0.25, -0.75])

    def test_extra_and_odd_chunks_skipped(self):
        a = _sine(frames=100)
        raw = AIO.encode_wav(a, 8000)
        # splice an odd-sized LIST chunk between WAVE and fmt
        extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\0"  # pad byte
        spliced = raw[:12] + extra + raw[12:]
        spliced = spliced[:4] + struct.pack(
            "<I", len(spliced) - 8
        ) + spliced[8:]
        out, rate = AIO.decode_wav(spliced)
        assert rate == 8000 and out.shape == (100, 1)

    def test_compressed_rejected(self):
        raw = bytearray(AIO.encode_wav(_sine(frames=10), 8000))
        struct.pack_into("<H", raw, 20, 85)  # MP3 format tag
        with pytest.raises(AIO.AudioFormatError, match="unsupported"):
            AIO.decode_wav(bytes(raw))

    def test_not_riff_rejected(self):
        with pytest.raises(AIO.AudioFormatError, match="RIFF"):
            AIO.decode_wav(b"ID3\x04" + b"\0" * 60)


class TestAudioFeatures:
    def test_known_signal(self):
        a = _sine()  # 0.1s of 440 Hz at amp 0.5
        f = AIO.audio_features(a, 8000, dim=8)
        assert f[0] == pytest.approx(0.1)                 # duration
        assert f[1] == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)  # rms
        assert f[2] == pytest.approx(0.5, rel=1e-2)       # peak
        # 440 Hz over 0.1 s -> 88 zero crossings of 799 transitions
        assert f[3] == pytest.approx(88 / 799, abs=0.01)

    def test_empty(self):
        assert AIO.audio_features(np.zeros((0, 1)), 8000) == [0.0] * 8


class TestSparkAudioRealPath:
    def test_kind_dispatch(self, spark):
        from mysql_data_quality_spark.functions import imageio as IIO

        img = IIO.encode_ppm(
            np.full((3, 3, 3), 128, np.uint8)
        )
        wav = AIO.encode_wav(_sine(), 8000)
        rows = [
            ("img1", "image", img, "image/x-portable-pixmap", None, None, None),
            ("aud1", "audio", wav, "audio/wav", None, None, 100),
        ]
        df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        got = {
            r["media_id"]: r["feature"]
            for r in MM.extract_features(
                df, feature_dim=8, use_real_decode=True
            ).collect()
        }
        # FEATURE_SCHEMA is array<float>: float32 rounding + 16-bit PCM
        # quantization bound the comparison, not exact float64 equality
        assert got["aud1"] == pytest.approx(
            AIO.audio_features(_sine(), 8000, 8), abs=2e-4
        )
        assert got["img1"][0] == pytest.approx(128 / 255.0, abs=1e-6)

    def test_non_wav_audio_env_gated(self, spark):
        rows = [("a", "audio", b"ID3\x04" + b"\0" * 60, "audio/mpeg",
                 None, None, None)]
        df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception) as ei:
            MM.extract_features(df, use_real_decode=True).collect()
        assert "DecodeUnavailable" in str(ei.value) or isinstance(
            ei.value, Py4JJavaError
        )

    def test_video_env_gated(self, spark):
        rows = [("v", "video", b"\x00\x00\x00\x18ftypmp42", "video/mp4",
                 None, None, 5000)]
        df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        with pytest.raises(Exception) as ei:
            MM.extract_features(df, use_real_decode=True).collect()
        assert "DecodeUnavailable" in str(ei.value) or "real decoder" in str(
            ei.value
        )
