"""Property-based (hypothesis) round-trip laws for the pure-numpy
codecs: arbitrary uint8 images survive PPM and BMP encode→decode
byte-exactly (any width — exercises every BMP row-padding residue);
arbitrary float audio survives WAV encode→decode within one 16-bit
quantization step; nearest-resize output dimensions and value
membership hold for arbitrary geometries.  Pure CPU — no Spark
session, so the whole file runs in seconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_data_quality_spark.functions import audioio as AIO
from mysql_data_quality_spark.functions import imageio as IIO

dims = st.integers(min_value=1, max_value=17)


def _img(h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestImageProperties:
    @settings(max_examples=40, deadline=None)
    @given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
    def test_ppm_round_trip(self, h, w, seed):
        a = _img(h, w, seed)
        assert (IIO.decode_ppm(IIO.encode_ppm(a)) == a).all()

    @settings(max_examples=40, deadline=None)
    @given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
    def test_bmp_round_trip_any_padding(self, h, w, seed):
        # w mod 4 in {0,1,2,3} all appear across examples
        a = _img(h, w, seed)
        assert (IIO.decode_bmp(IIO.encode_bmp(a)) == a).all()

    @settings(max_examples=40, deadline=None)
    @given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
    def test_png_round_trip(self, h, w, seed):
        a = _img(h, w, seed)
        assert (IIO.decode_png(IIO.encode_png(a)) == a).all()

    @settings(max_examples=40, deadline=None)
    @given(h=dims, w=dims, th=dims, tw=dims, seed=st.integers(0, 2**31 - 1))
    def test_resize_shape_and_membership(self, h, w, th, tw, seed):
        a = _img(h, w, seed)
        out = IIO.resize_nearest(a, tw, th)
        assert out.shape == (th, tw, 3)
        # nearest-neighbor: every output pixel IS an input pixel
        flat_in = {bytes(p) for p in a.reshape(-1, 3)}
        assert all(bytes(p) in flat_in for p in out.reshape(-1, 3))

    @settings(max_examples=40, deadline=None)
    @given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
    def test_resize_identity(self, h, w, seed):
        a = _img(h, w, seed)
        assert (IIO.resize_nearest(a, w, h) == a).all()


class TestAudioProperties:
    @settings(max_examples=40, deadline=None)
    @given(
        frames=st.integers(1, 400),
        channels=st.integers(1, 3),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_wav_round_trip_quantization_bound(
        self, frames, channels, rate, seed
    ):
        rng = np.random.RandomState(seed)
        a = rng.uniform(-1.0, 1.0, size=(frames, channels))
        out, got_rate = AIO.decode_wav(AIO.encode_wav(a, rate))
        assert got_rate == rate and out.shape == a.shape
        assert np.abs(out - a).max() <= 0.5 / 32767 + 1e-12

    @settings(max_examples=40, deadline=None)
    @given(
        frames=st.integers(1, 400),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_second_round_trip_is_exact(self, frames, seed):
        """Once quantized, re-encoding is LOSSLESS: decode(encode(x))
        is a fixed point — the property that makes resized/transcoded
        payload hashes stable across pipeline replays."""
        rng = np.random.RandomState(seed)
        a = rng.uniform(-1.0, 1.0, size=(frames, 1))
        once, _ = AIO.decode_wav(AIO.encode_wav(a, 8000))
        twice, _ = AIO.decode_wav(AIO.encode_wav(once, 8000))
        assert (once == twice).all()
