"""Baseline JPEG codec (functions/jpegio.py): transform-level unit
tests against the closed form (the parts of JPEG that are exact),
PSNR-bounded round trips for the lossy whole (4:4:4, 4:2:0,
grayscale, odd dimensions), Huffman/bitstream laws, marker-level
robustness (fill bytes, progressive rejection, truncation), restart
segment splitting, and the decode_image / multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from mysql_data_quality_spark.functions import imageio as IIO
from mysql_data_quality_spark.functions import jpegio as J
from mysql_data_quality_spark.operators import multimodal as MM


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _smooth(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [y * 3 + 20, x * 2 + 60, x + y + 40], axis=2
    ).astype(np.uint8)


class TestTransform:
    def test_dct_is_orthonormal(self):
        assert np.allclose(J._A @ J._A.T, np.eye(8), atol=1e-12)

    def test_idct_inverts_dct(self):
        rng = np.random.RandomState(1)
        x = rng.uniform(-128, 127, (8, 8))
        assert np.allclose(J.idct2(J.dct2(x)), x, atol=1e-10)

    def test_constant_block_is_pure_dc(self):
        X = J.dct2(np.full((8, 8), 31.0))
        assert abs(X[0, 0] - 31.0 * 8) < 1e-9
        X[0, 0] = 0
        assert np.abs(X).max() < 1e-9

    def test_zigzag_is_the_spec_order(self):
        assert J.ZIGZAG[:10] == [
            (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
            (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
        ]
        assert len(set(J.ZIGZAG)) == 64


class TestHuffman:
    def test_canonical_codes_are_prefix_free(self):
        lengths = J._huffman_lengths({1: 50, 2: 30, 3: 15, 4: 4, 5: 1})
        codes = J._canonical_codes(lengths)
        bitstrings = [
            format(c, f"0{ln}b") for c, ln in codes.values()
        ]
        for i, a in enumerate(bitstrings):
            for j, b in enumerate(bitstrings):
                if i != j:
                    assert not b.startswith(a), (a, b)

    def test_lut_decodes_what_writer_encodes(self):
        lengths = J._huffman_lengths({7: 9, 3: 5, 11: 2, 0: 1})
        codes = J._canonical_codes(lengths)
        payload = J._dht_payload(0, 0, lengths)
        bits = list(payload[1:17])
        vals = list(payload[17:])
        lut = J._decode_lut(bits, vals)
        w = J._BitWriter()
        seq = [7, 3, 3, 11, 0, 7, 7]
        for s in seq:
            c, ln = codes[s]
            w.write(c, ln)
        r = J._BitReader(w.flush())
        got = []
        for _ in seq:
            peek = r.peek16()
            got.append(int(lut[0][peek]))
            r.skip(int(lut[1][peek]))
        assert got == seq

    def test_magnitude_coding_round_trips(self):
        for v in (-255, -128, -1, 0, 1, 7, 128, 255):
            size = J._category(v)
            assert J._extend(J._magnitude_bits(v, size), size) == v


class TestRoundTrip:
    def test_constant_image_exact(self):
        img = np.full((16, 24, 3), 100, np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=1))
        assert (out == img).all()

    def test_smooth_image_high_psnr(self):
        img = _smooth(24, 31)  # odd width: exercises edge padding
        out = J.decode_jpeg(J.encode_jpeg(img, quality=1))
        assert out.shape == img.shape
        assert _psnr(out, img) >= 40

    def test_420_subsampled(self):
        img = _smooth(21, 18)  # odd dims + subsample padding
        out = J.decode_jpeg(J.encode_jpeg(img, quality=2, subsample=True))
        assert out.shape == img.shape
        assert _psnr(out, img) >= 33

    def test_noise_survives_coarsely(self):
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=1))
        assert _psnr(out, img) >= 22  # worst-case content, coarse bound

    def test_grayscale(self):
        y, x = np.mgrid[0:13, 0:9]
        g = (x * 12 + y * 7 + 30).astype(np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(g, quality=1))
        assert out.shape == (13, 9, 3)
        assert (out[:, :, 0] == out[:, :, 1]).all()
        assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 4

    def test_higher_quality_number_is_lossier(self):
        img = _smooth(16, 16)
        p1 = _psnr(J.decode_jpeg(J.encode_jpeg(img, quality=1)), img)
        p8 = _psnr(J.decode_jpeg(J.encode_jpeg(img, quality=8)), img)
        assert p1 > p8

    def test_decode_is_deterministic(self):
        img = _smooth(17, 23)
        blob = J.encode_jpeg(img, quality=3)
        a = J.decode_jpeg(blob)
        b = J.decode_jpeg(blob)
        assert (a == b).all()


class TestRobustness:
    def test_progressive_rejected(self):
        blob = bytearray(J.encode_jpeg(_smooth(8, 8)))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
        with pytest.raises(IIO.ImageFormatError, match="non-baseline"):
            J.decode_jpeg(bytes(blob))

    def test_fill_bytes_before_marker_ok(self):
        blob = J.encode_jpeg(_smooth(8, 8))
        # insert FF fill bytes before the SOF marker
        i = blob.find(b"\xff\xc0")
        padded = blob[:i] + b"\xff\xff" + blob[i:]
        out = J.decode_jpeg(padded)
        assert out.shape == (8, 8, 3)

    def test_truncated_raises(self):
        blob = J.encode_jpeg(_smooth(8, 8))
        with pytest.raises(IIO.ImageFormatError):
            J.decode_jpeg(blob[:18])

    def test_not_jpeg_raises(self):
        with pytest.raises(IIO.ImageFormatError, match="not a JPEG"):
            J.decode_jpeg(b"\x89PNG....")

    def test_entropy_split_destuffs_and_splits_at_rst(self):
        data = (
            b"\x01\xff\x00\x02"      # stuffed FF inside segment 0
            b"\xff\xd0"              # RST0
            b"\x03\x04"
            b"\xff\xd1"              # RST1
            b"\x05"
            b"\xff\xd9"              # EOI ends the scan
        )
        segs = J._split_entropy(data, 0)
        assert segs == [b"\x01\xff\x02", b"\x03\x04", b"\x05"]


class TestDispatch:
    def test_decode_image_sniffs_and_mime(self):
        img = _smooth(9, 9)
        blob = J.encode_jpeg(img, quality=1)
        out = IIO.decode_image(blob)
        assert out.shape == img.shape and _psnr(out, img) >= 40
        assert (IIO.decode_image(blob, "image/jpeg") == out).all()
        assert (MM.real_decode(blob, "image/jpeg") == out).all()

    def test_spark_real_feature_path(self, spark):
        """Features computed from the DECODED pixels of real JPEG bytes
        (expectation computed against the decode, since JPEG is lossy)."""
        import hashlib

        arrays = [_smooth(12, 10), _smooth(8, 8)]
        rows = [
            (f"j{i}", "image", J.encode_jpeg(a, quality=1), "image/jpeg",
             None, None, None)
            for i, a in enumerate(arrays)
        ]
        df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        got = {
            r["media_id"]: r["feature"]
            for r in MM.extract_features(
                df, feature_dim=8, use_real_decode=True
            ).collect()
        }
        for i, a in enumerate(arrays):
            want = MM._pixel_feature(
                J.decode_jpeg(J.encode_jpeg(a, quality=1)), 8
            )
            assert got[f"j{i}"] == pytest.approx(want, abs=1e-6)
