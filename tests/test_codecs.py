"""Pure-numpy codec unit tests: BMP/WAV/BMP-seq encode-decode
roundtrips, header/stride edge cases, nearest-neighbor resize golden,
and the feature extractors over known pixels (no Spark session —
these run in milliseconds)."""

import struct

import numpy as np
import pytest

from web_scrapers_python_spark.functions import codecs as C
from web_scrapers_python_spark.operators import multimodal as MM


class TestBMP:
    def test_roundtrip_various_geometries(self):
        rng = np.random.default_rng(7)
        # widths crossing every stride-padding residue (3W % 4)
        for w, h in [(1, 1), (2, 3), (3, 2), (4, 4), (5, 7), (16, 16),
                     (17, 29), (33, 5)]:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            out = C.decode_bmp(C.encode_bmp(img))
            assert out.shape == (h, w, 3)
            assert np.array_equal(out, img)

    def test_file_size_field_and_length(self):
        img = np.zeros((5, 5, 3), dtype=np.uint8)
        b = C.encode_bmp(img)
        assert len(b) == C.bmp_size(5, 5)
        (size,) = struct.unpack_from("<I", b, 2)
        assert size == len(b)

    def test_bottom_up_orientation(self):
        # top row white, rest black: a decoder that forgets the flip
        # returns the white row at the bottom
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[0] = 255
        out = C.decode_bmp(C.encode_bmp(img))
        assert out[0].min() == 255 and out[1:].max() == 0

    def test_channel_order(self):
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        img[:, :, 0] = 200        # red
        raw = C.encode_bmp(img)
        # pixel data starts at 54; BGR on disk -> blue byte first
        assert raw[54] == 0 and raw[56] == 200
        assert np.array_equal(C.decode_bmp(raw), img)

    def test_rejects_garbage_and_compressed(self):
        with pytest.raises(ValueError):
            C.decode_bmp(b"JFIF....")
        img = C.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
        hacked = bytearray(img)
        struct.pack_into("<I", hacked, 30, 1)       # BI_RLE8
        with pytest.raises(NotImplementedError):
            C.decode_bmp(bytes(hacked))


class TestWAV:
    def test_roundtrip(self):
        s = (np.sin(np.arange(777) / 5.0) * 12345).astype(np.int16)
        rate, out = C.decode_wav(C.encode_wav(s, rate=22050))
        assert rate == 22050
        assert np.array_equal(out, s)

    def test_chunk_walk_tolerates_extra_chunks(self):
        s = np.array([1, -2, 3], dtype=np.int16)
        raw = bytearray(C.encode_wav(s))
        # splice a LIST chunk between fmt and data
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = bytes(raw[:36]) + extra + bytes(raw[36:])
        spliced = bytearray(spliced)
        struct.pack_into("<I", spliced, 4, len(spliced) - 8)
        rate, out = C.decode_wav(bytes(spliced))
        assert rate == C.WAV_RATE and np.array_equal(out, s)

    def test_rejects_non_pcm16(self):
        s = np.array([0], dtype=np.int16)
        raw = bytearray(C.encode_wav(s))
        struct.pack_into("<H", raw, 34, 8)          # bits=8
        with pytest.raises(NotImplementedError):
            C.decode_wav(bytes(raw))


class TestVideoContainer:
    def test_split_and_decode(self):
        frames = [C.synth_image(11, f) for f in range(3)]
        payload = C.encode_bmp_seq(frames)
        parts = C.split_bmp_seq(payload)
        assert len(parts) == 3
        assert b"".join(parts) == payload
        for p, f in zip(parts, frames):
            assert np.array_equal(C.decode_bmp(p), f)

    def test_bad_container(self):
        with pytest.raises(ValueError):
            C.split_bmp_seq(b"BMxx")


class TestResize:
    def test_golden_floor_mapping(self):
        # 4x4 quadrant image -> 2x2 picks the floor (top-left) corners
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[:2, 2:] = 10
        img[2:, :2] = 20
        img[2:, 2:] = 30
        out = C.resize_nearest(img, 2, 2)
        assert out[0, 0].tolist() == [0, 0, 0]
        assert out[0, 1].tolist() == [10, 10, 10]
        assert out[1, 0].tolist() == [20, 20, 20]
        assert out[1, 1].tolist() == [30, 30, 30]

    def test_upscale_repeats(self):
        img = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)  # 1x2
        out = C.resize_nearest(img, 4, 2)
        assert out.shape == (2, 4, 3)
        assert np.array_equal(out[0], out[1])
        assert out[0, 0].tolist() == [1, 2, 3]
        assert out[0, 2].tolist() == [4, 5, 6]

    def test_two_tone_resize_row_split(self):
        # every synth height 16..28 maps exactly 4 of 8 target rows to
        # the top color — the closed form the DuckDB twin relies on
        for i in range(0, 120, 3):
            img = C.synth_image(i)
            out = C.resize_nearest(img, 8, 8)
            p = C.synth_image_params(i)
            assert (out[:4] == np.array(p["a"], dtype=np.uint8)).all()
            assert (out[4:] == np.array(p["b"], dtype=np.uint8)).all()


class TestFeatureExtractors:
    def test_image_features_known_pixels(self):
        img = np.zeros((4, 2, 3), dtype=np.uint8)
        img[:2] = (10, 20, 30)                      # top half
        img[2:] = (50, 60, 70)                      # bottom half
        f = MM._image_features(img)
        assert f == [2.0, 4.0,
                     2 * 2 * 10 + 2 * 2 * 50, 2 * 2 * 20 + 2 * 2 * 60,
                     2 * 2 * 30 + 2 * 2 * 70,
                     2 * 2 * (10 + 20 + 30), 2 * 2 * (50 + 60 + 70),
                     70 - 10]

    def test_audio_features_square_pulse(self):
        s = np.array([100, 100, -100, -100], dtype=np.int16)
        f = MM._audio_features(8000, s)
        assert f == [8000.0, 4.0, 0.0, 400.0, 100.0, -100.0, 1.0, 0.0]

    def test_synth_features_match_sql_closed_form(self):
        import duckdb
        ids = list(range(60))
        got = []
        for i in ids:
            mime, payload, _ = C.synth_payload(i)
            f = MM._decode_features(mime, payload, decode_stub=False)
            got.append((i, C.synth_kind(i), len(payload),
                        [int(x) for x in f]))
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(range(60)) AS doc_id")
        want = con.execute(
            MM.media_features_sql("t") + " ORDER BY media_id").fetchall()
        for (i, kind, nb, f), w in zip(got, want):
            assert (w[0], w[1], w[2]) == (i, kind, nb)
            assert list(w[3:]) == f
