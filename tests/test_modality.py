"""Multimodal column tests: magic-byte sniffing goldens, header
parsing, conditional byte views, and the decode-stage plumbing."""

import struct

import pytest
from pyspark.sql import functions as F

from mofka_spark.functions.views import DataDescriptor
from mofka_spark.operators import modality


def _png(w, h, body=b"x" * 20):
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + body
    )


def _gif(w, h, body=b"y" * 10):
    return b"GIF89a" + struct.pack("<HH", w, h) + body


def _wav(channels, rate, body=b"z" * 8):
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVEfmt "
        + struct.pack("<I", 16)
        + struct.pack("<HH", 1, channels)
        + struct.pack("<I", rate)
        + body
    )


GOLDENS = [
    (_png(640, 480), "png", "image"),
    (b"\xff\xd8\xff\xe0JFIF", "jpeg", "image"),
    (_gif(320, 200), "gif", "image"),
    (_wav(2, 44100), "wav", "audio"),
    (b"RIFF\x00\x00\x00\x00WEBPVP8 ", "webp", "image"),
    (b"RIFF\x00\x00\x00\x00AVI LIST", "avi", "video"),
    (b"\x00\x00\x00\x18ftypmp42", "mp4", "video"),
    (b"%PDF-1.7\n", "pdf", "document"),
    (b"ID3\x04\x00", "mp3", "audio"),
    (b"\x1f\x8b\x08\x00", "gzip", "archive"),
    (b"(\xb5/\xfdstuff", "zstd", "archive"),
    (b"plain text payload", "unknown", "unknown"),
]


class TestSniffing:
    def test_goldens(self, spark):
        df = spark.createDataFrame(
            [(i, payload) for i, (payload, _, _) in enumerate(GOLDENS)],
            ["doc_id", "data"],
        )
        typed = modality.with_modality(df)
        rows = {r.doc_id: (r.format, r.modality) for r in typed.collect()}
        for i, (_, fmt, mod) in enumerate(GOLDENS):
            assert rows[i] == (fmt, mod), f"golden {i}: {rows[i]} != {(fmt, mod)}"

    def test_null_payload(self, spark):
        df = spark.createDataFrame([(1, None)], "doc_id: long, data: binary")
        r = modality.with_modality(df).collect()[0]
        assert r.format is None and r.modality is None


class TestHeaderParsing:
    def test_png_gif_dims(self, spark):
        df = spark.createDataFrame(
            [(0, _png(1920, 1080)), (1, _gif(64, 33))], ["doc_id", "data"]
        )
        rows = {r.doc_id: (r.width, r.height) for r in modality.with_modality(df).collect()}
        assert rows[0] == (1920, 1080)
        assert rows[1] == (64, 33)

    def test_wav_audio_fields(self, spark):
        df = spark.createDataFrame([(0, _wav(2, 48000))], ["doc_id", "data"])
        r = modality.with_modality(df).collect()[0]
        assert (r.channels, r.sample_rate) == (2, 48000)
        assert r.width is None and r.height is None

    def test_jpeg_dims_null(self, spark):
        df = spark.createDataFrame([(0, b"\xff\xd8\xff\xe0JFIFxxxx")], ["doc_id", "data"])
        r = modality.with_modality(df).collect()[0]
        assert r.format == "jpeg" and r.width is None


class TestSelectByModality:
    def test_per_format_views(self, spark):
        df = spark.createDataFrame(
            [(0, _png(5, 6)), (1, _wav(1, 8000)), (2, b"raw-bytes-here")],
            ["doc_id", "data"],
        )
        ident = DataDescriptor.identity(1 << 20)
        sel = modality.select_by_modality(
            F.col("data"),
            modality.sniff_format(F.col("data")),
            {"png": ident.make_sub_view(16, 8), "wav": ident.make_sub_view(24, 4)},
        )
        rows = {r.doc_id: r.v for r in df.select("doc_id", sel.alias("v")).collect()}
        assert bytes(rows[0]) == struct.pack(">II", 5, 6)
        assert bytes(rows[1]) == struct.pack("<I", 8000)
        assert rows[2] is None  # no default -> unselected payloads are NULL

    def test_default_view(self, spark):
        df = spark.createDataFrame([(0, b"abcdefghij")], ["doc_id", "data"])
        ident = DataDescriptor.identity(1 << 20)
        sel = modality.select_by_modality(
            F.col("data"),
            modality.sniff_format(F.col("data")),
            {},
            default=ident.make_sub_view(0, 4),
        )
        assert bytes(df.select(sel.alias("v")).collect()[0].v) == b"abcd"


class TestDecodePlumbing:
    def test_fake_decode_schema_and_values(self, spark):
        df = spark.createDataFrame(
            [(7, _png(12, 34)), (8, _gif(5, 9)), (9, b"other")], ["doc_id", "data"]
        )
        out = modality.decode_image_features(df)
        assert out.schema == modality.DECODED_SCHEMA
        rows = {r.doc_id: r for r in out.collect()}
        assert (rows[7].format, rows[7].width, rows[7].height) == ("png", 12, 34)
        assert (rows[8].format, rows[8].width, rows[8].height) == ("gif", 5, 9)
        assert rows[9].format == "unknown" and rows[9].width is None
        # deterministic fake luma
        expected = modality._fake_decode(_png(12, 34))
        assert abs(rows[7].mean_luma - expected) < 1e-12

    def test_custom_decoder(self, spark):
        df = spark.createDataFrame([(1, b"abc")], ["doc_id", "data"])
        out = modality.decode_image_features(df, decoder=lambda b: 0.5).collect()
        assert out[0].mean_luma == 0.5

    def test_column_pruning_to_python(self, spark):
        # only (doc_id, data) may flow into the Python stage even when
        # the input frame is wide
        df = spark.createDataFrame(
            [(1, b"abc", "noise", 42)], ["doc_id", "data", "extra1", "extra2"]
        )
        out = modality.decode_image_features(df)
        assert set(out.columns) == {"doc_id", "format", "width", "height", "mean_luma"}


class TestSyntheticPayload:
    def test_round_trip_consistency(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
        typed = modality.with_modality(modality.synthetic_payload(docs))
        for r in typed.collect():
            m = r.doc_id % 4
            expect = {0: "png", 1: "wav", 2: "gif", 3: "unknown"}[m]
            assert r.format == expect, (r.doc_id, r.format)
            if m == 0:
                assert r.width == r.n_chars % 512 + 16
                assert r.height == (r.doc_id * 7) % 512 + 16
            if m == 1:
                assert r.sample_rate in (8000, 16000, 44100)
                assert r.channels == r.doc_id % 2 + 1


class TestDecodeEmbeddings:
    def test_formula_and_shape(self, spark):
        from mofka_spark.operators.modality import decode_embeddings

        df = spark.createDataFrame(
            [(3, b"abcdef"), (7, None)], "doc_id long, data binary"
        )
        out = {r.vec_id: r.embedding for r in decode_embeddings(df, dim=4).collect()}
        assert set(out) == {3, 7}
        for d, n in ((3, 6), (7, 0)):
            exp = [
                ((d * 1315423911 + i * 2654435761 + n) % 1000003) / 1000003.0
                for i in range(4)
            ]
            assert out[d] == pytest.approx(exp, abs=0)


class TestResizeImages:
    def test_header_patched_body_kept(self, spark):
        from mofka_spark.operators import modality

        docs = spark.createDataFrame(
            [(0, "pngbody", 100), (2, "gifbody", 100), (3, "rawbody", 100)],
            ["doc_id", "text", "n_chars"],
        )
        payloads = modality.synthetic_payload(docs).select("doc_id", "data")
        out = {r.doc_id: r for r in modality.resize_images(payloads, 7, 9).collect()}
        # raw payload (doc 3) dropped; images resized
        assert set(out) == {0, 2}
        png = bytes(out[0].data)
        assert png[16:20] == (7).to_bytes(4, "big")
        assert png[20:24] == (9).to_bytes(4, "big")
        assert png.endswith(b"pngbody")
        gif = bytes(out[2].data)
        assert gif[6:8] == (7).to_bytes(2, "little")
        assert gif[8:10] == (9).to_bytes(2, "little")
        assert gif.endswith(b"gifbody")
        assert all(
            (r.width, r.height, r.format in ("png", "gif")) == (7, 9, True)
            for r in out.values()
        )

    def test_fail_loud_without_fake(self, spark):
        import pytest

        from mofka_spark.operators import modality

        df = spark.createDataFrame([(1, b"x")], ["doc_id", "data"])
        with pytest.raises(NotImplementedError):
            modality.resize_images(df, 1, 1, allow_fake=False)


class TestSampleFrames:
    def test_stride_and_partial_tail(self, spark):
        from mofka_spark.operators import modality

        # 8-byte header + 20-byte body, frames of 8 -> idx 0,1,2
        # (last frame is the 4-byte tail); every=2 keeps 0 and 2
        payload = b"HDRHDRHD" + b"A" * 8 + b"B" * 8 + b"C" * 4
        df = spark.createDataFrame([(5, payload)], ["doc_id", "data"])
        out = {
            r.frame_idx: bytes(r.frame)
            for r in modality.sample_frames(df, frame_bytes=8, every=2).collect()
        }
        assert out == {0: b"A" * 8, 2: b"C" * 4}

    def test_invalid_params(self, spark):
        import pytest

        from mofka_spark.operators import modality

        df = spark.createDataFrame([(1, b"x")], ["doc_id", "data"])
        with pytest.raises(ValueError):
            modality.sample_frames(df, frame_bytes=0)
