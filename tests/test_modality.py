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


class TestAudioHeaders:
    """WAV/MP3 header parsing as Column expressions (no decode) —
    golden hand-built payloads with independently computed fields."""

    @staticmethod
    def _wav(chans=2, rate=22050, bits=16, body=b"\x00" * 441):
        brate = rate * chans * (bits // 8)
        return (
            b"RIFF" + (36 + len(body)).to_bytes(4, "little")
            + b"WAVEfmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + chans.to_bytes(2, "little")
            + rate.to_bytes(4, "little") + brate.to_bytes(4, "little")
            + (chans * bits // 8).to_bytes(2, "little")
            + bits.to_bytes(2, "little")
            + b"data" + len(body).to_bytes(4, "little") + body
        )

    @staticmethod
    def _mp3(bidx=9, ridx=0, mono=True, body=b"\x00" * 100, id3_len=None):
        frame = bytes(
            [0xFF, 0xFB, (bidx << 4) | (ridx << 2), (3 if mono else 0) << 6]
        ) + body
        if id3_len is None:
            return frame
        return (
            b"ID3" + bytes([4, 0, 0])
            + bytes([
                (id3_len >> 21) & 127, (id3_len >> 14) & 127,
                (id3_len >> 7) & 127, id3_len & 127,
            ])
            + b"\x00" * id3_len + frame
        )

    def _parse(self, spark, payload):
        from pyspark.sql import functions as F

        from mofka_spark.operators import modality

        df = spark.createDataFrame([(1, payload)], ["doc_id", "data"])
        df = df.withColumn("f", modality.sniff_format(F.col("data")))
        d, f = F.col("data"), F.col("f")
        return df.select(
            "f",
            modality.audio_channels(d, f).alias("ch"),
            modality.audio_sample_rate(d, f).alias("rate"),
            modality.audio_bits_per_sample(d, f).alias("bits"),
            modality.audio_byte_rate(d, f).alias("brate"),
            modality.audio_duration_ms(d, f).alias("dur"),
        ).collect()[0]

    def test_wav_canonical_fields(self, spark):
        # 2ch 22050Hz 16-bit, 441-byte data chunk: byte rate 88200,
        # duration = 441/88200 s = 5 ms
        r = self._parse(spark, self._wav())
        assert (r.f, r.ch, r.rate, r.bits, r.brate, r.dur) == (
            "wav", 2, 22050, 16, 88200, 5,
        )

    def test_mp3_raw_sync(self, spark):
        # 128 kbps (idx 9), 44100 (idx 0), mono: byte rate 16000;
        # 104 payload bytes -> round(104*1000/16000) = 7 ms (6.5 up)
        r = self._parse(spark, self._mp3())
        assert (r.f, r.ch, r.rate, r.brate, r.dur) == (
            "mp3", 1, 44100, 16000, 7,
        )
        assert r.bits is None  # lossy container: no PCM bit depth

    def test_mp3_id3_prefixed(self, spark):
        # a 300-byte ID3v2 tag (multi-byte synchsafe size) must be
        # skipped: same frame fields, duration over frame+body only
        r = self._parse(
            spark,
            self._mp3(bidx=11, ridx=1, mono=False, id3_len=300),
        )
        # 192 kbps -> 24000 B/s; 104 audio bytes -> round(4.33) = 4
        assert (r.f, r.ch, r.rate, r.brate, r.dur) == (
            "mp3", 2, 48000, 24000, 4,
        )

    def test_synthetic_payload_roundtrip(self, spark):
        # the gate's generative formulas == the parsed bytes, both
        # modalities, including the ID3 variant (doc_id % 8 == 1)
        from pyspark.sql import functions as F

        from mofka_spark.operators import modality

        docs = spark.createDataFrame(
            [(i, "y" * (20 + i)) for i in range(16)],
            "doc_id long, text string",
        )
        p = modality.synthetic_audio_payload(docs)
        p = p.withColumn("f", modality.sniff_format(F.col("data")))
        d, f = F.col("data"), F.col("f")
        got = {
            r["doc_id"]: r
            for r in p.select(
                "doc_id", "f",
                modality.audio_channels(d, f).alias("ch"),
                modality.audio_sample_rate(d, f).alias("rate"),
            ).collect()
        }
        for i in range(16):
            if i % 2 == 0:
                assert got[i]["f"] == "wav"
                assert got[i]["rate"] == [8000, 16000, 44100][i % 3]
                assert got[i]["ch"] == i % 2 + 1
            else:
                assert got[i]["f"] == "mp3"
                assert got[i]["rate"] == [44100, 48000, 32000][i % 3]
                assert got[i]["ch"] == (1 if i % 8 < 4 else 2)


class TestResampleAudio:
    def test_fake_patches_rate_and_byte_rate(self, spark):
        from pyspark.sql import functions as F

        from mofka_spark.operators import modality

        wav = TestAudioHeaders._wav(chans=2, rate=44100)
        df = spark.createDataFrame(
            [(1, wav), (2, b"not audio"), (3, TestAudioHeaders._mp3())],
            ["doc_id", "data"],
        )
        out = modality.resample_audio(df, 16000)
        rows = out.collect()
        # only the WAV row survives (MP3 needs a real decode)
        assert [r.doc_id for r in rows] == [1]
        assert rows[0].sample_rate == 16000
        # the rewritten header re-parses to the target fields; body,
        # channels and bit depth untouched
        chk = out.withColumn("f", modality.sniff_format(F.col("data")))
        d, f = F.col("data"), F.col("f")
        r = chk.select(
            modality.audio_sample_rate(d, f).alias("rate"),
            modality.audio_byte_rate(d, f).alias("brate"),
            modality.audio_channels(d, f).alias("ch"),
            modality.audio_bits_per_sample(d, f).alias("bits"),
        ).collect()[0]
        assert (r.rate, r.brate, r.ch, r.bits) == (16000, 64000, 2, 16)
        assert bytes(rows[0].data)[44:] == wav[44:]

    def test_injected_resampler_used(self, spark):
        from mofka_spark.operators import modality

        wav = TestAudioHeaders._wav()
        df = spark.createDataFrame([(1, wav)], ["doc_id", "data"])
        out = modality.resample_audio(
            df, 8000, resampler=lambda b, r: b"RESAMPLED" + r.to_bytes(4, "little")
        ).collect()
        assert bytes(out[0].data) == b"RESAMPLED" + (8000).to_bytes(4, "little")

    def test_allow_fake_false_raises(self, spark):
        import pytest

        from mofka_spark.operators import modality

        df = spark.createDataFrame([(1, b"x")], ["doc_id", "data"])
        with pytest.raises(NotImplementedError):
            modality.resample_audio(df, 8000, allow_fake=False)
