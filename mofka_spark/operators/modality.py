"""Multimodal columns: typed operations over opaque binary payloads.

The engine stores event payloads as opaque bytes (``data: BinaryType``,
SURVEY.md §1.1 — the reference's Data is an untyped byte blob,
/root/reference/tests/MofkaDataSelectionTest.cpp:42-52). A training-data
pipeline needs to treat those bytes as typed media: sniff the container
format, read header metadata (dimensions, sample rate) WITHOUT decoding,
filter/route per modality, and only then hand selected payloads to a
(heavy, Python-side) decoder.

Everything up to decoding is pure Column expressions over byte slices —
format sniffing and header parsing are substring/hex/conv compositions,
so they run JVM-side inside whole-stage codegen and cost one projection.
Decoding itself (decode_image_features) is the documented Python
boundary: an Arrow-batched mapInPandas whose real decoder is stubbed
(this environment has no image/audio libraries) behind a deterministic
fake — the Spark-side plumbing (schema, batch shape, column pruning) is
real and tested.

Scale notes: the sniff/parse projection reads only the first ~32 bytes
of each payload cell; Parquet column pruning means queries not touching
``data`` never read it at all (the columnar analog of the reference's
deferred payload fetch, SURVEY.md §4). Per-modality routing predicates
are plain filters, so partition/row-group pruning applies when payloads
are stored bucketed by modality.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from mofka_spark.functions.views import DataDescriptor

# -- byte-level helpers (pure expressions) ----------------------------------


def be_uint(data: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from bytes [pos, pos+nbytes), 1-based."""
    return F.conv(F.hex(F.substring(data, pos, nbytes)), 16, 10).cast("long")


def le_uint(data: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned int from bytes [pos, pos+nbytes), 1-based.
    hex() of binary is byte-wise (always two chars per byte), so
    reversing per-byte hex pairs reverses the byte order."""
    parts = [F.hex(F.substring(data, pos + i, 1)) for i in range(nbytes - 1, -1, -1)]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


def _magic(data: Column, pos: int, hexstr: str) -> Column:
    return F.hex(F.substring(data, pos, len(hexstr) // 2)) == hexstr.upper()


# -- format sniffing ---------------------------------------------------------

# format -> modality routing table
MODALITY_OF = {
    "png": "image",
    "jpeg": "image",
    "gif": "image",
    "webp": "image",
    "wav": "audio",
    "mp3": "audio",
    "avi": "video",
    "mp4": "video",
    "pdf": "document",
    "gzip": "archive",
    "zstd": "archive",
}


def sniff_format(data: Column) -> Column:
    """Container format from magic bytes; 'unknown' when unrecognized.

    One projection over the payload's first 12 bytes — the sniffing
    analog of `file(1)`. NULL payloads sniff to NULL."""
    riff = _magic(data, 1, "52494646")  # "RIFF"
    return (
        F.when(data.isNull(), F.lit(None).cast("string"))
        .when(_magic(data, 1, "89504E470D0A1A0A"), "png")
        .when(_magic(data, 1, "FFD8FF"), "jpeg")
        .when(_magic(data, 1, "474946383761") | _magic(data, 1, "474946383961"), "gif")
        .when(riff & _magic(data, 9, "57415645"), "wav")  # "WAVE"
        .when(riff & _magic(data, 9, "41564920"), "avi")  # "AVI "
        .when(riff & _magic(data, 9, "57454250"), "webp")  # "WEBP"
        .when(_magic(data, 5, "66747970"), "mp4")  # "ftyp" at offset 4
        .when(_magic(data, 1, "25504446"), "pdf")  # "%PDF"
        .when(_magic(data, 1, "494433") | _magic(data, 1, "FFFB"), "mp3")
        .when(_magic(data, 1, "1F8B"), "gzip")
        .when(_magic(data, 1, "28B52FFD"), "zstd")
        .otherwise("unknown")
    )


def modality_of(format_col: Column) -> Column:
    """Route a sniffed format to its modality class."""
    mapping = F.create_map(
        *[F.lit(x) for kv in MODALITY_OF.items() for x in kv]
    )
    return F.when(format_col.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(mapping[format_col], F.lit("unknown"))
    )


# -- header metadata (no decode) --------------------------------------------


def image_width(data: Column, fmt: Column) -> Column:
    """Pixel width from the container header. PNG: IHDR bytes 17-20 BE;
    GIF: logical-screen bytes 7-8 LE. JPEG needs a marker scan (not a
    fixed offset) — NULL here; decode_image_features covers it."""
    return (
        F.when(fmt == "png", be_uint(data, 17, 4))
        .when(fmt == "gif", le_uint(data, 7, 2))
        .otherwise(F.lit(None).cast("long"))
    )


def image_height(data: Column, fmt: Column) -> Column:
    return (
        F.when(fmt == "png", be_uint(data, 21, 4))
        .when(fmt == "gif", le_uint(data, 9, 2))
        .otherwise(F.lit(None).cast("long"))
    )


def audio_channels(data: Column, fmt: Column) -> Column:
    """Channel count: WAV fmt-chunk (bytes 23-24 LE, canonical
    layout); MP3 from the frame header's mode field (raw-sync or
    ID3v2-prefixed, MPEG1 Layer III)."""
    return (
        F.when(fmt == "wav", le_uint(data, 23, 2))
        .when(fmt == "mp3", mp3_channels(data))
        .otherwise(F.lit(None).cast("long"))
    )


def audio_sample_rate(data: Column, fmt: Column) -> Column:
    """Sample rate: WAV fmt-chunk (bytes 25-28 LE, canonical layout);
    MP3 from the frame header's rate index (MPEG1 Layer III)."""
    return (
        F.when(fmt == "wav", le_uint(data, 25, 4))
        .when(fmt == "mp3", mp3_sample_rate(data))
        .otherwise(F.lit(None).cast("long"))
    )


# MPEG1 Layer III tables (the public MPEG frame-header layout):
# bitrate index -> kbps (0 = free, 15 = bad), sample-rate index -> Hz.
_MP3_BITRATE_KBPS = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0,
]
_MP3_RATE_HZ = [44100, 48000, 32000, 0]


def _mp3_frame_pos(data: Column) -> Column:
    """1-based position of the first MPEG frame header: byte 1 for a
    raw sync stream; after the ID3v2 tag otherwise (tag length is the
    synchsafe 28-bit size at bytes 7-10, plus the 10-byte tag
    header)."""
    b = [be_uint(data, i, 1) for i in (7, 8, 9, 10)]
    synchsafe = (
        b[0].bitwiseAND(F.lit(127)) * 2097152
        + b[1].bitwiseAND(F.lit(127)) * 16384
        + b[2].bitwiseAND(F.lit(127)) * 128
        + b[3].bitwiseAND(F.lit(127))
    )
    return F.when(
        _magic(data, 1, "494433"), (synchsafe + 11).cast("int")
    ).otherwise(F.lit(1))


def _mp3_header_byte(data: Column, offset: int) -> Column:
    """The (frame_pos + offset)'th byte as an unsigned int — dynamic
    position, so the same expression reads raw streams and
    ID3-prefixed files."""
    pos = _mp3_frame_pos(data) + F.lit(offset)
    return F.conv(F.hex(F.substring(data, pos, F.lit(1))), 16, 10).cast("long")


def _idx_lookup(idx: Column, table: list[int]) -> Column:
    arr = F.array(*[F.lit(v).cast("long") for v in table])
    return F.element_at(arr, (idx + 1).cast("int"))


def audio_bits_per_sample(data: Column, fmt: Column) -> Column:
    """WAV fmt-chunk bits per sample (bytes 35-36 LE, canonical
    44-byte PCM layout). NULL for other formats (MP3 is lossy —
    no PCM bit depth in the container)."""
    return F.when(fmt == "wav", le_uint(data, 35, 2)).otherwise(
        F.lit(None).cast("long")
    )


def audio_byte_rate(data: Column, fmt: Column) -> Column:
    """Average bytes/second: WAV fmt-chunk byte rate (bytes 29-32 LE);
    MP3 from the frame header's bitrate index (MPEG1 Layer III
    table), raw-sync or ID3v2-prefixed."""
    mp3_b3 = _mp3_header_byte(data, 2)
    kbps = _idx_lookup(
        F.shiftright(mp3_b3, 4).bitwiseAND(F.lit(15)), _MP3_BITRATE_KBPS
    )
    return (
        F.when(fmt == "wav", le_uint(data, 29, 4))
        .when(fmt == "mp3", (kbps * 1000 / 8).cast("long"))
        .otherwise(F.lit(None).cast("long"))
    )


def mp3_sample_rate(data: Column) -> Column:
    """Sample rate from the MPEG frame header's rate index."""
    b3 = _mp3_header_byte(data, 2)
    return _idx_lookup(F.shiftright(b3, 2).bitwiseAND(F.lit(3)), _MP3_RATE_HZ)


def mp3_channels(data: Column) -> Column:
    """Channel count from the MPEG frame header's mode field (mode 3 =
    single channel; stereo/joint/dual otherwise)."""
    mode = F.shiftright(_mp3_header_byte(data, 3), 6).bitwiseAND(F.lit(3))
    return F.when(mode == 3, F.lit(1)).otherwise(F.lit(2)).cast("long")


def audio_duration_ms(data: Column, fmt: Column) -> Column:
    """Duration ESTIMATE in ms, header-only (no decode): WAV = data
    chunk size (bytes 41-44 LE, canonical layout) over the byte rate;
    MP3 = audio bytes (payload minus any ID3v2 tag) over the
    frame-header byte rate — exact for CBR, the standard header-only
    estimate for VBR. Rounded to a whole ms; NULL when the byte rate
    is missing/zero."""
    rate = audio_byte_rate(data, fmt)
    wav_bytes = le_uint(data, 41, 4)
    mp3_bytes = (
        F.octet_length(data) - (_mp3_frame_pos(data) - F.lit(1))
    ).cast("long")
    nbytes = F.when(fmt == "wav", wav_bytes).when(fmt == "mp3", mp3_bytes)
    return F.when(
        rate > 0, F.round(nbytes * 1000.0 / rate).cast("long")
    ).otherwise(F.lit(None).cast("long"))


def with_modality(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Attach typed-media columns: format, modality, n_bytes, and
    header-derived width/height/channels/sample_rate (NULL where the
    format doesn't carry them)."""
    d = F.col(data_col)
    fmt = sniff_format(d)
    df = df.withColumn("format", fmt)
    f = F.col("format")
    return (
        df.withColumn("modality", modality_of(f))
        .withColumn("n_bytes", F.octet_length(d).cast("long"))
        .withColumn("width", image_width(d, f))
        .withColumn("height", image_height(d, f))
        .withColumn("channels", audio_channels(d, f))
        .withColumn("sample_rate", audio_sample_rate(d, f))
    )


def modality_stats(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Corpus-level stats per (modality, format): counts, byte volume,
    average header dimensions. One scan + one small-key shuffle."""
    typed = with_modality(df, data_col)
    return typed.groupBy("modality", "format").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("width"), 2).alias("avg_width"),
        F.round(F.avg("height"), 2).alias("avg_height"),
        F.round(F.avg("sample_rate"), 2).alias("avg_sample_rate"),
    )


# -- modality-conditional byte views ----------------------------------------


def select_by_modality(
    data: Column,
    fmt: Column,
    views: dict[str, DataDescriptor],
    default: DataDescriptor | None = None,
) -> Column:
    """Per-row conditional byte view keyed on sniffed format — the
    multimodal form of the reference's DataSelector (C3,
    /root/reference/src/MofkaConsumer.cpp:240-248): each event decides,
    from its own metadata (here: its format), which byte range to
    materialize. Compiles to one when/otherwise chain of slice
    expressions; unselected payloads contribute NULL and are never
    moved."""
    expr = None
    for name, desc in views.items():
        clause = desc.to_column(data)
        expr = (
            F.when(fmt == name, clause)
            if expr is None
            else expr.when(fmt == name, clause)
        )
    fallback = (
        default.to_column(data) if default is not None else F.lit(None).cast("binary")
    )
    return expr.otherwise(fallback) if expr is not None else fallback


# -- the Python decode boundary (stubbed) ------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _fake_decode(payload: bytes) -> float:
    """Deterministic stand-in for pixel decoding: mean of the first 256
    payload bytes scaled to [0,1]. NOT a real luma — a placeholder that
    keeps the pipeline testable in an environment without codecs."""
    head = payload[:256]
    return (sum(head) / len(head)) / 255.0 if head else 0.0


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    data_col: str = "data",
    decoder: Callable[[bytes], float] | None = None,
    allow_fake: bool = True,
) -> DataFrame:
    """Decode-stage plumbing: Arrow-batched mapInPandas over (id, data).

    The real decoder would be PIL/libvips here; this container has no
    image libraries, so by default a clearly-marked deterministic fake
    (_fake_decode) substitutes for pixel work. Pass ``decoder`` to plug
    a real one; set allow_fake=False to fail loudly instead of faking.

    The Spark-side shape is the production one: only (id, data) columns
    flow to Python (column pruning), batches arrive as Arrow record
    batches, output schema is fixed (DECODED_SCHEMA), and the stage
    parallelizes per input partition."""
    if decoder is None:
        try:
            import PIL  # noqa: F401  (absent in this environment)

            raise NotImplementedError(
                "real image decoding is not wired up; pass decoder="
            )
        except ImportError:
            if not allow_fake:
                raise NotImplementedError(
                    "no image library available and allow_fake=False"
                ) from None
            decoder = _fake_decode

    narrow = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(data_col).alias("data")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["data"]
            fmts, widths, heights, lumas = [], [], [], []
            for raw in payloads:
                b = bytes(raw) if raw is not None else b""
                if b.startswith(b"\x89PNG\r\n\x1a\n"):
                    fmts.append("png")
                    widths.append(int.from_bytes(b[16:20], "big") if len(b) >= 20 else None)
                    heights.append(int.from_bytes(b[20:24], "big") if len(b) >= 24 else None)
                elif b.startswith(b"GIF8"):
                    fmts.append("gif")
                    widths.append(int.from_bytes(b[6:8], "little") if len(b) >= 8 else None)
                    heights.append(int.from_bytes(b[8:10], "little") if len(b) >= 10 else None)
                else:
                    fmts.append("unknown")
                    widths.append(None)
                    heights.append(None)
                lumas.append(decoder(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmts,
                    "width": pd.array(widths, dtype="Int64"),
                    "height": pd.array(heights, dtype="Int64"),
                    "mean_luma": lumas,
                }
            )

    return narrow.mapInPandas(run, DECODED_SCHEMA)


# -- synthetic payloads (fixture: testdata has no binary column) -------------


def synthetic_payload(docs: DataFrame) -> DataFrame:
    """Deterministic binary payloads over the documents table, cycling
    doc_id % 4 through png / wav / gif / raw-utf8. Header fields derive
    from (doc_id, n_chars) so an external oracle can compute the
    expected metadata without parsing bytes. Used by the modality
    queries and tests; a real deployment ingests payloads via the
    event data column."""
    d = F.col("doc_id")
    body = F.encode("text", "UTF-8")

    def be4(col: Column) -> Column:
        return F.unhex(F.lpad(F.hex(col.cast("bigint")), 8, "0"))

    def le(col: Column, nbytes: int) -> Column:
        parts = [
            F.unhex(
                F.lpad(
                    F.hex(
                        F.shiftrightunsigned(col.cast("bigint"), 8 * i).bitwiseAND(255)
                    ),
                    2,
                    "0",
                )
            )
            for i in range(nbytes)
        ]
        return F.concat(*parts)

    width = (F.col("n_chars") % 512 + 16).cast("bigint")
    height = ((d * 7) % 512 + 16).cast("bigint")
    rate = F.array(F.lit(8000), F.lit(16000), F.lit(44100))[(d % 3).cast("int")].cast(
        "bigint"
    )
    chans = (d % 2 + 1).cast("bigint")

    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
        be4(width),
        be4(height),
        body,
    )
    wav = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        le(F.octet_length("text").cast("bigint") + 36, 4),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le(F.lit(16).cast("bigint"), 4),
        le(F.lit(1).cast("bigint"), 2),
        le(chans, 2),
        le(rate, 4),
        body,
    )
    gif = F.concat(
        F.encode(F.lit("GIF89a"), "UTF-8"), le(width, 2), le(height, 2), body
    )
    # raw-text branch: an 8-byte "RAWTEXT\0" prefix makes the sniff
    # result deterministic regardless of text content — every magic
    # probe reads within bytes 1-8 (or requires RIFF first), so text
    # that happens to begin with "GIF89a"/"%PDF"/"ID3"/... can no
    # longer masquerade as a container and diverge from the oracle's
    # doc_id%4-based expectation
    raw = F.concat(F.unhex(F.lit("5241575445585400")), body)
    payload = (
        F.when(d % 4 == 0, png)
        .when(d % 4 == 1, wav)
        .when(d % 4 == 2, gif)
        .otherwise(raw)
    )
    return docs.withColumn("data", payload)


def synthetic_audio_payload(docs: DataFrame) -> DataFrame:
    """Deterministic AUDIO payloads over the documents table: canonical
    44-byte-header PCM WAV for even doc_ids, MPEG1-Layer-III MP3 (raw
    sync frame; every 4th an ID3v2-prefixed one) for odd. All header
    fields derive from (doc_id, n_chars) so an external oracle computes
    the expected metadata without parsing bytes:

    - wav: channels = doc_id%2+1 (=1 here), rate = [8000,16000,44100]
      [doc_id%3], bits = 16, byte_rate = rate*channels*2, data size =
      octet_length(text)
    - mp3: rate index = doc_id%3 -> [44100,48000,32000], bitrate index
      = doc_id%4+8 -> [112,128,160,192] kbps, mode = 3 (mono) when
      doc_id%8 < 4 else 0 (stereo)
    """
    d = F.col("doc_id")
    body = F.encode("text", "UTF-8")

    def le(col: Column, nbytes: int) -> Column:
        parts = [
            F.unhex(
                F.lpad(
                    F.hex(
                        F.shiftrightunsigned(col.cast("bigint"), 8 * i).bitwiseAND(255)
                    ),
                    2,
                    "0",
                )
            )
            for i in range(nbytes)
        ]
        return F.concat(*parts)

    rate = F.array(F.lit(8000), F.lit(16000), F.lit(44100))[
        (d % 3).cast("int")
    ].cast("bigint")
    chans = (d % 2 + 1).cast("bigint")  # even ids -> 1 channel
    bits = F.lit(16).cast("bigint")
    byte_rate = (rate * chans * 2).cast("bigint")
    block_align = (chans * 2).cast("bigint")
    dsize = F.octet_length("text").cast("bigint")
    wav = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        le(dsize + 36, 4),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le(F.lit(16).cast("bigint"), 4),
        le(F.lit(1).cast("bigint"), 2),   # PCM
        le(chans, 2),
        le(rate, 4),
        le(byte_rate, 4),
        le(block_align, 2),
        le(bits, 2),
        F.encode(F.lit("data"), "UTF-8"),
        le(dsize, 4),
        body,
    )
    # MPEG frame header: FF FB | bitrate_idx<<4 | rate_idx<<2 | mode<<6
    bidx = (d % 4 + 8).cast("bigint")
    ridx = (d % 3).cast("bigint")
    mode = F.when(d % 8 < 4, F.lit(3)).otherwise(F.lit(0)).cast("bigint")
    b3 = F.shiftleft(bidx, 4) + F.shiftleft(ridx, 2)
    b4 = F.shiftleft(mode, 6)
    frame = F.concat(
        F.unhex(F.lit("FFFB")), le_byte(b3), le_byte(b4), body
    )
    # every 4th odd doc gets an ID3v2 tag (version 4.0, flags 0, a
    # 64-byte synchsafe-encoded tag body of zeros) before the frame
    id3 = F.concat(
        F.encode(F.lit("ID3"), "UTF-8"),
        F.unhex(F.lit("0400" + "00" + "00000040")),  # v2.4, size=64
        F.unhex(F.lit("00" * 64)),
        frame,
    )
    mp3 = F.when(d % 8 == 1, id3).otherwise(frame)
    payload = F.when(d % 2 == 0, wav).otherwise(mp3)
    return docs.withColumn("data", payload)


def le_byte(col: Column) -> Column:
    """One byte from the low 8 bits of an integral Column."""
    return F.unhex(F.lpad(F.hex(col.bitwiseAND(F.lit(255))), 2, "0"))


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def resample_audio(
    df: DataFrame,
    target_rate: int,
    id_col: str = "doc_id",
    data_col: str = "data",
    resampler: Callable[[bytes, int], bytes] | None = None,
    allow_fake: bool = True,
) -> DataFrame:
    """Resample-stage plumbing on the resize_images injection pattern:
    Arrow-batched mapInPandas over (id, data) emitting WAV rows at the
    target sample rate.

    The real PCM resample would be soxr/librosa via ``resampler``;
    this container has none, so the default fake patches the canonical
    WAV header's sample-rate (25-28 LE) and byte-rate (29-32 LE)
    fields to the target and keeps the body bytes — deterministic,
    oracle-checkable, and shaped exactly like production: (id, data)
    column pruning, fixed output schema, pure map stage, non-WAV rows
    dropped in Python (MP3 resampling requires a full decode — out of
    scope for the header-stage fake). Set allow_fake=False to fail
    loudly instead of faking."""
    if resampler is None and not allow_fake:
        raise NotImplementedError(
            "no audio library available and allow_fake=False"
        )
    narrow = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(data_col).alias("data"),
    )
    tr = int(target_rate)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, datas = [], []
            for i, raw in zip(pdf["doc_id"], pdf["data"]):
                b = bytes(raw) if raw is not None else b""
                if not (
                    b.startswith(b"RIFF") and b[8:12] == b"WAVE" and len(b) >= 44
                ):
                    continue  # not a canonical WAV payload
                if resampler is not None:
                    out = resampler(b, tr)
                else:
                    chans = int.from_bytes(b[22:24], "little")
                    bits = int.from_bytes(b[34:36], "little") or 16
                    brate = tr * chans * (bits // 8)
                    out = (
                        b[:24]
                        + tr.to_bytes(4, "little")
                        + brate.to_bytes(4, "little")
                        + b[32:]
                    )
                ids.append(int(i))
                datas.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "format": ["wav"] * len(ids),
                    "sample_rate": pd.array([tr] * len(ids), dtype="int64"),
                    "data": datas,
                }
            )

    return narrow.mapInPandas(run, RESAMPLED_SCHEMA)


# -- payload -> embedding extraction (stubbed encoder) -----------------------


def decode_embeddings(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """Embedding-extraction plumbing: Arrow-batched mapInPandas from the
    opaque payload column to a dense vector, the stage that would run a
    real image/audio/text encoder at 100 TB (the encoder itself is a
    deterministic stand-in — this container ships no model runtimes).

    Stand-in encoder: component i of doc d with an n-byte payload is
      ((d * 1315423911 + i * 2654435761 + n) % 1000003) / 1000003.0
    — pure integer math, so an external oracle reproduces the exact
    doubles and downstream similarity results are fully checkable.

    Spark-side shape (the part that IS production-real): only
    (id, data) flow to Python (column pruning), batches arrive as Arrow
    record batches sized by spark.sql.execution.arrow.maxRecordsPerBatch,
    output is (vec_id, embedding: array<double>) ready for the
    similarity.py operators, and the stage is a pure map — no shuffle;
    a real encoder slots in by replacing _encode only."""
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    narrow = df.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(data_col).alias("data")
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        idx = np.arange(dim, dtype=np.int64)
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            nbytes = np.fromiter(
                (len(b) if b is not None else 0 for b in pdf["data"]),
                dtype=np.int64,
                count=len(pdf),
            )
            base = ids[:, None] * 1315423911 + idx[None, :] * 2654435761
            vecs = ((base + nbytes[:, None]) % 1000003) / 1000003.0
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(vecs)}
            )

    return narrow.mapInPandas(run, out_schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    data_col: str = "data",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    allow_fake: bool = True,
) -> DataFrame:
    """Resize-stage plumbing (brief: decode / feature-extract / RESIZE /
    frame-sample): Arrow-batched mapInPandas over (id, data) emitting
    the image rows with target dimensions and a rewritten payload.

    The real pixel resample would be PIL/libvips via ``resizer``; this
    container has none, so the default fake patches the TARGET
    dimensions into a rewritten header (png big-endian at 16/20, gif
    little-endian at 6/8) and keeps the body bytes — deterministic,
    oracle-checkable, and shaped exactly like production: (id, data)
    column pruning, fixed output schema, pure map stage, non-image
    rows dropped in Python (cheap per-batch predicate, no second scan).
    Set allow_fake=False to fail loudly instead of faking."""
    if resizer is None and not allow_fake:
        raise NotImplementedError(
            "no image library available and allow_fake=False"
        )
    narrow = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(data_col).alias("data"),
    )
    tw, th = int(target_w), int(target_h)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, fmts, datas = [], [], []
            for i, raw in zip(pdf["doc_id"], pdf["data"]):
                b = bytes(raw) if raw is not None else b""
                if b.startswith(b"\x89PNG\r\n\x1a\n") and len(b) >= 24:
                    if resizer is not None:
                        out = resizer(b, tw, th)
                    else:
                        out = (
                            b[:16]
                            + tw.to_bytes(4, "big")
                            + th.to_bytes(4, "big")
                            + b[24:]
                        )
                    fmts.append("png")
                elif b.startswith(b"GIF8") and len(b) >= 10:
                    if resizer is not None:
                        out = resizer(b, tw, th)
                    else:
                        out = (
                            b[:6]
                            + tw.to_bytes(2, "little")
                            + th.to_bytes(2, "little")
                            + b[10:]
                        )
                    fmts.append("gif")
                else:
                    continue  # not an image payload
                ids.append(int(i))
                datas.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "format": fmts,
                    "width": pd.array([tw] * len(ids), dtype="int64"),
                    "height": pd.array([th] * len(ids), dtype="int64"),
                    "data": datas,
                }
            )

    return narrow.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int,
    every: int = 1,
    header_skip: int = 8,
    id_col: str = "doc_id",
    data_col: str = "data",
) -> DataFrame:
    """Frame-sampling plumbing (brief: decode / feature-extract /
    resize / FRAME-SAMPLE): treat each payload's body (after a fixed
    ``header_skip``-byte container header) as a stream of
    ``frame_bytes``-sized frames and emit every ``every``-th one as its
    own row — the fan-out stage a video pipeline runs before per-frame
    feature extraction. A real demuxer (pyav/ffmpeg) would slot in
    here; the fixed-stride slicing is the deterministic stand-in, and
    the Spark-side shape is production-real: (id, data) column pruning,
    Arrow batches, a pure map stage whose output rows fan out per
    input row (flatMap shape, bounded by batch size), frame_idx
    preserving the source order. The trailing partial frame is kept
    when non-empty."""
    if frame_bytes <= 0 or every <= 0:
        raise ValueError("frame_bytes and every must be positive")
    narrow = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(data_col).alias("data"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, raw in zip(pdf["doc_id"], pdf["data"]):
                b = bytes(raw) if raw is not None else b""
                body = b[header_skip:]
                n = (len(body) + frame_bytes - 1) // frame_bytes
                for k in range(0, n, every):
                    ids.append(int(i))
                    idxs.append(k)
                    frames.append(body[k * frame_bytes:(k + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int64"),
                    "frame": frames,
                }
            )

    return narrow.mapInPandas(run, FRAME_SCHEMA)
