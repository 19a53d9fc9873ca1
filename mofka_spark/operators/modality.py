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
    """WAV fmt-chunk channel count (bytes 23-24 LE, canonical layout)."""
    return F.when(fmt == "wav", le_uint(data, 23, 2)).otherwise(
        F.lit(None).cast("long")
    )


def audio_sample_rate(data: Column, fmt: Column) -> Column:
    """WAV fmt-chunk sample rate (bytes 25-28 LE, canonical layout)."""
    return F.when(fmt == "wav", le_uint(data, 25, 4)).otherwise(
        F.lit(None).cast("long")
    )


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
