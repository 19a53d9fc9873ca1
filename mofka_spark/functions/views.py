"""DataDescriptor view algebra -> Spark byte-slicing expressions.

Reference semantics (SURVEY.md §2.6, golden tests in
/root/reference/tests/MofkaDataSelectionTest.cpp):

- identity: whole payload (:73-96)
- null: no bytes (:57-71)
- makeSubView(offset, size): bytes [offset, offset+size) (:98-121)
- makeStridedView(offset, nblocks, blocksize, gap): nblocks blocks of
  blocksize bytes starting at offset, skipping gap bytes between blocks
  (:124-147)
- makeUnstructuredView([(off, size)...]): concat of arbitrary segments
  (:149-176)
- flatten(): any view -> ordered (offset, size) segment list — the
  normal form (/root/reference/src/DefaultPartitionManager.cpp:536-551,
  /root/reference/src/WarabiDataStore.hpp:135-139)
- views compose relative to the *selected* region of their parent
  descriptor (sub-of-sub re-bases offsets).

Spark-first design: every descriptor flattens to segments; a segment
list compiles to a single `concat(substring(...), ...)` Column — pure
JVM expressions inside WholeStageCodegen, no UDFs. The columnar reading
of *only* the data column when referenced + conditional projection
reproduces the reference's "deferred payload fetch" architecture
(/root/reference/docs/usage/architecture.rst:149-210) for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from mofka_spark.errors import InvalidViewError

Segment = tuple[int, int]  # (offset, size), offsets 0-based


@dataclass(frozen=True)
class DataDescriptor:
    """Immutable descriptor = ordered list of (offset, size) segments
    relative to the event's full payload. An empty segment list is the
    null descriptor (select no bytes)."""

    segments: tuple[Segment, ...] = field(default=())

    # -- constructors ------------------------------------------------------
    @staticmethod
    def null() -> "DataDescriptor":
        return DataDescriptor(())

    @staticmethod
    def identity(size: int | None = None) -> "DataDescriptor":
        """Whole payload. If size is unknown, use the WHOLE sentinel
        (-1 length segment meaning 'to end of payload')."""
        if size is None:
            return DataDescriptor(((0, -1),))
        return DataDescriptor(((0, size),))

    # -- view algebra (compose relative to the selected region) -----------
    def _selected_size(self) -> int:
        if any(s == -1 for _, s in self.segments):
            raise InvalidViewError(
                "cannot re-base a view on an unsized identity descriptor; "
                "construct with DataDescriptor.identity(size)"
            )
        return sum(s for _, s in self.segments)

    def _rebase(self, spans: list[Segment]) -> "DataDescriptor":
        """Map spans expressed in *selected-region* coordinates back to
        payload coordinates through this descriptor's segments."""
        out: list[Segment] = []
        for off, size in spans:
            if off < 0 or size < 0:
                raise InvalidViewError(f"negative offset/size in view: ({off},{size})")
            remaining = size
            pos = off
            # walk the existing segments to translate [pos, pos+remaining)
            cursor = 0
            for seg_off, seg_size in self.segments:
                if remaining <= 0:
                    break
                seg_end = cursor + seg_size
                if pos >= seg_end:
                    cursor = seg_end
                    continue
                local = pos - cursor  # start inside this segment
                take = min(seg_size - local, remaining)
                out.append((seg_off + local, take))
                remaining -= take
                pos += take
                cursor = seg_end
            if remaining > 0:
                raise InvalidViewError(
                    f"view [{off},{off + size}) exceeds selected size "
                    f"{self._selected_size()}"
                )
        return DataDescriptor(tuple(_coalesce(out)))

    def make_sub_view(self, offset: int, size: int) -> "DataDescriptor":
        return self._rebase([(offset, size)])

    def make_strided_view(
        self, offset: int, nblocks: int, blocksize: int, gap: int
    ) -> "DataDescriptor":
        spans = [
            (offset + i * (blocksize + gap), blocksize) for i in range(nblocks)
        ]
        return self._rebase(spans)

    def make_unstructured_view(self, segments: list[Segment]) -> "DataDescriptor":
        return self._rebase(list(segments))

    def flatten(self) -> list[Segment]:
        """Normal form: ordered (offset, size) list."""
        return list(self.segments)

    @property
    def size(self) -> int:
        return self._selected_size()

    # -- python-side evaluation (client pull path / test oracle) ----------
    def apply(self, payload: bytes) -> bytes:
        out = bytearray()
        for off, size in self.segments:
            if size == -1:
                out += payload[off:]
            else:
                out += payload[off : off + size]
        return bytes(out)

    # -- Spark compilation -------------------------------------------------
    def to_column(self, data: Column | str = "data") -> Column:
        """Compile to a byte-slicing Column over a BinaryType column.

        substring() is 1-based and works on BinaryType JVM-side; concat
        of binary stays binary. Fully codegen'd — no Python in the plan.
        """
        col = F.col(data) if isinstance(data, str) else data
        if not self.segments:
            return F.lit(b"")
        parts = []
        for off, size in self.segments:
            if size == -1:
                # "to end of payload": max int32 length, substring clamps.
                parts.append(F.substring(col, off + 1, 2147483647))
            else:
                parts.append(F.substring(col, off + 1, size))
        return parts[0] if len(parts) == 1 else F.concat(*parts)


def _coalesce(segs: list[Segment]) -> list[Segment]:
    """Merge adjacent contiguous segments (same wire-savings the
    reference gets from flatten())."""
    out: list[Segment] = []
    for off, size in segs:
        if out and out[-1][0] + out[-1][1] == off and out[-1][1] != -1:
            out[-1] = (out[-1][0], out[-1][1] + size)
        else:
            out.append((off, size))
    return out


# ---------------------------------------------------------------------------
# Dynamic (per-row) selection: segments computed from metadata as an
# array<struct<off,size>> column, applied with one generic expression.
# ---------------------------------------------------------------------------

def slice_segments(data: Column | str, segments: Column) -> Column:
    """Apply a dynamic array<struct<off:int,size:int>> of segments to a
    binary column: concat(substring(data, off+1, size) for each seg).

    This is the engine's generic "getData by descriptor" (L5,
    /root/reference/src/DefaultPartitionManager.cpp:516-560) — a single
    aggregate over the segment array, JVM-side, no UDF.
    """
    col = F.col(data) if isinstance(data, str) else data
    return F.aggregate(
        segments,
        F.lit(b""),
        lambda acc, s: F.concat(acc, col.substr(s["off"] + 1, s["size"])),
    )


def select_bytes(
    data: Column | str,
    *,
    when: Column | None = None,
    view: DataDescriptor | None = None,
    otherwise: DataDescriptor | None = None,
) -> Column:
    """C3 DataSelector as conditional projection.

    ``when`` predicate chooses between ``view`` (default identity) and
    ``otherwise`` (default null -> NULL bytes). With no predicate, just
    compiles ``view``.
    """
    col = F.col(data) if isinstance(data, str) else data
    view_col = view.to_column(col) if view is not None else col
    if when is None:
        return view_col
    if otherwise is None:
        other_col = F.lit(None).cast("binary")
    else:
        other_col = otherwise.to_column(col)
    return F.when(when, view_col).otherwise(other_col)
