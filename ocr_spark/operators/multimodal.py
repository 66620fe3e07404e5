"""Multimodal (image/audio/video) column plumbing.

Media lives in DataFrames as an opaque ``binary`` column plus typed
metadata — the pattern a 100 TB training-data pipeline uses: keep bytes
opaque to Catalyst, decode/feature-extract inside Arrow-batched
``mapInPandas`` stages, and emit typed columns the relational layer can
aggregate/join/filter.

Because this container has no image/audio libraries, the DECODE step is
deterministic-fake: a self-describing "FKIM" container format whose
header/frames are pure functions of the document id, so the driver's
DuckDB oracle can recompute every decoded value and check the whole
binary round trip (synthesize → Arrow → Python batch → parse → typed
columns) value-for-value. The real decoders (PIL/ffmpeg/librosa) are
stubbed behind ``decode_real_image`` with NotImplementedError; swapping
them in changes ONE function, not the Spark plumbing.

FKIM layout (big-endian):
    0..3   magic b"FKIM"
    4      version (=1)
    5..6   width  uint16
    7..8   height uint16
    9      n_frames uint8
    10..   n_frames frames of 32 bytes each
           (frame f = ascii hex of md5("<doc_id>_<f>"))

All batch kernels are Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]
(mapInPandas): no per-row Python at the Spark API level, bounded batch
memory via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MAGIC = b"FKIM"
FRAME_BYTES = 32
HEADER_BYTES = 10


def media_dims(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) as pure functions of doc_id — mirrored
    by the SQL oracle in plans/multimodal_queries.py."""
    return (64 + (doc_id * 7) % 192,
            64 + (doc_id * 13) % 192,
            1 + doc_id % 8)


def frame_content(doc_id: int, frame_idx: int) -> bytes:
    return hashlib.md5(f"{doc_id}_{frame_idx}".encode()).hexdigest().encode()


def encode_media(doc_id: int) -> bytes:
    w, h, nf = media_dims(doc_id)
    head = MAGIC + struct.pack(">BHHB", 1, w, h, nf)
    return head + b"".join(frame_content(doc_id, f) for f in range(nf))


def decode_real_image(data: bytes):  # pragma: no cover - stub
    """STUB: the production decode (PIL.Image.open / ffmpeg). Not
    available in this container — the FKIM fake exercises the identical
    Spark-side plumbing (schema, batching, error capture)."""
    raise NotImplementedError("real image decoding requires PIL/ffmpeg; "
                              "use the FKIM deterministic codec in tests")


# --------------------------------------------------------------------------
# Spark stages
# --------------------------------------------------------------------------

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media", BinaryType(), True),
])

META_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("format", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("error", StringType(), True),
])

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_md5", StringType(), True),
])


def synthesize_media(docs: DataFrame) -> DataFrame:
    """docs(doc_id, …) → (doc_id, media BINARY). Arrow-batched."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "media": [encode_media(int(d)) for d in ids],
            })
    return docs.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_media_meta(media: DataFrame) -> DataFrame:
    """(doc_id, media) → typed metadata. Data errors become rows with an
    ``error`` string, never task failures (a poisoned byte blob must not
    kill a 100 TB job)."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["media"]):
                row = {"doc_id": int(doc_id), "format": None, "width": None,
                       "height": None, "n_frames": None,
                       "n_bytes": len(data) if data is not None else 0,
                       "error": None}
                try:
                    if data is None or data[:4] != MAGIC:
                        raise ValueError("bad magic")
                    _, w, h, nf = struct.unpack(">BHHB", data[4:HEADER_BYTES])
                    if len(data) != HEADER_BYTES + nf * FRAME_BYTES:
                        raise ValueError("truncated payload")
                    row.update(format="fkim", width=w, height=h, n_frames=nf)
                except Exception as exc:  # data error → row, not failure
                    row["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA])
    return media.mapInPandas(decode, schema=META_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling (video path): explode every k-th frame with its
    content hash. 1 input row → n_frames/k output rows; mapInPandas is
    the UDTF-shaped generator here."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
            for doc_id, data in zip(pdf["doc_id"], pdf["media"]):
                # same data-errors-never-kill-tasks discipline as
                # decode_media_meta: truncated headers/payloads are
                # skipped, not raised
                if (data is None or len(data) < HEADER_BYTES
                        or data[:4] != MAGIC):
                    continue
                nf = data[9]
                if len(data) < HEADER_BYTES + nf * FRAME_BYTES:
                    continue
                for f in range(0, nf, every_k):
                    start = HEADER_BYTES + f * FRAME_BYTES
                    frame = bytes(data[start:start + FRAME_BYTES])
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f)
                    out["frame_md5"].append(
                        hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA])
    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes bytes through a batch stage that would call
    the real resizer; here it re-stamps the header dims (deterministic)
    so the pipeline shape — binary in, binary out, same row count — is
    real and testable."""
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data in pdf["media"]:
                if data is None or data[:4] != MAGIC:
                    out.append(None)
                    continue
                data = bytes(data)
                out.append(data[:5] + struct.pack(">HH", width, height)
                           + data[9:])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out})
    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)
