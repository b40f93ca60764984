"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata.

The decode/resize/frame-sample kernels are STUBBED (no image/audio libs
in this container — clearly marked below); everything Spark-side is
real and tested: schema, batch shape, ``mapInPandas`` iterator
signature, Arrow transfer, partition sizing. On a real cluster only the
marked kernel bodies change.

Batch shape rules encoded here:
- binary payloads ride ``BinaryType`` columns; metadata is typed columns
  beside them (never JSON blobs in the hot path);
- per-batch work is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set it low for big blobs — 1k blobs × 1 MB = 1 GB per Arrow batch
  otherwise);
- kernels are ``mapInPandas`` (iterator of pandas DataFrames) so one
  task streams many small Arrow batches instead of materializing the
  partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = (
    "doc_id long, n_bytes long, magic string, kind string"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo plumbing: materialize an opaque binary column (utf-8 bytes of
    the text stand in for an image/audio blob) + declared media kind."""
    return docs.withColumn("blob", F.encode(F.col(text_col), "utf-8")).withColumn(
        "kind", F.lit("text/plain")
    )


def extract_blob_metadata(docs_with_blob: DataFrame) -> DataFrame:
    """mapInPandas metadata extractor: byte length + 4-byte magic header.
    This is the real batch shape a decoder would use."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "magic": blobs.map(lambda b: bytes(b[:4]).hex()),
                    "kind": pdf["kind"],
                }
            )

    return docs_with_blob.mapInPandas(kernel, BLOB_META_SCHEMA)


def resize_blob(docs_with_blob: DataFrame, target_bytes: int = 4096) -> DataFrame:
    """Resize with a DETERMINISTIC FAKE kernel: real resize needs an
    image lib (absent here), so the kernel truncates the payload to
    ``target_bytes`` — same mapInPandas batch shape, schema, and Arrow
    binary transfer a PIL ``Image.resize`` kernel would use. Swap the
    one marked line on a real cluster."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            out = blobs.map(lambda b: bytes(b[:target_bytes]))  # FAKE: real impl = decode+resize+re-encode
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes_in": blobs.map(len).astype("int64"),
                    "n_bytes_out": out.map(len).astype("int64"),
                    "blob_out": out,
                }
            )

    return docs_with_blob.mapInPandas(
        kernel, "doc_id long, n_bytes_in long, n_bytes_out long, blob_out binary"
    )


def extract_features(docs_with_blob: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction with a DETERMINISTIC FAKE kernel: an L1-
    normalized byte histogram standing in for a CNN/audio embedding.
    The production contract — fixed-width ``array<float>`` out of a
    vectorized numpy kernel over Arrow batches — is exactly this."""
    import numpy as np

    assert n_bins & (n_bins - 1) == 0 and 1 <= n_bins <= 256
    shift = 8 - int(np.log2(n_bins))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["blob"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * n_bins)
                    continue
                hist = np.bincount(arr >> shift, minlength=n_bins)
                feats.append((hist[:n_bins] / arr.size).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return docs_with_blob.mapInPandas(kernel, "doc_id long, features array<float>")


def decode_image(docs_with_blob: DataFrame) -> DataFrame:  # pragma: no cover
    """STUB — image decode (PIL/OpenCV absent in this container).

    On a real cluster, replace ``kernel`` with e.g. PIL.Image.open over
    io.BytesIO per blob inside the same mapInPandas shape. The schema
    and batching below are the production contract.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires PIL/OpenCV; container has neither. "
            "Plumbing (schema/batching) is tested via extract_blob_metadata."
        )

    return docs_with_blob.mapInPandas(
        kernel, "doc_id long, width int, height int, channels int"
    )


def frame_sample(docs_with_blob: DataFrame, every_n: int = 30) -> DataFrame:  # pragma: no cover
    """STUB — video frame sampling (no ffmpeg in container). Contract:
    one output row per sampled frame, binary frame column + index."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError("frame sampling requires ffmpeg/av")

    return docs_with_blob.mapInPandas(
        kernel, "doc_id long, frame_idx int, frame binary"
    )


def frame_schedule(
    meta: DataFrame,
    id_col: str = "doc_id",
    duration_col: str = "duration_s",
    fps_col: str = "fps",
    max_frames: int = 16,
) -> DataFrame:
    """Deterministic frame-sampling SCHEDULE from container metadata
    only — the half of video frame-sampling that needs no decoder:
    given per-blob (duration, fps), emit the uniform-stride frame
    indices a downstream decode kernel (``frame_sample``) should pull,
    capped at ``max_frames`` per blob.

    At 100 TB this is the work-planning pass that runs BEFORE any
    byte of video is touched: pure long arithmetic over the metadata
    columns (zero shuffle, codegen'd), so the expensive decode stage
    receives an explicit, bounded work list — (blob, frame_idx) —
    instead of discovering frame counts inside the kernel. Output
    row count is the decode stage's exact task budget.

    Determinism: stride = max(1, n_frames DIV max_frames) (exact long
    DIV — parenthesized, DIV binds tighter than minus), indices =
    sequence(0, n_frames-1, stride) truncated to ``max_frames``; a
    zero-length blob yields an empty schedule, not an error.
    """
    n_frames = (
        F.col(duration_col).cast("long") * F.col(fps_col).cast("long")
    )
    # integer division: floor(n/max) in long space
    stride = F.greatest(
        F.lit(1).cast("long"),
        F.floor(n_frames / F.lit(max_frames)).cast("long"),
    )
    idx = F.when(
        n_frames > 0,
        F.slice(
            F.sequence(F.lit(0).cast("long"), n_frames - 1, stride),
            1,
            max_frames,
        ),
    ).otherwise(F.array().cast("array<long>"))
    return meta.select(
        F.col(id_col),
        n_frames.alias("n_frames"),
        stride.alias("stride"),
        F.size(idx).cast("long").alias("n_sampled"),
        idx.alias("frame_idx"),
    )
