"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns with typed metadata, decoded/feature-extracted through
Arrow-batched Pandas UDFs (`mapInPandas`).

The decode step itself is STUBBED (no image/audio libraries in this
container — see ``_decode_stub``); everything around it — schema,
batching, partitioning, UDF signature — is real. Swapping the stub for
PIL/torchaudio/ffmpeg is a one-function change.

Scale notes: `mapInPandas` streams Arrow batches, so payload bytes never
materialize per-row in Python object form; batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (drop it for multi-MB
payloads). Feature extraction is a pure map — no shuffle; colocate it
with the scan."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of extract_features (driver-visible contract)
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_frames bigint, "
    "frame_bytes bigint, byte_sum_first8 bigint"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Make an opaque binary payload column + typed metadata (media kind,
    declared size). Real pipelines read the bytes from object storage;
    here the payload is the utf-8 encoding of the text column so results
    are deterministic and oracle-checkable."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("fake/binary").alias("kind"),
            F.length(F.col("payload")).alias("declared_bytes"),
        ),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    The UDF receives pandas DataFrames (one per Arrow batch) and returns
    the typed feature frame — the canonical shape for decode / resize /
    frame-sample operators at scale.

    IMPORTANT: everything the UDF calls is defined INSIDE this function so
    cloudpickle serializes it by value — Python workers must not need
    ``movies_etl_spark`` importable on their own sys.path (the driver
    harness may run from any cwd)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_stub(payload: bytes) -> dict:
            # STUB for the real decoder (PIL.Image.open / av.open /
            # soundfile). Deterministic fake: 'frames' from payload
            # length, checksum from the first 8 bytes. Raises on None to
            # mirror decoder behavior on missing payloads.
            if payload is None:
                raise NotImplementedError("no payload — real decoder would raise")
            n = len(payload)
            n_frames = n % 7 + 1
            return {
                "n_bytes": n,
                "n_frames": n_frames,
                "frame_bytes": n // n_frames,
                "byte_sum_first8": sum(payload[:8]),
            }

        for pdf in batches:
            feats = pdf["payload"].map(decode_stub)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(F.col(id_col), "payload").mapInPandas(op, FEATURE_SCHEMA)
