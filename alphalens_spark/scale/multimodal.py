"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBBED (the
container ships no image/audio libs — marked clearly below with
``decoder='fake'`` as a deterministic stand-in); the Spark-side plumbing
(schema, batch iteration, partitioning, UDF signatures) is real and
tested, so dropping in PIL/torchvision later only replaces the kernel
body.

Scale notes: payload bytes stay in Arrow record batches end to end (no
per-row Python); metadata-only transforms (filtering by size/mime,
partition pruning) never touch the binary column thanks to Parquet
column pruning — check ReadSchema in the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Wrap the driver's documents table as a media table: text bytes as
    the opaque payload + typed metadata — the test double for an
    image/audio corpus with identical Spark-side shape."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decode_and_featurize(
    media: DataFrame, feature_dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode payloads and emit a fixed-dim feature vector per item.

    Arrow-batched ``mapInPandas``: each Python worker receives whole
    record batches (payload bytes as ``bytes`` objects), vectorizes over
    the batch, yields feature frames. ``decoder='fake'`` is the
    deterministic stub kernel (byte-histogram features); a real decoder
    (``decoder='pil'`` etc.) raises until the library is installed —
    clearly marking the stubbed boundary.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real media decoding needs PIL/torchaudio, "
            "not available in this environment; the 'fake' decoder exercises "
            "the identical Spark plumbing"
        )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                # deterministic fake "decode": bucketed byte histogram,
                # L1-normalized — stands in for pixel/spectral features
                hist = np.bincount(arr % feature_dim, minlength=feature_dim)
                total = hist.sum() or 1
                feats.append((hist / total).astype("float32"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_featurize, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame/chunk sampling plumbing: one output row per sampled offset.

    For video this is frame sampling; for the byte-payload stand-in it
    slices the payload at fixed strides. Pure JVM expressions (explode
    over a sequence of offsets + substring on binary→string), no Python.
    Output: (media_id, frame_idx, offset, chunk binary).
    """
    n_frames = F.least(
        F.greatest((F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    ex = media.select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
    offset = F.col("frame_idx") * every_n_bytes
    chunk = F.expr(f"substring(payload, frame_idx * {every_n_bytes} + 1, {every_n_bytes})")
    return ex.select(
        "media_id", "frame_idx", offset.alias("offset"), chunk.alias("chunk")
    )


def resize_media(
    media: DataFrame,
    target_width: int = 32,
    target_height: int = 32,
    resizer: str = "fake",
) -> DataFrame:
    """Resize plumbing: payload → fixed-size payload + updated metadata.

    Same Arrow-batched ``mapInPandas`` shape a real image resize uses
    (PIL/cv2 per batch); ``resizer='fake'`` nearest-neighbor-samples the
    BYTE stream to exactly ``target_width*target_height`` bytes — a
    deterministic stand-in with the real operator's schema, batch shape
    and output-size invariant. A real backend raises until its library
    exists, marking the stubbed boundary.

    Output: (media_id, payload binary, width int, height int, n_bytes long).
    """
    if resizer != "fake":
        raise NotImplementedError(
            f"resizer={resizer!r}: real image resizing needs PIL/cv2, not "
            "available in this environment; 'fake' exercises the identical "
            "Spark plumbing"
        )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("n_bytes", T.LongType(), True),
        ]
    )
    n_out = target_width * target_height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, sizes = [], []
            for payload in pdf["payload"]:
                if payload is None or len(payload) == 0:
                    payloads.append(None)
                    sizes.append(None)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                # nearest-neighbor index sampling to the target size
                idx = np.linspace(0, len(arr) - 1, n_out).round().astype(int)
                resized = arr[idx].tobytes()
                payloads.append(resized)
                sizes.append(len(resized))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": target_width,
                    "height": target_height,
                    "n_bytes": pd.array(sizes, dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(_resize, out_schema)


def chunk_udtf():
    """SQL-callable chunking as a Python UDTF — the §2.10 table-function
    surface: ``spark.udtf.register("chunk_doc", chunk_udtf());
    SELECT c.* FROM docs, LATERAL chunk_doc(text, 32, 16) c``.

    Semantics are DEFINED BY :func:`alphalens_spark.scale.curation.
    chunk_documents` (equality-tested); the UDTF exists for SQL-first
    consumers and as the documented example of the UDTF escape hatch —
    per-row Python, so the native column-expression form is always the
    hot-path choice.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "chunk_idx int, start_token int, n_tokens int, chunk_text string"
    ))
    class ChunkDoc:
        def eval(self, text: str, size: int = 32, stride: int = 16):
            toks = text.strip().split() or [""]
            n = len(toks)
            last = max(n - size, 0)
            starts = list(range(0, last + 1, stride))
            if last > 0 and last % stride:
                starts.append(last)
            for idx, st in enumerate(starts):
                yield (
                    idx,
                    st,
                    min(size, n - st),
                    " ".join(toks[st : st + size]),
                )

    return ChunkDoc
