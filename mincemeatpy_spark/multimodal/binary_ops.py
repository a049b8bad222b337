"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata.

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (and ``decode_image_real`` raises
``NotImplementedError`` until a codec is present) — but the Spark-side
plumbing is real and tested: binary columns, byte-length/digest
metadata, Arrow-batched ``mapInPandas`` decode with an explicit output
schema, and frame-index expansion.  Swapping the stub for PIL/ffmpeg
changes ONE function body, not the pipeline.

At 100 TB: binary payloads ride in parquet alongside metadata columns;
filters on metadata prune row groups without touching payload bytes;
decode runs in mapInPandas so bytes stream batch-wise through Arrow and
never materialize on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


def decode_image_real(payload: bytes) -> dict:
    """Real image decode — requires an imaging library not present in
    this container.  The mapInPandas pipeline below calls the stub
    instead; swap it for this when PIL is available."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use the deterministic stub (fake_decode_meta) instead"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for an image decoder: metadata derived
    purely from the byte content, so tests and oracles are stable."""
    n = len(payload)
    width = n % 640 + 1
    height = (n * 7) % 480 + 1
    channels = 3
    fmt = "png" if n % 2 == 0 else "jpg"
    return width, height, channels, fmt


@register(
    "multimodal_ingest",
    oracle="""
        SELECT doc_id,
               octet_length(text::BLOB)  AS n_bytes,
               md5(text)                 AS digest
        FROM documents
        """,
    category="multimodal",
    doc="Ingest stage: opaque binary payload + byte length + content "
    "digest.  The digest is the exact-dedup key for binary assets; the "
    "length feeds partition sizing.",
)
def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


@register(
    "multimodal_decode_stub",
    oracle="""
        SELECT doc_id, width, height, channels, fmt
        FROM (
            SELECT doc_id,
                   octet_length(text::BLOB) AS n,
                   octet_length(text::BLOB) % 640 + 1        AS width,
                   (octet_length(text::BLOB) * 7) % 480 + 1  AS height,
                   3                                          AS channels,
                   CASE WHEN octet_length(text::BLOB) % 2 = 0
                        THEN 'png' ELSE 'jpg' END             AS fmt
            FROM documents
        )
        """,
    category="multimodal",
    doc="Decode stage via mapInPandas: Arrow-batched binary in, typed "
    "metadata out.  The decoder body is the deterministic stub "
    "(fake_decode_meta) so the oracle can mirror it in SQL; a real "
    "codec swaps in without touching the pipeline (explicit output "
    "schema, per-batch iteration, no driver collect).",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    # NOTE: the decoder must be self-contained (no references to this
    # module) so cloudpickle ships it by value — executors may not have
    # the package on their sys.path.
    def _decode_one(payload: bytes) -> tuple[int, int, int, str]:
        n = len(payload)
        return n % 640 + 1, (n * 7) % 480 + 1, 3, ("png" if n % 2 == 0 else "jpg")

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            metas = [_decode_one(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                    "fmt": [m[3] for m in metas],
                }
            )

    return d.mapInPandas(
        decode, schema="doc_id long, width int, height int, channels int, fmt string"
    )


@register(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id, unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx
        FROM (
            SELECT doc_id, octet_length(text::BLOB) % 97 + 4 AS n_frames
            FROM documents
        )
        """,
    category="multimodal",
    doc="Frame sampling for video payloads: frame count from metadata "
    "(stubbed as a byte-length function), every-5th index expanded with "
    "sequence+explode — one row per sampled frame, ready for a decode "
    "stage keyed by (asset, frame_idx).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n_frames = F.length(F.col("text").cast("binary")) % 97 + 4
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(5))).alias("frame_idx"),
    )


@register(
    "multimodal_resize_stub",
    oracle="""
        SELECT doc_id, width, height,
               CAST(floor(width  * least(224.0 / width, 224.0 / height) + 0.5) AS INT) AS out_w,
               CAST(floor(height * least(224.0 / width, 224.0 / height) + 0.5) AS INT) AS out_h
        FROM (
            SELECT doc_id,
                   octet_length(text::BLOB) % 640 + 1        AS width,
                   (octet_length(text::BLOB) * 7) % 480 + 1  AS height
            FROM documents
        )
        """,
    category="multimodal",
    doc="Decode+resize fused in ONE mapInPandas pass (one Arrow round "
    "trip, the shape a real PIL/opencv stage uses): stub-decode dims, "
    "then fit-to-224-box scaling.  floor(x + 0.5) keeps the rounding "
    "identical across engines (python round() is banker's; SQL round() "
    "is half-up).",
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def decode_resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n = len(bytes(b))
                w, h = n % 640 + 1, (n * 7) % 480 + 1
                scale = min(224.0 / w, 224.0 / h)
                rows.append(
                    (doc_id, w, h, math.floor(w * scale + 0.5), math.floor(h * scale + 0.5))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "out_w", "out_h"]
            )

    return d.mapInPandas(
        decode_resize,
        schema="doc_id long, width int, height int, out_w int, out_h int",
    )


@register(
    "multimodal_audio_energy",
    oracle="""
        SELECT doc_id, frame_no,
               list_sum(list_transform(
                   split(substr(text, frame_no * 256 + 1, 256), ''),
                   c -> ascii(c))) AS energy,
               length(substr(text, frame_no * 256 + 1, 256)) AS n_samples
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(0,
                       CAST(ceil(octet_length(text::BLOB) / 256.0) AS INT) - 1)) AS frame_no
            FROM documents
            WHERE octet_length(text::BLOB) > 0
        )
        """,
    category="multimodal",
    doc="Audio feature-extract plumbing: payload bytes framed into 256-"
    "sample windows, per-frame energy (sum of sample values) via numpy "
    "over Arrow batches in mapInPandas — the exact shape of a real "
    "spectral/DSP stage (frombuffer -> per-window reduce -> one row per "
    "frame).  The fixture payload is ASCII text, so the oracle mirrors "
    "byte values with ascii() in SQL.",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def energy(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            out_doc, out_frame, out_energy, out_n = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(b), dtype=np.uint8)
                if samples.size == 0:
                    continue
                for f in range(0, (samples.size + 255) // 256):
                    win = samples[f * 256 : (f + 1) * 256]
                    out_doc.append(doc_id)
                    out_frame.append(f)
                    out_energy.append(int(win.sum()))
                    out_n.append(int(win.size))
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_no": out_frame,
                    "energy": out_energy,
                    "n_samples": out_n,
                }
            )

    return d.mapInPandas(
        energy, schema="doc_id long, frame_no int, energy bigint, n_samples int"
    )


@register(
    "multimodal_dedup_digest",
    oracle="""
        WITH assets AS (
            SELECT doc_id, md5(substr(text, 1, 60)) AS digest,
                   CAST(length(substr(text, 1, 60)) AS BIGINT) AS n_bytes
            FROM documents
        ),
        groups AS (
            SELECT digest,
                   min(doc_id) AS canonical_id,
                   count(*) AS n_copies,
                   min(n_bytes) AS n_bytes
            FROM assets GROUP BY digest
        )
        SELECT CAST(count(*) AS BIGINT) AS n_unique_assets,
               CAST(sum(n_copies) AS BIGINT) AS n_total_assets,
               CAST(sum(n_copies - 1) AS BIGINT) AS n_duplicate_copies,
               CAST(sum(n_bytes * (n_copies - 1)) AS BIGINT) AS bytes_saved
        FROM groups
        """,
    category="multimodal",
    doc="Content-addressed dedup of binary assets — the image/audio "
    "store's first optimization: digest each payload scan-side (md5 "
    "over the bytes; the payload itself never shuffles), group by "
    "digest to elect a canonical copy, and report the dedup ledger "
    "(unique assets, duplicate copies, bytes reclaimed).  At 100 TB "
    "the shuffle is 16-byte digests + counts; the winning copy's "
    "bytes are rewritten once into content-addressed storage and "
    "every duplicate row keeps only the digest pointer.  Fixture "
    "payloads are 60-byte text prefixes cast to binary (near-dup "
    "docs share prefixes, so real duplicate groups exist) (same bytes both "
    "engines, so the digests match exactly).",
)
def multimodal_dedup_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = F.substring("text", 1, 60).cast("binary")
    assets = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(payload).alias("digest"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )
    groups = assets.groupBy("digest").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_bytes").alias("n_bytes"),
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_unique_assets"),
        F.sum("n_copies").alias("n_total_assets"),
        F.sum(F.col("n_copies") - 1).alias("n_duplicate_copies"),
        F.sum(F.col("n_bytes") * (F.col("n_copies") - 1)).alias("bytes_saved"),
    )
