"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference surface (mandated).  The pattern at 100 TB: media lives
in parquet/lakehouse as `binary` payload columns beside typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas`` so each task streams record
batches without materializing a partition in memory.

The container has no image/audio codecs, so the actual decode is STUBBED
(deterministic fake, clearly marked) — but the Spark-side plumbing
(schemas, batch iteration, partition independence) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, mime: str = "image/fake") -> DataFrame:
    """Build a media table from any table by treating UTF-8 bytes of a
    text column as the opaque payload — the harness has no real media, so
    this provides a deterministic binary column with realistic plumbing."""
    from kmeans_mapreduce_spark.session import ensure_parallelism

    return ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def _decode_real(payload: bytes, mime: str):
    """Real decoder hook — requires PIL/av/soundfile, absent here."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "swap in PIL.Image.open / av.open here on a real cluster"
    )


def _decode_fake(payload: bytes):
    """Deterministic stand-in decode: metadata derived from the bytes.

    width/height from byte length, an 8-dim 'feature' from byte sums over
    8 equal chunks — stable across runs/engines, good enough to exercise
    schema, batching and downstream joins.
    """
    n = len(payload)
    width = 64 + (n % 64)
    height = 64 + ((n // 64) % 64)
    chunk = max(1, n // 8)
    feature = [float(sum(payload[i * chunk : (i + 1) * chunk]) % 1000) for i in range(8)]
    return n, width, height, feature


def decode_media(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """media[media_id, payload, mime] -> DECODED_SCHEMA via mapInPandas.

    Arrow-batched: each task receives an iterator of pandas batches;
    per-batch work never holds the whole partition.  This is the exact
    shape a real decoder plugs into — only _decode_fake changes.
    """
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            if use_real_codec:
                _decode_real(b"", "")  # raises NotImplementedError by design
            decoded = [_decode_fake(bytes(p)) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"].values,
                    "mime": batch["mime"].values,
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "feature": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb_width", T.IntegerType()),
        T.StructField("thumb_height", T.IntegerType()),
        T.StructField("thumb_feature", T.ArrayType(T.DoubleType())),
    ]
)


def resize_media(df: DataFrame, max_side: int = 32, use_real_codec: bool = False) -> DataFrame:
    """Resize/thumbnail stage: decode -> aspect-preserving downscale ->
    re-extracted (coarser) feature, as a second mapInPandas stage.

    A real pipeline chains decode -> resize -> feature-extract inside
    ONE task (no shuffle between stages: mapInPandas composes in the
    same whole-stage pipeline); the fake decoder mirrors that by
    deriving the thumbnail dims from the decoded dims and pooling the
    8-dim feature down to 4.  Swap _decode_fake for the PIL path on a
    real cluster (same schema contract)."""
    import pandas as pd

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            if use_real_codec:
                _decode_real(b"", "")  # raises NotImplementedError by design
            out = {k: [] for k in RESIZED_SCHEMA.fieldNames()}
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                n, w, h, feature = _decode_fake(bytes(payload))
                scale = max_side / max(w, h)
                tw, th = max(1, int(w * scale)), max(1, int(h * scale))
                pooled = [
                    (feature[2 * i] + feature[2 * i + 1]) / 2.0 for i in range(4)
                ]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["thumb_width"].append(tw)
                out["thumb_height"].append(th)
                out["thumb_feature"].append(pooled)
            yield pd.DataFrame(out)

    return df.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing demo: explode each payload into
    one row per sampled offset (as a video decoder would per frame).
    Pure Catalyst — sequence+explode, no Python."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.octet_length("payload") - 1, F.lit(0)), F.lit(every_n_bytes))
        ).alias("offset"),
    )


def audio_pcm_windows(
    df: DataFrame,
    sample_rate: int = 16000,
    bytes_per_sample: int = 2,
    window_samples: int = 32,
    hop_samples: int = 25,
) -> DataFrame:
    """Audio window segmentation WITHOUT decoding: treat each payload
    as a PCM16-style stream and emit one row per (overlapping) analysis
    window — the framing stage every ASR/audio-feature pipeline runs
    before the codec-dependent part.  All arithmetic is on byte
    lengths, so this stays pure Catalyst (no Python, no codec): the
    decode boundary (_decode_real) begins strictly AFTER framing, which
    is exactly how a 100 TB audio pipeline pre-filters and shards work
    before spinning up expensive decoders.

    Output per window: index, start sample/byte, and start time in ms
    (rounded to 4 dp — exact at any integer hop/rate ratio).  Payloads
    shorter than one window emit nothing (n_windows = 0)."""
    n_samples = F.floor(
        F.octet_length("payload") / F.lit(bytes_per_sample)
    ).cast("long")
    n_windows = F.when(
        n_samples >= window_samples,
        F.floor((n_samples - window_samples) / F.lit(hop_samples)).cast("long")
        + 1,
    ).otherwise(F.lit(0))
    start = F.col("window_idx") * hop_samples
    return (
        df.select("media_id", n_windows.alias("n_w"))
        # sequence(0, -1) DESCENDS in Spark — zero-window payloads must
        # be filtered before the explode, not after
        .where(F.col("n_w") > 0)
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_w") - 1)).alias(
                "window_idx"
            ),
        )
        .select(
            "media_id",
            "window_idx",
            start.alias("start_sample"),
            (start * bytes_per_sample).alias("start_byte"),
            F.round(start * 1000.0 / sample_rate, 4).alias("t_start_ms"),
        )
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata without decoding: [media_id, mime, n_bytes].
    Catalyst-only (octet_length) — the cheap pre-filter stage that runs
    before any expensive decode at scale."""
    return df.select("media_id", "mime", F.octet_length("payload").cast("long").alias("n_bytes"))


def image_tiles(df: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style 2-D patch grid over decoded media: one row per
    (tile_row, tile_col), with edge tiles clipped to the image bounds.
    Input needs ``media_id``, ``width``, ``height`` (decode_media's
    output).  Pure Catalyst — one sequence+explode fan-out bounded by
    ceil(w/p)*ceil(h/p) per image, no Python; at scale this is the
    pre-processing fan-out that feeds a patch-embedding UDF, and it
    parallelizes per-tile instead of per-image."""
    cols = F.ceil(F.col("width") / patch).cast("int")
    rows = F.ceil(F.col("height") / patch).cast("int")
    # sequence(0, -1) DESCENDS in Spark, so a non-positive dimension
    # (width/height <= 0) would emit spurious negative tile indices and
    # _cols=0 would null tile_row/tile_col via division by zero — guard
    # with an empty array instead (same pattern as bpe._pair_counts).
    n_tiles = rows * cols
    idx = F.when(
        (cols >= 1) & (rows >= 1), F.sequence(F.lit(0), n_tiles - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            "media_id",
            "width",
            "height",
            cols.alias("_cols"),
            F.explode(idx).alias("_i"),
        )
        .select(
            "media_id",
            (F.col("_i") / F.col("_cols")).cast("int").alias("tile_row"),
            (F.col("_i") % F.col("_cols")).alias("tile_col"),
            F.least(
                F.lit(patch), F.col("width") - (F.col("_i") % F.col("_cols")) * patch
            ).alias("tile_w"),
            F.least(
                F.lit(patch),
                F.col("height")
                - (F.col("_i") / F.col("_cols")).cast("int") * patch,
            ).alias("tile_h"),
        )
    )
