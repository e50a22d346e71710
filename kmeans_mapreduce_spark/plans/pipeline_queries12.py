"""Round-8 pipeline queries: the REAL-codec multimodal family.

The multimodal operators' decode boundary was a documented stub through
round 7 — the Arrow plumbing was tested but no query ever turned bytes
into pixels.  These queries close that: a dependency-free pure-Python
binary-PPM (P6) decoder (operators/multimodal._decode_ppm) runs inside
the mapInPandas stages, over payloads that are genuine P6 files whose
CONTENT follows a generative formula both engines can recompute (dims
from the text byte length, pixel i = (media_id*7 + i) % 256).  The
oracles therefore re-derive every output — dims, byte counts, pixel
sums, nearest-neighbor thumb sums, tile counts — from the formula,
while the Spark side actually parses headers and walks rasters: an
off-by-one anywhere in the decoder breaks the driver hash.

Scale shape (all three): synth -> decode -> (resize|tiles) compose
inside ONE mapInPandas/Catalyst pipeline per task — no shuffle until
the final (bounded or per-media) aggregate; at 100 TB this is the
canonical "decode near the data, never collect pixels" layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import multimodal as MM
from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

# dims formula shared with operators/multimodal.attach_ppm_payload
_DIMS_CTE = """
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         octet_length(encode(text)) AS n
  FROM documents),
d AS (
  SELECT media_id, 4 + n % 13 AS w, 4 + (n // 13) % 11 AS h FROM m)
"""


def mm_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize genuine P6 PPM payloads
    from the documents table, parse them with the pure-Python decoder,
    and report per image the parsed dims, total byte count (header +
    raster — sensitive to header serialization), the exact pixel sum
    and the first/last raster bytes (sensitive to the raster offset:
    any header-scan off-by-one shifts them)."""
    media = MM.attach_ppm_payload(_docs(spark, sf_dir), "doc_id", "text")
    dec = MM.decode_media(media)
    return dec.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        (F.col("feature")[0] + F.col("feature")[1] + F.col("feature")[2])
        .cast("bigint")
        .alias("pix_sum"),
        F.col("feature")[3].cast("int").alias("first_px"),
        F.col("feature")[4].cast("int").alias("last_px"),
    )


MM_DECODE_PPM_SQL = (
    _DIMS_CTE
    + """
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       -- 'P6\\n' + 'w h\\n' + '255\\n' + raster
       CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            + 3 * w * h AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(0, 3 * w * h),
            i -> (media_id * 7 + i) % 256)) AS BIGINT) AS pix_sum,
       CAST((media_id * 7) % 256 AS INT) AS first_px,
       CAST((media_id * 7 + 3 * w * h - 1) % 256 AS INT) AS last_px
FROM d
"""
)


def mm_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode -> nearest-neighbor downscale (max side 8) -> exact
    thumb pixel sum, all inside one mapInPandas stage over genuine P6
    bytes.  Thumb dims use integer math (w*8 // max(w,h), floored at 1)
    and the NN source index is i*h // th — deterministic on both
    engines, no float scale anywhere."""
    media = MM.attach_ppm_payload(_docs(spark, sf_dir), "doc_id", "text")
    res = MM.resize_media(media, max_side=8)
    return res.select(
        "media_id",
        "width",
        "height",
        "thumb_width",
        "thumb_height",
        F.col("thumb_feature")[3].cast("bigint").alias("thumb_sum"),
    )


MM_RESIZE_PPM_SQL = (
    _DIMS_CTE
    + """,
t AS (
  SELECT media_id, w, h,
         greatest(1, (w * 8) // greatest(w, h)) AS tw,
         greatest(1, (h * 8) // greatest(w, h)) AS th
  FROM d)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(tw AS INT) AS thumb_width,
       CAST(th AS INT) AS thumb_height,
       -- NN thumb byte k: pixel p = k//3, channel c = k%3,
       -- ty = p//tw, tx = p%tw, sy = ty*h//th, sx = tx*w//tw
       CAST(list_sum(list_transform(range(0, 3 * tw * th),
            k -> (media_id * 7
                  + 3 * ((((k // 3) // tw) * h // th) * w
                         + (((k // 3) % tw) * w // tw))
                  + k % 3) % 256)) AS BIGINT) AS thumb_sum
FROM t
"""
)


def mm_tiles_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch grid over GENUINELY decoded dims: decode real P6
    headers, tile at patch=4 with edge clipping, and report per image
    the tile count and the summed tile area — which must reconstruct
    the exact decoded w*h (the clipping bookkeeping check), while
    n_tiles pins the ceil-grid fan-out."""
    media = MM.attach_ppm_payload(_docs(spark, sf_dir), "doc_id", "text")
    dec = MM.decode_media(media)
    tiles = MM.image_tiles(dec.select("media_id", "width", "height"), patch=4)
    return (
        tiles.groupBy("media_id")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum(F.col("tile_w").cast("bigint") * F.col("tile_h"))
            .cast("bigint")
            .alias("tile_area"),
        )
        .orderBy("media_id")
    )


MM_TILES_PPM_SQL = (
    _DIMS_CTE
    + """
SELECT media_id,
       CAST(((w + 3) // 4) * ((h + 3) // 4) AS BIGINT) AS n_tiles,
       CAST(w * h AS BIGINT) AS tile_area
FROM d
ORDER BY media_id
"""
)
