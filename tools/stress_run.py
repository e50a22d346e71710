"""100x-correctness-scale stress point for the heavy operators.

Every "100 TB posture" claim in this repo is otherwise verified at
plan-shape level plus sf0.1 execution (10x the correctness scale).
This run manufactures a ~100x point and EXECUTES the heaviest
operators there, because the round-4 re-execution-trap class was only
ever caught by running, not by reading plans:

  Phase A — synthetic K-Means at true scale: the partition-parallel
  synthetic_points DataSource generates 2M x 16-dim Gaussian-blob
  points inside the executors (4000x the sf0.01 embeddings row count;
  no driver materialization), and both the reference-semantics native
  Lloyd loop and the MLlib path fit k=8 on it.

  Phase B — a 10x-replicated sf0.1 corpus (= 100x sf0.01) for the
  document/embedding operators: documents.parquet and
  embeddings.parquet are each unioned 10x with re-keyed ids into a
  stress directory, then the REAL catalog callables run against it
  (same code path the driver gates).  Replication makes the corpus
  heavily duplicate-laden — the realistic dedup workload — so the
  MinHash/dedup family does strictly more candidate work per row than
  on organic data.  Excluded by design: queries whose ORACLE side is
  the O(N^2) all-pairs baseline (dedup_ngram_jaccard,
  dedup_minhash_recall ground truth) — the production paths those
  baselines exist to verify ARE in the list.

  Phase C — the STREAMING folds at the same 100x point, because
  state-store growth and per-batch cache leaks are exactly the
  failure class plan-shape tests cannot see:
    * stream_dedup_corpus drains the 50k-doc stress corpus through
      the persisted signature index in multi-file micro-batches;
      recorded state = index rows/bytes (must stay ~300 B/doc);
    * streaming K-Means drains the SAME 2M x 16 synthetic points
      Phase A fits, but via the DataSource's streamReader in
      partition-granular micro-batches; recorded state = the k x d
      driver model (weights must sum to the row count);
    * the quality-accounting MV fold drains the stress documents;
      recorded state = |sources| MV rows, with the replay guard's
      batch_id advancing once per micro-batch.

Run this EXCLUSIVELY (no concurrent Spark JVM on the box): the
round-5 contaminated-baseline incident is why.  Results go to stdout
as one JSON line; copy the table into SCALE_RUN.md with an explicit
load statement.

Usage:  python tools/stress_run.py [--keep] [query ...]
        (bare words restrict Phase B to a subset; --keep preserves the
        stress directory for reruns)
"""

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kmeans_mapreduce_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
STRESS_DIR = str(Path(__file__).resolve().parent.parent / ".stress_x100")
REPLICAS = 10
SYN_N = 2_000_000
SYN_DIM = 16
SYN_K = 8

# Phase B: the heavy operators the round-5 verdict named, all running
# the REAL catalog callables against the stress dir.  Each touches only
# documents.parquet / embeddings.parquet.
PHASE_B = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_components",
    "dedup_simhash",
    "graph_pagerank_vectors",
    "graph_triangle_count",
    "ann_ivf_topk",
    "ann_pq_topk",
    "docs_ngram_novelty",
    "pipeline_bpe_train",
    "pipeline_bpe_apply_fixed",
    "kmeans_fit_fixed",
    "kmeans_fit_native",
    "kmeans_fit_mllib",
    # round-7 batch 22/23 heavies (documents/embeddings only; the
    # exact-all-pairs eval queries — yield curve, minhash recall —
    # stay out by design, same as dedup_ngram_jaccard)
    "pipeline_dedup_cross_source",
    "pipeline_pack_efficiency",
    "pipeline_quality_prune_sweep",
    "embedding_pq_distortion",
    # round-10 batch 28/30: the trained IVF-PQ calibrations at the
    # production knob — at 20k vectors kc = ceil(sqrt(N)) = 142 cells,
    # deep in the broadcast-assignment regime; the brute ground-truth
    # leg stays the bounded 50-query x N pass
    "ann_ivf_pq_recall",
    "ann_ivf_pq_rerank_recall",
    # round-11 batch 32: the compressed/video codec arms (decode is a
    # linear mapInPandas scan — the stress point is 50k real
    # inflate+unfilter / nested-walk parses per run) and the codebook
    # sweep (4 ADC legs + 3 extra codebook trainings over the 142-cell
    # trained index; the m-level trainings memoize per corpus)
    "mm_png_decode_stats",
    "mm_avi_frame_sample",
    "mm_gif_decode_stats",
    "ann_ivf_pq_codebook_sweep",
    # round-11 batch 33/35: the oracle-replayable stump trainer at
    # 50k docs (one shuffle to the bounded candidate frame + windowed
    # prefix sums) and the four-arm quarantine decode (50k real parses
    # with every 7th payload corrupt — the ValueError contract under
    # stress)
    "quality_stump_fit",
    "mm_decode_quarantine",
]

# Phase C streaming workloads (names usable as subset args too)
PHASE_C = [
    "stream_dedup_corpus",
    "stream_boost_filter",
    "stream_kmeans_2m",
    "stream_quality_mv",
    "stream_event_joins",
    "stream_shard_export",
    "stream_corpus_pipeline",
    "corpus_probe_curve",
]

# Phase D: the k-NN graph family at the PRODUCTION k_cells knob.
# Phase B runs graph_pagerank_vectors / graph_triangle_count through
# the 4-cell oracle fixture, where within-cell joins go dense at 20k
# vectors (the r7 stress outliers: 110s / 84s); the documented fix —
# k_cells ~ sqrt(N) — was argued in a docstring but never executed.
# These entries run the same operators over knn_edges_scaled (sqrt(N)
# cells ~ 141 at 20k vectors) so the claim is measured, not argued.
PHASE_D = [
    "graph_pagerank_sqrtcells",
    "graph_triangle_sqrtcells",
    "knn_bucketed_ab",
    "zorder_pruning_ab",
    "band_bucketed_ab",
]


def band_bucketed_ab(spark, results: dict) -> int:
    """The composed pipeline's LAST modeled layout claim, EXECUTED:
    'a deployment whose batches outgrow the broadcast threshold would
    register the [pre-banded index] sibling as a table bucketed by
    (band, key) so the candidate join co-locates without shuffling the
    index' (streaming/corpus_pipeline.py).  Band the whole 50k-doc
    stress corpus's signatures (the index side at stream end), take a
    micro-batch-sized probe slice, and A/B the (band, key) candidate
    equi-join: plain frames (both sides exchange) vs both sides read
    from the bucketed table (zero exchanges) — wall clock, Exchange
    hashpartitioning count, and checksum equality, with auto-broadcast
    disabled so the join strategy is decided by distribution alone
    (the regime the claim is about)."""
    import os

    from kmeans_mapreduce_spark.operators.dedup import (
        banded_signatures,
        minhash_signature,
    )
    from kmeans_mapreduce_spark.sources.bucketed import write_bucketed_table

    def cand(left, right):
        return (
            left.alias("a")
            .join(
                right.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        )

    def checksum(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("a_id") * 31 + F.col("b_id")).alias("chk"),
        ).collect()[0]
        return (r["n"], r["chk"])

    def exchanges(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    tbl = f"stress_band_idx_{os.getpid()}"
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    banded = None
    try:
        docs = spark.read.parquet(f"{STRESS_DIR}/documents.parquet")
        banded = (
            banded_signatures(
                docs.select(
                    F.col("doc_id").alias("id"),
                    minhash_signature("text").alias("sig"),
                ).where(F.col("sig").isNotNull())
            )
            .select("id", "band", "key")
            .cache()
        )
        n_banded = banded.count()
        probe = banded.where(F.col("id") % 16 == 0)

        t0 = time.time()
        plain_q = cand(probe, banded)
        plain_sum = checksum(plain_q)
        plain_sec = round(time.time() - t0, 1)
        plain_ex = exchanges(plain_q)

        t0 = time.time()
        bt = write_bucketed_table(banded, tbl, ["band", "key"], 32)
        write_sec = round(time.time() - t0, 1)
        t0 = time.time()
        buck_q = cand(bt.where(F.col("id") % 16 == 0), bt)
        buck_sum = checksum(buck_q)
        buck_sec = round(time.time() - t0, 1)
        buck_ex = exchanges(buck_q)

        results["band_bucketed_ab"] = {
            "banded_rows": n_banded,
            "candidates": plain_sum[0],
            "plain_sec": plain_sec,
            "bucketed_sec": buck_sec,
            "bucketed_write_sec": write_sec,
            "plain_exchanges": plain_ex,
            "bucketed_exchanges": buck_ex,
            "checksums_equal": plain_sum == buck_sum,
        }
        print(
            f"D band bucketed A/B: {results['band_bucketed_ab']}",
            file=sys.stderr,
        )
        return (
            0
            if plain_sum == buck_sum and buck_ex < plain_ex
            else 1
        )
    except Exception as exc:  # noqa: BLE001
        results["band_bucketed_ab"] = {"error": str(exc)[:300]}
        print(f"D band bucketed A/B: ERROR {exc}", file=sys.stderr)
        return 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        if banded is not None:
            banded.unpersist()
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def knn_bucketed_ab(spark, results: dict) -> int:
    """The 100 TB layout claim, EXECUTED at the 100x point: write the
    stress corpus's assigned cells (sqrt(N) knob, ~142 cells at 20k
    vectors) through write_bucketed_table and A/B the within-cell
    self-join (rank_cell_pairs, the k-NN/SemDeDup consumer) against the
    shuffle build over the plain frame — wall clock AND Exchange
    hashpartitioning count, with auto-broadcast disabled so the join
    strategy is decided by distribution alone (at real scale neither
    side broadcasts).  `knn_graph_bucketed` pins this contract at
    fixture scale (4 cells, driver-hash-checked); this row measures it
    where the layout actually pays."""
    import math

    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.plans.pipeline_queries import _embs
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        assigned_cells,
        rank_cell_pairs,
    )
    from kmeans_mapreduce_spark.sources.bucketed import write_bucketed_table

    def checksum(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.sum("neighbor_id").alias("s_nb"),
            F.sum(F.col("rank") * F.col("node_id")).alias("s_rk"),
        ).collect()[0]
        return (r["n"], r["s_nb"], r["s_rk"])

    def exchanges(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    e = (
        _embs(spark, STRESS_DIR)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .cache()
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n = e.count()
        k_cells = max(1, math.ceil(n**0.5))
        cents = [
            list(r["v"])
            for r in e.orderBy("vec_id").limit(k_cells).collect()
        ]
        assigned = assigned_cells(e, cents)

        # A: shuffle build (both join sides exchange on cell)
        t0 = time.time()
        shuffle_sum = checksum(rank_cell_pairs(assigned, 3))
        shuffle_sec = round(time.time() - t0, 1)
        shuffle_ex = exchanges(rank_cell_pairs(assigned, 3))

        # B: the bucketed layout — write once (the layout cost a real
        # pipeline amortizes over every downstream join), then the
        # co-located read
        t0 = time.time()
        tbl = write_bucketed_table(
            assigned, "knn_cells_stress_ab", "cell", n_buckets=64
        )
        write_sec = round(time.time() - t0, 1)
        t0 = time.time()
        buck_sum = checksum(rank_cell_pairs(tbl, 3))
        buck_sec = round(time.time() - t0, 1)
        buck_ex = exchanges(rank_cell_pairs(tbl, 3))

        ok = shuffle_sum == buck_sum and buck_ex < shuffle_ex
        results["knn_bucketed_ab"] = {
            "n_vectors": n,
            "k_cells": k_cells,
            "shuffle_join_sec": shuffle_sec,
            "shuffle_exchanges": shuffle_ex,
            "bucketed_write_sec": write_sec,
            "bucketed_join_sec": buck_sec,
            "bucketed_exchanges": buck_ex,
            "rows": shuffle_sum[0],
            "results_equal": shuffle_sum == buck_sum,
        }
        print(f"D bucketed A/B: {results['knn_bucketed_ab']}", file=sys.stderr)
        return 0 if ok else 1
    except Exception as exc:  # noqa: BLE001
        results["knn_bucketed_ab"] = {"error": str(exc)[:300]}
        print(f"D bucketed A/B: ERROR {exc}", file=sys.stderr)
        return 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS knn_cells_stress_ab")
        e.unpersist()


def zorder_pruning_ab(spark, results: dict) -> int:
    """The Z-order footer-skipping claim, EXECUTED on physically
    written files (round-11 VERDICT §next #3): write the sf0.1 orders
    table (150k rows) as 64 parquet files twice — linear
    (repartitionByRange on o_orderkey, the insert-order layout) and
    via write_zordered on the catalog query's (x, y) = (custkey%256,
    floor(totalprice)%256) — then push the SAME 64x64 box predicate
    through the parquet reader on each layout and record what the
    scan PHYSICALLY did:

      files_stat_hit   files whose footer (x, y) stats intersect the
                       box (pyarrow row-group min/max — what a
                       min/max reader decodes; the rest are footer-
                       open-then-skip)
      rows_decoded     the FileSourceScan's numOutputRows metric =
                       rows the vectorized reader actually decoded
                       after row-group skipping (AQE off so the
                       executed plan exposes the scan leaf directly)

    All layouts must return identical result rows; the Z-order
    layout must decode a small fraction of the linear layout's.
    Range-partition file boundaries don't align exactly with 32x32
    curve tiles (equal-COUNT ranges), so the sampled layout's hit
    count runs a little above the bucket model's 4-of-64 — round 12
    measured 8/64, and round 13 closes that gap with a THIRD arm:
    write_zordered_tiles cuts at explicit tile-boundary Z-values
    (hive-partition by the 6-bit tile id), so each file bounds exactly
    one tile and the footer check must hit exactly the model's 4/64.
    The tiled arm also records the catalog-level path: filtering on
    tiles_for_box's ids lets the planner skip the other 60 tile
    DIRECTORIES outright (numFiles in the scan = 4 before any footer
    is opened)."""
    import pyarrow.parquet as pq

    from kmeans_mapreduce_spark.plans.pipeline_queries17 import _ZO_BOX
    from kmeans_mapreduce_spark.sources.zorder import (
        tiles_for_box,
        write_zordered,
        write_zordered_tiles,
    )

    xlo, xhi, ylo, yhi = _ZO_BOX
    base = Path(STRESS_DIR) / "zorder_ab"
    o = spark.read.parquet(f"{SF01}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("x"),
        (F.floor("o_totalprice").cast("long") % 256).alias("y"),
    )

    def footer_hits(path: str) -> tuple[int, int]:
        """(files whose x/y row-group stats intersect the box, total
        files) — the decision a min/max reader makes per footer."""
        hit = total = 0
        for f in sorted(Path(path).rglob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo = {"x": None, "y": None}
            hi = {"x": None, "y": None}
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    nm, st = col.path_in_schema, col.statistics
                    if nm in lo and st is not None and st.has_min_max:
                        lo[nm] = st.min if lo[nm] is None else min(lo[nm], st.min)
                        hi[nm] = st.max if hi[nm] is None else max(hi[nm], st.max)
            total += 1
            if lo["x"] is None or lo["y"] is None:
                # zero-row part file (range sampling can cut an empty
                # partition) or stats-less chunk: nothing decodable, a
                # stats reader skips it — count the file, not a hit
                continue
            if (
                hi["x"] >= xlo
                and lo["x"] <= xhi
                and hi["y"] >= ylo
                and lo["y"] <= yhi
            ):
                hit += 1
        return hit, total

    def scan_decoded(path: str, tile_ids=None) -> tuple[tuple, int, int]:
        """((result rows, o_orderkey checksum), rows the scan decoded,
        files the scan selected) for the box query — the checksum makes
        results_equal compare the actual selected rows, not just their
        count (a layout write that swapped k in-box rows for k
        out-of-box rows would pass a count-only check).  ``tile_ids``
        adds the catalog-level prune (partition filter on the hive tile
        column); numFiles is None if the scan node lacks the metric."""
        df = spark.read.parquet(path).where(
            (F.col("x") >= xlo)
            & (F.col("x") <= xhi)
            & (F.col("y") >= ylo)
            & (F.col("y") <= yhi)
        )
        if tile_ids is not None:
            df = df.where(F.col("_ztile").isin(tile_ids))
        rows = df.collect()
        n = (len(rows), sum(r["o_orderkey"] for r in rows))
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        decoded = n_files = None
        for i in range(leaves.length()):
            node = leaves.apply(i)
            if "FileSourceScan" in node.getClass().getName():
                decoded = node.metrics().apply("numOutputRows").value()
                # numFiles = files the scan SELECTED (after partition
                # pruning) — the catalog-level readout for the tiled arm
                m = node.metrics()
                if m.contains("numFiles"):
                    n_files = m.apply("numFiles").value()
        if decoded is None:
            # make a metric-extraction miss (e.g. the read planned as a
            # differently-named scan node) self-explaining instead of a
            # bogus pruning-regression readout
            raise RuntimeError(
                "no FileSourceScan leaf in the executed plan — scan "
                "metric extraction needs updating for this Spark version"
            )
        return n, decoded, n_files

    try:
        t0 = time.time()
        (
            o.repartitionByRange(64, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.mode("overwrite")
            .parquet(str(base / "linear"))
        )
        write_zordered(o, str(base / "zorder"), "x", "y", 64)
        write_zordered_tiles(o, str(base / "tiled"), "x", "y", 64)
        write_sec = round(time.time() - t0, 1)
        aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            lin_rows, lin_decoded, _ = scan_decoded(str(base / "linear"))
            zo_rows, zo_decoded, _ = scan_decoded(str(base / "zorder"))
            ti_rows, ti_decoded, _ = scan_decoded(str(base / "tiled"))
            # catalog-level prune: the tile-id partition filter — the
            # planner keeps only the matching tile dirs, numFiles shows
            # how many files the scan even LISTS (no footer opened for
            # the rest)
            box_tiles = tiles_for_box(xlo, xhi, ylo, yhi, n_tiles=64)
            tp_rows, tp_decoded, tp_files = scan_decoded(
                str(base / "tiled"), tile_ids=box_tiles
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
        lin_hit, lin_total = footer_hits(str(base / "linear"))
        zo_hit, zo_total = footer_hits(str(base / "zorder"))
        ti_hit, ti_total = footer_hits(str(base / "tiled"))
        ok = (
            lin_rows == zo_rows == ti_rows == tp_rows
            and zo_decoded < lin_decoded // 4
            and zo_hit < lin_hit
            # the round-13 gate: explicit tile cuts close the gap to
            # the bucket model exactly (4/64), and the tile-id filter
            # prunes to those same files at the catalog level
            and ti_hit == len(box_tiles)
            and tp_files == len(box_tiles)
        )
        results["zorder_pruning_ab"] = {
            "write_all_sec": write_sec,
            "result_rows": lin_rows[0],
            "result_checksum": lin_rows[1],
            "results_equal": lin_rows == zo_rows == ti_rows == tp_rows,
            "linear_files_stat_hit": f"{lin_hit}/{lin_total}",
            "zorder_files_stat_hit": f"{zo_hit}/{zo_total}",
            "tiled_files_stat_hit": f"{ti_hit}/{ti_total}",
            "linear_rows_decoded": lin_decoded,
            "zorder_rows_decoded": zo_decoded,
            "tiled_rows_decoded": ti_decoded,
            "tiled_dirprune_files_listed": tp_files,
            "tiled_dirprune_rows_decoded": tp_decoded,
            "model_tiles": len(box_tiles),
        }
        print(f"D zorder A/B: {results['zorder_pruning_ab']}", file=sys.stderr)
        return 0 if ok else 1
    except Exception as exc:  # noqa: BLE001
        results["zorder_pruning_ab"] = {"error": str(exc)[:300]}
        print(f"D zorder A/B: ERROR {exc}", file=sys.stderr)
        return 1


def phase_d(spark, results: dict, names: list[str]) -> int:
    from kmeans_mapreduce_spark.operators.graph import (
        pagerank,
        triangle_counts,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries import _embs
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        knn_edges_scaled,
    )

    rc = 0
    if "knn_bucketed_ab" in names:
        rc = knn_bucketed_ab(spark, results) or rc
    if "zorder_pruning_ab" in names:
        rc = zorder_pruning_ab(spark, results) or rc
    if "band_bucketed_ab" in names:
        rc = band_bucketed_ab(spark, results) or rc
    if not ({"graph_pagerank_sqrtcells", "graph_triangle_sqrtcells"} & set(names)):
        return rc
    t0 = time.time()
    # knn_edges_scaled returns a MATERIALIZED (localCheckpoint) frame —
    # both consumers below read the checkpoint blocks, no extra cache
    edges = knn_edges_scaled(spark, STRESS_DIR)
    n_edges = edges.count()
    build_sec = round(time.time() - t0, 1)
    print(f"D knn build (sqrt-N cells): {n_edges} edges {build_sec}s", file=sys.stderr)
    if "graph_pagerank_sqrtcells" in names:
        t0 = time.time()
        try:
            nodes = _embs(spark, STRESS_DIR).select(
                F.col("vec_id").alias("node")
            )
            nrows = pagerank(nodes, edges).count()
            results["graph_pagerank_sqrtcells"] = {
                "sec": round(time.time() - t0, 1),
                "rows": nrows,
                "edges": n_edges,
                "knn_build_sec": build_sec,
            }
            print(
                f"D pagerank: {results['graph_pagerank_sqrtcells']}",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["graph_pagerank_sqrtcells"] = {"error": str(exc)[:300]}
            print(f"D pagerank: ERROR {exc}", file=sys.stderr)
    if "graph_triangle_sqrtcells" in names:
        t0 = time.time()
        try:
            row = (
                triangle_counts(edges)
                .agg(
                    F.count("*").alias("nodes"),
                    F.expr("sum(triangles) div 3").alias("total"),
                )
                .collect()[0]
            )
            results["graph_triangle_sqrtcells"] = {
                "sec": round(time.time() - t0, 1),
                "nodes_in_triangles": row["nodes"],
                "total_triangles": row["total"],
                "edges": n_edges,
                "knn_build_sec": build_sec,
            }
            print(
                f"D triangles: {results['graph_triangle_sqrtcells']}",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["graph_triangle_sqrtcells"] = {"error": str(exc)[:300]}
            print(f"D triangles: ERROR {exc}", file=sys.stderr)
    return rc


def phase_c(spark, results: dict, names: list[str]) -> int:
    """Drive the streaming folds over the stress corpus; record wall
    clock AND the terminal state sizes (the thing that must stay
    bounded on a long-lived stream)."""
    rc = 0
    base = Path(STRESS_DIR) / "streaming"
    # always start from clean streaming state: a --keep rerun would
    # otherwise find committed checkpoints (no new batches fold ->
    # the kmeans pacing times out) and report the PREVIOUS run's
    # accepted/index/MV contents as fresh results
    shutil.rmtree(base, ignore_errors=True)
    docs_dir = f"{STRESS_DIR}/documents.parquet"

    if "stream_dedup_corpus" in names:
        from kmeans_mapreduce_spark.streaming.dedup_corpus import (
            stream_dedup_corpus,
        )

        acc, idx, ckpt = (
            str(base / "accepted"),
            str(base / "sig_index"),
            str(base / "dedup_ckpt"),
        )
        t0 = time.time()
        try:
            # 32 part files / 8 per trigger = 4 multi-file micro-batches
            stream_dedup_corpus(
                spark, docs_dir, acc, idx, ckpt, max_files_per_trigger=8
            )
            accepted = spark.read.parquet(acc).count()
            index = spark.read.parquet(idx)
            idx_rows = index.count()
            idx_bytes = sum(
                f.stat().st_size
                for f in Path(idx).rglob("*.parquet")
            )
            results["stream_dedup_corpus"] = {
                "sec": round(time.time() - t0, 1),
                "accepted": accepted,
                "index_rows": idx_rows,
                "index_bytes_per_doc": round(idx_bytes / max(1, idx_rows)),
            }
            print(f"C dedup: {results['stream_dedup_corpus']}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["stream_dedup_corpus"] = {"error": str(exc)[:300]}
            print(f"C dedup: ERROR {exc}", file=sys.stderr)

    if "stream_boost_filter" in names:
        from kmeans_mapreduce_spark.plans.pipeline_queries18 import (
            _boost_features,
            _boost_rounds,
        )
        from kmeans_mapreduce_spark.streaming.boost_stream import (
            apply_boost_filter,
            stream_boost_filter,
        )

        kept_dir, ckpt = str(base / "boost_kept"), str(base / "boost_ckpt")
        t0 = time.time()
        try:
            # train the shipped-depth ensemble (_BQ_ROUNDS, 5 as of
            # round 13) on the UNREPLICATED sf0.1
            # corpus (the offline-train half), then serve the frozen
            # model over the 50k-doc stress stream (the online half)
            fx = _boost_features(spark, SF01).localCheckpoint(eager=True)
            rounds = _boost_rounds(fx)
            train_sec = round(time.time() - t0, 1)
            t0 = time.time()
            stream_boost_filter(
                spark, docs_dir, kept_dir, ckpt, rounds,
                max_files_per_trigger=8,
            )
            drain_sec = round(time.time() - t0, 1)

            # doc-for-doc verification (count + id checksum — a swap
            # of one kept doc for another dropped one must fail), NOT
            # charged to the drain time
            def _sig(df):
                r = df.agg(
                    F.count("*").alias("n"),
                    F.sum("doc_id").alias("chk"),
                ).collect()[0]
                return (r["n"], r["chk"])

            kept_sig = _sig(spark.read.parquet(kept_dir))
            batch_sig = _sig(
                apply_boost_filter(spark.read.parquet(docs_dir), rounds)
            )
            total = spark.read.parquet(docs_dir).count()
            results["stream_boost_filter"] = {
                "train_sec": train_sec,
                "sec": drain_sec,
                "docs": total,
                "kept": kept_sig[0],
                "stream_equals_batch": kept_sig == batch_sig,
                "rounds": [
                    (r["j"], r["theta"], r["ge_is_pos"]) for r in rounds
                ],
            }
            print(
                f"C boost filter: {results['stream_boost_filter']}",
                file=sys.stderr,
            )
            if kept_sig != batch_sig:
                rc = 1
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["stream_boost_filter"] = {"error": str(exc)[:300]}
            print(f"C boost filter: ERROR {exc}", file=sys.stderr)

    if "stream_kmeans_2m" in names:
        from kmeans_mapreduce_spark.streaming.kmeans_stream import (
            drain_stream_kmeans,
        )

        t0 = time.time()
        try:
            # same 2M x 16 source as Phase A, streamed 16 partitions
            # per micro-batch (= 4 batches of 500k rows)
            opts = {
                "n": SYN_N,
                "dim": SYN_DIM,
                "k": SYN_K,
                "seed": 7,
                "partitions": 64,
                "parts_per_batch": 16,
            }
            batch = spark.read.format("synthetic_points")
            stream = spark.readStream.format("synthetic_points")
            for k, v in opts.items():
                batch = batch.option(k, v)
                stream = stream.option(k, v)
            init = [
                list(r["features"])
                for r in batch.load().where(F.col("id") < SYN_K).collect()
            ]
            model = drain_stream_kmeans(
                stream.load(),
                lambda df: df.select("id", "features"),
                init,
                checkpoint=str(base / "skm_ckpt"),
                # Python stream sources single-batch under availableNow;
                # pace explicitly until all 2M rows folded
                expected_rows=SYN_N,
            )
            results["stream_kmeans_2m"] = {
                "sec": round(time.time() - t0, 1),
                "batches": model.batches_seen,
                "weight_sum": int(sum(model.weights)),
                "state_floats": len(model.centroids)
                * (len(model.centroids[0]) + 1),
            }
            print(f"C kmeans: {results['stream_kmeans_2m']}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["stream_kmeans_2m"] = {"error": str(exc)[:300]}
            print(f"C kmeans: ERROR {exc}", file=sys.stderr)

    if "stream_quality_mv" in names:
        from kmeans_mapreduce_spark.sources.matview import (
            _read_manifest,
            read_matview,
        )
        from kmeans_mapreduce_spark.streaming.quality_stream import (
            stream_quality_counts,
        )

        mv, ckpt = str(base / "quality_mv"), str(base / "quality_ckpt")
        t0 = time.time()
        try:
            schema = spark.read.parquet(docs_dir).schema
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 8)
                .parquet(docs_dir)
            )
            q = stream_quality_counts(src, mv, ckpt)
            q.awaitTermination()
            view = read_matview(spark, mv)
            totals = view.agg(
                F.sum("n_docs").alias("d"), F.sum("n_kept").alias("k")
            ).collect()[0]
            results["stream_quality_mv"] = {
                "sec": round(time.time() - t0, 1),
                "mv_rows": view.count(),
                "n_docs": int(totals["d"]),
                "n_kept": int(totals["k"]),
                "batches_folded": int(
                    _read_manifest(spark, mv).get("batch_id", -1)
                )
                + 1,
            }
            print(f"C quality: {results['stream_quality_mv']}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["stream_quality_mv"] = {"error": str(exc)[:300]}
            print(f"C quality: ERROR {exc}", file=sys.stderr)

    if "stream_event_joins" in names:
        # Stream-stream join + session windows at 100x event volume
        # (1M rows, 40 files, 4 files/trigger => ~10 micro-batches).
        # Recorded state: MAX numRowsTotal / memoryUsedBytes across all
        # progress events — the bound that must stay flat on a
        # long-lived stream — plus watermark drop counts for honesty
        # (replica-boundary stragglers are legitimately late).
        from kmeans_mapreduce_spark.streaming.windows import (
            stream_session_windows,
            stream_stream_purchase_attribution,
        )

        ev_dir = build_stress_events(spark)
        workloads = (
            (
                "stream_join_attr_1m",
                lambda: stream_stream_purchase_attribution(
                    spark, ev_dir, max_files_per_trigger=4
                ),
            ),
            (
                "stream_session_1m",
                lambda: stream_session_windows(
                    spark, ev_dir, max_files_per_trigger=4
                ),
            ),
        )
        for label, df_fn in workloads:
            out, ck = str(base / f"{label}_out"), str(base / f"{label}_ckpt")
            t0 = time.time()
            try:
                q = (
                    df_fn()
                    .writeStream.format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ck)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                progress = q.recentProgress or []
                ops = [
                    o
                    for p in progress
                    for o in (p.get("stateOperators") or [])
                ]
                results[label] = {
                    "sec": round(time.time() - t0, 1),
                    "out_rows": spark.read.parquet(out).count(),
                    "batches": len(progress),
                    "state_rows_max": max(
                        (int(o.get("numRowsTotal", 0)) for o in ops),
                        default=0,
                    ),
                    "state_mem_max_bytes": max(
                        (int(o.get("memoryUsedBytes", 0)) for o in ops),
                        default=0,
                    ),
                    "dropped_by_watermark": sum(
                        int(o.get("numRowsDroppedByWatermark", 0))
                        for o in ops
                    ),
                }
                print(f"C {label}: {results[label]}", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001
                rc = 1
                results[label] = {"error": str(exc)[:300]}
                print(f"C {label}: ERROR {exc}", file=sys.stderr)

    if "stream_shard_export" in names:
        # Exactly-once shard export under a FORCED mid-run crash: start
        # the availableNow export over the 50k-doc stress corpus in
        # multi-file micro-batches, kill the query after the first
        # batches commit, then resume from the SAME checkpoint to
        # completion.  Evidence recorded: rows/distinct ids seen by a
        # metadata-log-aware reader must equal the corpus exactly (no
        # duplicated shards, no loss), plus committed-vs-physical file
        # counts (orphaned part files from the kill are excluded by the
        # sink's _spark_metadata log — that exclusion IS the
        # exactly-once mechanism a downstream consumer relies on).
        from kmeans_mapreduce_spark.streaming.export import (
            documents_stream_source,
            stream_export_jsonl,
        )

        out, ck = str(base / "shards"), str(base / "shards_ckpt")
        t0 = time.time()
        try:
            q = stream_export_jsonl(
                documents_stream_source(
                    spark, docs_dir, max_files_per_trigger=4
                ),
                out,
                ck,
                n_shards=8,
                await_termination=False,
            )
            # let >=2 micro-batches land, then simulate the crash
            deadline = time.time() + 300
            while (
                len([p for p in (q.recentProgress or []) if p]) < 2
                and q.isActive
                and time.time() < deadline
            ):
                time.sleep(0.25)
            batches_before = len(q.recentProgress or [])
            q.stop()
            # metadata-log-aware read only once a batch has COMMITTED;
            # before that the dir read would count orphan part files
            # (or throw on an empty dir)
            committed_mid = (
                spark.read.json(out).count()
                if (Path(out) / "_spark_metadata").exists()
                else 0
            )
            # resume: same checkpoint, fresh query, drain to completion
            q2 = stream_export_jsonl(
                documents_stream_source(
                    spark, docs_dir, max_files_per_trigger=4
                ),
                out,
                ck,
                n_shards=8,
                await_termination=False,
            )
            q2.awaitTermination()
            exported = spark.read.json(out)
            n_rows = exported.count()
            n_ids = exported.select("doc_id").distinct().count()
            corpus = spark.read.parquet(docs_dir).count()
            physical = len(list(Path(out).rglob("part-*.json")))
            # DISTINCT committed paths: a .compact file (appears every
            # fileSink.log.compactInterval=10 batches) repeats all
            # earlier entries, so raw line counts double-count
            committed_paths = set()
            for f in sorted((Path(out) / "_spark_metadata").glob("*")):
                if not f.is_file() or f.name.endswith(".crc"):
                    continue
                for line in f.read_text().splitlines():
                    if '"path"' in line:
                        committed_paths.add(
                            json.loads(line).get("path", line)
                        )
            resumed = len(q2.recentProgress or [])
            results["stream_shard_export"] = {
                "sec": round(time.time() - t0, 1),
                "corpus_rows": corpus,
                "exported_rows": n_rows,
                "distinct_ids": n_ids,
                "batches_before_kill": batches_before,
                "rows_committed_at_kill": committed_mid,
                "resumed_batches": resumed,
                "files_physical": physical,
                "files_committed": len(committed_paths),
                # the evidence is only a crash test if the resume had
                # real work left — a kill that landed after completion
                # degrades to a plain rerun and must not certify
                "killed_mid_run": bool(
                    resumed > 0 and committed_mid < corpus
                ),
                "exactly_once": bool(n_rows == corpus and n_ids == corpus),
            }
            print(
                f"C shard_export: {results['stream_shard_export']}",
                file=sys.stderr,
            )
            if not results["stream_shard_export"]["exactly_once"]:
                rc = 1
            if not results["stream_shard_export"]["killed_mid_run"]:
                rc = 1
                print(
                    "C shard_export: kill landed after completion — "
                    "crash evidence invalid, rerun",
                    file=sys.stderr,
                )
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["stream_shard_export"] = {"error": str(exc)[:300]}
            print(f"C shard_export: ERROR {exc}", file=sys.stderr)

    if "stream_corpus_pipeline" in names:
        # Round-13 VERDICT item 2: the stages compose in ONE topology.
        # Drain the 50k-doc corpus through triage -> frozen boost
        # filter -> incremental exact+near dedup -> content-addressed
        # shard export (streaming/corpus_pipeline.py), then run the
        # SAME fold via the driver-loop replay face over the same
        # lexicographic file groups and demand the terminal states be
        # identical doc-for-doc — checksum-gated across the WHOLE
        # chain, not per stage.  State bounds recorded per stage.
        from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
            replay_corpus_pipeline,
            stream_batch_file_groups,
            stream_corpus_pipeline,
        )

        from kmeans_mapreduce_spark.plans.kmeans_queries import (
            _fixed_centroids,
        )

        out_s = str(base / "corpus_pipe")
        out_r = str(base / "corpus_pipe_replay")
        ckpt = str(base / "corpus_pipe_ckpt")
        t0 = time.time()
        try:
            # IVF stage on: the stress embeddings (10x-replicated, ids
            # aligned with doc ids) against the frozen coarse quantizer
            # (first-8 convention over the UNREPLICATED corpus)
            embs = spark.read.parquet(f"{STRESS_DIR}/embeddings.parquet")
            cents = _fixed_centroids(spark, SF01, k=8)
            stream_corpus_pipeline(
                spark, docs_dir, out_s, ckpt, max_files_per_trigger=8,
                ivf_vectors=embs, ivf_centroids=cents,
            )
            drain_sec = round(time.time() - t0, 1)
            t0 = time.time()
            # replay the stream's OWN recorded batches (the source log
            # lists files in modified order, not path order — guessing
            # the grouping from sorted paths diverges)
            groups = stream_batch_file_groups(ckpt)
            replay_corpus_pipeline(
                spark, groups, out_r, ivf_vectors=embs, ivf_centroids=cents
            )
            replay_sec = round(time.time() - t0, 1)

            def _sig(out: str) -> dict:
                acc = spark.read.parquet(f"{out}/accepted")
                a = acc.agg(
                    F.count("*").alias("n"),
                    F.sum("doc_id").alias("chk"),
                    F.sum(
                        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10)
                        .cast("long")
                    ).alias("txt_chk"),
                ).collect()[0]
                qn = spark.read.parquet(f"{out}/quarantine").count()
                idx = spark.read.parquet(f"{out}/index").count()
                from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
                    _BAND_KEY_COL,
                )

                bnd = (
                    spark.read.parquet(f"{out}/index_bands")
                    .agg(
                        F.count("*").alias("n"),
                        F.sum("id").alias("id_chk"),
                        F.sum(F.hash("band", _BAND_KEY_COL)).alias("key_chk"),
                    )
                    .collect()[0]
                )
                met = sorted(
                    tuple(r)
                    for r in spark.read.parquet(f"{out}/metrics").collect()
                )
                sh = (
                    spark.read.json(f"{out}/shards")
                    .groupBy("shard")
                    .agg(
                        F.count("*").alias("n"),
                        F.sum("doc_id").alias("chk"),
                    )
                    .orderBy("shard")
                    .collect()
                )
                iv = (
                    spark.read.parquet(f"{out}/ivf")
                    .groupBy("cell")
                    .agg(
                        F.count("*").alias("n"),
                        F.sum("neighbor_id").alias("chk"),
                    )
                    .orderBy("cell")
                    .collect()
                )
                return {
                    "accepted": (a["n"], a["chk"], a["txt_chk"]),
                    "quarantined": qn,
                    "index_rows": idx,
                    "index_bands": (bnd["n"], bnd["id_chk"], bnd["key_chk"]),
                    "metrics": met,
                    "shards": [tuple(r) for r in sh],
                    "ivf_cells": [tuple(r) for r in iv],
                }

            s, r = _sig(out_s), _sig(out_r)
            idx_bytes = sum(
                f.stat().st_size
                for f in Path(f"{out_s}/index").rglob("*.parquet")
            )
            corpus = spark.read.parquet(docs_dir).count()
            equal = s == r
            results["stream_corpus_pipeline"] = {
                "sec": drain_sec,
                "replay_sec": replay_sec,
                "docs": corpus,
                "accepted": s["accepted"][0],
                "quarantined": s["quarantined"],
                "per_batch_metrics": [list(m) for m in s["metrics"]],
                "index_rows": s["index_rows"],
                "index_bytes_per_doc": round(
                    idx_bytes / max(1, s["index_rows"])
                ),
                "shard_rows": sum(x[1] for x in s["shards"]),
                "ivf_indexed": sum(x[1] for x in s["ivf_cells"]),
                "ivf_cells": len(s["ivf_cells"]),
                "stream_equals_replay": equal,
            }
            print(
                f"C corpus_pipeline: {results['stream_corpus_pipeline']}",
                file=sys.stderr,
            )
            if not equal:
                rc = 1
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["stream_corpus_pipeline"] = {"error": str(exc)[:300]}
            print(f"C corpus_pipeline: ERROR {exc}", file=sys.stderr)

        # Round-14 VERDICT item 3: the streamed IVF tree accumulates
        # batch=<b>/cell=<i> dirs forever — compact it to the batch
        # builder's cell-major layout and demand the file count
        # collapse with IDENTICAL probe results.  Depends on the
        # pipeline run above (embs/cents/out_s); skip rather than
        # masquerade a missing prerequisite as a compaction failure.
        pipe = results.get("stream_corpus_pipeline", {})
        if not pipe or "error" in pipe:
            results["ivf_compaction"] = {
                "skipped": "stream_corpus_pipeline did not complete"
            }
            print(
                "C ivf_compaction: skipped (pipeline incomplete)",
                file=sys.stderr,
            )
        else:
            try:
                from kmeans_mapreduce_spark.operators.similarity import (
                    compact_ivf_index,
                    ivf_topk_from_index,
                )

                ivf_tree = f"{out_s}/ivf"
                ivf_base = str(base / "ivf_compacted")
                queries = embs.where(F.col("vec_id") % 997 == 0)
                before = sorted(
                    map(
                        tuple,
                        ivf_topk_from_index(
                            spark, ivf_tree, queries, cents, k=5, n_probe=2,
                            id_col="vec_id", vec_col="embedding",
                        ).collect(),
                    )
                )
                t0 = time.time()
                comp = compact_ivf_index(spark, ivf_tree, ivf_base)
                comp_sec = round(time.time() - t0, 1)
                after = sorted(
                    map(
                        tuple,
                        ivf_topk_from_index(
                            spark, ivf_base, queries, cents, k=5, n_probe=2,
                            id_col="vec_id", vec_col="embedding",
                        ).collect(),
                    )
                )
                results["ivf_compaction"] = {
                    "sec": comp_sec,
                    "rows": comp["rows"],
                    "cells": comp["cells"],
                    "files_before": comp["files_before"],
                    "files_after": comp["files_after"],
                    "probe_queries": queries.count(),
                    "probe_identical": before == after,
                }
                print(
                    f"C ivf_compaction: {results['ivf_compaction']}",
                    file=sys.stderr,
                )
                if not results["ivf_compaction"]["probe_identical"]:
                    rc = 1
                if comp["files_after"] >= comp["files_before"]:
                    rc = 1
            except Exception as exc:  # noqa: BLE001
                rc = 1
                results["ivf_compaction"] = {"error": str(exc)[:300]}
                print(f"C ivf_compaction: ERROR {exc}", file=sys.stderr)

        # Round-15 VERDICT item 2: the post-compaction probe HANDOFF,
        # executable at the 50k point — compact MID-STREAM (after 3 of
        # the 4 recorded batches), keep folding the 4th through the
        # same fold_corpus_batch, and demand that probing
        # base ∪ (tree where batch > watermark) equals probing the
        # full uncompacted tree, with the delta visibly changing the
        # base-only answer (so the equality is not vacuous).
        pipe = results.get("stream_corpus_pipeline", {})
        if not pipe or "error" in pipe:
            results["ivf_probe_handoff"] = {
                "skipped": "stream_corpus_pipeline did not complete"
            }
            print(
                "C ivf_probe_handoff: skipped (pipeline incomplete)",
                file=sys.stderr,
            )
        else:
            try:
                from kmeans_mapreduce_spark.operators.similarity import (
                    ivf_topk_base_plus_delta,
                    ivf_topk_from_index,
                )
                from kmeans_mapreduce_spark.operators.similarity import (
                    compact_ivf_index as _compact,
                )
                from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
                    FROZEN_QUALITY_ENSEMBLE as _CP_ROUNDS,
                )
                from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
                    fold_corpus_batch as _cp_fold,
                )

                t0 = time.time()
                out_h = str(base / "corpus_handoff")
                tree_h = f"{out_h}/ivf"
                base_h = str(base / "ivf_handoff_base")
                # compact EARLY (after the first recorded batch): the
                # 10x-replicated stress corpus dedups later batches to
                # near-zero accepted docs, and the handoff claim needs
                # post-compaction batches that demonstrably index rows
                pre, post = groups[:1], groups[1:]
                for bid, grp in enumerate(pre):
                    _cp_fold(
                        spark, spark.read.parquet(*grp), bid, out_h,
                        _CP_ROUNDS, ivf_vectors=embs, ivf_centroids=cents,
                    )
                comp_h = _compact(spark, tree_h, base_h)
                wm = comp_h["watermark_batch"]
                for off, grp in enumerate(post):
                    _cp_fold(
                        spark, spark.read.parquet(*grp), len(pre) + off,
                        out_h, _CP_ROUNDS, ivf_vectors=embs,
                        ivf_centroids=cents,
                    )
                queries = embs.where(F.col("vec_id") % 997 == 0)

                def _probe_sorted(df):
                    return sorted(map(tuple, df.collect()))

                full = _probe_sorted(
                    ivf_topk_from_index(
                        spark, tree_h, queries, cents, k=5, n_probe=2,
                        id_col="vec_id", vec_col="embedding",
                    )
                )
                bpd = _probe_sorted(
                    ivf_topk_base_plus_delta(
                        spark, base_h, tree_h, queries, cents, k=5,
                        n_probe=2, id_col="vec_id", vec_col="embedding",
                    )
                )
                base_only = _probe_sorted(
                    ivf_topk_from_index(
                        spark, base_h, queries, cents, k=5, n_probe=2,
                        id_col="vec_id", vec_col="embedding",
                    )
                )
                delta_rows = (
                    spark.read.parquet(tree_h)
                    .where(F.col("batch") > wm)
                    .count()
                )
                results["ivf_probe_handoff"] = {
                    "sec": round(time.time() - t0, 1),
                    "watermark_batch": wm,
                    "batches_pre": len(pre),
                    "batches_post": len(post),
                    "delta_index_rows": delta_rows,
                    "probe_queries": queries.count(),
                    "bpd_equals_full_tree": bpd == full,
                    "delta_changes_base_only": base_only != full,
                }
                print(
                    f"C ivf_probe_handoff: {results['ivf_probe_handoff']}",
                    file=sys.stderr,
                )
                if not results["ivf_probe_handoff"]["bpd_equals_full_tree"]:
                    rc = 1
                if delta_rows > 0 and base_only == full:
                    # the post-watermark batches indexed rows, yet the
                    # probe cannot see them differ — the handoff row
                    # proved nothing; fail loudly instead
                    rc = 1
            except Exception as exc:  # noqa: BLE001
                rc = 1
                results["ivf_probe_handoff"] = {"error": str(exc)[:300]}
                print(f"C ivf_probe_handoff: ERROR {exc}", file=sys.stderr)

    if "corpus_probe_curve" in names:
        # Round-14 VERDICT item 2: MEASURE (don't model) the composed
        # fold's vs-index probe cost at stream length.  Drive the SAME
        # fold_corpus_batch over 16 micro-batches (2 of the 32 corpus
        # files each) with a driver loop, recording per-batch wall
        # time, the index rows the batch probed against
        # (n_index_rows), and the per-batch Spark JOB COUNT (job-group
        # scoped) — the observe()-metrics claim made measurable.
        from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
            fold_corpus_batch as _fold,
        )
        from kmeans_mapreduce_spark.streaming.corpus_pipeline import (
            FROZEN_QUALITY_ENSEMBLE as _ROUNDS,
        )

        out_c = str(base / "corpus_curve")
        t_all = time.time()
        try:
            files = sorted(
                str(p)
                for p in Path(docs_dir).glob("part-*.parquet")
            )
            groups = [files[i : i + 2] for i in range(0, len(files), 2)]
            sc = spark.sparkContext
            per_batch = []
            for bid, grp in enumerate(groups):
                gid = f"corpus_curve_b{bid}"
                sc.setJobGroup(gid, "corpus probe curve", False)
                t0 = time.time()
                m = _fold(
                    spark, spark.read.parquet(*grp), bid, out_c, _ROUNDS
                )
                sec = round(time.time() - t0, 2)
                sc.setLocalProperty("spark.jobGroup.id", None)
                jobs = len(sc.statusTracker().getJobIdsForGroup(gid))
                per_batch.append(
                    {
                        "b": bid,
                        "sec": sec,
                        "jobs": jobs,
                        "index_rows": m["n_index_rows"],
                        "accepted": m["n_accepted"],
                    }
                )
            secs = [p["sec"] for p in per_batch]
            results["corpus_probe_curve"] = {
                "sec": round(time.time() - t_all, 1),
                "batches": len(per_batch),
                "first4_sec": secs[:4],
                "last4_sec": secs[-4:],
                "jobs_per_batch": [p["jobs"] for p in per_batch],
                "index_rows_final": per_batch[-1]["index_rows"],
                "per_batch": per_batch,
            }
            print(
                f"C corpus_probe_curve: batches={len(per_batch)} "
                f"first4={secs[:4]} last4={secs[-4:]} "
                f"jobs={[p['jobs'] for p in per_batch][:6]}... "
                f"index_rows_final={per_batch[-1]['index_rows']}",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results["corpus_probe_curve"] = {"error": str(exc)[:300]}
            print(f"C corpus_probe_curve: ERROR {exc}", file=sys.stderr)
    return rc


def build_stress_events(spark) -> str:
    """10 TIME-SHIFTED replicas of the sf0.1 events (1M rows = 100x the
    correctness scale): disjoint event_id/user_id ranges AND a
    per-replica time shift of one span + 1h, written SEQUENTIALLY so
    file modification order tracks event time.  The file stream then
    sees roughly time-ordered micro-batches and the watermark genuinely
    advances and EVICTS state across the run — fully-overlapping
    replicas would mark everything after batch 1 late and measure
    nothing but drop counts."""
    out = f"{STRESS_DIR}/events_stream.parquet"
    ready = Path(STRESS_DIR) / "_EVENTS_READY"
    if ready.exists():
        return out
    # no sentinel: a prior build may have died mid-replica — a partial
    # corpus would silently record Phase C bounds against fewer rows
    shutil.rmtree(out, ignore_errors=True)
    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, SF01)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span_us = int((hi - lo).total_seconds() * 1_000_000) + 3_600_000_000
    for i in range(REPLICAS):
        (
            ev.select(
                (F.col("event_id") + i * 10_000_000).alias("event_id"),
                F.timestamp_micros(
                    F.unix_micros("ts") + F.lit(i * span_us)
                ).alias("ts"),
                (F.col("user_id") + i * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .repartition(4)
            .write.mode("append")
            .parquet(out)
        )
    ready.touch()
    return out


def build_stress_dir(spark) -> None:
    """10 replicas of the sf0.1 documents/embeddings with disjoint id
    ranges (offset per replica).  One job per table; the union is read
    10x from the same parquet, so build cost is bounded by write
    bandwidth."""
    out = Path(STRESS_DIR)
    if (out / "_READY").exists():
        return
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    embs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    doc_parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        for i in range(REPLICAS)
    ]
    emb_parts = [
        embs.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        for i in range(REPLICAS)
    ]
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    embs_u = emb_parts[0]
    for p in emb_parts[1:]:
        embs_u = embs_u.unionByName(p)
    d.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    embs_u.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    (out / "_READY").touch()


def main() -> int:
    subset = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark("stress-x100")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    from kmeans_mapreduce_spark.session import quiet_audited_window_warnings

    quiet_audited_window_warnings(spark)  # audited bounded-aggregate windows
    results = {}
    rc = 0

    # --- Phase A: synthetic K-Means at 2M x 16 ---------------------------
    from kmeans_mapreduce_spark.operators.kmeans import (
        fit_kmeans_mllib,
        fit_kmeans_native,
    )
    from kmeans_mapreduce_spark.sources import synthetic

    synthetic.register(spark)
    pts = (
        spark.read.format("synthetic_points")
        .option("n", SYN_N)
        .option("dim", SYN_DIM)
        .option("k", SYN_K)
        .option("seed", 7)
        .option("partitions", 64)
        .load()
    )
    if not subset:
        t0 = time.time()
        res = fit_kmeans_native(pts, k=SYN_K, dim=SYN_DIM, seed=7, max_iter=10)
        results["syn_kmeans_native_2M"] = {
            "sec": round(time.time() - t0, 1),
            "iters": res.iterations,
            "converged": res.converged,
        }
        print("A native:", results["syn_kmeans_native_2M"], file=sys.stderr)
        t0 = time.time()
        _, assigned = fit_kmeans_mllib(pts, k=SYN_K, seed=7, max_iter=10)
        n = assigned.groupBy("cluster_id").count().count()
        results["syn_kmeans_mllib_2M"] = {
            "sec": round(time.time() - t0, 1),
            "clusters": n,
        }
        print("A mllib:", results["syn_kmeans_mllib_2M"], file=sys.stderr)

    # --- Phase B: 10x-replicated corpus through the catalog callables ----
    t0 = time.time()
    build_stress_dir(spark)
    print(f"B build: {time.time() - t0:.1f}s", file=sys.stderr)
    import __spark_entry__ as e

    qs = e.queries()
    names = [
        n for n in (subset or PHASE_B) if n not in PHASE_C and n not in PHASE_D
    ]
    for name in names:
        t0 = time.time()
        try:
            nrows = qs[name](spark, STRESS_DIR).count()
            results[name] = {"sec": round(time.time() - t0, 1), "rows": nrows}
            print(f"B {name}: {results[name]}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results[name] = {"error": str(exc)[:300]}
            print(f"B {name}: ERROR {exc}", file=sys.stderr)

    # --- Phase C: streaming folds over the stress corpus ------------------
    c_names = (
        [n for n in subset if n in PHASE_C] if subset else list(PHASE_C)
    )
    if c_names:
        rc = phase_c(spark, results, c_names) or rc

    # --- Phase D: k-NN graph at the production k_cells knob ---------------
    d_names = (
        [n for n in subset if n in PHASE_D] if subset else list(PHASE_D)
    )
    if d_names:
        rc = phase_d(spark, results, d_names) or rc
    print(json.dumps({"stress": results}))
    if "--keep" not in sys.argv:
        shutil.rmtree(STRESS_DIR, ignore_errors=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
