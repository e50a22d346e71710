"""Barrier-stage fan-out (reference O3 parity).

The reference master fans a Map phase out to every worker with async
RPC and then blocks on the full set of replies before Reduce
(master.go: goroutine fan-out + WaitGroup barrier).  Normal Spark
stages already give the data-plane equivalent (a shuffle IS a
fan-out + barrier), so every query in this repo gets O3 for free — but
Spark also exposes the control-plane primitive directly: barrier
execution mode (SPIP: ~Spark 2.4, for gang-scheduled ML), where all
tasks of a stage run simultaneously and can exchange state mid-stage
via BarrierTaskContext.allGather.

`barrier_partial_stats` demonstrates the reference's exact
communication pattern on that primitive: every task computes its
partition's partial point-sum (the Map side of recenter), allGathers
everyone's partial counts, and emits its partials together with the
globally-agreed total — the in-stage consensus the reference reaches
with its reply barrier.  The production K-Means path
(operators/kmeans.py) deliberately does NOT use this: Catalyst partial
aggregation is faster and elastic (barrier mode requires gang
scheduling).  This operator exists for parity and for genuinely
gang-scheduled workloads (allreduce-style ML steps).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def barrier_partial_stats(points: DataFrame, dim: int, num_tasks: int = 8):
    """Run a barrier stage over `points` ([id, features]): each task
    computes (partial_count, partial_sum[dim]) for its partition,
    allGathers the counts, and returns rows
    (task_id, partial_count, global_count, sum0) — every task must
    report the SAME global_count (asserted by the caller/tests), which
    proves the barrier synchronized.

    Returns a list of dicts (one per task) — this is a control-plane
    demo on model-sized state; data-plane aggregation stays with
    Catalyst.
    """
    from pyspark import BarrierTaskContext

    sc = points.sparkSession.sparkContext
    # Barrier stages gang-schedule: every task must hold a core for the
    # whole stage, so cap tasks at the cluster's parallelism.
    n = min(num_tasks, sc.defaultParallelism)
    # repartition, not coalesce: barrier stages reject partition-count
    # changes INSIDE the stage (SPARK-24820); a shuffle boundary puts
    # the barrier stage cleanly after the exchange with exactly n tasks.
    rdd = points.select("features").repartition(n).rdd.map(lambda r: r["features"])

    def run(it):
        ctx = BarrierTaskContext.get()
        cnt = 0
        sums = [0.0] * dim
        for feats in it:
            cnt += 1
            for i, x in enumerate(feats):
                sums[i] += x
        # The reference's reply barrier: exchange partial counts with
        # every peer task, then proceed — allGather both synchronizes
        # and broadcasts the payloads.
        payloads = ctx.allGather(json.dumps(cnt))
        global_count = sum(json.loads(p) for p in payloads)
        yield {
            "task_id": ctx.partitionId(),
            "partial_count": cnt,
            "global_count": global_count,
            "sum0": sums[0] if dim else 0.0,
        }

    return rdd.barrier().mapPartitions(run).collect()
