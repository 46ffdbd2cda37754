"""Decompose the structured-streaming fixed cost (r13 VERDICT ask #7).

Every stream query in the bench pays a per-run floor that is NOT the
data work: offset-log + commit-log writes, micro-batch planning, query
start/stop. This script measures that floor directly and attributes
the headline stream query's wall time:

  a) NO-OP stream: the same parquet-source availableNow reader with an
     empty ``foreachBatch`` handler — pure machinery, zero compute.
  b) The full ``stream_ann_ingest_dedup`` query, with the
     ``ann_ingest_batch`` handler wrapped by a timer, and the model
     load + final store read timed separately.

Output (one JSON line): medians over reps for
  noop_stream_floor  — (a): offset/commit log + planning + start/stop
  total              — (b) end-to-end, bench methodology (noop sink)
  handler_compute    — Σ time inside ann_ingest_batch during (b)
  model_load         — persisted-model read + collect
  machinery          — total - handler_compute - model_load - store_read
  store_read         — reading the drained store through the noop sink

The keep/change decision this feeds lives in SCALING.md ("streaming
fixed-cost decomposition", r14).

Usage: python scripts/profile_stream_floor.py [reps]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import amazonmsk_emr_tem_data_spark.streaming.pipelines as P  # noqa: E402
from amazonmsk_emr_tem_data_spark.queries import REGISTRY  # noqa: E402
from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("stream-floor")
    fn, _ = REGISTRY["stream_ann_ingest_dedup"]

    # warm: JVM + codegen + parquet footers (bench methodology)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    noop_floor, totals, handler, model_load, store_read = [], [], [], [], []

    for _ in range(reps):
        t0 = time.perf_counter()
        emb = P.embeddings_stream(spark, sf_dir)
        q = (
            emb.writeStream.foreachBatch(lambda df, bid: None)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="ckpt_floor_"),
            )
            .trigger(availableNow=True)
            .queryName("noop_floor")
            .start()
        )
        q.awaitTermination(300)
        noop_floor.append(time.perf_counter() - t0)

    orig_batch = P.ann_ingest_batch
    orig_model = getattr(
        sys.modules["amazonmsk_emr_tem_data_spark.queries._registry"],
        "_persisted_ann_model",
    )
    reg = sys.modules["amazonmsk_emr_tem_data_spark.queries._registry"]
    try:
        for _ in range(reps):
            h_acc: list[float] = []
            m_acc: list[float] = []

            def timed_batch(batch_df, store_dir, centroids, threshold=0.45):
                t = time.perf_counter()
                out = orig_batch(batch_df, store_dir, centroids, threshold)
                h_acc.append(time.perf_counter() - t)
                return out

            def timed_model(*a, **kw):
                t = time.perf_counter()
                out = orig_model(*a, **kw)
                m_acc.append(time.perf_counter() - t)
                return out

            P.ann_ingest_batch = timed_batch
            reg._persisted_ann_model = timed_model
            t0 = time.perf_counter()
            result = fn(spark, sf_dir)
            t1 = time.perf_counter()
            result.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            totals.append(t2 - t0)
            store_read.append(t2 - t1)
            handler.append(sum(h_acc))
            model_load.append(sum(m_acc))
            spark.catalog.clearCache()
    finally:
        P.ann_ingest_batch = orig_batch
        reg._persisted_ann_model = orig_model

    t, h, m, s = (
        _median(totals),
        _median(handler),
        _median(model_load),
        _median(store_read),
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "noop_stream_floor": round(_median(noop_floor), 3),
                "total": round(t, 3),
                "handler_compute": round(h, 3),
                "model_load": round(m, 3),
                "store_read": round(s, 3),
                "machinery": round(t - h - m - s, 3),
                "loadavg": os.getloadavg()[0],
            }
        )
    )


if __name__ == "__main__":
    main()
