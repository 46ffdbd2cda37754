"""Round-13 scale study: 10× AND 100× rows for the query added this
round (streaming ANN ingest near-dedup), so SCALING.md's committed
ratios always describe the shipped plans.

The ingest stream is measured in its PRODUCTION shape: the scaled
embeddings table is laid out as sf0.1-sized parquet shards (the
"new shard of freshly-embedded documents lands in object storage"
story) and drained with maxFilesPerTrigger=1, so every micro-batch is
bounded and the per-batch plan contract (broadcast the micro-batch-
sized arrivals; store vectors never shuffle) holds at any corpus
size. A whole-corpus single batch is a backfill misuse of the
operator — the study that exposed it (and the interpreted-fold
scoring it also exposed) is written up in SCALING.md.

Usage:
    python scripts/bench_round13_scale.py [x10_dir] [x100_dir]
Prints one JSON line
{"stream_ann_ingest_dedup": {"sf01": s, "x10": s, "x100": s,
 "r10": ratio, "r100": ratio, "batches_x100": n}}.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402


def _sharded_dir(spark, src_dir: str, shard_rows: int) -> str:
    """A fixture dir whose embeddings table is a DIRECTORY of
    ~shard_rows-row parquet files (other tables symlinked)."""
    out = tempfile.mkdtemp(prefix="ann_scale_")
    for p in glob.glob(os.path.join(src_dir, "*.parquet")):
        name = os.path.basename(p)
        if name != "embeddings.parquet":
            os.symlink(p, os.path.join(out, name))
    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    n = emb.count()
    shards = max(1, round(n / shard_rows))
    (
        emb.repartitionByRange(shards, "vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )
    return out


def _ingest_secs(spark, sf_dir: str, centroids, reps: int = 2,
                 mfpt: int | None = 1, timeout_s: int = 1800):
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        stream_ann_ingest,
    )

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = stream_ann_ingest(
            spark,
            sf_dir,
            centroids,
            max_files_per_trigger=mfpt,
            timeout_s=timeout_s,
        )
        n = out.count()
        times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return min(times), n


def main() -> None:
    src = "/root/testdata/sf0.1"
    x10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scaled_10"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled_100"
    for d, f in ((x10, 10), (x100, 100)):
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            from scripts.make_scaled_fixtures import build_scaled

            build_scaled(src, d, f)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("bench-scale-r13")
    from amazonmsk_emr_tem_data_spark.queries._registry import (
        _ANN_INGEST_THRESHOLD,
        _persisted_ann_model,
    )

    model = _persisted_ann_model(spark, src)
    cents = model["centroids"]
    shard = 2000  # sf0.1 embeddings rows — the committed batch size
    rec = {}
    sec, n01 = _ingest_secs(spark, src, cents)
    rec["sf01"] = round(sec, 2)
    d10 = _sharded_dir(spark, x10, shard)
    sec, n10 = _ingest_secs(spark, d10, cents)
    rec["x10"] = round(sec, 2)
    rec["r10"] = round(rec["x10"] / rec["sf01"], 2)
    d100 = _sharded_dir(spark, x100, shard)
    sec, n100 = _ingest_secs(spark, d100, cents, reps=1)
    rec["x100"] = round(sec, 2)
    rec["r100"] = round(rec["x100"] / rec["sf01"], 2)
    rec["rows"] = {"sf01": n01, "x10": n10, "x100": n100}
    print(f"# {rec}", file=sys.stderr, flush=True)
    print(json.dumps({"stream_ann_ingest_dedup": rec}))


if __name__ == "__main__":
    main()
