"""A/B the NN-Descent int8 prefilter at dim=512 (r13 VERDICT ask #3).

The prefilter was measured-rejected as the default at dim=64 (the int8
signature is only 8x narrower than the raw vector there) and kept
opt-in "for the dim >= 512 regime" — a claim that had never been
measured. This script builds a deterministic clustered dim-512 corpus
(NN-Descent's intended regime: locality to descend), runs
nn_descent_graph with prefilter on and off (alternated, noop sink,
fresh timing per arm), checks both outputs are IDENTICAL (the
residual-norm certificate is lossless), and prints one JSON line.

Usage: python scripts/bench_nnd_dim512.py [n] [dim] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_fixture(path: str, n: int, dim: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(24, dim))
    X = centers[rng.integers(0, 24, n)] + 0.25 * rng.normal(size=(n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(1, n + 1), type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in np.round(X, 6)],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path, row_group_size=max(1024, n // 16))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    path = f"/tmp/dim{dim}_fixture/embeddings.parquet"
    if not os.path.exists(path):
        build_fixture(path, n, dim)

    from amazonmsk_emr_tem_data_spark.operators.similarity import (
        nn_descent_graph,
    )
    from amazonmsk_emr_tem_data_spark.session import get_spark

    spark = get_spark("nnd-dim512")
    emb = spark.read.parquet(path)

    def run(prefilter: bool) -> float:
        t0 = time.perf_counter()
        nn_descent_graph(
            emb, k=6, iters=3, n_planes=6, seed=77, prefilter=prefilter
        ).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # warm both plans once
    run(False)
    run(True)
    times = {"off": [], "on": []}
    for _ in range(reps):  # alternated arms
        times["off"].append(run(False))
        times["on"].append(run(True))

    # output equality (sorted rows; cosines are double-equal because
    # the prefilter only PRUNES — survivors rescore on raw vectors)
    rows_off = sorted(
        map(tuple, nn_descent_graph(emb, k=6, iters=3, prefilter=False).collect())
    )
    rows_on = sorted(
        map(tuple, nn_descent_graph(emb, k=6, iters=3, prefilter=True).collect())
    )
    print(
        json.dumps(
            {
                "n": n,
                "dim": dim,
                "off_sec": [round(t, 2) for t in times["off"]],
                "on_sec": [round(t, 2) for t in times["on"]],
                "identical": rows_off == rows_on,
                "n_rows": len(rows_off),
                "loadavg": os.getloadavg()[0],
            }
        )
    )


if __name__ == "__main__":
    main()
