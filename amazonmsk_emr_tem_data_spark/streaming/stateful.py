"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has zero stateful operators (SURVEY.md §2.6) — its only
state is Kafka offsets held in memory. This module adds the canonical
custom-state pattern Spark offers beyond built-in windowed aggs: an
arbitrary per-key state machine fed Arrow batches per micro-batch.

Operator: **per-key EWMA tracker** — for every key it carries
(count, ewma) across micro-batches and emits one row per key per batch
with the updated smoothed value. This is the building block for
streaming anomaly detection (|x − ewma| thresholding) where a plain
windowed agg can't express the recursive update x̂ₜ = α·xₜ + (1−α)·x̂ₜ₋₁.

Determinism: rows within a micro-batch are sorted by (event-time,
event_id) before folding, so a single ``availableNow`` drain over a
bounded source equals the sequential batch computation — which is what
the unit test asserts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _make_ewma_fn(alpha: float):
    def update(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, ewma, last_ts_micros = state.get
        else:
            n, ewma, last_ts_micros = 0, None, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, row in pdf.iterrows():
                x = float(row["value"])
                ewma = x if ewma is None else alpha * x + (1.0 - alpha) * ewma
                n += 1
                last_ts_micros = max(
                    last_ts_micros, int(row["ts"].value // 1000)
                )
        state.update((n, ewma, last_ts_micros))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "ewma": [ewma],
                "last_ts": [pd.Timestamp(last_ts_micros * 1000)],
            }
        )

    return update


def ewma_per_user(stream: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-user streaming EWMA over ``value`` with arbitrary state
    carried across micro-batches (Arrow-batched, one state row per key —
    state size is O(keys), independent of stream length)."""
    return (
        stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_ewma_fn(alpha),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
