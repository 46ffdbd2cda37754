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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 Arbitrary State API v2)
# ---------------------------------------------------------------------------

def has_tws_runtime() -> bool:
    """The transformWithStateInPandas driver worker speaks protobuf to
    the JVM state server; without ``google.protobuf`` installed the
    query crashes at init. Gate, don't crash (same policy as the media
    codec stubs in operators/multimodal.py)."""
    import importlib.util

    try:
        # find_spec on a dotted name imports the parent package, which
        # itself raises when absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def running_stats_per_user(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over ``value`` via Spark 4's
    ``transformWithStateInPandas`` — the v2 arbitrary-state API
    (explicit typed state variables, TTL support, timers) that
    supersedes ``applyInPandasWithState``'s single state tuple.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) and a Python runtime with
    ``google.protobuf`` (check :func:`has_tws_runtime` first; the
    fully-supported v1 twin of this operator is ``ewma_per_user``).

    After a full ``availableNow`` drain the emitted final state per key
    equals the batch aggregate ``groupBy(user).agg(count, sum, max)`` —
    which is what the (runtime-gated) unit test asserts. State size is
    O(keys); each micro-batch folds Arrow batches executor-side.
    """
    from pyspark.sql.streaming import StatefulProcessor

    class _RunningStats(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "stats", "n LONG, total DOUBLE, vmax DOUBLE"
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._state.exists():
                n, total, vmax = self._state.get()
            else:
                n, total, vmax = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                vmax = max(vmax, float(pdf["value"].max()))
            self._state.update((n, total, vmax))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [vmax],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _RunningStats(),
            outputStructType=(
                "user_id LONG, n_events LONG, "
                "total_value DOUBLE, max_value DOUBLE"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )
