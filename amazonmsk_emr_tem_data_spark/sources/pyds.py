"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
an ordered, offset-tracked telemetry replay source.

The reference's ingest loop is a driver-side Python producer that reads
a CSV and emits rows to Kafka in order at a fixed rate
(``/root/reference/pyspark_scripts/temDataRead.py:43-66``), then a
separate consumer re-reads them from the topic. This module provides
the same semantics as a first-class pluggable Spark source instead of
an external process pair:

- **batch**: ``spark.read.format("tem_telemetry").option("path", p)`` —
  a partitioned scan (one input partition per row slice, executors read
  their slice only, driver never touches data rows);
- **streaming**: ``spark.readStream.format("tem_telemetry")`` — ordered
  micro-batch replay with REAL offsets: the offset is the row position,
  ``latestOffset`` advances by ``batch_rows`` per micro-batch, commits
  are monotone, and a checkpoint restart resumes from the committed
  offset without re-emitting (exactly-once into an idempotent sink) —
  the Kafka-offset contract (S3) demonstrated broker-free.

Rows are served from a parquet file via pyarrow row slices; the file
path, per-batch row budget, and slice width are options. At scale the
same shape serves any cursor-addressable feed (a Kinesis shard, an
HTTP paging API, a CDC log): offsets are positions, partitions are
position ranges, reads are executor-side.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

DEFAULT_BATCH_ROWS = 500
DEFAULT_SLICE_ROWS = 200


class _RowRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _read_slice(path: str, start: int, end: int, columns: Sequence[str]):
    """Executor-side: yield tuples for rows [start, end) of the file."""
    import pyarrow.parquet as pq

    if end <= start:
        return
    table = pq.read_table(path, columns=list(columns))
    for batch in table.slice(start, end - start).to_batches():
        cols = [c.to_pylist() for c in batch.columns]
        yield from zip(*cols)


def _count_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _slices(path: str, start: int, end: int, width: int) -> list[_RowRange]:
    return [
        _RowRange(path, s, min(s + width, end))
        for s in range(start, end, width)
    ]


class _TemBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.slice_rows = int(
            options.get("slice_rows", DEFAULT_SLICE_ROWS)
        )

    def partitions(self) -> list[InputPartition]:
        return _slices(self.path, 0, _count_rows(self.path), self.slice_rows)

    def read(self, partition: _RowRange) -> Iterator[tuple]:
        yield from _read_slice(
            partition.path,
            partition.start,
            partition.end,
            self.schema.fieldNames(),
        )


class _TemStreamReader(DataSourceStreamReader):
    """Partition-parallel reader (throttle off): ``latestOffset`` is
    always EOF — a pure function of the file, so it cannot regress
    across restarts — and each micro-batch's row range splits into
    executor-side slices. Reader-local mutable offsets would be a bug:
    a restarted reader doesn't know the WAL's committed position, so
    any 'advance by N per call' scheme re-emits rows after recovery
    (the throttled mode therefore lives in the SIMPLE reader below,
    whose ``read(start)`` is handed the durable start offset)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.slice_rows = int(options.get("slice_rows", DEFAULT_SLICE_ROWS))
        self.n_rows = _count_rows(self.path)

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        return {"row": self.n_rows}

    def partitions(
        self, start: dict, end: dict
    ) -> list[InputPartition]:
        return _slices(self.path, start["row"], end["row"], self.slice_rows)

    def read(self, partition: _RowRange) -> Iterator[tuple]:
        yield from _read_slice(
            partition.path,
            partition.start,
            partition.end,
            self.schema.fieldNames(),
        )

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint WAL; nothing external to clean
        pass


class _TemSimpleStreamReader(SimpleDataSourceStreamReader):
    """Throttled ordered replay (default): at most ``batch_rows`` rows
    per micro-batch — the reference's rate-capped producer loop
    (``temDataRead.py``'s 2 msg/s sleep) expressed as an offset budget.
    ``read(start)`` RECEIVES the durable start offset every batch, so
    the budget is restart-safe by construction: after recovery the next
    batch continues from the WAL position, never re-emitting.
    ``readBetweenOffsets`` replays an uncommitted batch
    deterministically on recovery."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.batch_rows = int(options.get("batch_rows", DEFAULT_BATCH_ROWS))
        self.n_rows = _count_rows(self.path)

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        s = start["row"]
        e = min(s + self.batch_rows, self.n_rows)
        # materialized, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator to allow replay, and generators
        # aren't copyable. Bounded by batch_rows, so driver memory is
        # capped by the throttle budget itself.
        rows = list(_read_slice(self.path, s, e, self.schema.fieldNames()))
        return (iter(rows), {"row": e})

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        return _read_slice(
            self.path, start["row"], end["row"], self.schema.fieldNames()
        )

    def commit(self, end: dict) -> None:
        pass


class TemTelemetryDataSource(DataSource):
    """``format("tem_telemetry")`` — ordered telemetry replay source."""

    @classmethod
    def name(cls) -> str:
        return "tem_telemetry"

    def schema(self) -> str:
        # default schema = the events table; callers can .schema(...) a
        # projection and the readers serve exactly those columns. ts is
        # NTZ because the file stores no timezone (the batch loader
        # load_table normalizes flavors for the relational operators;
        # this source serves the file's own type).
        return (
            "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _TemBatchReader(schema, self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        # throttle on (default) -> raise so Spark falls back to the
        # simple reader, whose read(start) gets the durable offset and
        # is therefore restart-safe; throttle off -> partition-parallel
        # reader with a constant EOF latestOffset.
        if str(self.options.get("throttle", "true")).lower() == "true":
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader (throttled)"},
            )
        return _TemStreamReader(schema, self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> "SimpleDataSourceStreamReader":
        return _TemSimpleStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(TemTelemetryDataSource)


def offsets_json_roundtrip(offset: dict) -> dict:
    """Offsets must survive the checkpoint WAL's JSON round-trip."""
    return json.loads(json.dumps(offset))
