"""Custom STREAMING connector: a Spark 4 Python ``DataSourceStreamReader``
— the streaming twin of the batch FIMG source (fimg_source.py).

A replayable "table tail" over a parquet file with ROW-GROUP-granular
offsets: the reader plans one input partition per row group in the
(start, end] offset range, so the actual reads run ON EXECUTORS
(``read`` receives a partition, not the whole range — this is the
distributed ``DataSourceStreamReader``, not the driver-side
``SimpleDataSourceStreamReader``), and a resumed query re-plans exactly
the uncommitted row groups — the offset/commit contract that gives a
custom source exactly-once semantics under checkpointing.

Scale: offsets are row-group ordinals (parquet's native replay unit);
planning touches only file METADATA (footer), never data; per-partition
reads are row-group-local. A production tail would list many files and
use (file, row-group) pairs as offsets — same protocol, one more level.

Trigger note: availableNow falls back to single-batch execution for
Python micro-batch sources (engine limitation, logged by Spark) —
``latestOffset`` therefore reports everything available instead of
throttling, so a drain can never strand uncommitted tail batches.
Cross-batch incremental maintenance is covered by the file-feed
streaming queries (maxFilesPerTrigger staging); THIS source's surface
is the Python streaming source protocol itself.

Column scope: the reader exposes (event_id, user_id, event_type,
value) — ``ts`` stays behind core.catalog's nanos normalization on the
batch path; a streaming source declaring its own schema must not
re-introduce the raw TIMESTAMP(NANOS) drift that path exists to stop.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)
_COLS = [f.name for f in _SCHEMA.fields]


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, rg: int):
        self.path = path
        self.rg = rg


class EventTailStreamReader(DataSourceStreamReader):
    def __init__(self, path: str):
        import pyarrow.parquet as pq

        self._path = path
        # footer-only: row-group count without touching data pages
        self._n_rg = pq.ParquetFile(path).metadata.num_row_groups

    def initialOffset(self):
        return {"rg": 0}

    def latestOffset(self):
        return {"rg": self._n_rg}

    def partitions(self, start, end):
        return [
            _RowGroupPartition(self._path, i)
            for i in range(start["rg"], end["rg"])
        ]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        tbl = pq.ParquetFile(partition.path).read_row_group(
            partition.rg, columns=_COLS
        )
        # yield Arrow RecordBatches directly (the Python DataSource API
        # accepts them in place of tuple iterators): column-oriented
        # zero-copy transport instead of per-row pickling
        yield from tbl.to_batches()

    def commit(self, end):
        pass  # replayable source: nothing to release


class EventTailDataSource(DataSource):
    """``spark.readStream.format("eventtail").option("path", f).load()``"""

    @classmethod
    def name(cls) -> str:
        return "eventtail"

    def schema(self) -> StructType:
        return _SCHEMA

    def streamReader(self, schema: StructType) -> EventTailStreamReader:
        return EventTailStreamReader(self.options["path"])
