"""Custom connector: a Spark 4 Python DataSource for FIMG image corpora.

``spark.read.format("binaryFile")`` gives (path, bytes); this source
goes further the way a production image connector would: it parses the
container header AT SCAN TIME and exposes typed metadata columns
(height/width/channels) alongside the raw payload, so metadata
predicates (e.g. ``WHERE width >= 64``) never ship pixel bytes to the
query — the multimodal-column model (opaque binary + typed metadata)
as a first-class source.

Partitioning: one input partition per file group (``files_per_task``),
so a 10⁸-file corpus fans out across executors instead of listing on
one task. Registration: ``spark.dataSource.register(FimgDataSource)``
then ``spark.read.format("fimg").option("path", dir).load()``.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_HEADER = struct.Struct(">4sHHB")

_SCHEMA = (
    "img_id string, height int, width int, channels int, "
    "length long, content binary"
)


class _FileChunk(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


_META_COLS = {"height", "width", "channels", "length"}
_OPS = {
    EqualTo: lambda a, b: a == b,
    GreaterThan: lambda a, b: a > b,
    GreaterThanOrEqual: lambda a, b: a >= b,
    LessThan: lambda a, b: a < b,
    LessThanOrEqual: lambda a, b: a <= b,
}


class FimgReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fimg source requires option 'path'")
        self.files_per_task = int(options.get("files_per_task", "64"))
        self._pushed = []

    def pushFilters(self, filters):
        """Accept comparison filters on the metadata columns — evaluated
        against the parsed header, so filtered-out files never surface
        their payload; everything else stays with Spark."""
        for f in filters:
            if (
                type(f) in _OPS
                and len(f.attribute) == 1
                and f.attribute[0] in _META_COLS
                and isinstance(f.value, int)
            ):
                self._pushed.append((f.attribute[0], _OPS[type(f)], f.value))
            else:
                yield f

    def partitions(self):
        names = sorted(
            f for f in os.listdir(self.path) if f.endswith(".fimg")
        )
        full = [os.path.join(self.path, f) for f in names]
        n = self.files_per_task
        chunks = [full[i : i + n] for i in range(0, len(full), n)] or [[]]
        return [_FileChunk(c) for c in chunks]

    def read(self, partition: _FileChunk):
        for p in partition.paths:
            with open(p, "rb") as fh:
                header = fh.read(_HEADER.size)
                magic, h, w, c = _HEADER.unpack_from(header)
                meta = {
                    "height": h,
                    "width": w,
                    "channels": c,
                    "length": os.path.getsize(p),
                }
                if any(not op(meta[col], val) for col, op, val in self._pushed):
                    continue  # pushed filter pruned this file — payload unread
                buf = header + fh.read()
            img_id = os.path.basename(p)[: -len(".fimg")]
            yield (img_id, h, w, c, meta["length"], buf)


class FimgDataSource(DataSource):
    @classmethod
    def name(cls):
        return "fimg"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return FimgReader(self.options)
