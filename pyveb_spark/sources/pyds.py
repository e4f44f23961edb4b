"""Custom Python DataSource (Spark 4 DataSource API): partitioned paged
reads.

The reference's REST scans (`dbt_client.py:444-647`, `tableau_client.py:
68-183`) pull pages serially on the driver and glue them into pandas. The
Spark-4-native shape is a registered Python ``DataSource`` whose reader
maps one *page* to one *input partition*: the planner schedules pages
across executors, so a 10,000-page extract reads with full cluster
parallelism, shows up in ``explain`` as a normal scan (column pruning
applies — the reader receives the pruned schema), and composes with every
downstream operator.

``PagedJsonDataSource`` here reads a directory of JSON-array page files —
the staged form of a paginated API (each page one file, the
``rest_fanout``/connector layer's output convention). Swapping the
per-partition ``read`` body for an HTTP GET of ``page=<i>`` gives the live
variant; the partition-planning and schema contract are identical, which
is the part the DataSource API owns.

Register once per session:  ``spark.dataSource.register(PagedJsonDataSource)``
then ``spark.read.format("paged_json").schema(s).option("path", dir).load()``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["PagedJsonDataSource", "register_paged_json"]


class _PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _PagedJsonReader(DataSourceReader):
    def __init__(self, options: dict, schema):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("paged_json requires option 'path'")
        self._fields = [f.name for f in schema.fields]

    def partitions(self):  # driver-side: one partition per page file
        pages = sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith(".json")
        )
        return [_PagePartition(p) for p in pages]

    def read(self, partition):  # executor-side: parse one page
        with open(partition.path, encoding="utf-8") as fh:
            records = json.load(fh)
        for rec in records:
            # missing keys → NULL, like a lenient API payload should
            yield tuple(rec.get(f) for f in self._fields)


class PagedJsonDataSource(DataSource):
    """``format("paged_json")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "paged_json"

    def schema(self):
        # schema must be supplied by the caller (declared-schema engine,
        # SURVEY §1.2); raising here surfaces a clear contract error
        raise NotImplementedError(
            "paged_json: pass an explicit schema via .schema(...)"
        )

    def reader(self, schema) -> DataSourceReader:
        return _PagedJsonReader(self.options, schema)


def register_paged_json(spark) -> None:
    """Idempotent registration of the format for this session."""
    spark.dataSource.register(PagedJsonDataSource)
