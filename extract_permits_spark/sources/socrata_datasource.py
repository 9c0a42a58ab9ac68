"""Socrata as a Spark 4 Python DataSource with real filter pushdown (S1).

The idiomatic DSv2-style packaging of sources/socrata.py: register once,
then

    spark.dataSource.register(SocrataDataSource)
    spark.read.format("socrata")
         .option("date_col", "issue_date")
         .option("start_date", "1900-01-01").option("end_date", "3000-01-01")
         .load()
         .where("issue_date >= '2023-01-01'")   # ← pushed into the fetch

``pushFilters`` narrows the date window from Catalyst's filters (the SoQL
``$where`` the reference hand-builds, chicago/permit_cleaning.py:539-554),
``partitions()`` splits the window into one fetch per task, and each task
pulls only its slice.

Offline mode (this container has no egress): ``fixture_path`` points at a
JSON-lines file served through the same SoQL filter semantics, so the
pushdown path is fully testable; in deployment, drop in an HTTP fetch.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql import types as T

from extract_permits_spark.sources.socrata import partition_date_range

DEFAULT_SCHEMA = (
    "permit_ string, issue_date string, reported_cost string, "
    "street_number string, street_direction string, street_name string, "
    "suffix string, contact_1_name string, work_description string, "
    "pin_list string"
)


@dataclass
class DateWindow(InputPartition):
    start: str
    end: str


class SocrataReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema_ = schema
        self.date_col = options.get("date_col", "issue_date")
        self.start = options.get("start_date", "1900-01-01")
        self.end = options.get("end_date", "3000-01-01")
        self.num_partitions = int(options.get("num_partitions", "8"))
        self.fixture_path = options.get("fixture_path")
        self.dataset = options.get("dataset", "ydr8-5enu")

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Narrow the fetch window from date-column predicates; everything
        else is returned for Spark to evaluate post-scan."""
        for f in filters:
            col = f.attribute[0] if hasattr(f, "attribute") else None
            if col == self.date_col and isinstance(
                f, (GreaterThan, GreaterThanOrEqual)
            ):
                lo = str(f.value)[:10]
                if lo > self.start:
                    self.start = lo
            elif col == self.date_col and isinstance(
                f, (LessThan, LessThanOrEqual)
            ):
                hi = str(f.value)[:10]
                if hi < self.end:
                    self.end = hi
            elif col == self.date_col and isinstance(f, EqualTo):
                self.start = self.end = str(f.value)[:10]
            else:
                yield f  # unsupported → Spark re-applies

    def partitions(self) -> Sequence[InputPartition]:
        return [
            DateWindow(lo, hi)
            for lo, hi in partition_date_range(self.start, self.end, self.num_partitions)
        ]

    def read(self, partition: DateWindow) -> Iterator[tuple]:
        names = [f.name for f in self.schema_.fields]
        for rec in self._fetch(partition.start, partition.end):
            d = rec.get(self.date_col)
            # same SoQL date-prefix semantics as the window split
            if d is None or not (partition.start <= d[:10] <= partition.end):
                continue
            yield tuple(
                None if rec.get(n) is None else str(rec.get(n)) for n in names
            )

    def _fetch(self, start: str, end: str) -> Iterator[dict]:
        if self.fixture_path:
            with open(self.fixture_path) as fh:
                for line in fh:
                    if line.strip():
                        yield json.loads(line)
            return
        raise NotImplementedError(
            "no network egress in this environment; set fixture_path, or swap "
            "_fetch for an HTTP SoQL GET in deployment"
        )


class SocrataDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "socrata"

    def schema(self) -> str:
        return self.options.get("schema_ddl", DEFAULT_SCHEMA)

    def reader(self, schema: T.StructType) -> SocrataReader:
        return SocrataReader(schema, dict(self.options))
