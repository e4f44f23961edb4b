"""Config-driven pipeline spec: config.yml + CLI contract → a Pipeline.

Reference parity (SURVEY.md §2.13): the reference drives every pipeline from
CLI args + ``config.yml`` — ``common.py:249-288`` (arg contract:
``--env {local,dev,prd,stg} --type {event,incremental,full_refresh}
--airflow_execution_date --task ...``), ``config.py:37-62`` (upward search
for the config file), ``config.py:77-106`` (partition-key computation at
year/month/day/hour/minute/second granularity), ``config.py:111-259``
(general/source/transform/target sections with per-env and per-task key
resolution + required-key validation).

Here the resolved config builds a ``plans.Pipeline`` — one Spark job — and
the partition key becomes real partition COLUMNS (``sinks.writers.
with_date_partitions`` + ``partitionBy``) instead of an S3 key-prefix
string, so partition pruning works at the scan.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

__all__ = [
    "ENVS",
    "PIPELINE_TYPES",
    "GRANULARITIES",
    "partition_key",
    "partition_values",
    "find_config_file",
    "parse_cli",
    "PipelineConfig",
]

ENVS = ("local", "dev", "stg", "prd")
PIPELINE_TYPES = ("event", "incremental", "full_refresh")
GRANULARITIES = ("year", "month", "day", "hour", "minute", "second")


def partition_values(date: datetime, granularity: str = "day") -> dict[str, str]:
    """Zero-padded partition column values down to ``granularity`` ↔
    ``config.py:77-106`` / ``common.py:47-61``."""
    if granularity not in GRANULARITIES:
        raise ValueError(f"granularity must be one of {GRANULARITIES}")
    parts = {
        "year": f"{date.year:04d}",
        "month": f"{date.month:02d}",
        "day": f"{date.day:02d}",
        "hour": f"{date.hour:02d}",
        "minute": f"{date.minute:02d}",
        "second": f"{date.second:02d}",
    }
    keep = GRANULARITIES[: GRANULARITIES.index(granularity) + 1]
    return {k: parts[k] for k in keep}


def partition_key(date: datetime, granularity: str = "day") -> str:
    """Hive-style key string ``year=YYYY/month=MM/day=DD[...]`` — kept for
    compatibility with prefix-keyed layouts; new tables should partition by
    the columns from ``partition_values`` instead."""
    return "/".join(f"{k}={v}" for k, v in partition_values(date, granularity).items())


def find_config_file(start_dir: str | None = None, name: str = "config.yml") -> str:
    """Upward directory search for the config file ↔ ``config.py:37-62``."""
    d = os.path.abspath(start_dir or os.getcwd())
    while True:
        cand = os.path.join(d, name)
        if os.path.isfile(cand):
            return cand
        parent = os.path.dirname(d)
        if parent == d:
            raise FileNotFoundError(f"{name} not found from {start_dir} upward")
        d = parent


def parse_cli(argv: list[str] | None = None) -> argparse.Namespace:
    """The reference's CLI contract ↔ ``common.py:249-288`` (keyword form;
    the legacy positional variant ``common.py:63-124`` is not reproduced)."""
    p = argparse.ArgumentParser(description="pyveb_spark pipeline driver")
    p.add_argument("--env", required=True, choices=ENVS)
    p.add_argument("--type", required=True, choices=PIPELINE_TYPES, dest="pipeline_type")
    p.add_argument("-d", "--airflow_execution_date", required=True)
    p.add_argument("--task", default=None)
    p.add_argument("--event_bucket", default=None)
    p.add_argument("--event_prefix", default=None)
    p.add_argument("--year", default=None)
    p.add_argument("--data_sources", default=None)
    p.add_argument(
        "--partition_granularity", default="day", choices=GRANULARITIES
    )
    args = p.parse_args(argv)
    # lenient ISO-8601 parse ↔ common.py:222-247 / config.py:65-75 (airflow
    # dates arrive with T separators, offsets, microseconds)
    raw = args.airflow_execution_date.replace("Z", "+00:00")
    try:
        args.execution_datetime = datetime.fromisoformat(raw)
    except ValueError as exc:
        raise SystemExit(f"invalid --airflow_execution_date {raw!r}: {exc}")
    if args.execution_datetime.tzinfo is None:
        args.execution_datetime = args.execution_datetime.replace(tzinfo=timezone.utc)
    return args


@dataclass
class PipelineConfig:
    """Resolved view of a config.yml for one (env, task).

    Layout (mirrors the reference's sections, ``config.py:151-259``)::

        general:  {required_keys: [...], ...}
        source:   {<task>: {local: {...}, prd: {...}, ...}}
        transform:{<task>: {...}}
        target:   {<task>: {local: {...}, prd: {...}, ...}}

    Section values may be keyed per-task, per-env, both, or neither —
    ``resolve`` walks task-then-env and merges shallow dicts, validating
    ``required_keys`` like the reference's asserts (``config.py:164-174``).
    """

    env: str
    task: str | None = None
    raw: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_yaml(
        cls, env: str, task: str | None = None, path: str | None = None
    ) -> "PipelineConfig":
        import yaml

        path = path or find_config_file()
        with open(path) as fh:
            return cls(env=env, task=task, raw=yaml.safe_load(fh) or {})

    def _narrow(self, node: Any) -> Any:
        """Descend through optional task and env keyings."""
        if isinstance(node, dict) and self.task is not None and self.task in node:
            node = node[self.task]
        if isinstance(node, dict) and self.env in node:
            node = node[self.env]
        return node

    def resolve(self, section: str, required: list[str] | None = None) -> dict:
        node = self._narrow(self.raw.get(section, {}))
        if not isinstance(node, dict):
            raise TypeError(f"config section {section!r} did not resolve to a dict")
        if required is None:  # explicit [] disables validation
            required = self.raw.get("general", {}).get(
                f"required_{section}_keys", []
            )
        missing = [k for k in required if k not in node]
        if missing:
            raise KeyError(f"config {section} missing required keys: {missing}")
        return node

    @property
    def general(self) -> dict:
        g = self.raw.get("general", {})
        return g if isinstance(g, dict) else {}
