"""REST API fan-out source — executor-side HTTP with retry/backoff.

Reference parity (SURVEY.md §2.1/§3.2): the reference fans API calls out
with a driver-side thread pool (``common.multithreading_list``,
``common.py:137-168``) over param lists built from warehouse columns
(``rs_client.py:444-469``, ``api_client.py:209-230``), with per-call
exponential backoff + jitter (``api_client.py:232-254``,
``custom_decorators.py:80-147``) and request params echoed into each
response as ``api_id`` / ``api_param_*`` / ``fk_*`` columns "to link tables
later" (``api_client.py:256-305``).

Spark-native design: the param table IS a DataFrame; ``mapInPandas`` runs
the HTTP fetch per partition on the executors (N× the driver pool's
throughput, bounded by ``repartition``), responses land as JSON strings to
be decoded with ``from_json``, and the echo columns ride along natively.
The HTTP transport is injectable — tests use a fake; production uses
urllib/requests (import-gated: not every cluster image ships requests).
"""

from __future__ import annotations

import json
import random
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_api_params",
    "rest_fanout",
    "http_get_fetcher",
    "RetryPolicy",
]


class RetryPolicy:
    """Exponential backoff + full jitter ↔ ``api_client.py:232-254`` /
    ``custom_decorators.py:80-147`` (3-5 attempts, 429/5xx-aware)."""

    def __init__(
        self,
        attempts: int = 4,
        base_delay: float = 0.5,
        max_delay: float = 8.0,
        retry_statuses: tuple[int, ...] = (429, 500, 502, 503, 504),
    ):
        self.attempts = attempts
        self.base_delay = base_delay
        self.max_delay = max_delay
        self.retry_statuses = retry_statuses

    def call(self, fn: Callable[[], tuple[int, str]]) -> tuple[int, str, int]:
        """Returns (status, body, attempts_used); retries on exceptions and
        retryable statuses, sleeping base*2^i with full jitter."""
        last: tuple[int, str] = (0, "")
        for i in range(self.attempts):
            try:
                status, body = fn()
                last = (status, body)
                if status not in self.retry_statuses:
                    return status, body, i + 1
            except Exception as exc:  # network errors retry like 5xx
                last = (-1, str(exc))
            if i < self.attempts - 1:
                delay = min(self.max_delay, self.base_delay * (2**i))
                time.sleep(random.uniform(0, delay))
        return last[0], last[1], self.attempts


def http_get_fetcher(timeout: float = 30.0) -> Callable[[str, dict], tuple[int, str]]:
    """Default GET transport (urllib — stdlib, no extra deps). Returns a
    ``(url, params) -> (status, body)`` callable for ``rest_fanout``."""
    from urllib.error import HTTPError
    from urllib.parse import urlencode
    from urllib.request import urlopen

    def _fetch(url: str, params: dict) -> tuple[int, str]:
        full = f"{url}?{urlencode(params)}" if params else url
        try:
            with urlopen(full, timeout=timeout) as resp:  # noqa: S310
                return resp.status, resp.read().decode("utf-8", "replace")
        except HTTPError as e:
            # urlopen raises on every non-2xx; surface the REAL status and
            # body so RetryPolicy's retry_statuses logic can act on it —
            # otherwise a non-retryable 404 is retried through the whole
            # backoff budget and recorded as status=-1
            return e.code, e.read().decode("utf-8", "replace")

    return _fetch


def with_api_params(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """Rows → JSON param strings ↔ ``create_api_params_from_df``
    (``api_client.py:209-230``): every column becomes a query param; adds a
    monotonic ``api_id`` if none given (the reference's response-linking
    id, ``api_client.py:74-83``)."""
    out = df
    if id_col is None:
        out = out.withColumn("api_id", F.monotonically_increasing_id())
        id_col = "api_id"
    payload_cols = [c for c in out.columns if c != id_col]
    return out.select(
        F.col(id_col).alias("api_id"),
        F.to_json(F.struct(*payload_cols)).alias("api_params"),
    )


def rest_fanout(
    params_df: DataFrame,
    url: str,
    fetcher: Callable[[str, dict], tuple[int, str]] | None = None,
    retry: RetryPolicy | None = None,
    params_col: str = "api_params",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fan the HTTP fetch over executors via ``mapInPandas``.

    Input: a DataFrame with ``api_id`` + a JSON ``params_col`` (from
    ``with_api_params``). Output columns: ``api_id``, ``api_params`` (echo,
    ↔ ``api_client.py:256-305``), ``status``, ``body`` (raw JSON to decode
    with ``from_json``), ``attempts``, ``error``.

    Scale notes: concurrency = partition count × executor cores — tune with
    ``num_partitions`` to respect the API's rate limit (the reference's
    thread-pool size analogue). Each partition reuses one transport. Errors
    are captured per-row (result/error struct ↔ ``common.py:137-168``'s
    results/errors dicts), never failing the job.
    """
    retry = retry or RetryPolicy()
    fetcher = fetcher or http_get_fetcher()
    if num_partitions is not None:
        params_df = params_df.repartition(num_partitions)

    out_schema = (
        "api_id long, api_params string, status int, body string, "
        "attempts int, error string"
    )

    def _fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                params = json.loads(row[params_col]) if row[params_col] else {}
                # fk_* / null params split out of the query string but kept
                # in the echo (api_client.py:256-305 semantics)
                query = {
                    k: v
                    for k, v in params.items()
                    if v is not None and not str(k).startswith("fk_")
                }
                status, body, attempts = retry.call(lambda: fetcher(url, query))
                ok = status // 100 == 2  # any 2xx (201/204/206 included)
                rows.append(
                    {
                        "api_id": row["api_id"],
                        "api_params": row[params_col],
                        "status": status,
                        "body": body if ok else None,
                        "attempts": attempts,
                        "error": None if ok else body,
                    }
                )
            yield pd.DataFrame(rows)

    return params_df.mapInPandas(_fetch_batches, schema=out_schema)
