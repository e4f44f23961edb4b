"""Pipeline logging: console + file + shippable-buffer triple sink.

Parity with the reference's logger module (``logger.py:7-30`` colorized
formatter, ``logger.py:33-121`` console/file/StringIO triple handler,
``logger.py:124-135`` S3 shipper), re-expressed:

- A *named* logger per pipeline instead of mutating the root logger, so
  two pipelines in one driver process don't double-handle each other's
  records (the reference attaches everything to the root logger and
  returns ``False`` from its constructor path on bad input; here bad
  input raises).
- The object-store shipper takes an injectable ``put(body, bucket, key)``
  callable — the container has no cloud SDK, and on a cluster you pass
  ``boto3.client("s3").put_object`` (or any store's equivalent) at the
  call site. Executors never log through this: Spark's own log4j owns
  executor logs; this sink is for *driver-side* pipeline orchestration
  records, which is exactly how the reference used it.
"""

from __future__ import annotations

import logging
import os
import sys
from io import StringIO
from typing import Callable

_COLOR_CODES = {
    logging.CRITICAL: "\033[1;35m",
    logging.ERROR: "\033[1;31m",
    logging.WARNING: "\033[1;33m",
    logging.INFO: "\033[0;37m",
    logging.DEBUG: "\033[1;30m",
}
_RESET = "\033[0m"

#: ``PYVEB_LOG_FORMAT`` overrides the line template (env-keyed, like the
#: reference's single module-level template string).
_DEFAULT_FORMAT = (
    "%(color_on)s[%(asctime)s] [%(threadName)s] [%(levelname)-8s] "
    "%(name)s: %(message)s%(color_off)s"
)


class ColorFormatter(logging.Formatter):
    """Level-colored formatter; ``color=False`` emits the same template
    with empty color fields (file/buffer sinks stay grep-clean)."""

    def __init__(self, color: bool, fmt: str | None = None):
        super().__init__(fmt=fmt or os.environ.get("PYVEB_LOG_FORMAT", _DEFAULT_FORMAT))
        self.color = color

    def format(self, record: logging.LogRecord) -> str:
        if self.color and record.levelno in _COLOR_CODES:
            record.color_on = _COLOR_CODES[record.levelno]
            record.color_off = _RESET
        else:
            record.color_on = ""
            record.color_off = ""
        return super().format(record)


def _level(name: str) -> int:
    value = logging.getLevelName(name.upper())
    if not isinstance(value, int):
        raise ValueError(f"invalid log level: {name!r}")
    return value


class PipelineLogger:
    """Triple-sink pipeline logger.

    ``get_logger()`` returns a standard :class:`logging.Logger` wired to:

    1. console (stdout/stderr, colorized, own level),
    2. a ``<script>.log`` file next to ``log_dir``,
    3. an in-memory buffer (``.buffer``) that :class:`ObjectStoreLogShipper`
       ships to object storage at pipeline end.
    """

    def __init__(
        self,
        script_name: str,
        log_dir: str = ".",
        console_output: str = "stdout",
        console_level: str = "info",
        console_color: bool = True,
        file_level: str = "debug",
        fmt: str | None = None,
    ):
        if console_output not in ("stdout", "stderr"):
            raise ValueError(
                f"console_output must be stdout|stderr, got {console_output!r}"
            )
        base = os.path.splitext(os.path.basename(script_name))[0]
        self.name = base
        self.log_path = os.path.join(log_dir, f"{base}.log")
        self.buffer = StringIO()

        logger = logging.getLogger(f"pyveb_spark.pipeline.{base}")
        logger.setLevel(logging.DEBUG)
        logger.propagate = False
        logger.handlers.clear()

        console = logging.StreamHandler(
            sys.stdout if console_output == "stdout" else sys.stderr
        )
        console.setLevel(_level(console_level))
        console.setFormatter(ColorFormatter(console_color, fmt))
        logger.addHandler(console)

        filehandler = logging.FileHandler(self.log_path)
        filehandler.setLevel(_level(file_level))
        filehandler.setFormatter(ColorFormatter(False, fmt))
        logger.addHandler(filehandler)

        bufferhandler = logging.StreamHandler(self.buffer)
        bufferhandler.setLevel(_level(file_level))
        bufferhandler.setFormatter(ColorFormatter(False, fmt))
        logger.addHandler(bufferhandler)

        # chatty third-party loggers, same suppressions as the reference
        logging.getLogger("py4j").setLevel(logging.WARNING)
        logging.getLogger("urllib3").setLevel(logging.ERROR)

        self._logger = logger

    def get_logger(self) -> logging.Logger:
        return self._logger

    def close(self) -> None:
        for h in list(self._logger.handlers):
            h.close()
            self._logger.removeHandler(h)


class ObjectStoreLogShipper:
    """Ship the buffered log to object storage at pipeline end
    (``logger.py:124-135`` parity). ``put`` is any
    ``(body: str, bucket: str, key: str) -> None`` callable — inject the
    real client on a cluster, a fake in tests."""

    def __init__(
        self,
        pipeline_logger: PipelineLogger,
        bucket: str,
        key: str,
        put: Callable[[str, str, str], None],
    ):
        self.pipeline_logger = pipeline_logger
        self.bucket = bucket
        self.key = key
        self._put = put

    def send_logs(self) -> int:
        """Upload the buffer; returns the number of characters shipped."""
        body = self.pipeline_logger.buffer.getvalue()
        self._put(body, self.bucket, self.key)
        return len(body)
