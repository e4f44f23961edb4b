"""Driver-side file connectors: FTP, Excel, SharePoint, web-driver, fuzzy
filename matching.

Reference parity (SURVEY.md §2.1/§2.2): these sources/sinks are *driver-side
by nature* — they talk to systems with no splittable read API (an FTP server,
a SharePoint document library, one xlsx workbook). The reference implements
them in ``ftp_client.py``, ``sharepoint_client.py``, ``excel_client.py``,
``request_client.py`` and ``selenium_client.py``. The engine keeps the same
boundary the survey prescribes: a thin connector lands bytes where executors
can read them (or lifts one small file into a DataFrame); everything after
that is the normal distributed plan. Nothing here ever holds big data on the
driver — big data arrives via ``sources.readers`` / JDBC / REST fan-out.

Network/credential-bound pieces accept an injectable transport so tests run
against fakes (the same pattern ``sources.rest`` uses); libraries this
container doesn't ship (openpyxl, office365, selenium) are import-gated with
actionable errors.
"""

from __future__ import annotations

import difflib
import io
import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "match_filename",
    "list_files",
    "ftp_upload",
    "read_excel_df",
    "excel_sink",
    "sharepoint_download",
    "sharepoint_upload",
    "webdriver_download",
]


def match_filename(wanted: str, available: Sequence[str], cutoff: float = 0.6) -> str | None:
    """Closest filename by difflib ratio ↔ ``sharepoint_client.py:121-127``
    (``get_close_matches(..., 1)``). Driver-side: the candidate list is a
    directory listing, never data-scale. For a data-scale similarity join
    use ``operators.joins``/``operators.similarity`` instead."""
    hit = difflib.get_close_matches(wanted, list(available), n=1, cutoff=cutoff)
    return hit[0] if hit else None


def ftp_upload(
    local_path: str,
    remote_name: str,
    host: str,
    user: str,
    password: str,
    env_prefix: str | None = None,
    make_conn: Callable[[], object] | None = None,
) -> str:
    """Upload one file to FTP with an env-prefixed name ↔
    ``ftp_client.py:47-77``. ``make_conn`` injects a fake for tests; the
    default uses stdlib ``ftplib`` over TLS-less FTP exactly like the
    reference (swap in FTP_TLS for hardened deployments)."""
    name = f"{env_prefix}_{remote_name}" if env_prefix else remote_name
    if make_conn is None:
        import ftplib

        def make_conn():
            conn = ftplib.FTP(host)
            conn.login(user, password)
            return conn

    conn = make_conn()
    try:
        with open(local_path, "rb") as fh:
            conn.storbinary(f"STOR {name}", fh)
    finally:
        close = getattr(conn, "quit", None) or getattr(conn, "close", None)
        if close:
            close()
    return name


def read_excel_df(
    spark: SparkSession,
    path_or_bytes: str | bytes,
    sheet_name: int | str = 0,
    header: int = 0,
) -> DataFrame:
    """One xlsx workbook → Spark DataFrame ↔ ``request_client.py:33-58`` /
    ``tf_client.py:44-45``. Excel files are small by format; lifting through
    pandas on the driver is the correct boundary (Arrow-backed
    ``createDataFrame``). Import-gated: needs openpyxl."""
    import pandas as pd

    try:
        buf = io.BytesIO(path_or_bytes) if isinstance(path_or_bytes, bytes) else path_or_bytes
        pdf = pd.read_excel(buf, sheet_name=sheet_name, header=header)
    except ImportError as exc:  # openpyxl missing in this container
        raise NotImplementedError(
            "read_excel_df needs openpyxl (not shipped in this environment); "
            "install it or stage the sheet as CSV and use sources.read_csv"
        ) from exc
    return spark.createDataFrame(pdf)


def excel_sink(
    df: DataFrame,
    path: str,
    sheet_name: str = "data",
    max_rows: int = 100_000,
) -> str:
    """DataFrame → styled xlsx ↔ ``excel_client.py:7-69``. Guarded driver
    collect (`max_rows`) because xlsx IS a driver-side format; anything
    bigger belongs in Parquet/CSV sinks. Import-gated: needs an Excel
    writer engine (openpyxl/xlsxwriter)."""
    # one job: fetch max_rows+1 and refuse on overflow (a separate count()
    # would execute the whole upstream plan twice)
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"excel_sink refuses > {max_rows} rows; use write_parquet/write_csv"
        )
    try:
        pdf.to_excel(path, sheet_name=sheet_name, index=False, freeze_panes=(1, 0))
    except ImportError as exc:
        raise NotImplementedError(
            "excel_sink needs openpyxl/xlsxwriter (not shipped in this environment)"
        ) from exc
    return path


def sharepoint_download(
    site_url: str,
    folder: str,
    filename: str,
    dest_dir: str,
    client: object | None = None,
) -> str:
    """Fuzzy-match ``filename`` in a SharePoint folder and download it ↔
    ``sharepoint_client.py:91-160``. ``client`` is an injected object with
    ``list_files(folder) -> list[str]`` and ``download(folder, name) ->
    bytes`` (tests pass a fake; production wraps office365-rest-python-client,
    which this container doesn't ship)."""
    if client is None:
        raise NotImplementedError(
            "no SharePoint client library in this environment; pass client=... "
            "implementing list_files/download"
        )
    names = client.list_files(folder)
    best = match_filename(filename, names)
    if best is None:
        raise FileNotFoundError(f"no close match for {filename!r} in {folder!r}")
    data = client.download(folder, best)
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, best)
    with open(dest, "wb") as fh:
        fh.write(data)
    return dest


def sharepoint_upload(
    local_path: str,
    folder: str,
    client: object | None = None,
    name_suffix: str | None = None,
) -> str:
    """Upload a file to a SharePoint folder ↔ ``sharepoint_client.py:
    162-204`` (which suffixes uploads with a date / unix timestamp so
    repeated loads never clobber). ``name_suffix`` keeps that convention
    but is caller-supplied (no hidden clock — deterministic pipelines pass
    their partition date). ``client`` is an injected object with
    ``upload(folder, name, data: bytes)``; returns the remote name."""
    if client is None:
        raise NotImplementedError(
            "no SharePoint client library in this environment; pass "
            "client=... implementing upload(folder, name, data)"
        )
    base = os.path.basename(local_path)
    if name_suffix:
        stem, dot, ext = base.rpartition(".")
        base = f"{stem}_{name_suffix}{dot}{ext}" if dot else f"{base}_{name_suffix}"
    with open(local_path, "rb") as fh:
        client.upload(folder, base, fh.read())
    return base


def list_files(
    path: str,
    suffix: str | None = None,
    min_size_bytes: int | None = None,
    max_files: int | None = None,
    lister: Callable[[str], Sequence[tuple[str, int]]] | None = None,
) -> list[str]:
    """Driver-side file listing ↔ ``s3_client.py:29-87`` (``list_files``
    with type/max filters + continuation tokens, ``list_files_bigger_than``
    with a size threshold).

    Executors read object storage directly (glob paths on ``read_*``), so
    in this engine listing is only a *driver utility* — the thing reference
    users call before deciding what to ingest. Default ``lister`` walks a
    local/NFS directory recursively; for object stores inject one that
    yields ``(key, size)`` pairs (e.g. a boto3 ``list_objects_v2``
    paginator — pagination/continuation lives inside the injected callable,
    matching the reference's token loop). Results are sorted for
    deterministic truncation, unlike the reference's store order."""

    def _local(p: str) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for root, _dirs, names in os.walk(p):
            for n in names:
                full = os.path.join(root, n)
                out.append((full, os.path.getsize(full)))
        return out

    entries = (lister or _local)(path)
    keys = [
        k
        for k, size in entries
        if (suffix is None or k.endswith(suffix))
        and (min_size_bytes is None or size >= min_size_bytes)
    ]
    keys.sort()
    return keys[:max_files] if max_files is not None else keys


_PARTIAL_SUFFIXES = (".crdownload", ".part", ".tmp")


def webdriver_download(
    url: str,
    dest_dir: str,
    driver: object,
    locator: tuple[str, str] | None = None,
    retries: int = 3,
    wait_timeout: float = 10.0,
    poll: float = 0.1,
    sleep: Callable[[float], None] | None = None,
    fetch: Callable[[str, str], None] | None = None,
) -> str:
    """Browser-driven file download ↔ ``selenium_client.py:93-194``.

    ``driver`` is injectable (anything implementing ``get(url)`` and
    ``find_element(by, name)`` whose elements expose ``get_attribute`` /
    ``click``) — real Selenium in production, a fake in tests (selenium is
    not in this container; the logic, not the browser, is the parity
    surface). Two modes, mirroring the reference's methods:

    - ``fetch`` given (↔ ``get_file``): resolve the element's ``href`` and
      hand it to ``fetch(file_url, dest_path)`` (urlretrieve in the
      reference); returns the fetched path.
    - otherwise (↔ ``get_file_via_form_button_xpath`` /
      ``get_href_via_xpath``): click the element (or just ``get(url)``
      when ``locator`` is None) and wait for the download to land in
      ``dest_dir`` — unlike the reference's fixed ``time.sleep(wait_time)``
      (its own REFACTOR comment asks for this), poll until a new file
      exists and no partial (``.crdownload``/``.part``/``.tmp``) remains,
      raising ``TimeoutError`` otherwise.

    Retry pattern: ``retries`` attempts with the reference's quadratic
    backoff (``sleep(i*i)``), but failures raise instead of ``sys.exit``
    (``selenium_client.py:132``) — library code must not kill the caller.
    """
    import time as _time

    sleep = sleep or _time.sleep
    os.makedirs(dest_dir, exist_ok=True)
    last_err: Exception | None = None
    for attempt in range(retries):
        sleep(attempt * attempt)
        try:
            before = set(os.listdir(dest_dir))
            driver.get(url)
            element = None
            if locator is not None:
                element = driver.find_element(*locator)
            if fetch is not None:
                if element is None:
                    raise ValueError("href mode requires a locator")
                file_url = element.get_attribute("href")
                if not file_url:
                    raise ValueError(
                        f"element {locator!r} has no href to fetch"
                    )
                name = os.path.basename(file_url.rstrip("/")) or "download"
                dest = os.path.join(dest_dir, name)
                try:
                    fetch(file_url, dest)
                except Exception:
                    # a failed fetch may leave a partial dest file that a
                    # later attempt (or caller polling) would pick up
                    if os.path.exists(dest):
                        os.unlink(dest)
                    raise
                return dest
            if element is not None:
                element.click()
            waited = 0.0
            while True:
                entries = set(os.listdir(dest_dir))
                new = {
                    e
                    for e in entries - before
                    if not e.endswith(_PARTIAL_SUFFIXES)
                }
                partials = {
                    e for e in entries if e.endswith(_PARTIAL_SUFFIXES)
                }
                if new and not partials:
                    return os.path.join(dest_dir, sorted(new)[0])
                if waited >= wait_timeout:
                    raise TimeoutError(
                        f"download did not complete within {wait_timeout}s "
                        f"(partials: {sorted(partials)})"
                    )
                sleep(poll)
                waited += poll
        except (ValueError, TypeError):
            # programming errors (bad arguments, protocol misuse) are not
            # transient — retrying burns the backoff and buries the cause
            raise
        except Exception as exc:  # noqa: BLE001 — retried, then re-raised
            last_err = exc
    raise RuntimeError(
        f"webdriver_download failed after {retries} attempts"
    ) from last_err
