"""Typed metadata-harvest parity tests (sources/harvest.py) ↔ the
reference's dataclass parse + content-hash duplicate check
(dbt_client.py:22-260, 334-442, 649-672) and Tableau namedtuples
(tableau_client.py:11-15, 98-136), plus webdriver download-dir waiting
(selenium_client.py:93-194) with a fake driver."""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from pyveb_spark.sources.harvest import (
    DBT_JOB,
    DBT_RUN,
    TABLEAU_USER,
    check_duplicates,
    content_hash,
    dedup_records,
    parse_records,
    parse_staged,
)

JOB_1 = {
    "id": 101,
    "name": "nightly",
    "description": "loads",
    "project_id": 7,
    "environment_id": 3,
    "created_at": "2024-01-01T00:00:00",
    "updated_at": "2024-02-01T00:00:00",
    "state": "1",
    "deactivated": "false",
    "schedule": {"cron": "0 2 * * *"},
    "cron_humanized": "daily at 2",
}
# same identity (id, state, created_at) — different non-key field, which
# the reference's __hash__ ignores: still a duplicate
JOB_1_TOUCHED = dict(JOB_1, cron_humanized="daily at two")
JOB_2 = dict(JOB_1, id=102, name="hourly")


def test_parse_records_typed_and_nested(spark):
    df = parse_records(spark, [JOB_1, JOB_2], DBT_JOB)
    rows = {r.job_id: r for r in df.collect()}
    assert set(rows) == {"101", "102"}
    assert rows["101"].schedule == "0 2 * * *"  # nested schedule.cron
    assert rows["101"].cron_humanized == "daily at 2"
    assert df.columns == list(DBT_JOB.out_columns())


def test_parse_records_missing_and_invalid_to_null(spark):
    run = {"id": "not-a-number", "status": "Queued"}
    df = parse_records(spark, [run], DBT_RUN)
    r = df.first()
    assert r.run_id is None  # try_cast of invalid bigint
    assert r.status == "Queued"
    assert r.finished_at is None  # absent key


def test_content_hash_matches_reference_construction(spark):
    df = parse_records(spark, [JOB_1], DBT_JOB)
    got = df.select(content_hash(DBT_JOB)).first()["record_hash"]
    # dbt_client.py:45-58: sha256 over f"{key}:{value}" per hash field
    h = hashlib.sha256()
    for key, value in (
        ("job_id", "101"),
        ("state", "1"),
        ("created_at", "2024-01-01T00:00:00"),
    ):
        h.update(f"{key}:{value}".encode())
    assert got == h.hexdigest()


def test_duplicate_check_and_dedup_by_identity_subset(spark):
    dup = parse_records(spark, [JOB_1, JOB_1_TOUCHED, JOB_2], DBT_JOB)
    assert check_duplicates(dup, DBT_JOB) is True
    deduped = dedup_records(dup, DBT_JOB)
    assert deduped.count() == 2
    clean = parse_records(spark, [JOB_1, JOB_2], DBT_JOB)
    assert check_duplicates(clean, DBT_JOB) is False


def test_parse_staged_pages(spark, tmp_path):
    users = [
        [{"id": "u1", "fullName": "Ann", "siteRole": "Creator"}],
        [{"id": "u2", "fullName": "Ben", "siteRole": "Viewer"},
         {"id": "u3", "fullName": "Cat", "siteRole": "Guest"}],
    ]
    for i, page in enumerate(users):
        (tmp_path / f"page_{i}.json").write_text(json.dumps(page))
    df = parse_staged(spark, str(tmp_path), TABLEAU_USER)
    rows = {r.user_id: r.site_role for r in df.collect()}
    assert rows == {"u1": "Creator", "u2": "Viewer", "u3": "Guest"}


# --------------------------------------------------------------------------
# webdriver download (fake driver, no selenium)
# --------------------------------------------------------------------------


class _FakeElement:
    def __init__(self, href=None, on_click=None):
        self._href = href
        self._on_click = on_click

    def get_attribute(self, name):
        assert name == "href"
        return self._href

    def click(self):
        if self._on_click:
            self._on_click()


class _FakeDriver:
    def __init__(self, element=None, on_get=None):
        self._element = element
        self._on_get = on_get
        self.got = []

    def get(self, url):
        self.got.append(url)
        if self._on_get:
            self._on_get()

    def find_element(self, by, name):
        assert self._element is not None
        return self._element


def test_webdriver_click_waits_for_partial_to_finish(tmp_path):
    from pyveb_spark.sources.connectors import webdriver_download

    dest = str(tmp_path)
    state = {"clicks": 0}

    def on_click():
        state["clicks"] += 1
        with open(os.path.join(dest, "data.csv.crdownload"), "w") as fh:
            fh.write("partial")

    driver = _FakeDriver(element=_FakeElement(on_click=on_click))

    # sleep hook finishes the "browser download" after a few polls
    polls = {"n": 0}

    def fake_sleep(_):
        polls["n"] += 1
        if polls["n"] == 3:
            os.rename(
                os.path.join(dest, "data.csv.crdownload"),
                os.path.join(dest, "data.csv"),
            )

    out = webdriver_download(
        "http://x/export",
        dest,
        driver,
        locator=("xpath", "//form/button[1]"),
        sleep=fake_sleep,
    )
    assert out.endswith("data.csv") and os.path.exists(out)
    assert state["clicks"] == 1 and driver.got == ["http://x/export"]


def test_webdriver_href_mode_uses_fetch(tmp_path):
    from pyveb_spark.sources.connectors import webdriver_download

    driver = _FakeDriver(element=_FakeElement(href="http://files/report.xlsx"))
    fetched = {}

    def fetch(url, dest):
        fetched["url"] = url
        with open(dest, "wb") as fh:
            fh.write(b"bytes")

    out = webdriver_download(
        "http://x", str(tmp_path), driver,
        locator=("link text", "Download"), fetch=fetch,
    )
    assert fetched["url"] == "http://files/report.xlsx"
    assert out.endswith("report.xlsx") and os.path.getsize(out) == 5


def test_webdriver_retries_then_raises(tmp_path):
    from pyveb_spark.sources.connectors import webdriver_download

    class _Boom(_FakeDriver):
        def get(self, url):
            raise ConnectionError("nope")

    slept = []
    with pytest.raises(RuntimeError):
        webdriver_download(
            "http://x", str(tmp_path), _Boom(), sleep=slept.append,
        )
    # quadratic backoff schedule 0,1,4 before each of the 3 attempts
    assert slept == [0, 1, 4]


def test_webdriver_programming_errors_fail_fast(tmp_path):
    """ValueError/TypeError are not transient: no retries, no backoff
    burn, the real cause surfaces instead of a generic RuntimeError."""
    from pyveb_spark.sources.connectors import webdriver_download

    slept = []
    # fetch mode without a locator is protocol misuse
    with pytest.raises(ValueError, match="locator"):
        webdriver_download(
            "http://x", str(tmp_path), _FakeDriver(),
            fetch=lambda u, d: None, sleep=slept.append,
        )
    assert slept == [0]  # first attempt only — never retried

    # an element with no href is a page/locator bug, not a flaky network
    slept2 = []
    driver = _FakeDriver(element=_FakeElement(href=None))
    with pytest.raises(ValueError, match="no href"):
        webdriver_download(
            "http://x", str(tmp_path), driver,
            locator=("link text", "Download"),
            fetch=lambda u, d: None, sleep=slept2.append,
        )
    assert slept2 == [0] and len(driver.got) == 1


def test_webdriver_failed_fetch_unlinks_partial_dest(tmp_path):
    """A fetch that dies mid-write must not leave a partial dest file for
    a later attempt or caller polling to pick up."""
    from pyveb_spark.sources.connectors import webdriver_download

    driver = _FakeDriver(element=_FakeElement(href="http://files/report.xlsx"))
    attempts = {"n": 0}

    def flaky_fetch(url, dest):
        attempts["n"] += 1
        with open(dest, "wb") as fh:
            fh.write(b"partial")
        if attempts["n"] < 3:
            raise ConnectionError("mid-transfer drop")

    out = webdriver_download(
        "http://x", str(tmp_path), driver,
        locator=("link text", "Download"),
        fetch=flaky_fetch, sleep=lambda _: None,
    )
    # retried to success; the successful write is the only file left
    assert attempts["n"] == 3 and os.path.getsize(out) == 7
    assert sorted(os.listdir(tmp_path)) == ["report.xlsx"]

    def always_fails(url, dest):
        with open(dest, "wb") as fh:
            fh.write(b"junk")
        raise ConnectionError("down")

    dest2 = tmp_path / "second"
    with pytest.raises(RuntimeError):
        webdriver_download(
            "http://x", str(dest2), driver,
            locator=("link text", "Download"),
            fetch=always_fails, sleep=lambda _: None,
        )
    assert os.listdir(dest2) == []  # nothing partial left behind


def test_list_files_filters_and_truncates(tmp_path):
    from pyveb_spark.sources.connectors import list_files

    (tmp_path / "sub").mkdir()
    (tmp_path / "a.parquet").write_bytes(b"x" * 100)
    (tmp_path / "b.parquet").write_bytes(b"x" * 10)
    (tmp_path / "sub" / "c.parquet").write_bytes(b"x" * 200)
    (tmp_path / "d.csv").write_bytes(b"x" * 300)

    allp = list_files(str(tmp_path), suffix=".parquet")
    assert [os.path.basename(p) for p in allp] == ["a.parquet", "b.parquet", "c.parquet"]
    big = list_files(str(tmp_path), suffix=".parquet", min_size_bytes=100)
    assert [os.path.basename(p) for p in big] == ["a.parquet", "c.parquet"]
    assert len(list_files(str(tmp_path), max_files=2)) == 2

    # injected lister = the object-store path (continuation handled inside)
    fake = lambda prefix: [(f"{prefix}/k{i}.json", i * 50) for i in range(4)]
    assert list_files("s3://b/p", suffix=".json", min_size_bytes=100, lister=fake) == [
        "s3://b/p/k2.json", "s3://b/p/k3.json",
    ]
