"""S1-S3 + V6 against a LIVE HTTP server — the ingest twin of the live
JDBC proofs: a real localhost http.server serves World-Bank-shaped
JSON envelopes and the full ingest family runs over real sockets —
pagination loop, per-year scan with year_id injection, all-or-nothing
failure absorption on a real 500, metadata + aggregate-code
derivation, and the retry wrapper against a flapping endpoint."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from data_integration_and_visualization_uc3m_spark.sources import api

COUNTRIES = [
    {"id": "ESP", "name": "Spain", "region": {"id": "EUR", "value": "Europe"}},
    {"id": "FRA", "name": "France", "region": {"id": "EUR", "value": "Europe"}},
    {"id": "WLD", "name": "World", "region": {"id": "NA", "value": "Aggregates"}},
]
POP = {
    2019: [
        {"countryiso3code": "ESP", "country": {"id": "ES", "value": "Spain"},
         "value": "47000000"},
        {"countryiso3code": "FRA", "country": {"id": "FR", "value": "France"},
         "value": "67000000"},
    ],
    2020: [
        {"countryiso3code": "ESP", "country": {"id": "ES", "value": "Spain"},
         "value": "47500000"},
    ],
}
PAGES = {1: [{"v": 1}, {"v": 2}], 2: [{"v": 3}], 3: []}


class _Handler(BaseHTTPRequestHandler):
    flaky_hits = 0

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        u = urlparse(self.path)
        q = parse_qs(u.query)

        def send(payload, status=200):
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        if u.path == "/countries":
            send([{"total": len(COUNTRIES)}, COUNTRIES])
        elif u.path == "/pop":
            year = int(q["date"][0])
            send([{"year": year}, POP.get(year, [])])
        elif u.path == "/paged":
            page = int(q.get("page", ["1"])[0])
            send([{"page": page}, PAGES.get(page, [])])
        elif u.path == "/boom":
            send({"error": "server exploded"}, status=500)
        elif u.path == "/flaky":
            _Handler.flaky_hits += 1
            if _Handler.flaky_hits < 3:
                send({"error": "try again"}, status=500)
            else:
                send([{"ok": True}, [{"v": 42}]])
        else:
            send({"error": "not found"}, status=404)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_live_paginated_scan(server):
    rows = api.fetch_paginated(
        api.http_fetch, server + "/paged?page={page}", pages=range(1, 10)
    )
    assert rows == [{"v": 1}, {"v": 2}, {"v": 3}]  # stopped at empty page


def test_live_per_year_ingest_with_injection(spark, server):
    df = api.ingest_indicator_per_year(
        spark, api.http_fetch, server + "/pop?date={year}", years=[2019, 2020]
    )
    got = {(r.countryiso3code, r.year_id): r.value for r in df.collect()}
    assert got == {
        ("ESP", 2019): "47000000",
        ("FRA", 2019): "67000000",
        ("ESP", 2020): "47500000",
    }


def test_live_all_or_nothing_on_real_500(spark, server):
    # second year hits a real HTTP 500 → EVERYTHING resets (etl:128-130)
    df = api.ingest_indicator_per_year(
        spark,
        api.http_fetch,
        server + "/pop?date={year}",
        years=[2019, 99999],  # 99999 → empty rows is fine; use /boom:
    )
    assert df.count() == 2  # empty year absorbed, 2019's rows kept

    calls = iter([server + "/pop?date=2019", server + "/boom"])

    def route(_url):
        return api.http_fetch(next(calls))

    df2 = api.ingest_indicator_per_year(
        spark, route, server + "/pop?date={year}", years=[2019, 2020]
    )
    assert df2.count() == 0  # all-or-nothing: year-1 rows discarded too


def test_live_metadata_and_aggregates(spark, server):
    countries, aggregates = api.ingest_country_metadata(
        spark, api.http_fetch, server + "/countries"
    )
    assert countries.count() == 3
    assert [r.code for r in aggregates.collect()] == ["WLD"]


def test_live_retry_against_flaky_endpoint(server):
    _Handler.flaky_hits = 0
    slept = []
    out = api.retry(
        lambda: api.http_fetch(server + "/flaky"),
        retries=5,
        delay_s=0.01,
        sleep=slept.append,
    )
    assert api.parse_envelope(out) == [{"v": 42}]
    assert _Handler.flaky_hits == 3 and len(slept) == 2


def test_live_distributed_datasource_ingest(spark, server):
    """The SCALE path live: the Spark 4 Python DataSource fetches each
    year's page ON EXECUTORS over real sockets (fetcher resolved
    executor-side to sources.api:http_fetch), with year_id injection —
    distributed HTTP ingest end to end, not a driver loop."""
    from data_integration_and_visualization_uc3m_spark.sources.pyds import (
        PaginatedRestDataSource,
    )

    spark.dataSource.register(PaginatedRestDataSource)
    df = (
        spark.read.format("paginated_rest")
        .schema("countryiso3code string, value string, year_id int")
        .option("url_template", server + "/pop?date={year}")
        .option("years", "2019,2020")
        .option(
            "fetcher",
            "data_integration_and_visualization_uc3m_spark.sources.api:http_fetch",
        )
        .load()
    )
    got = {(r.countryiso3code, r.year_id): r.value for r in df.collect()}
    assert got == {
        ("ESP", 2019): "47000000",
        ("FRA", 2019): "67000000",
        ("ESP", 2020): "47500000",
    }
    # two partitions — one per year URL — really ran
    assert df.rdd.getNumPartitions() == 2


def test_live_streaming_rest_poll(spark, server):
    """The STREAMING shape live: the Spark 4 Python streaming
    DataSource polls real HTTP pages micro-batch by micro-batch
    (page-cursor offsets) until exhaustion — the continuous twin of
    test_live_distributed_datasource_ingest."""
    from data_integration_and_visualization_uc3m_spark.sources.pyds import (
        run_rest_poll_stream,
    )

    df = run_rest_poll_stream(
        spark,
        server + "/paged?page={page}",
        "v int, page_id int",
        last_page=3,
        pages_per_batch=1,
        fetcher="data_integration_and_visualization_uc3m_spark.sources.api:http_fetch",
        query_name="t_live_rest_poll",
    )
    got = sorted((r.v, r.page_id) for r in df.collect())
    assert got == [(1, 1), (2, 1), (3, 2)]  # page 3 served empty
