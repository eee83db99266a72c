"""Custom Python DataSource (Spark 4 API): distributed paginated REST.

`sources/api.py` reproduces the reference's DRIVER-side ingest loop
(one GET per year on the driver, crime_immigration_etl.py:88-132) and
documents executor-side fetching as the scale path. This module IS
that scale path, using Spark 4's Python DataSource API
(`pyspark.sql.datasource`): every page/year URL becomes an
`InputPartition`, so fetches run ON EXECUTORS, in parallel, with
retry/locality handled by the scheduler — the right shape when the
URL list is thousands of shards, not five years.

Usage:

    spark.dataSource.register(PaginatedRestDataSource)
    df = (spark.read.format("paginated_rest")
          .schema("indicator string, value double, year_id int")
          .option("url_template", "https://api.example/{year}?fmt=json")
          .option("years", "2018,2019,2020,2021,2022")
          .option("fetcher", "mypkg.http:get_json")   # executor-side import
          .load())

Fetchers (the network edge is injected, same philosophy as api.py):

* ``module.path:callable`` — imported ON THE EXECUTOR, called with the
  URL, must return the World Bank ``[metadata, rows]`` envelope.
* ``synthetic:<n>`` — built-in deterministic fake producing ``n`` rows
  per page from the URL alone (hermetic tests, demos, load-shape
  rehearsal without a network).

Rows in each envelope are projected to the user-declared schema by
field name (missing keys → NULL), exactly like api.py's driver path.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .api import parse_envelope


class PageInputPartition(InputPartition):
    def __init__(self, url: str, ordinal: int):
        self.url = url
        self.ordinal = ordinal


def _resolve_fetcher(spec: str):
    """Executor-side fetcher resolution (see module docstring)."""
    if spec.startswith("synthetic:"):
        n = int(spec.split(":", 1)[1])

        def synthetic(url: str):
            # deterministic: row values derived from the url text only
            tag = url.rsplit("/", 1)[-1].split("?", 1)[0]
            rows = [
                {"indicator": f"{tag}-r{i}", "value": float(i * len(url) % 97)}
                for i in range(n)
            ]
            return [{"page": 1}, rows]

        return synthetic
    mod, _, fn = spec.partition(":")
    if not fn:
        raise ValueError(
            f"fetcher must be 'module.path:callable' or 'synthetic:<n>', got {spec!r}"
        )
    import importlib

    return getattr(importlib.import_module(mod), fn)


class PaginatedRestReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.url_template = options["url_template"]
        self.fetcher_spec = options.get("fetcher", "synthetic:10")
        years = options.get("years", "")
        pages = options.get("pages", "")
        if years:
            self.urls = [
                (self.url_template.format(year=int(y)), int(y))
                for y in years.split(",")
            ]
            self.inject_year = True
        elif pages:
            self.urls = [
                (self.url_template.format(page=int(p)), int(p))
                for p in pages.split(",")
            ]
            self.inject_year = False
        else:
            raise ValueError("provide 'years' or 'pages' as a comma list")

    def partitions(self):
        return [PageInputPartition(url, ord_) for url, ord_ in self.urls]

    def read(self, partition: PageInputPartition) -> Iterator[tuple]:
        fetch = _resolve_fetcher(self.fetcher_spec)
        rows = parse_envelope(fetch(partition.url))
        names = [f.name for f in self.schema.fields]
        for r in rows:
            r = dict(r)
            if self.inject_year and "year_id" in names:
                r["year_id"] = partition.ordinal
            yield tuple(r.get(k) for k in names)


class PaginatedRestDataSource(DataSource):
    """format("paginated_rest") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def reader(self, schema) -> PaginatedRestReader:
        return PaginatedRestReader(schema, self.options)
