"""Engine vs reference-style pandas: single-node throughput shootout.

The reference's country/population transform
(``crime_immigration_etl.py:154-210``) runs eager pandas with row-wise
``.apply`` lambdas for nested-dict access and name normalization.
This harness scales that exact workload shape to N rows and times:

  (a) a faithful pandas implementation (reference semantics, including
      the per-row lambdas the reference uses), and
  (b) this engine's ``plans.star.transform_country_and_population``
      (lazy DataFrame DAG, struct access, broadcast exclusion join).

Both read the same parquet file. Prints one JSON line with rows/sec.

Usage: python tools/reference_shootout.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

CODES = [f"C{i:02d}" for i in range(200)]
AGGREGATES = ["WLD", "EUU", "ARB"]


def generate(path: str, n: int) -> None:
    rng = np.random.default_rng(42)
    iso3 = rng.choice(CODES + AGGREGATES + ["XX", ""], size=n).astype(object)
    names = np.array([f" Name {c} " for c in iso3], dtype=object)
    country = pa.array(
        [{"id": c[:2], "value": (None if i % 97 == 0 else nm)}
         for i, (c, nm) in enumerate(zip(iso3, names))],
        type=pa.struct([("id", pa.string()), ("value", pa.string())]),
    )
    values = rng.integers(1, 10**8, size=n).astype(str).astype(object)
    values[:: 101] = "n/a"  # coercion corner
    years = rng.integers(2016, 2023, size=n)
    table = pa.table(
        {
            "countryiso3code": pa.array(iso3, type=pa.string()),
            "country": country,
            "value": pa.array(values, type=pa.string()),
            "year_id": pa.array(years, type=pa.int32()),
        }
    )
    pq.write_table(table, path)


def pandas_reference(path: str) -> tuple[int, int]:
    """Reference semantics, reference style (etl:154-210): boolean
    masks + per-row .apply for nested access and normalization."""
    df = pd.read_parquet(path)
    df = df[~df["countryiso3code"].isin(AGGREGATES)]
    df = df[df["countryiso3code"].notna() & (df["countryiso3code"].str.len() == 3)]
    df = df[df["country"].notna()]
    df = df[df["country"].apply(lambda x: x.get("value") is not None)]  # etl:172-174
    df = df.copy()
    df["country_name"] = df["country"].apply(
        lambda x: x["value"].strip().lower()  # etl:177-179 (normalise_country)
    )
    df["population"] = pd.to_numeric(df["value"], errors="coerce")  # etl:182
    df = df.dropna(subset=["population"])
    df = df[df["population"] > 0]
    df["population"] = df["population"].round(0).astype(int)  # etl:191-192
    df["year_id"] = df["year_id"].astype(int)
    df = df[df["year_id"] >= 2018]
    country = df[["countryiso3code", "country_name"]].drop_duplicates(
        subset=["countryiso3code"]
    )
    population = df[["population", "countryiso3code", "year_id"]].drop_duplicates(
        subset=["countryiso3code", "year_id"]
    )
    return len(country), len(population)


def spark_engine(path: str) -> tuple[int, int]:
    from pyspark.sql import functions as F

    from data_integration_and_visualization_uc3m_spark.plans import star
    from data_integration_and_visualization_uc3m_spark.schemas import RAW_POPULATION
    from data_integration_and_visualization_uc3m_spark.session import get_spark

    spark = get_spark("shootout")
    raw = spark.read.schema(RAW_POPULATION).parquet(path)
    aggregates = spark.createDataFrame([(c,) for c in AGGREGATES], "code string")
    country, population = star.transform_country_and_population(raw, aggregates)
    return country.count(), population.count()


def main() -> None:
    import tempfile

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/raw.parquet"
        generate(path, n)

        t0 = time.perf_counter()
        p_country, p_pop = pandas_reference(path)
        t_pandas = time.perf_counter() - t0

        # warm the JVM before the timed run
        spark_engine(path)
        t0 = time.perf_counter()
        s_country, s_pop = spark_engine(path)
        t_spark = time.perf_counter() - t0

    assert (p_country, p_pop) == (s_country, s_pop), (
        f"result mismatch pandas={(p_country, p_pop)} spark={(s_country, s_pop)}"
    )
    print(
        json.dumps(
            {
                "n_rows": n,
                "pandas_reference_sec": round(t_pandas, 3),
                "spark_engine_sec": round(t_spark, 3),
                "speedup": round(t_pandas / t_spark, 2),
                "outputs": {"country": s_country, "population": s_pop},
            }
        )
    )


if __name__ == "__main__":
    main()
