"""End-to-end golden pipeline test (SURVEY §5.3): reference-shaped raw
fixtures → full transform → hand-computed star-schema outputs,
including the rate formula (etl:292-294) and the 7-way slice
(etl:236-252), plus idempotent double-load (§5.4)."""

from __future__ import annotations

from decimal import Decimal

from data_integration_and_visualization_uc3m_spark.plans import star
from data_integration_and_visualization_uc3m_spark.schemas import RAW_CRIME, RAW_POPULATION
from data_integration_and_visualization_uc3m_spark.sources.readers import year_dim


def raw_population(spark):
    rows = [
        # (iso3, (id, name), value, year)
        ("ESP", ("ES", " Spain "), "47000000", 2019),
        ("ESP", ("ES", "Spain"), "47500000.4", 2020),
        ("FRA", ("FR", "France"), "67000000", 2019),
        ("WLD", ("1W", "World"), "7700000000", 2019),   # aggregate → excluded
        ("XX", ("XX", "Tiny"), "1000", 2019),           # bad ISO3 length
        ("DEU", ("DE", None), "83000000", 2019),        # null nested name
        ("ITA", ("IT", "Italy"), "n/a", 2019),          # garbage value
        ("PRT", ("PT", "Portugal"), "-5", 2019),        # non-positive
        ("GRC", ("GR", "Greece"), "10700000", 2017),    # year < 2018
    ]
    return spark.createDataFrame(
        [(i3, c, v, y) for (i3, c, v, y) in rows], RAW_POPULATION
    )


def test_country_population_golden(spark):
    aggregates = spark.createDataFrame([("WLD",), ("EUU",)], "code string")
    country, population = star.transform_country_and_population(
        raw_population(spark), aggregates
    )
    c = {r.country_iso3_id: r.country_name for r in country.collect()}
    assert c == {"ESP": "spain", "FRA": "france"}
    p = {(r.country_iso3_id, r.year_id): r.population for r in population.collect()}
    assert p == {("ESP", 2019): 47000000, ("ESP", 2020): 47500000, ("FRA", 2019): 67000000}


def test_crime_golden_seven_way_slice(spark):
    base = {
        "Category": "Total", "Sex": "Total", "Age": "Total",
        "Indicator": "Persons convicted",
        "Unit of measurement": "Rate per 100,000 population",
        "Region": "Europe",
    }
    rows = [
        dict(base, Iso3_code="ESP", Country="Spain", Year=2019, VALUE="8.125"),
        dict(base, Iso3_code="FRA", Country="France", Year=2019, VALUE="junk"),
        dict(base, Iso3_code="DEU", Country="Germany", Year=2017, VALUE="5.0"),
        dict(base, Iso3_code="ITA", Country="Italy", Year=2019, VALUE="-2"),
        dict(base, Iso3_code="PRT", Country="Portugal", Year=2019, VALUE="3.5", Sex="Male"),
        dict(base, Iso3_code="GRC", Country="Greece", Year=2019, VALUE="4.0", Region="Asia"),
    ]
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in RAW_CRIME.fields) for r in rows], RAW_CRIME
    )
    got = {r.country_iso3_id: r.convicts_per_100000 for r in star.transform_crime(df).collect()}
    # only ESP survives; 8.125 rounds HALF_UP to 8.13 (not pandas' 8.12)
    assert got == {"ESP": Decimal("8.13")}


def test_immigration_golden_rate(spark):
    raw = spark.createDataFrame(
        [
            ("ES", 2019, "94000"),       # → ESP
            ("EL", 2019, ":"),           # Eurostat quirk code + missing marker → 0
            ("UK", 2019, "1000"),        # → GBR but no population row → inner-join drop
            ("EU27_2020", 2019, "5"),    # aggregate, len>2 → dropped
            ("FR", 2019, "junk"),        # coerce-null → dropped
        ],
        "geo string, TIME_PERIOD int, OBS_VALUE string",
    )
    population = spark.createDataFrame(
        [("ESP", 2019, 47000000), ("GRC", 2019, 10700000), ("FRA", 2019, 67000000)],
        "country_iso3_id string, year_id int, population long",
    )
    got = {
        (r.country_iso3_id, r.year_id): r.immigration_per_100000
        for r in star.transform_immigration(raw, population, star.iso2_lookup(spark)).collect()
    }
    assert got == {
        ("ESP", 2019): Decimal("200.00"),  # 94000/47e6*1e5
        ("GRC", 2019): Decimal("0.00"),    # ':' → 0
    }


def test_validate_and_idempotent_load(spark):
    aggregates = spark.createDataFrame([("WLD",)], "code string")
    country, population = star.transform_country_and_population(
        raw_population(spark), aggregates
    )
    tables = {"country": country, "year": year_dim(spark), "population": population}
    report = star.validate_star(tables)
    assert all(v == 0 for v in report.values()), report

    loaded_once = star.load_star({}, tables)
    loaded_twice = star.load_star(loaded_once, tables)
    for name in tables:
        a = sorted(map(tuple, loaded_once[name].collect()))
        b = sorted(map(tuple, loaded_twice[name].collect()))
        assert a == b, f"{name} not idempotent"
