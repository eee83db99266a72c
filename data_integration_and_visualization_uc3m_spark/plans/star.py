"""The reference star-schema pipeline, Spark-first (SURVEY.md §3.1).

Reference: ``crime_immigration_etl.py`` — eager pandas in three stages
(``transform_data`` :153-311) feeding a constrained Postgres star schema.
Here the whole E-T becomes ONE lazy DAG per output table; "execute"
happens at the sink. No step collects to the driver; every lookup is a
broadcast join; constraints are validation operators.

The transforms take raw-shaped DataFrames (schemas.RAW_*) so unit tests
feed adversarial fixtures (FIXTURES.md) and golden-test the outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import iso3166
from ..operators import cleaning, filters, joins, upsert, validate
from ..schemas import LOAD_ORDER, NATURAL_KEYS

# ISO2 → ISO3 lookup over the FULL ISO 3166-1 universe (the pycountry
# analog the reference builds in crime_immigration_etl.py:16-28), incl.
# the Eurostat quirks it handles via country_converter (etl:271-276):
# EL → GRC (Greece), UK → GBR. Rounds 1-7 carried only 35 European
# codes, so non-European Eurostat input silently took the J2 fallback;
# functions/iso3166.py restores all 249 countries.
ISO2_TO_ISO3 = {a2: a3 for a2, a3, _, _ in iso3166.COUNTRIES}
ISO2_TO_ISO3.update(
    {alias.upper(): a3 for alias, a3 in iso3166.EXTRA_ALIASES}
)

MIN_YEAR, MAX_YEAR = 2018, 2022


def iso2_lookup(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(k.lower(), v) for k, v in sorted(ISO2_TO_ISO3.items())],
        "alias string, canonical string",
    )


def transform_country_and_population(
    raw_pop: DataFrame,
    aggregate_codes: DataFrame,
    alias_lookup: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Country dim + population fact (etl:154-210).

    Steps (each cites the reference line it re-expresses):
    - drop World Bank aggregate pseudo-countries via anti-join
      (etl:157-159; the code list is data-driven, etl:98-102)
    - ISO3 validity: len==3 & not null (etl:165-168)
    - nested country.value non-null (etl:171-174) — struct access
    - name = lower∘trim, alias-lookup with fallback (etl:31-34,177-179)
    - population = coerce(value) > 0, rounded to long (etl:182-192)
    - year_id int ≥ 2018 (etl:195-196)
    - country dim = first-wins dedup on iso3, ordered by (name, year)
      for determinism (etl:199-203 keeps pandas file order; SURVEY §7.4.3)
    """
    df = filters.anti_join_exclude(
        raw_pop, aggregate_codes.withColumnRenamed("code", "countryiso3code"),
        on="countryiso3code",
    )
    df = df.filter(filters.valid_code_length("countryiso3code", 3))
    df = df.filter(filters.non_null_nested("country", "value"))
    df = df.withColumn("country_name", cleaning.normalize_string(F.col("country.value")))
    if alias_lookup is not None:
        df = joins.lookup_join_with_fallback(
            df, alias_lookup, F.col("country_name"), "country_name"
        )
    df = df.withColumn("population_raw", cleaning.coerce_numeric("value", "double"))
    df = df.filter(filters.in_range("population_raw", low=None) & (F.col("population_raw") > 0))
    df = df.withColumn("population", cleaning.to_integer_rounded("population_raw", "long"))
    df = df.withColumn("year_id", F.col("year_id").cast("int")).filter(
        F.col("year_id") >= MIN_YEAR
    )
    df = df.withColumnRenamed("countryiso3code", "country_iso3_id")

    country = upsert.dedup_batch_first_wins(
        df.select("country_iso3_id", "country_name"),
        keys=["country_iso3_id"],
        order_by=["country_name"],
    )
    population = upsert.dedup_batch_first_wins(
        df.select("population", "country_iso3_id", "year_id"),
        keys=["country_iso3_id", "year_id"],
        order_by=["population"],
    )
    return country, population


def transform_crime(raw_crime: DataFrame) -> DataFrame:
    """Crime fact (etl:212-266): rename → ISO3 guard → coerce → range →
    the 7-way conjunctive slice (etl:236-252) → 2-decimal contract."""
    df = cleaning.rename_columns(
        raw_crime,
        {"Iso3_code": "country_iso3_id", "Country": "country_name", "Year": "year_id"},
    )
    df = df.filter(filters.valid_code_length("country_iso3_id", 3))
    df = df.withColumn("value_num", cleaning.coerce_numeric("VALUE", "double"))
    df = filters.drop_null_rows(df, ["value_num"])
    df = df.filter(F.col("value_num") >= 0)
    df = filters.conjunctive_slice(
        df,
        [
            F.col("Category") == "Total",
            F.col("Sex") == "Total",
            F.col("Indicator") == "Persons convicted",
            F.col("Age") == "Total",
            F.col("Unit of measurement") == "Rate per 100,000 population",
            F.col("year_id").cast("int") >= MIN_YEAR,
            F.col("Region") == "Europe",
        ],
    )
    return df.select(
        cleaning.round_half_up("value_num", 2)
        .cast("decimal(10,2)")
        .alias("convicts_per_100000"),
        "country_iso3_id",
        F.col("year_id").cast("int").alias("year_id"),
    )


def transform_immigration(
    raw_immig: DataFrame, population: DataFrame, iso2_to_iso3: DataFrame
) -> DataFrame:
    """Immigration fact (etl:268-303): project 3 of 24 cols → ISO2 guard
    (drops aggregates like EU27_2020) → ISO2→ISO3 broadcast lookup →
    ':'→0 then coerce (ORDER MATTERS, etl:278-280) → validated m2o join
    with population → rate = total/pop·100000 rounded (etl:292-297)."""
    df = cleaning.project(raw_immig, ["geo", "TIME_PERIOD", "OBS_VALUE"])
    df = df.filter(filters.valid_code_length("geo", 2))
    df = joins.lookup_join_with_fallback(
        df, iso2_to_iso3, cleaning.normalize_string("geo"), "country_iso3_id"
    )
    # fallback leaves unknown ISO2 lowercase (len 2) — drop them: the
    # reference's converter returns 'not found' which fails the FK load
    df = df.filter(F.length("country_iso3_id") == 3)
    df = df.withColumn("year_id", F.col("TIME_PERIOD").cast("int"))
    df = df.withColumn(
        "immigration_total",
        cleaning.coerce_numeric(
            cleaning.replace_missing_marker("OBS_VALUE", ":", 0), "double"
        ),
    )
    df = filters.drop_null_rows(df, ["immigration_total"])
    enriched = joins.validated_join(
        df,
        population.select("country_iso3_id", "year_id", "population"),
        on=["country_iso3_id", "year_id"],
        how="inner",
        validate_unique=True,
    )
    return enriched.select(
        cleaning.round_half_up(
            F.col("immigration_total") / F.col("population") * 100000, 2
        )
        .cast("decimal(10,2)")
        .alias("immigration_per_100000"),
        "country_iso3_id",
        "year_id",
    )


def validate_star(tables: dict[str, DataFrame]) -> dict[str, int]:
    """The DDL constraint surface (schema.sql:23-105) as one validation
    report: uniqueness on natural keys + FK integrity facts→dims.
    Returns violation counts (all zero ⇒ loadable)."""
    report: dict[str, int] = {}
    for name, keys in NATURAL_KEYS.items():
        if name in tables:
            report[f"{name}_dup_keys"] = validate.uniqueness_violations(
                tables[name], keys
            ).count()
    for fact in ("population", "crime", "immigration"):
        if fact in tables and "country" in tables:
            report[f"{fact}_fk_country"] = validate.fk_violations(
                tables[fact], tables["country"].select("country_iso3_id"),
                ["country_iso3_id"],
            ).count()
        if fact in tables and "year" in tables:
            report[f"{fact}_fk_year"] = validate.fk_violations(
                tables[fact], tables["year"].select("year_id"), ["year_id"]
            ).count()
    return report


def load_star(
    existing: dict[str, DataFrame], incoming: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """K2/K4 — FK-ordered idempotent load: upsert each table in
    LOAD_ORDER with conflict-ignore semantics (etl:335-380)."""
    out = dict(existing)
    for name in LOAD_ORDER:
        if name not in incoming:
            continue
        batch = incoming[name]
        keys = NATURAL_KEYS[name]
        if name in out:
            out[name] = upsert.upsert_ignore(out[name], batch, keys)
        else:
            out[name] = upsert.dedup_batch_first_wins(batch, keys)
    return out


def ddl_statements() -> list[str]:
    """The reference warehouse DDL (``database/initdb/schema.sql:23-117``)
    re-emitted in embedded-ANSI dialect (Derby-compatible): dimension
    PRIMARY KEYs, fact surrogate keys as GENERATED IDENTITY (the SERIAL
    analog, schema.sql:38,62,85), NOT NULL rate/population columns,
    both FOREIGN KEYs per fact with ON DELETE CASCADE
    (schema.sql:44-54,68-78,91-101), the per-fact UNIQUE
    (country, year) natural key (schema.sql:57,81,104), and the seeded
    year dimension 2018-2022 (schema.sql:111-117). Statement order is
    LOAD_ORDER-safe: dims before facts.

    Executed live against embedded Derby in the warehouse e2e test —
    the constraints these statements declare are the same surface
    ``validate_star`` checks engine-side before a load.
    """
    fact = (
        "CREATE TABLE {name} ("
        "{name}_id INT NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY, "
        "{measure} NOT NULL, "
        "country_iso3_id VARCHAR(3) NOT NULL, "
        "year_id INT NOT NULL, "
        "CONSTRAINT fk_{name}_country FOREIGN KEY (country_iso3_id) "
        "REFERENCES country (country_iso3_id) ON DELETE CASCADE, "
        "CONSTRAINT fk_{name}_year FOREIGN KEY (year_id) "
        'REFERENCES "year" (year_id) ON DELETE CASCADE, '
        "CONSTRAINT uq_{name} UNIQUE (country_iso3_id, year_id))"
    )
    return [
        "CREATE TABLE country ("
        "country_iso3_id VARCHAR(3) NOT NULL PRIMARY KEY, "
        "country_name VARCHAR(255) NOT NULL)",
        # YEAR is a reserved word in Derby (unlike Postgres) — quote
        # the identifier; consumers must quote it too.
        'CREATE TABLE "year" (year_id INT NOT NULL PRIMARY KEY)',
        fact.format(name="population", measure="population BIGINT"),
        fact.format(name="crime", measure="convicts_per_100000 NUMERIC(10, 2)"),
        fact.format(
            name="immigration", measure="immigration_per_100000 NUMERIC(10, 2)"
        ),
        'INSERT INTO "year" (year_id) '
        "VALUES (2018), (2019), (2020), (2021), (2022)",
    ]
