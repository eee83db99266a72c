"""XLSX ingest bridge (SURVEY.md §2.1, S4).

PySpark has no core XLSX reader; the idiomatic bridge is a driver-side
``pandas.read_excel`` → ``spark.createDataFrame`` (Arrow path). The
reference reads with the real header on spreadsheet row 3
(``header=2``, ``crime_immigration_etl.py:136-142``).

openpyxl isn't guaranteed in this container — gated behind import-try
with a clear error. For many/huge XLSX files at scale, distribute by
file: parallelize the path list and read per-partition (noted, not
needed for the reference's single workbook).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class XlsxUnavailable(ImportError):
    pass


def read_xlsx(
    spark: SparkSession,
    path: str,
    header_row: int = 0,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S4 — XLSX scan with header offset (header_row=2 ⇒ spreadsheet
    row 3, matching pandas ``header=2``)."""
    try:
        import pandas as pd  # noqa: F401
        import openpyxl  # noqa: F401
    except ImportError as ex:
        raise XlsxUnavailable(
            "XLSX ingest needs pandas+openpyxl on the driver"
        ) from ex
    import pandas as pd

    pdf = pd.read_excel(path, header=header_row)
    pdf.columns = [str(c) for c in pdf.columns]
    if schema is not None:
        pdf = pdf[[f.name for f in schema.fields]]
        return spark.createDataFrame(pdf, schema)
    return spark.createDataFrame(pdf)


def read_xlsx_jvm(
    spark: SparkSession,
    path: str,
    header_row: int = 0,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S4 at-scale path: the spark-excel (com.crealytics) JVM data
    source — executor-side reads, no driver bridge, the right choice
    when there are many/huge workbooks. The jar does NOT ship in this
    image, so this raises :class:`XlsxUnavailable` here; with the jar
    on the classpath (``--packages com.crealytics:spark-excel_2.13``)
    the same call reads distributed. ``dataAddress`` skips the
    ``header_row`` leading rows (pandas ``header=N`` parity)."""
    reader = (
        spark.read.format("com.crealytics.spark.excel")
        .option("header", "true")
        .option("dataAddress", f"'Sheet1'!A{header_row + 1}")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    try:
        return reader.load(path)
    except Exception as ex:  # jar absent → ClassNotFound inside analysis
        raise XlsxUnavailable(
            "spark-excel data source not on the classpath; add "
            "com.crealytics:spark-excel to spark.jars.packages or use "
            "read_xlsx (driver-side pandas bridge)"
        ) from ex
