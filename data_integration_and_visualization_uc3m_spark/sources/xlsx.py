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
