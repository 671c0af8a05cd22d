"""duckdb_psql_spark — a PySpark-native engine with the query surface of
the ``ywelsch/duckdb-psql`` DuckDB extension (reference snapshot at
/root/reference, read-only), rebuilt Spark-first per SURVEY.md.

Usage::

    from duckdb_psql_spark import PsqlSession
    psql = PsqlSession(spark)
    df = psql.sql("from 'data/lineitem.parquet' |> where l_quantity > 45 "
                  "|> select l_orderkey, l_quantity |> order by l_quantity desc |> limit 5")
"""

from .errors import PsqlCompileError, PsqlError, PsqlParseError
from .session import PsqlSession, default_spark

__all__ = [
    "PsqlSession",
    "default_spark",
    "PsqlError",
    "PsqlParseError",
    "PsqlCompileError",
]

__version__ = "0.1.0"
