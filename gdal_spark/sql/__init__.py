"""OGR SQL dialect front-end (text → Spark DataFrame)."""

from gdal_spark.sql.ogr_sql import OgrSqlError, execute_ogr_sql  # noqa: F401
