"""Catalog introspection: duckdb_* table functions, information_schema,
pg_catalog, SHOW ALL TABLES.

DuckDB exposes its catalog through table functions (duckdb_tables(),
duckdb_columns(), …), the SQL-standard information_schema views, and a
postgres-compat pg_catalog (functions.md / the delegated dialect —
psql_extension.cpp:76-79 passes them straight to DuckDB). Here they
enumerate the SPARK session catalog instead: column sets mirror DuckDB
1.4's exactly (probe-pinned), values describe this engine ("memory"
database, "main" schema, Spark temp views as temporary tables). All are
driver-side catalog walks over createDataFrame — a few hundred rows at
most, never a distributed concern. OIDs are stable per-session hashes;
estimated_size / sql bodies are NULL (Spark does not keep them).

COMMENT ON text and the PRIMARY KEY bookkeeping (compiler._table_keys)
surface through the comment / has_primary_key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Spark simpleString → DuckDB type name (duckdb_columns().data_type)
_DUCK_TYPES = {
    "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "INTEGER",
    "bigint": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
    "string": "VARCHAR", "boolean": "BOOLEAN", "binary": "BLOB",
    "date": "DATE", "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
    "void": "NULL", "interval": "INTERVAL",
}


def duck_type(spark_type: str) -> str:
    t = spark_type.lower()
    if t in _DUCK_TYPES:
        return _DUCK_TYPES[t]
    if t.startswith("decimal"):
        return "DECIMAL" + t[len("decimal"):].upper()
    if t.startswith("array<"):
        return duck_type(t[6:-1]) + "[]"
    if t.startswith("map<"):
        return "MAP"  # element detail elided
    if t.startswith("struct<"):
        return "STRUCT"
    if t.startswith("varchar") or t.startswith("char"):
        return "VARCHAR"
    return spark_type.upper()


def _oid(name: str) -> int:
    # stable, positive, session-independent pseudo-oid
    import zlib

    return zlib.crc32(name.encode()) & 0x7FFFFFFF


def _tables(spark: SparkSession):
    """(name, is_temporary) for every table/view in the current database."""
    out = []
    for t in spark.catalog.listTables():
        out.append((t.name, t.tableType == "TEMPORARY" or t.isTemporary))
    return sorted(out)


def duckdb_tables(
    spark: SparkSession,
    table_keys: dict[str, list[str]],
    comments: dict[tuple[str, str], str],
) -> DataFrame:
    rows = []
    for name, temp in _tables(spark):
        ncols = len(spark.table(name).columns)
        rows.append((
            "memory", _oid("memory"), "main", _oid("main"), name,
            _oid(name), comments.get(("table", name)), None, False, temp,
            name in table_keys, None, ncols, 0, 0, None,
        ))
    return spark.createDataFrame(
        rows,
        "database_name string, database_oid bigint, schema_name string, "
        "schema_oid bigint, table_name string, table_oid bigint, "
        "comment string, tags map<string,string>, internal boolean, "
        "temporary boolean, has_primary_key boolean, estimated_size bigint, "
        "column_count int, index_count int, check_constraint_count int, "
        "sql string",
    )


def duckdb_columns(
    spark: SparkSession, comments: dict[tuple[str, str], str]
) -> DataFrame:
    rows = []
    for name, _temp in _tables(spark):
        for idx, (col, typ) in enumerate(spark.table(name).dtypes, start=1):
            rows.append((
                "memory", _oid("memory"), "main", _oid("main"), name,
                _oid(name), col, idx,
                comments.get(("column", f"{name}.{col}")), False, None,
                True, duck_type(typ), _oid(typ), None, None, None, None,
            ))
    return spark.createDataFrame(
        rows,
        "database_name string, database_oid bigint, schema_name string, "
        "schema_oid bigint, table_name string, table_oid bigint, "
        "column_name string, column_index int, comment string, "
        "internal boolean, column_default string, is_nullable boolean, "
        "data_type string, data_type_id bigint, "
        "character_maximum_length int, numeric_precision int, "
        "numeric_precision_radix int, numeric_scale int",
    )


def duckdb_functions(spark: SparkSession) -> DataFrame:
    rows = []
    for f in spark.catalog.listFunctions():
        rows.append((
            "memory", _oid("memory"), "main", f.name, "scalar", None, None,
            None, None, None, None, None, None, False, not f.isTemporary,
            _oid(f.name), None, None,
        ))
    return spark.createDataFrame(
        rows,
        "database_name string, database_oid bigint, schema_name string, "
        "function_name string, function_type string, description string, "
        "comment string, tags map<string,string>, return_type string, "
        "parameters array<string>, parameter_types array<string>, "
        "varargs string, macro_definition string, has_side_effects boolean, "
        "internal boolean, function_oid bigint, example string, "
        "stability string",
    )


def duckdb_settings(spark: SparkSession) -> DataFrame:
    try:
        allconf = dict(spark.conf.getAll)
    except Exception:
        allconf = dict(spark.sparkContext.getConf().getAll())
    rows = [
        (k, str(v), None, "VARCHAR", "GLOBAL")
        for k, v in sorted(allconf.items())
    ]
    return spark.createDataFrame(
        rows,
        "name string, value string, description string, "
        "input_type string, scope string",
    )


def duckdb_views(spark: SparkSession) -> DataFrame:
    rows = []
    for name, temp in _tables(spark):
        rows.append((
            "memory", _oid("memory"), "main", _oid("main"), name,
            _oid(name), None, None, False, temp,
            len(spark.table(name).columns), None,
        ))
    return spark.createDataFrame(
        rows,
        "database_name string, database_oid bigint, schema_name string, "
        "schema_oid bigint, view_name string, view_oid bigint, "
        "comment string, tags map<string,string>, internal boolean, "
        "temporary boolean, column_count int, sql string",
    )


def duckdb_schemas(spark: SparkSession) -> DataFrame:
    rows = [(_oid("main"), "memory", _oid("memory"), "main", None, None,
             False, None)]
    return spark.createDataFrame(
        rows,
        "oid bigint, database_name string, database_oid bigint, "
        "schema_name string, comment string, tags map<string,string>, "
        "internal boolean, sql string",
    )


def duckdb_databases(spark: SparkSession) -> DataFrame:
    rows = [("memory", _oid("memory"), None, None, None, False,
             "duckdb_psql_spark", False)]
    return spark.createDataFrame(
        rows,
        "database_name string, database_oid bigint, path string, "
        "comment string, tags map<string,string>, internal boolean, "
        "type string, readonly boolean",
    )


def info_schema_tables(spark: SparkSession) -> DataFrame:
    rows = [
        ("memory", "main", name, "VIEW" if temp else "BASE TABLE",
         None, None, None, None, None, "YES", "NO", None, None)
        for name, temp in _tables(spark)
    ]
    return spark.createDataFrame(
        rows,
        "table_catalog string, table_schema string, table_name string, "
        "table_type string, self_referencing_column_name string, "
        "reference_generation string, user_defined_type_catalog string, "
        "user_defined_type_schema string, user_defined_type_name string, "
        "is_insertable_into string, is_typed string, commit_action string, "
        "TABLE_COMMENT string",
    )


_INFO_COLUMNS_TAIL = [
    # the standard's full column set after data_type — all NULL here
    # (DuckDB populates a handful; Spark keeps none of them)
    "character_maximum_length int", "character_octet_length int",
    "numeric_precision int", "numeric_precision_radix int",
    "numeric_scale int", "datetime_precision int", "interval_type string",
    "interval_precision int", "character_set_catalog string",
    "character_set_schema string", "character_set_name string",
    "collation_catalog string", "collation_schema string",
    "collation_name string", "domain_catalog string",
    "domain_schema string", "domain_name string", "udt_catalog string",
    "udt_schema string", "udt_name string", "scope_catalog string",
    "scope_schema string", "scope_name string", "maximum_cardinality int",
    "dtd_identifier string", "is_self_referencing string",
    "is_identity string", "identity_generation string",
    "identity_start string", "identity_increment string",
    "identity_maximum string", "identity_minimum string",
    "identity_cycle string", "is_generated string",
    "generation_expression string", "is_updatable string",
    "COLUMN_COMMENT string",
]


def info_schema_columns(spark: SparkSession) -> DataFrame:
    rows = []
    for name, _temp in _tables(spark):
        for idx, (col, typ) in enumerate(spark.table(name).dtypes, start=1):
            rows.append((
                "memory", "main", name, col, idx, None, "YES",
                duck_type(typ), *([None] * len(_INFO_COLUMNS_TAIL)),
            ))
    return spark.createDataFrame(
        rows,
        "table_catalog string, table_schema string, table_name string, "
        "column_name string, ordinal_position int, column_default string, "
        "is_nullable string, data_type string, "
        + ", ".join(_INFO_COLUMNS_TAIL),
    )


def info_schema_schemata(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("memory", "main", None, None, None, None, None)],
        "catalog_name string, schema_name string, schema_owner string, "
        "default_character_set_catalog string, "
        "default_character_set_schema string, "
        "default_character_set_name string, sql_path string",
    )


def pg_tables(spark: SparkSession) -> DataFrame:
    rows = [("main", name, None, None, False, False, False)
            for name, _temp in _tables(spark)]
    return spark.createDataFrame(
        rows,
        "schemaname string, tablename string, tableowner string, "
        "tablespace string, hasindexes boolean, hasrules boolean, "
        "hastriggers boolean",
    )


def show_all_tables(spark: SparkSession) -> DataFrame:
    rows = []
    for name, temp in _tables(spark):
        dtypes = spark.table(name).dtypes
        rows.append((
            "memory", "main", name,
            [c for c, _ in dtypes],
            [duck_type(t) for _, t in dtypes],
            temp,
        ))
    return spark.createDataFrame(
        rows,
        "database string, schema string, name string, "
        "column_names array<string>, column_types array<string>, "
        "temporary boolean",
    )


def duckdb_constraints(spark: SparkSession, compiler) -> DataFrame:
    """DuckDB's duckdb_constraints() over the engine's two key stores:
    column-def PRIMARY KEY/UNIQUE of CREATE TEMP TABLE (_table_keys)
    and the session-level DECLARE registry (constraints.py — file
    scans can't carry DDL, so declared sources surface with the
    source identity as table_name). Schema mirrors DuckDB 1.0's
    column set; expression is NULL (no CHECK constraints)."""
    rows = []
    for name, cols in compiler._table_keys.items():
        rows.append((
            "memory", _oid("memory"), "main", _oid("main"), name,
            _oid(name), 0, "PRIMARY KEY",
            f"PRIMARY KEY({', '.join(cols)})", None,
            list(range(len(cols))), list(cols),
        ))
    kc = compiler.constraints
    for src, keysets in kc.uniques.items():
        for i, ks in enumerate(sorted(map(sorted, keysets))):
            rows.append((
                "memory", _oid("memory"), "main", _oid("main"), src[1],
                _oid(src[1]), i, "UNIQUE",
                f"UNIQUE({', '.join(ks)})", None,
                list(range(len(ks))), list(ks),
            ))
    for (src, cols_fs), (ref, mapping) in kc.fks.items():
        cols = sorted(cols_fs)
        rows.append((
            "memory", _oid("memory"), "main", _oid("main"), src[1],
            _oid(src[1]), 0, "FOREIGN KEY",
            f"FOREIGN KEY ({', '.join(cols)}) REFERENCES {ref[1]}"
            f"({', '.join(mapping[c] for c in cols)})",
            None, list(range(len(cols))), list(cols),
        ))
    return spark.createDataFrame(
        rows,
        "database_name string, database_oid bigint, schema_name string, "
        "schema_oid bigint, table_name string, table_oid bigint, "
        "constraint_index bigint, constraint_type string, "
        "constraint_text string, expression string, "
        "constraint_column_indexes array<bigint>, "
        "constraint_column_names array<string>",
    )


TABLE_FUNCS = {
    "duckdb_tables": lambda spark, c: duckdb_tables(
        spark, c._table_keys, c._comments
    ),
    "duckdb_constraints": lambda spark, c: duckdb_constraints(spark, c),
    "duckdb_columns": lambda spark, c: duckdb_columns(spark, c._comments),
    "duckdb_functions": lambda spark, c: duckdb_functions(spark),
    "duckdb_settings": lambda spark, c: duckdb_settings(spark),
    "duckdb_views": lambda spark, c: duckdb_views(spark),
    "duckdb_schemas": lambda spark, c: duckdb_schemas(spark),
    "duckdb_databases": lambda spark, c: duckdb_databases(spark),
}

VIRTUAL_SCHEMAS = {
    ("information_schema", "tables"): info_schema_tables,
    ("information_schema", "columns"): info_schema_columns,
    ("information_schema", "schemata"): info_schema_schemata,
    ("pg_catalog", "pg_tables"): pg_tables,
}
