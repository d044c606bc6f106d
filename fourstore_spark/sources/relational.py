"""Deterministic relational -> RDF quads mapping (FIXTURES.md F6).

Maps the driver's TPC-H-ish parquet tables into the engine's quads table so
every SURVEY §2 operator can be phrased both as SPARQL (engine side) and as
ANSI SQL over the original tables (DuckDB oracle side):

- row of table T with key k      -> subject ``urn:T:<k>``, graph ``urn:g:T``
- column c with value v          -> quad (urn:g:T, urn:T:<k>, urn:col:T#c, v)
  with o_dt from the column type (INT -> xsd:integer, DOUBLE -> xsd:double,
  TIMESTAMP -> xsd:dateTime, STRING -> plain literal)
- foreign keys                   -> object-URI quads (urn:<ref>:<v>)

The whole mapping is expressed as column expressions over the source scans
(no UDFs); a per-table mapping is a union of narrow selects, so Catalyst
prunes unused columns per quad-pattern and pushes predicate filters into the
parquet scan.

Replaces the reference's import pipeline for relational-shaped data
(src/frontend/import.c:333-423 hashes terms and buffers per segment; here
the "segments" are Spark partitions and the "hash" stays lexical).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fourstore_spark.model import (
    KIND_LITERAL,
    KIND_URI,
    XSD_DATETIME,
    XSD_DOUBLE,
    XSD_INTEGER,
)


@dataclass
class ColumnMap:
    name: str
    # 'int' | 'double' | 'string' | 'timestamp' | ('fk', reftable)
    typ: object


@dataclass
class TableMap:
    name: str
    key: list[str]  # subject key column(s)
    columns: list[ColumnMap] = field(default_factory=list)
    # True when key cols are NOT unique (e.g. lineitem's synthetic data has
    # duplicate (l_orderkey, l_linenumber) pairs): subjects get a
    # deterministic '-<n>' rank suffix, n = row_number partitioned by the
    # key and ordered by every mapped column. One extra shuffle at mapping
    # time; at scale this runs once at import, not per query.
    rank_key: bool = False


def _col(name: str, typ) -> ColumnMap:
    return ColumnMap(name, typ)


TABLE_MAPS: dict[str, TableMap] = {
    t.name: t
    for t in [
        TableMap(
            "region",
            ["r_regionkey"],
            [_col("r_name", "string")],
        ),
        TableMap(
            "nation",
            ["n_nationkey"],
            [_col("n_name", "string"), _col("n_regionkey", ("fk", "region"))],
        ),
        TableMap(
            "customer",
            ["c_custkey"],
            [
                _col("c_name", "string"),
                _col("c_nationkey", ("fk", "nation")),
                _col("c_acctbal", "double"),
                _col("c_mktsegment", "string"),
            ],
        ),
        TableMap(
            "supplier",
            ["s_suppkey"],
            [
                _col("s_name", "string"),
                _col("s_nationkey", ("fk", "nation")),
                _col("s_acctbal", "double"),
            ],
        ),
        TableMap(
            "part",
            ["p_partkey"],
            [
                _col("p_name", "string"),
                _col("p_brand", "string"),
                _col("p_type", "string"),
                _col("p_size", "int"),
                _col("p_retailprice", "double"),
            ],
        ),
        TableMap(
            "orders",
            ["o_orderkey"],
            [
                _col("o_custkey", ("fk", "customer")),
                _col("o_orderstatus", "string"),
                _col("o_totalprice", "double"),
                _col("o_orderdate", "timestamp"),
                _col("o_orderpriority", "string"),
            ],
        ),
        TableMap(
            "lineitem",
            ["l_orderkey", "l_linenumber"],
            rank_key=True,
            columns=[
                _col("l_orderkey", ("fk", "orders")),
                _col("l_partkey", ("fk", "part")),
                _col("l_suppkey", ("fk", "supplier")),
                _col("l_linenumber", "int"),
                _col("l_quantity", "double"),
                _col("l_extendedprice", "double"),
                _col("l_discount", "double"),
                _col("l_tax", "double"),
                _col("l_returnflag", "string"),
                _col("l_linestatus", "string"),
                _col("l_shipdate", "timestamp"),
            ],
        ),
        TableMap(
            "events",
            ["event_id"],
            [
                _col("ts", "timestamp"),
                _col("user_id", "int"),
                _col("event_type", "string"),
                _col("value", "double"),
                _col("props", "string"),
            ],
        ),
        TableMap(
            "documents",
            ["doc_id"],
            [
                _col("text", "string"),
                _col("lang", "string"),
                _col("source", "string"),
                _col("n_chars", "int"),
            ],
        ),
    ]
}


def subject_uri(table: str, key_cols: list) -> F.Column:
    """``urn:T:<k>`` (composite keys joined with '-')."""
    parts = [F.lit(f"urn:{table}:")]
    for i, c in enumerate(key_cols):
        if i:
            parts.append(F.lit("-"))
        parts.append(c.cast("string"))
    return F.concat(*parts)


def predicate_uri(table: str, column: str) -> str:
    return f"urn:col:{table}#{column}"


def graph_uri(table: str) -> str:
    return f"urn:g:{table}"


# DuckDB-side SQL fragments for the same mapping, so oracle queries can
# reconstruct subjects/objects identically.
def sql_subject(table: str) -> str:
    tm = TABLE_MAPS[table]
    expr = " || '-' || ".join(f"CAST({k} AS VARCHAR)" for k in tm.key)
    if tm.rank_key:
        expr += " || '-' || CAST(__rn AS VARCHAR)"
    return f"'urn:{table}:' || {expr}"


def sql_from(table: str) -> str:
    """FROM-clause source replicating the mapping's row identity: ranked
    tables get the same deterministic ROW_NUMBER the Spark side computes."""
    tm = TABLE_MAPS[table]
    if not tm.rank_key:
        return table
    part = ", ".join(tm.key)
    order = ", ".join(cm.name for cm in tm.columns)
    return (
        f"(SELECT *, ROW_NUMBER() OVER (PARTITION BY {part} "
        f"ORDER BY {order}) AS __rn FROM {table})"
    )


def sql_fk_object(reftable: str, column: str) -> str:
    return f"'urn:{reftable}:' || CAST({column} AS VARCHAR)"


def _timestamp_lex(c: F.Column) -> F.Column:
    # ISO-8601, second precision (test data carries whole seconds)
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def table_quads(df: DataFrame, table: str) -> DataFrame:
    """Map one relational DataFrame into quads rows."""
    tm = TABLE_MAPS[table]
    key_cols = [df[k] for k in tm.key]
    if tm.rank_key:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*key_cols).orderBy(
            *[df[cm.name] for cm in tm.columns]
        )
        df = df.withColumn("__rn", F.row_number().over(w))
        key_cols = [df[k] for k in tm.key] + [df["__rn"]]
    subj = subject_uri(table, key_cols)
    g = F.lit(graph_uri(table))
    parts: list[DataFrame] = []
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    for cm in tm.columns:
        p = F.lit(predicate_uri(table, cm.name))
        c = df[cm.name]
        if isinstance(cm.typ, tuple):  # foreign key -> object URI
            _, ref = cm.typ
            o_kind = F.lit(KIND_URI)
            o_lex = F.concat(F.lit(f"urn:{ref}:"), c.cast("string"))
            o_dt, o_lang, o_num = null_s, null_s, null_d
        elif cm.typ == "int":
            o_kind = F.lit(KIND_LITERAL)
            o_lex = c.cast("string")
            o_dt = F.lit(XSD_INTEGER)
            o_lang = null_s
            o_num = c.cast("double")
        elif cm.typ == "double":
            o_kind = F.lit(KIND_LITERAL)
            o_lex = c.cast("string")
            o_dt = F.lit(XSD_DOUBLE)
            o_lang = null_s
            o_num = c.cast("double")
        elif cm.typ == "timestamp":
            o_kind = F.lit(KIND_LITERAL)
            o_lex = _timestamp_lex(c)
            o_dt = F.lit(XSD_DATETIME)
            o_lang = null_s
            o_num = null_d
        else:  # plain string literal
            o_kind = F.lit(KIND_LITERAL)
            o_lex = c.cast("string")
            o_dt = null_s
            o_lang = null_s
            o_num = null_d
        part = df.where(c.isNotNull()).select(
            g.alias("g"),
            subj.alias("s"),
            F.lit(KIND_URI).cast("tinyint").alias("s_kind"),
            p.alias("p"),
            o_kind.cast("tinyint").alias("o_kind"),
            o_lex.alias("o_lex"),
            o_dt.cast("string").alias("o_dt"),
            o_lang.cast("string").alias("o_lang"),
            o_num.cast("double").alias("o_num"),
        )
        parts.append(part)
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.ts may be TIMESTAMP(NANOS) parquet (rejected by Spark by
        # default — read as long nanos and convert) or plain micros
        # TIMESTAMP depending on how the dataset was generated.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def quads_from_sf_dir(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> DataFrame:
    """Union of the quad mappings of every (requested) table in sf_dir."""
    names = tables or list(TABLE_MAPS)
    out = None
    for t in names:
        q = table_quads(load_table(spark, sf_dir, t), t)
        out = q if out is None else out.unionByName(q)
    return out
