"""Public query API.

Mirrors the reference's entry point fs_query_execute
(src/frontend/query.c:337): parse -> plan -> execute, returning a lazy
DataFrame instead of a pull-model row fetcher (fs_query_fetch_row,
src/frontend/results.c:2598) — Spark's actions are the pull model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fourstore_spark.sparql.parser import parse_query
from fourstore_spark.sparql.translator import Translator


class SparqlResult:
    def __init__(self, form: str, df: DataFrame):
        self.form = form
        self.df = df

    def ask(self) -> bool:
        assert self.form == "ASK"
        return len(self.df.take(1)) > 0

    # -- flat projections for oracle comparison / serialization ----------
    def lex(self, var: str) -> Column:
        return self.df[var]["lex"]

    def num(self, var: str) -> Column:
        return self.df[var]["num"]

    def flat(self, **types: str) -> DataFrame:
        """Project term-struct vars to plain columns.

        types: var -> 'lex' | 'num' | 'int' | 'ts' | 'date' | 'bool'
        Unlisted vars default to 'lex'.
        """
        cols = []
        for var in self.df.columns:
            t = types.get(var, "lex")
            c = self.df[var]
            if t == "lex":
                cols.append(c["lex"].alias(var))
            elif t == "num":
                cols.append(c["num"].alias(var))
            elif t == "int":
                cols.append(c["num"].cast("long").alias(var))
            elif t == "ts":
                cols.append(F.to_timestamp(c["lex"]).alias(var))
            elif t == "date":
                cols.append(F.to_date(c["lex"]).alias(var))
            elif t == "bool":
                cols.append((c["lex"] == "true").alias(var))
            else:
                raise ValueError(t)
        return self.df.select(*cols)


class SparqlEngine:
    """SPARQL engine over a quads DataFrame.

    quads schema: model.QUADS_SCHEMA — (g, s, s_kind, p, o_kind, o_lex,
    o_dt, o_lang, o_num).
    """

    def __init__(
        self,
        spark: SparkSession,
        quads: DataFrame,
        union_default_graph: bool = True,
    ):
        self.spark = spark
        self.quads = quads
        self.union_default_graph = union_default_graph

    def query(self, text: str) -> SparqlResult:
        q = parse_query(text)
        tr = Translator(self.spark, self.quads, self.union_default_graph)
        df = tr.translate_query(q)
        return SparqlResult(q.form, df)

    def select(self, text: str, **types: str) -> DataFrame:
        """Run a SELECT and flatten term structs to plain columns."""
        res = self.query(text)
        assert res.form == "SELECT", res.form
        return res.flat(**types)

    def ask(self, text: str) -> bool:
        return self.query(text).ask()
