"""RDF syntax I/O: N-Triples / N-Quads (distributed) and Turtle
(driver-side), plus quad serializers.

Replaces the reference's Raptor-based import pipeline (fs_import,
/root/reference/src/frontend/import.c:333-477; statement callback
store_stmt import.c:702) with:

- **N-Triples / N-Quads**: line-oriented, so the parse distributes as a
  ``mapPartitions`` over ``spark.read.text`` — each executor parses its
  split with a pure-Python tokenizer; no driver bottleneck, scales to
  arbitrarily large dumps. Blank-node labels are file-scoped
  (``_:label``), matching the reference's per-import bnode allocation
  (fs_bnode_id, import.c:546-586) without a cluster-wide counter.
- **Turtle**: parsed on the driver by reusing the SPARQL grammar's
  triples-block parser (Turtle is a syntactic subset of a SPARQL BGP plus
  @prefix/@base). Right for config files and test KBs; convert big data
  to N-Triples/N-Quads for the distributed path.

Serialization (dump.c / restore.c parity) goes the other way: a quads
DataFrame becomes one N-Quads (or N-Triples) line per row via a column
expression, written with ``df.write.text`` — fully distributed.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fourstore_spark.model import (
    DEFAULT_GRAPH,
    KIND_BNODE,
    KIND_LITERAL,
    KIND_URI,
    NUMERIC_DATATYPES,
    QUADS_SCHEMA,
)

_TERM_RE = re.compile(
    r"""\s*(?:
        <(?P<iri>[^>]*)>
      | (?P<bnode>_:[^\s]+)
      | "(?P<lit>(?:[^"\\]|\\.)*)"
        (?:@(?P<lang>[A-Za-z][A-Za-z0-9-]*)|\^\^<(?P<dt>[^>]*)>)?
      | (?P<dot>\.)
    )""",
    re.VERBOSE,
)

_UNESC = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in _UNESC:
                out.append(_UNESC[n])
                i += 2
                continue
            if n == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if n == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_nt_line(line: str, default_graph: str = DEFAULT_GRAPH):
    """One N-Triples/N-Quads line -> quad tuple matching QUADS_SCHEMA,
    or None for blank/comment lines."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    terms = []
    pos = 0
    while pos < len(line):
        m = _TERM_RE.match(line, pos)
        if not m:
            raise ValueError(f"bad N-Triples syntax at col {pos}: {line!r}")
        pos = m.end()
        if m.group("dot") is not None:
            break
        if m.group("iri") is not None:
            terms.append(("iri", _unescape(m.group("iri")), None, None))
        elif m.group("bnode") is not None:
            terms.append(("bnode", m.group("bnode")[2:], None, None))
        else:
            terms.append(
                ("lit", _unescape(m.group("lit")), m.group("dt"), m.group("lang"))
            )
    if len(terms) not in (3, 4):
        raise ValueError(f"expected 3 or 4 terms: {line!r}")
    (sk, sv, _, _), (pk, pv, _, _), (ok, ov, odt, olang) = terms[:3]
    if pk != "iri":
        raise ValueError(f"predicate must be an IRI: {line!r}")
    if len(terms) == 4:
        gk, gv, _, _ = terms[3]
        g = gv if gk == "iri" else "_:" + gv
    else:
        g = default_graph
    s = sv if sk == "iri" else "_:" + sv
    s_kind = KIND_URI if sk == "iri" else KIND_BNODE
    if ok == "iri":
        o_kind, o_lex, o_dt, o_lang, o_num = KIND_URI, ov, None, None, None
    elif ok == "bnode":
        o_kind, o_lex, o_dt, o_lang, o_num = KIND_BNODE, "_:" + ov, None, None, None
    else:
        o_kind, o_lex, o_dt = KIND_LITERAL, ov, odt
        o_lang = olang.lower() if olang else None
        o_num = None
        if odt in NUMERIC_DATATYPES:
            try:
                o_num = float(ov)
            except ValueError:
                o_num = None
    return (g, s, s_kind, pv, o_kind, o_lex, o_dt, o_lang, o_num)


def quads_from_nt(
    spark: SparkSession, path: str, default_graph: str = DEFAULT_GRAPH
) -> DataFrame:
    """Distributed N-Triples/N-Quads load: text splits parse in parallel."""
    lines = spark.read.text(path)

    def parse_partition(rows):
        for row in rows:
            q = parse_nt_line(row[0], default_graph)
            if q is not None:
                yield q

    return spark.createDataFrame(
        lines.rdd.mapPartitions(parse_partition), QUADS_SCHEMA
    )


def quads_from_nt_text(
    spark: SparkSession, text: str, default_graph: str = DEFAULT_GRAPH
) -> DataFrame:
    """Parse an in-memory N-Triples/N-Quads string (driver-side)."""
    rows = [
        q
        for line in text.splitlines()
        if (q := parse_nt_line(line, default_graph)) is not None
    ]
    return spark.createDataFrame(rows, QUADS_SCHEMA)


# ------------------------------------------------------------- turtle
_AT_PREFIX = re.compile(r"@prefix\s+(\S+)\s+(<[^>]*>)\s*\.", re.IGNORECASE)
_AT_BASE = re.compile(r"@base\s+(<[^>]*>)\s*\.", re.IGNORECASE)


def parse_turtle(text: str) -> list:
    """Turtle text -> list of (s, p, o) algebra terms (driver-side).

    Reuses the SPARQL grammar's triples-block parser — Turtle's triple
    syntax (prefixed names, 'a', ';' ',' lists, bnode property lists,
    collections) is the same production the WHERE clause uses. @prefix/
    @base directives are rewritten to SPARQL PREFIX/BASE first.
    """
    from fourstore_spark.sparql.parser import Parser

    text = _AT_PREFIX.sub(lambda m: f"PREFIX {m.group(1)} {m.group(2)}", text)
    text = _AT_BASE.sub(lambda m: f"BASE {m.group(1)}", text)
    p = Parser(text)
    triples: list = []
    while True:
        p.parse_prologue()
        if p.peek().type == "EOF":
            break
        block = p.parse_triples_block()
        if not block:
            p.err("expected triples")
        triples.extend(block)
    return triples


def quads_from_turtle(
    spark: SparkSession, text: str, default_graph: str = DEFAULT_GRAPH
) -> DataFrame:
    """Turtle text -> quads DataFrame (driver-side parse)."""
    from fourstore_spark.sparql import algebra as A

    rows = []
    for tp in parse_turtle(text):
        if isinstance(tp.s, A.Iri):
            s, s_kind = tp.s.value, KIND_URI
        else:  # BNode
            s, s_kind = "_:" + tp.s.label, KIND_BNODE
        pv = tp.p.value
        o = tp.o
        if isinstance(o, A.Iri):
            row_o = (KIND_URI, o.value, None, None, None)
        elif isinstance(o, A.BNode):
            row_o = (KIND_BNODE, "_:" + o.label, None, None, None)
        else:
            num = None
            if o.dt in NUMERIC_DATATYPES:
                try:
                    num = float(o.lex)
                except ValueError:
                    num = None
            row_o = (KIND_LITERAL, o.lex, o.dt, o.lang, num)
        rows.append((default_graph, s, s_kind, pv) + row_o)
    return spark.createDataFrame(rows, QUADS_SCHEMA)


def load_rdf(
    spark: SparkSession, path: str, default_graph: str = DEFAULT_GRAPH
) -> DataFrame:
    """Format-sniffing loader (fs_import picks a Raptor parser by
    extension/MIME, import.c:352-371): .nt/.nq distributed, .ttl driver."""
    lower = path.lower()
    if lower.endswith((".ttl", ".turtle")):
        with open(path, encoding="utf-8") as fh:
            return quads_from_turtle(spark, fh.read(), default_graph)
    return quads_from_nt(spark, path, default_graph)


# --------------------------------------------------------- serializers
def _esc_lit(c: Column) -> Column:
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def nt_object(o_kind: Column, o_lex: Column, o_dt: Column, o_lang: Column) -> Column:
    lit = F.concat(F.lit('"'), _esc_lit(o_lex), F.lit('"'))
    lit = F.when(
        o_lang.isNotNull(), F.concat(lit, F.lit("@"), o_lang)
    ).when(
        o_dt.isNotNull(), F.concat(lit, F.lit("^^<"), o_dt, F.lit(">"))
    ).otherwise(lit)
    return (
        F.when(o_kind == KIND_URI, F.concat(F.lit("<"), o_lex, F.lit(">")))
        .when(o_kind == KIND_BNODE, o_lex)
        .otherwise(lit)
    )


def nt_subject(s: Column, s_kind: Column) -> Column:
    return F.when(
        s_kind == KIND_BNODE, s
    ).otherwise(F.concat(F.lit("<"), s, F.lit(">")))


def quads_to_nq_lines(quads: DataFrame, with_graph: bool = True) -> DataFrame:
    """One N-Quads (or N-Triples) line per quad, as a single 'value'
    column — write with df.write.text for a distributed dump
    (dump.c parity without the custom binary format)."""
    parts = [
        nt_subject(F.col("s"), F.col("s_kind")),
        F.lit(" "),
        F.concat(F.lit("<"), F.col("p"), F.lit(">")),
        F.lit(" "),
        nt_object(F.col("o_kind"), F.col("o_lex"), F.col("o_dt"), F.col("o_lang")),
    ]
    base = F.concat(*parts)
    if with_graph:
        line = F.when(
            F.col("g") == DEFAULT_GRAPH, F.concat(base, F.lit(" ."))
        ).otherwise(
            F.concat(base, F.lit(" <"), F.col("g"), F.lit("> ."))
        )
    else:
        line = F.concat(base, F.lit(" ."))
    return quads.select(line.alias("value"))
