"""SPARQL result serializers: XML, JSON, CSV, TSV (+ N-Triples for
CONSTRUCT/DESCRIBE graphs).

Parity with the reference's output dispatch (fs_query_results_output,
/root/reference/src/frontend/results.c:2900-2918; writers output_sparql
:1900, output_text :2014, output_csv :2143, output_json :2248) against the
W3C formats those writers implement.

All writers stream ``df.toLocalIterator()`` — the driver holds one
partition at a time, never the whole result set.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape as xml_escape

from fourstore_spark.model import KIND_BNODE, KIND_LITERAL, KIND_URI


class _BnodeNamer:
    """Per-serialization blank-node relabeling. Internal labels may
    contain characters outside the BLANK_NODE_LABEL grammar (the import
    path's collision-proof '~' namespacing, rdfio.py), so writers emit
    fresh b0, b1, ... labels instead — consistent within one
    serialization, which is all the spec requires (the reference likewise
    emits Raptor-generated genid labels on output)."""

    def __init__(self):
        self._map: dict = {}

    def __call__(self, lex: str) -> str:
        if lex.startswith("_:"):
            lex = lex[2:]
        return self._map.setdefault(lex, f"b{len(self._map)}")


def _term_dict(term, bn: _BnodeNamer) -> dict | None:
    """Row struct -> SPARQL-JSON RDF-term object."""
    if term is None or term["kind"] is None:
        return None
    kind = term["kind"]
    if kind == KIND_URI:
        return {"type": "uri", "value": term["lex"]}
    if kind == KIND_BNODE:
        return {"type": "bnode", "value": bn(term["lex"])}
    out = {"type": "literal", "value": term["lex"]}
    if term["lang"]:
        out["xml:lang"] = term["lang"]
    elif term["dt"]:
        out["datatype"] = term["dt"]
    return out


def _iter_bindings(df, variables):
    bn = _BnodeNamer()
    for row in df.toLocalIterator():
        binding = {}
        for v in variables:
            t = _term_dict(row[v], bn)
            if t is not None:
                binding[v] = t
        yield binding


# ------------------------------------------------------------------ JSON
def select_json(df, variables=None, ask: bool | None = None) -> str:
    """SPARQL 1.1 Query Results JSON (output_json, results.c:2248)."""
    if ask is not None:
        return json.dumps({"head": {}, "boolean": ask})
    variables = variables or df.columns
    bindings = list(_iter_bindings(df, variables))
    return json.dumps(
        {"head": {"vars": variables}, "results": {"bindings": bindings}},
        ensure_ascii=False,
    )


# ------------------------------------------------------------------- XML
def select_xml(df, variables=None, ask: bool | None = None) -> str:
    """SPARQL Query Results XML (output_sparql, results.c:1900)."""
    out = ['<?xml version="1.0"?>']
    out.append('<sparql xmlns="http://www.w3.org/2005/sparql-results#">')
    if ask is not None:
        out.append("  <head></head>")
        out.append(f"  <boolean>{'true' if ask else 'false'}</boolean>")
        out.append("</sparql>")
        return "\n".join(out)
    variables = variables or df.columns
    out.append("  <head>")
    for v in variables:
        out.append(f'    <variable name="{xml_escape(v)}"/>')
    out.append("  </head>")
    out.append("  <results>")
    for binding in _iter_bindings(df, variables):
        out.append("    <result>")
        for v, t in binding.items():
            val = xml_escape(t["value"])
            if t["type"] == "uri":
                body = f"<uri>{val}</uri>"
            elif t["type"] == "bnode":
                body = f"<bnode>{val}</bnode>"
            elif "xml:lang" in t:
                body = f'<literal xml:lang="{t["xml:lang"]}">{val}</literal>'
            elif "datatype" in t:
                body = (
                    f'<literal datatype="{xml_escape(t["datatype"])}">{val}</literal>'
                )
            else:
                body = f"<literal>{val}</literal>"
            out.append(f'      <binding name="{xml_escape(v)}">{body}</binding>')
        out.append("    </result>")
    out.append("  </results>")
    out.append("</sparql>")
    return "\n".join(out)


# --------------------------------------------------------------- CSV/TSV
def _csv_cell(term, bn: _BnodeNamer) -> str:
    if term is None or term["kind"] is None:
        return ""
    if term["kind"] == KIND_BNODE:
        return "_:" + bn(term["lex"])
    v = term["lex"] or ""
    if any(c in v for c in (",", '"', "\n", "\r")):
        return '"' + v.replace('"', '""') + '"'
    return v


def _tsv_cell(term, bn: _BnodeNamer) -> str:
    if term is None or term["kind"] is None:
        return ""
    kind = term["kind"]
    if kind == KIND_URI:
        return f"<{term['lex']}>"
    if kind == KIND_BNODE:
        return "_:" + bn(term["lex"])
    v = (term["lex"] or "").replace("\\", "\\\\").replace('"', '\\"')
    v = v.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    out = f'"{v}"'
    if term["lang"]:
        out += f"@{term['lang']}"
    elif term["dt"]:
        out += f"^^<{term['dt']}>"
    return out


def select_csv(df, variables=None) -> str:
    """SPARQL 1.1 Results CSV (output_csv, results.c:2143)."""
    variables = variables or df.columns
    bn = _BnodeNamer()
    lines = [",".join(variables)]
    for row in df.toLocalIterator():
        lines.append(",".join(_csv_cell(row[v], bn) for v in variables))
    return "\r\n".join(lines) + "\r\n"


def select_tsv(df, variables=None) -> str:
    """SPARQL 1.1 Results TSV (the reference's 'text' format,
    output_text, results.c:2014)."""
    variables = variables or df.columns
    bn = _BnodeNamer()
    lines = ["\t".join("?" + v for v in variables)]
    for row in df.toLocalIterator():
        lines.append("\t".join(_tsv_cell(row[v], bn) for v in variables))
    return "\n".join(lines) + "\n"


def select_text(df, variables=None, ask: bool | None = None) -> str:
    """The reference's default 'ascii'/'text' output (output_text,
    results.c:2014-2135): tab-separated cells, URIs in <>, bare lexical
    forms for the numeric shortform types (integer bare; decimal with a
    forced '.'; double with a forced exponent), language tags uppercased
    (the reference's resource storage does), quoted strings otherwise.
    Served by the httpd for Accept: text/plain and -f text/ascii."""
    from fourstore_spark.model import XSD_DECIMAL, XSD_DOUBLE, XSD_INTEGER

    if ask is not None:
        return "true\n" if ask else "false\n"

    def esc(v: str) -> str:
        return (
            v.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )

    def cell(t) -> str:
        if t is None or t["kind"] is None:
            return ""
        k = t["kind"]
        lex = t["lex"] or ""
        if k == KIND_URI:
            return f"<{lex}>"
        if k == KIND_BNODE:
            return lex if lex.startswith("_:") else "_:" + lex
        if t["lang"]:
            return f'"{esc(lex)}"@{t["lang"].upper()}'
        dt = t["dt"]
        if dt == XSD_INTEGER:
            return lex
        if dt == XSD_DECIMAL:
            return lex if "." in lex else lex + ".0"
        if dt == XSD_DOUBLE:
            return lex if ("e" in lex or lex in ("inf", "-inf")) else lex + "e0"
        if dt:
            return f'"{esc(lex)}"^^<{dt}>'
        return f'"{esc(lex)}"'

    variables = variables or df.columns
    lines = ["\t".join("?" + v for v in variables)]
    for row in df.toLocalIterator():
        lines.append("\t".join(cell(row[v]) for v in variables))
    return "\n".join(lines) + "\n"


# ------------------------------------------------------------- testcase
def select_testcase(df, variables=None, ask: bool | None = None) -> str:
    """The reference's ``-f testcase`` format (output_testcase,
    /root/reference/src/frontend/results.c:2397-2496): the W3C DAWG
    result-set vocabulary in Turtle — rs:ResultSet with one rs:solution
    bnode per row, rs:binding [ rs:variable / rs:value ] per bound var;
    ASK renders rs:boolean. CONSTRUCT/DESCRIBE route to Turtle upstream
    (the reference does the same)."""

    def esc(v: str) -> str:
        return (
            v.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )

    out = [
        "@prefix rs: "
        "<http://www.w3.org/2001/sw/DataAccess/tests/result-set#> .",
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        "",
    ]
    if ask is not None:
        out.append("[] rdf:type rs:ResultSet ;")
        out.append(
            f'   rs:boolean "{"true" if ask else "false"}"^^xsd:boolean .'
        )
        return "\n".join(out) + "\n"
    variables = variables or df.columns
    head = "\n".join(out) + "\n[] rdf:type rs:ResultSet ;\n   rs:resultVariable "
    head += ", ".join(f'"{v}"' for v in variables)
    bn = _BnodeNamer()
    sols = []
    for row in df.toLocalIterator():
        binds = []
        for v in variables:
            t = row[v]
            if t is None or t["kind"] is None:
                continue
            if t["kind"] == KIND_URI:
                val = f"<{t['lex']}>"
            elif t["kind"] == KIND_BNODE:
                val = "_:" + bn(t["lex"])
            else:
                val = f'"{esc(t["lex"])}"'
                if t["lang"]:
                    val += f"@{t['lang']}"
                elif t["dt"]:
                    val += f"^^<{t['dt']}>"
            binds.append(
                f'      rs:binding [ rs:variable "{v}" ;\n'
                f"                   rs:value {val} ]"
            )
        sols.append("   rs:solution [\n" + " ;\n".join(binds) + "\n   ]")
    return head + ("".join(" ;\n" + s for s in sols)) + " .\n"


# --------------------------------------------- CONSTRUCT/DESCRIBE graphs
def graph_ntriples(df) -> str:
    """Triples DataFrame (CONSTRUCT/DESCRIBE output schema) -> N-Triples
    text (the reference serializes via Raptor, results.c:1659-1898)."""

    def esc(v: str) -> str:
        return (
            v.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )

    bn = _BnodeNamer()
    lines = []
    for row in df.toLocalIterator():
        s = (
            "_:" + bn(row["s"])
            if row["s_kind"] == KIND_BNODE
            else f"<{row['s']}>"
        )
        p = f"<{row['p']}>"
        if row["o_kind"] == KIND_URI:
            o = f"<{row['o_lex']}>"
        elif row["o_kind"] == KIND_BNODE:
            o = "_:" + bn(row["o_lex"])
        else:
            o = f'"{esc(row["o_lex"])}"'
            if row["o_lang"]:
                o += f"@{row['o_lang']}"
            elif row["o_dt"]:
                o += f"^^<{row['o_dt']}>"
        lines.append(f"{s} {p} {o} .")
    return "\n".join(lines) + ("\n" if lines else "")


def graph_rdfxml(df) -> str:
    """Triples DataFrame (CONSTRUCT/DESCRIBE output schema) -> RDF/XML
    (the reference serializes graphs via Raptor in multiple syntaxes;
    results.c:1659-1898 + Raptor serializer selection). One
    rdf:Description per subject occurrence; predicates split into
    namespace + local name at the last #, / or : boundary."""
    import re as _re

    bn = _BnodeNamer()
    out = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">',
    ]
    split = _re.compile(r"^(.*[#/:])([A-Za-z_][\w.-]*)$")

    for row in df.toLocalIterator():
        m = split.match(row["p"])
        if not m:
            # predicate IRI with no splittable local name cannot be an
            # XML element — skip (Raptor errors similarly)
            continue
        ns, local = m.group(1), m.group(2)
        if row["s_kind"] == KIND_BNODE:
            subj = f'rdf:nodeID="{xml_escape(bn(row["s"]))}"'
        else:
            subj = f'rdf:about="{xml_escape(row["s"])}"'
        if row["o_kind"] == KIND_URI:
            obj = (
                f'<{local} xmlns="{xml_escape(ns)}" '
                f'rdf:resource="{xml_escape(row["o_lex"])}"/>'
            )
        elif row["o_kind"] == KIND_BNODE:
            obj = (
                f'<{local} xmlns="{xml_escape(ns)}" '
                f'rdf:nodeID="{xml_escape(bn(row["o_lex"]))}"/>'
            )
        else:
            attrs = ""
            if row["o_lang"]:
                attrs = f' xml:lang="{xml_escape(row["o_lang"])}"'
            elif row["o_dt"]:
                attrs = f' rdf:datatype="{xml_escape(row["o_dt"])}"'
            obj = (
                f'<{local} xmlns="{xml_escape(ns)}"{attrs}>'
                f'{xml_escape(row["o_lex"] or "")}</{local}>'
            )
        out.append(f'  <rdf:Description {subj}>')
        out.append(f"    {obj}")
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out) + "\n"


def graph_turtle(df) -> str:
    """Triples DataFrame -> Turtle, grouped by subject with ``;``
    predicate lists (Raptor's turtle serializer parity). Terms use the
    N-Triples forms (no prefix compression — correct and simple; any
    Turtle parser accepts it)."""

    def esc(v: str) -> str:
        return (
            v.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )

    bn = _BnodeNamer()
    by_subject: dict = {}
    order: list = []
    for row in df.toLocalIterator():
        s = (
            "_:" + bn(row["s"])
            if row["s_kind"] == KIND_BNODE
            else f"<{row['s']}>"
        )
        p = f"<{row['p']}>"
        if row["o_kind"] == KIND_URI:
            o = f"<{row['o_lex']}>"
        elif row["o_kind"] == KIND_BNODE:
            o = "_:" + bn(row["o_lex"])
        else:
            o = f'"{esc(row["o_lex"])}"'
            if row["o_lang"]:
                o += f"@{row['o_lang']}"
            elif row["o_dt"]:
                o += f"^^<{row['o_dt']}>"
        if s not in by_subject:
            by_subject[s] = []
            order.append(s)
        by_subject[s].append(f"{p} {o}")
    blocks = [
        f"{s} " + " ;\n    ".join(pos) + " ." for s in order
        for pos in [by_subject[s]]
    ]
    return "\n".join(blocks) + ("\n" if blocks else "")


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def graph_turtle_abbrev(df, base: str | None = None) -> str:
    """Raptor's abbreviated Turtle, as 4s-httpd streams CONSTRUCT/
    DESCRIBE bodies under Accept: text/plain (httpd.c:438 type "text" ->
    the raptor turtle serializer): ``@base``/``@prefix rdf:`` header,
    subject on its own line, 4-space-indented predicate lines joined
    with `` ;``, objects comma-grouped, block terminated `` .`` plus a
    blank line. Rows are emitted in sorted (s, p, o) order."""

    def esc(v: str) -> str:
        return (
            v.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )

    def iri(v: str) -> str:
        if v.startswith(_RDF_NS):
            return "rdf:" + v[len(_RDF_NS):]
        return f"<{v}>"

    bn = _BnodeNamer()
    triples = []
    for row in df.toLocalIterator():
        s = (
            "_:" + bn(row["s"])
            if row["s_kind"] == KIND_BNODE
            else iri(row["s"])
        )
        p = iri(row["p"])
        if row["o_kind"] == KIND_URI:
            o = iri(row["o_lex"])
        elif row["o_kind"] == KIND_BNODE:
            o = "_:" + bn(row["o_lex"])
        else:
            o = f'"{esc(row["o_lex"])}"'
            if row["o_lang"]:
                o += f"@{row['o_lang']}"
            elif row["o_dt"]:
                o += f"^^{iri(row['o_dt'])}"
        triples.append((s, p, o))
    triples = sorted(set(triples))

    out = []
    if base:
        out.append(f"@base <{base}> .\n")
    out.append(f"@prefix rdf: <{_RDF_NS}> .\n\n")
    cur_s = None
    lines: list[str] = []
    cur_p = None
    objs: list[str] = []

    def flush_pred():
        nonlocal cur_p, objs
        if cur_p is not None:
            lines.append(f"    {cur_p} " + ", ".join(objs))
        cur_p, objs = None, []

    def flush_subj():
        nonlocal cur_s, lines
        flush_pred()
        if cur_s is not None:
            out.append(cur_s + "\n" + " ;\n".join(lines) + " .\n\n")
        cur_s, lines = None, []

    for s, p, o in triples:
        if s != cur_s:
            flush_subj()
            cur_s = s
        if p != cur_p:
            flush_pred()
            cur_p = p
        objs.append(o)
    flush_subj()
    return "".join(out)
