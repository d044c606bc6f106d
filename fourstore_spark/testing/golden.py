"""Replay of the reference's OWN end-to-end query tests.

The reference's primary test harness (tests/query/run.pl) executes every
shell script in tests/query/scripts/* against a store loaded by
tests/query/setup.sh (swh.xrdf FOAF + tiger/TGR06001.nt census data as
named graphs, nasty.ttl imported then deleted) and byte-diffs stdout
against the golden files in tests/query/exemplar/*.  This module replays
those scripts against THIS engine:

- ``parse_script`` extracts the embedded 4s-query / 4s-import /
  4s-delete-model invocations (including ``echo '...' | 4s-query -P``
  stdin mode, ``-f`` format flags, and ``| sort`` post-processing);
- ``run_script`` executes them over the same checked-in data files and
  renders output in 4s-query's byte shapes: the default ``ascii``/TSV
  format (output_text, src/frontend/results.c:2014-2135 — bare
  xsd:integer, decimal with a forced '.', double with a forced exponent),
  the SPARQL XML format (output_sparql, results.c:1900-2012), and
  N-Triples for CONSTRUCT;
- ``compare_output`` diffs against the exemplar: exact first, then a
  line-multiset fallback (the reference's row order for un-ORDERed
  queries is its own bind order, which no other engine reproduces) with
  blank-node labels canonicalized (bnode naming is allocator-specific).

TGR06001.nt is NOT in the reference checkout (data/tiger/ only carries
the tiger.pl generator, which downloads from census.gov), so scripts
whose exemplar depends on the census graph are excused explicitly by the
caller — and, like the reference's excuses.txt discipline, an excused
script that unexpectedly PASSES is reported stale.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from fourstore_spark.model import KIND_BNODE, KIND_URI

REF_QUERY_DIR = "/root/reference/tests/query"
REF_DATA_DIR = "/root/reference/data"
GRAPH_SWH = "http://example.com/swh.xrdf"


@dataclass
class Step:
    kind: str  # 'echo' | 'query' | 'import' | 'delete-model'
    text: str = ""  # echo payload or query text
    fmt: str = "ascii"
    programatic: bool = False
    pipe: list = field(default_factory=list)  # post-processing pipeline
    model: str = ""
    path: str = ""


@dataclass
class Script:
    name: str
    steps: list[Step] = field(default_factory=list)
    unsupported: str | None = None  # reason if a command can't be replayed


_SQ = re.compile(r"'([^']*)'", re.S)


def _commands(text: str) -> list[str]:
    """Split script body into logical commands: lines accumulate until
    single quotes balance (queries are multiline single-quoted) and
    heredocs (<<WORD ... WORD) are consumed whole."""
    cmds: list[str] = []
    buf = ""
    heredoc: str | None = None
    for ln in text.split("\n"):
        if not buf:
            s = ln.strip()
            if not s or s.startswith("#!") or s.startswith("#"):
                continue
            buf = ln
        else:
            buf += "\n" + ln
        if heredoc is not None:
            if ln.strip() == heredoc:
                heredoc = None
            else:
                continue
        m = re.search(r"<<\s*(\w+)\s*$", ln)
        if m and heredoc is None and buf.count("'") % 2 == 0:
            heredoc = m.group(1)
            continue
        if buf.count("'") % 2 == 0 and buf.count('"') % 2 == 0:
            cmds.append(buf)
            buf = ""
    if buf:
        cmds.append(buf)
    return cmds


_ANY_Q = re.compile(r"'([^']*)'|\"([^\"]*)\"", re.S)


def _first_quoted(text: str) -> tuple[str, int] | None:
    """First single- or double-quoted span -> (content, end offset)."""
    m = _ANY_Q.search(text)
    if not m:
        return None
    return (m.group(1) if m.group(1) is not None else m.group(2), m.end())


def _parse_pipeline(tail: str) -> list:
    """Post-processing after the query: `| sort`, `| wc -l`,
    `| sed 's/pat/repl/g'`, `| grep -v 'pat'` (run.pl scripts use these
    to canonicalize allocator-specific bnode names and drop warnings)."""
    ops: list = []
    for seg in tail.split("|")[1:]:
        seg = seg.strip().rstrip(";").strip()
        if not seg:
            continue
        if seg.startswith("sort"):
            ops.append(("sort",))
        elif seg.startswith("wc -l"):
            ops.append(("wc-l",))
        elif seg.startswith("sed"):
            q = _first_quoted(seg)
            if not q or not q[0].startswith("s/"):
                return [("unsupported", seg)]
            _, pat, repl, _flags = q[0].split("/", 3)
            ops.append(("sed", pat, repl))
        elif seg.startswith("grep -v"):
            q = _first_quoted(seg)
            if not q:
                return [("unsupported", seg)]
            ops.append(("grep-v", q[0]))
        else:
            return [("unsupported", seg)]
    return ops


def _laqrs_compat(q: str) -> str:
    """The reference links Rasqal's LAQRS grammar, which tolerates commas
    between projection items (`SELECT ?a, (COUNT(?o) AS ?c)`); strip
    them from the projection head only (before the first '{'/WHERE)."""
    head_end = q.find("{")
    if head_end < 0:
        return q
    head = q[:head_end]
    if "," in head:
        head = head.replace(",", " ")
    return head + q[head_end:]


def parse_script(path: str) -> Script:
    sc = Script(name=os.path.basename(path))
    with open(path) as fh:
        body = fh.read()
    for cmd in _commands(body):
        if "4s-query" in cmd:
            pre, args = cmd.split("4s-query", 1)
            st = Step(kind="query")
            m = re.search(r"-f\s*(\w+)", args)
            if m:
                st.fmt = m.group(1)
            if re.search(r"\s-P\b", args):
                st.programatic = True
            hd = re.search(r"<<\s*(\w+)\n(.*)\n\1\s*$", args, re.S)
            if hd:
                st.text, tail = hd.group(2), ""
            elif "|" in pre:
                # stdin mode: echo 'Q' | 4s-query ...; query in the echo
                q = _first_quoted(pre)
                if not q:
                    sc.unsupported = f"no stdin query: {cmd[:60]!r}"
                    return sc
                st.text, tail = q[0], args
            else:
                q = _first_quoted(args)
                if not q:
                    sc.unsupported = f"no inline query: {cmd[:60]!r}"
                    return sc
                st.text, tail = q[0], args[q[1]:]
            st.text = _laqrs_compat(st.text)
            st.pipe = _parse_pipeline(tail)
            for op in st.pipe:
                if op[0] == "unsupported":
                    sc.unsupported = f"unsupported pipeline: {op[1]!r}"
                    return sc
            sc.steps.append(st)
        elif "4s-import" in cmd:
            m = re.search(r"-m\s+(\S+)\s+(\S+)", cmd)
            if not m:
                sc.unsupported = f"unparsed import: {cmd[:60]!r}"
                return sc
            path_arg = m.group(2).replace("$TESTPATH/../data", REF_DATA_DIR)
            sc.steps.append(
                Step(kind="import", model=m.group(1), path=path_arg)
            )
        elif "4s-delete-model" in cmd:
            m = re.search(r"(https?://\S+)", cmd)
            if not m:
                sc.unsupported = f"unparsed delete-model: {cmd[:60]!r}"
                return sc
            sc.steps.append(Step(kind="delete-model", model=m.group(1)))
        elif cmd.strip().startswith("echo"):
            q = _SQ.search(cmd) or re.search(r'"([^"]*)"', cmd)
            txt = (q.group(1) if q else "").replace("$?", "0")
            sc.steps.append(Step(kind="echo", text=txt))
        elif cmd.strip().startswith("pkg-config"):
            continue  # rasqal version gate — not applicable here
        else:
            sc.unsupported = f"unsupported command: {cmd.strip()[:60]!r}"
            return sc
    return sc


# ----------------------------------------------------- output rendering
def _ascii_output(res) -> str:
    """4s-query's default output (output_text) — rendering now lives in
    results_io.select_text; graph forms emit N-Triples."""
    from fourstore_spark.sparql import results_io as R

    if res.form == "ASK":
        return R.select_text(res.df, ask=res.ask())
    if res.form in ("CONSTRUCT", "DESCRIBE"):
        return res.serialize("ntriples")
    return R.select_text(res.df)


def _xml_output(res) -> str:
    """output_sparql's byte shape (results.c:1900-2012): two-space
    indents, head always open/close on separate lines, binding on one
    line. Differs from results_io.select_xml only in ASK's head."""
    from xml.sax.saxutils import escape as xesc

    out = [
        '<?xml version="1.0"?>',
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">',
        "  <head>",
    ]
    if res.form == "ASK":
        out.append("  </head>")
        out.append(f"  <boolean>{'true' if res.ask() else 'false'}</boolean>")
        out.append("</sparql>")
        return "\n".join(out) + "\n"
    cols = res.df.columns
    for c in cols:
        out.append(f'    <variable name="{xesc(c)}"/>')
    out.append("  </head>")
    out.append("  <results>")
    for row in res.df.toLocalIterator():
        out.append("    <result>")
        for c in cols:
            t = row[c]
            if t is None or t["kind"] is None:
                continue
            lex = xesc(t["lex"] or "")
            if t["kind"] == KIND_URI:
                body = f"<uri>{lex}</uri>"
            elif t["kind"] == KIND_BNODE:
                body = f"<bnode>{lex}</bnode>"
            elif t["lang"]:
                body = f'<literal xml:lang="{t["lang"]}">{lex}</literal>'
            elif t["dt"]:
                body = f'<literal datatype="{t["dt"]}">{lex}</literal>'
            else:
                body = f"<literal>{lex}</literal>"
            out.append(f'      <binding name="{xesc(c)}">{body}</binding>')
        out.append("    </result>")
    out.append("  </results>")
    out.append("</sparql>")
    return "\n".join(out) + "\n"


# ------------------------------------------------------------ execution
def load_graph(spark, model: str, path: str):
    """One data file -> quads DataFrame in graph ``model`` (4s-import
    uses the model URI as parse base)."""
    from fourstore_spark.sources.rdfio import (
        quads_from_rdfxml,
        quads_from_turtle,
    )

    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    if path.endswith((".xrdf", ".rdf", ".xml")):
        q = quads_from_rdfxml(spark, text, model, base=model)
    else:
        q = quads_from_turtle(spark, text, model)
    # 4store import is set-semantics (store.py QUAD_KEY dedup); repeated
    # triples in the source file must collapse
    return q.dropDuplicates()


def run_script(spark, sc: Script, base_graphs: dict) -> str:
    """Execute the script's steps; returns the concatenated stdout the
    reference harness would diff. ``base_graphs``: model IRI -> quads
    DataFrame (the setup.sh store)."""
    from fourstore_spark.sparql.engine import SparqlEngine

    graphs = dict(base_graphs)
    engine = None
    out: list[str] = []

    def eng():
        nonlocal engine
        if engine is None:
            frames = list(graphs.values())
            quads = frames[0]
            for f in frames[1:]:
                quads = quads.unionByName(f)
            # 4store's default graph is the union of all models
            engine = SparqlEngine(spark, quads, union_default_graph=True)
        return engine

    for st in sc.steps:
        if st.kind == "echo":
            out.append(st.text + "\n")
        elif st.kind == "import":
            graphs[st.model] = load_graph(spark, st.model, st.path)
            engine = None
        elif st.kind == "delete-model":
            graphs.pop(st.model, None)
            engine = None
        elif st.kind == "query":
            qtext = st.text
            if not re.search(r"(?im)^\s*BASE\b", qtext):
                # 4s-query's default base (4s-query.c:74)
                qtext = "BASE <local:>\n" + qtext
            res = eng().query(qtext)
            if st.fmt in ("ascii", "text", "tsv"):
                text = _ascii_output(res)
            elif st.fmt == "sparql":
                if res.form in ("CONSTRUCT", "DESCRIBE"):
                    # output_sparql emits RDF/XML for graph results
                    text = res.serialize("rdfxml")
                else:
                    text = _xml_output(res)
            else:
                text = res.serialize(st.fmt)
            text = _apply_pipe(text, st.pipe)
            out.append(text)
            if st.programatic:
                out.append(
                    "<!-- EOR -->\n" if st.fmt == "sparql" else "#EOR\n"
                )
    return "".join(out)


def _apply_pipe(text: str, ops: list) -> str:
    for op in ops:
        if op[0] == "sort":
            lines = text.split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            text = "\n".join(sorted(lines)) + "\n"
        elif op[0] == "wc-l":
            text = f"{text.count(chr(10))}\n"
        elif op[0] == "sed":
            text = re.sub(op[1], op[2], text)
        elif op[0] == "grep-v":
            text = "".join(
                ln + "\n"
                for ln in text.split("\n")[:-1]
                if not re.search(op[1], ln)
            )
    return text


# ----------------------------------------------------------- comparison
_BN = re.compile(r"_:[A-Za-z0-9]+")


def _rdfxml_triples(text: str):
    """RDF/XML -> canonical triple multiset (bnode ids erased) for the
    -f sparql CONSTRUCT case: the reference serializes via Raptor, whose
    element layout no other writer reproduces — compare the graphs."""
    from fourstore_spark.sources.rdfio import parse_rdfxml

    m = re.search(r'xml:base="([^"]*)"', text)
    base = m.group(1) if m else ""

    def canon(term):
        if term[0] == "bnode":
            return ("bnode",)
        if term[0] == "uri" and base and not re.match(
            r"^[A-Za-z][A-Za-z0-9+.\-]*:", term[1]
        ):
            # Raptor relativizes against xml:base (exemplar
            # construct-union: rdf:about="akt" under xml:base="local:")
            return ("uri", base + term[1])
        return tuple(term)

    return sorted(
        (canon(s), canon(p), canon(o)) for s, p, o in parse_rdfxml(text)
    )


def _split_rdfxml_docs(text: str) -> list[str]:
    """A -P script can emit several XML documents separated by EOR
    comments; split at each XML declaration, dropping the markers."""
    body = text.replace("<!-- EOR -->", "")
    parts = [p for p in re.split(r"<\?xml[^?]*\?>", body) if p.strip()]
    return ['<?xml version="1.0"?>' + p for p in parts]


def compare_output(got: str, want: str) -> tuple[bool, str]:
    """Exact diff first; on mismatch, canonicalize bnode labels and
    compare the line multisets (the reference's un-ORDERed row order is
    its own bind order; every VALUE must still match 1:1). RDF/XML
    payloads (CONSTRUCT via -f sparql) compare as graphs."""
    if got == want:
        return True, ""
    if "<rdf:RDF" in want and "?>" in got:
        try:
            segs_w = _split_rdfxml_docs(want)
            segs_g = _split_rdfxml_docs(got)
            if len(segs_w) == len(segs_g) and all(
                _rdfxml_triples(w) == _rdfxml_triples(g)
                for w, g in zip(segs_w, segs_g)
            ):
                return True, "graph-multiset"
        except Exception:  # noqa: BLE001 — fall through to line compare
            pass
    g = _BN.sub("_:b", got)
    w = _BN.sub("_:b", want)
    if sorted(g.splitlines()) == sorted(w.splitlines()):
        return True, "line-multiset"
    import difflib

    diff = "\n".join(
        difflib.unified_diff(
            want.splitlines(), got.splitlines(),
            "exemplar", "engine", lineterm="", n=1,
        )
    )
    return False, diff[:2000]


def replay(spark, name: str, base_graphs: dict) -> tuple[str, str]:
    """-> (status, detail); status in pass|fail|skipped."""
    sc = parse_script(os.path.join(REF_QUERY_DIR, "scripts", name))
    if sc.unsupported:
        return ("skipped", sc.unsupported)
    exemplar_path = os.path.join(REF_QUERY_DIR, "exemplar", name)
    if not os.path.exists(exemplar_path):
        return ("skipped", "no exemplar")
    with open(exemplar_path, encoding="utf-8") as fh:
        want = fh.read()
    try:
        got = run_script(spark, sc, base_graphs)
    except Exception as exc:  # noqa: BLE001 — report, don't crash sweep
        return ("fail", f"{type(exc).__name__}: {exc}")
    ok, detail = compare_output(got, want)
    return ("pass", detail) if ok else ("fail", detail)
