"""Synthetic TIGER/Line-shaped KB for replaying the reference's census
query scripts.

The reference's query suite loads ``data/tiger/TGR06001.nt`` (Alameda
County census road data), which its checkout does NOT vendor —
``data/tiger/tiger.pl`` downloads from census.gov, so the exemplar
BYTES are unreproducible offline (tests/test_golden_query.py excuses
them). The query TEXTS, however, are checked in
(``/root/reference/tests/query/scripts/*``), and what they exercise is
the SHAPE of the data: the TIGER 2002 vocabulary
(``vocab#path/start/end/lat/long/name/location/directionPrefix``),
CFCC feature classes, ``tlid`` segment URIs, blank-node points keyed
by shared coordinate literals, and rdfs labels.

This module generates a deterministic quad set with exactly those
shapes — road features with labeled multi-segment paths, segment
chains that continue at shared (lat, long) literals (the OPTIONAL
"next segment" join in tiger-typical/tiger-fail-optional), a
dead-end segment whose OPTIONAL finds nothing, water features (CFCC
H12), typed-and-referenced entities for the GROUP BY scripts, and the
specific labels/tlids the scripts mention ("Broadway", "Harold Ave",
"Sugar Hill Terrance West", "Corral Hollow Creek", "Escobar St",
"Harris", tlid/125011954, tlid/125030028) — so the scripts' own query
texts run against this engine and a DuckDB oracle evaluates the same
quads independently (tests/test_golden_query.py, synthetic section).

Reference anchors: tests/query/setup.sh (the graph URI
http://example.com/TGR06001.nt), tests/query/scripts/tiger-* (the
vocabulary), data/tiger/tiger.pl (the real generator's term shapes).
"""

from __future__ import annotations

VOCAB = "http://www.census.gov/tiger/2002/vocab#"
CFCC = "http://www.census.gov/tiger/2002/CFCC/"
FEATID = "http://www.census.gov/tiger/2002/featid/"
TLID = "http://www.census.gov/tiger/2002/tlid/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
GRAPH_TIGER = "http://example.com/TGR06001.nt"
# the model URI the reference's BENCHMARK suite imports under
# (tests/benchmark/queries/feature-h12.rq names it in a GRAPH clause)
GRAPH_TIGER_BENCH = "file:///usr/local/tiger/CA/TGR06001.ttl"

# the coordinate shared by the end of segment 125030028 and the starts
# of segments 1001/1003 — the "road continues here" join key
_SHARED = ("37.700000", "-121.500000")


def tiger_quads() -> list[tuple]:
    """-> [(s, skind, p, o, okind)]: skind/okind in {'uri','bnode',
    'literal'}; bnodes carry BARE labels; all literals are plain (no
    datatype/lang), matching the reference generator's N-Triples."""
    q: list[tuple] = []

    def uri(s, p, o):
        q.append((s, "uri", p, o, "uri"))

    def lit(s, p, o):
        q.append((s, "uri", p, o, "literal"))

    def b_lit(s, p, o):  # bnode subject -> plain literal
        q.append((s, "bnode", p, o, "literal"))

    def uri_b(s, p, o):  # uri subject -> bnode object
        q.append((s, "uri", p, o, "bnode"))

    # --- road/water segments: tlid -> CFCC class + start/end points ---
    # (tlid, cfcc, (start lat, start long), (end lat, end long))
    segments = [
        ("1001", "A41", _SHARED, ("37.701000", "-121.501000")),
        ("1002", "A41", ("37.702000", "-121.502000"),
         ("37.703000", "-121.503000")),
        ("1003", "A41", _SHARED, ("37.704000", "-121.504000")),
        # pS1004 deliberately sits AT pE1001 (segment 1004 continues
        # where Broadway's 1001 ends): benchmark roads.rq Q2 joins
        # altpath ENDS to Broadway START longs (pE028 long matches
        # pS1001's) and Q3 joins altpath STARTS to Broadway END
        # coordinates — this makes Q3 non-empty; the (lat AND long)
        # chain joins elsewhere key on the _SHARED coordinate and are
        # unaffected
        ("1004", "A41", ("37.701000", "-121.501000"),
         ("37.706000", "-121.506000")),
        ("1005", "A41", ("37.721727", "-121.507000"),
         ("37.707000", "-121.508000")),
        ("1006", "A41", ("37.721800", "-121.509000"),
         ("37.708000", "-121.510000")),
        ("1007", "H12", ("37.709000", "-121.511000"),
         ("37.710000", "-121.512000")),
        ("1008", "H12", ("37.711000", "-121.513000"),
         ("37.712000", "-121.514000")),
        # tiger-typical's segment: its end coordinate is unique, so the
        # OPTIONAL "next segment starts here" finds nothing
        ("125011954", "A41", ("37.713000", "-121.515000"),
         ("37.714000", "-121.516000")),
        # tiger-fail-optional / tiger-mixed-optional's segment: its end
        # IS the shared coordinate, so two next segments (1001, 1003)
        ("125030028", "A41", ("37.715000", "-121.517000"), _SHARED),
    ]
    for tlid, cfcc, (slat, slong), (elat, elong) in segments:
        seg = TLID + tlid
        uri(seg, RDF_TYPE, CFCC + cfcc)
        uri_b(seg, VOCAB + "start", f"pS{tlid}")
        uri_b(seg, VOCAB + "end", f"pE{tlid}")
        b_lit(f"pS{tlid}", VOCAB + "lat", slat)
        b_lit(f"pS{tlid}", VOCAB + "long", slong)
        b_lit(f"pE{tlid}", VOCAB + "lat", elat)
        b_lit(f"pE{tlid}", VOCAB + "long", elong)

    # --- named features: label + path segment(s) + attributes ---------
    feats = {
        "101": ("Broadway", ["1001"]),
        "102": ("Broadway", ["1002"]),
        "103": ("Harold Ave", ["1003", "1004"]),
        "104": ("Sugar Hill Terrance West", ["1005"]),
        "105": ("Sugar Hill Terrance West", ["1006"]),
        "106": ("Escobar St", []),
        "107": ("Escobar St", []),
        "108": ("Smith St", []),
        "109": ("Corral Hollow Creek", ["1007"]),
        "110": ("Corral Hollow Creek", ["1008"]),
        "111": ("Typical Rd", ["125011954"]),
        "112": ("Chain Rd", ["125030028"]),
    }
    for fid, (label, paths) in feats.items():
        lit(FEATID + fid, RDFS_LABEL, label)
        for p in paths:
            uri(FEATID + fid, VOCAB + "path", TLID + p)
    # typed road features with a direction prefix (tiger-reverse wants
    # the type+direction INTERSECTION: only feature 101 has both)
    uri(FEATID + "101", RDF_TYPE, FEATID + "type/Rd")
    uri(FEATID + "103", RDF_TYPE, FEATID + "type/Rd")
    uri(FEATID + "101", VOCAB + "directionPrefix", FEATID + "direction/W")
    uri(FEATID + "104", VOCAB + "directionPrefix", FEATID + "direction/W")
    # county attributes ("Harris" is the count script's probe literal)
    for fid in ("101", "103", "106"):
        lit(FEATID + fid, VOCAB + "county", "Harris")
    # vocab:name alongside rdfs:label (tiger-explosion matches the
    # literal through ANY predicate; optimiser-disjunction DISTINCTs
    # over the predicate too)
    lit(FEATID + "110", VOCAB + "name", "Corral Hollow Creek")
    lit(FEATID + "108", VOCAB + "name", "Smith St")

    # --- landmarks (tiger-landmarks: OPTIONAL location) ----------------
    landmarks = [
        ("201", "City Hall", ("37.716000", "-121.518000")),
        ("202", "Old Mill", None),
        ("203", "Water Tower", ("37.717000", "-121.519000")),
    ]
    for lid, name, loc in landmarks:
        lm = FEATID + lid
        lit(lm, VOCAB + "name", name)
        uri(lm, RDF_TYPE, VOCAB + "Landmark")
        if loc:
            uri_b(lm, VOCAB + "location", f"L{lid}")
            b_lit(f"L{lid}", VOCAB + "lat", loc[0])
            b_lit(f"L{lid}", VOCAB + "long", loc[1])
    # one referenced landmark so tiger-groupby-class sees the class
    uri(FEATID + "101", VOCAB + "nearby", FEATID + "201")

    # --- CFCC class hierarchy (real TIGER ships it; the benchmark
    # queries lines.rq / roads.rq walk type -> subClassOf -> label) ----
    hierarchy = [
        ("A41", "Local, neighborhood, or rural road", "A4"),
        ("A4", "Local, neighborhood, and rural roads", "A"),
        ("A", "Road", None),
        ("H12", "Perennial stream", "H1"),
        ("H1", "Naturally flowing water features", "H"),
        ("H", "Hydrography", None),
    ]
    for cls, label, parent in hierarchy:
        lit(CFCC + cls, RDFS_LABEL, label)
        if parent:
            uri(CFCC + cls, RDFS_SUBCLASS, CFCC + parent)
    return q


def tiger_nq(graph: str = GRAPH_TIGER) -> str:
    """The same quads as N-Quads text (the form the reference's
    4s-import would ingest)."""
    lines = []
    for s, skind, p, o, okind in tiger_quads():
        st = f"_:{s}" if skind == "bnode" else f"<{s}>"
        if okind == "literal":
            ot = '"' + o.replace("\\", "\\\\").replace('"', '\\"') + '"'
        elif okind == "bnode":
            ot = f"_:{o}"
        else:
            ot = f"<{o}>"
        lines.append(f"{st} <{p}> {ot} <{graph}> .")
    return "\n".join(lines) + "\n"


def load_tiger(spark, graph: str = GRAPH_TIGER):
    """Quads DataFrame through the real N-Quads parse path, bnode labels
    preserved (namespace_bnodes=False) so engine output is directly
    comparable to the oracle's bare labels."""
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    return quads_from_nt_text(
        spark, tiger_nq(graph), namespace_bnodes=False
    )


def duckdb_quads(con, graph: str = GRAPH_TIGER) -> None:
    """Register the SAME quads as DuckDB table ``q(g, s, skind, p, o,
    okind)`` — URIs as full strings, bnodes as ``_:label`` (the
    engine's stored lexical form, rdfio.py parse), plain literals as
    their lexical forms (the synthetic KB has no typed or
    language-tagged literals by construction)."""
    con.execute(
        "CREATE OR REPLACE TABLE q("
        "g TEXT, s TEXT, skind TEXT, p TEXT, o TEXT, okind TEXT)"
    )
    con.executemany(
        "INSERT INTO q VALUES (?, ?, ?, ?, ?, ?)",
        [
            (
                graph,
                f"_:{s}" if sk == "bnode" else s,
                sk,
                p,
                f"_:{o}" if ok == "bnode" else o,
                ok,
            )
            for s, sk, p, o, ok in tiger_quads()
        ],
    )
