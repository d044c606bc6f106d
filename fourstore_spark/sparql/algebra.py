"""SPARQL algebra AST.

The reference parses with Rasqal and flattens the graph-pattern tree into
numbered blocks with per-block join types (graph_pattern_walk,
src/frontend/query.c:1305-1437; fs_join_type enum FS_INNER/FS_LEFT/FS_UNION/
FS_MINUS, src/frontend/query-datatypes.h:34).  We keep the tree: each node
translates compositionally to a DataFrame, and Catalyst does the
flattening/reordering the reference did by hand (src/frontend/optimiser.c).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---------------------------------------------------------------- terms
@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Literal:
    lex: str
    dt: str | None = None
    lang: str | None = None


@dataclass(frozen=True)
class BNode:
    label: str


Term = Var | Iri | Literal | BNode


@dataclass(frozen=True)
class TriplePattern:
    s: Term
    p: Term
    o: Term


# ---------------------------------------------------------- expressions
@dataclass
class EVar:
    name: str


@dataclass
class EConst:
    term: Iri | Literal


@dataclass
class EOr:
    args: list


@dataclass
class EAnd:
    args: list


@dataclass
class ECompare:
    op: str  # = != < > <= >=
    left: object
    right: object


@dataclass
class EArith:
    op: str  # + - * /
    left: object
    right: object


@dataclass
class EUnary:
    op: str  # ! + -
    arg: object


@dataclass
class EIn:
    expr: object
    options: list
    negated: bool = False


@dataclass
class ECall:
    """Builtin or cast call; name is the uppercased builtin keyword or the
    full IRI for cast/extension functions."""

    name: str
    args: list


@dataclass
class EExists:
    pattern: object
    negated: bool = False


@dataclass
class EAggregate:
    name: str  # COUNT SUM AVG MIN MAX SAMPLE GROUP_CONCAT
    expr: object | None  # None for COUNT(*)
    distinct: bool = False
    separator: str = " "


# --------------------------------------------------------------- paths
# SPARQL 1.1 property paths — BEYOND the reference's surface (4store's
# Rasqal frontend is BGP-only; parse_verb used to reject these). A path
# appears in a TriplePattern's predicate slot; the translator expands it
# (fourstore_spark/sparql/translator.py _path_sol): sequences become
# joins, alternatives unions, inverses endpoint swaps, negated sets
# NOT-IN scans, and * / + a distributed semi-naive transitive closure.
@dataclass(frozen=True)
class PathSeq:
    """elt1 / elt2 / ... — steps chained through fresh variables."""

    steps: tuple


@dataclass(frozen=True)
class PathAlt:
    """elt1 | elt2 | ... — union of the alternatives."""

    alts: tuple


@dataclass(frozen=True)
class PathInverse:
    """^elt — traverse backwards (endpoints swapped)."""

    inner: object


@dataclass(frozen=True)
class PathMod:
    """elt? / elt* / elt+ — zero-or-one / zero-or-more / one-or-more."""

    inner: object
    mod: str


@dataclass(frozen=True)
class PathNeg:
    """!(:p1|^:p2|...) — any forward edge whose predicate is outside
    ``forward`` plus any backward edge outside ``inverse``.  A component
    participates only if its member list is non-empty, except the
    degenerate !() which matches every forward edge."""

    forward: tuple
    inverse: tuple


# ------------------------------------------------------------- patterns
@dataclass
class BGP:
    triples: list


@dataclass
class Join:
    left: object
    right: object


@dataclass
class LeftJoin:
    left: object
    right: object
    expr: object | None = None  # filter lifted from the OPTIONAL group


@dataclass
class Union:
    left: object
    right: object


@dataclass
class Minus:
    left: object
    right: object


@dataclass
class Filter:
    expr: object
    pattern: object


@dataclass
class Extend:
    pattern: object
    var: str
    expr: object


@dataclass
class GraphPattern:
    graph: Term  # Var or Iri
    pattern: object


@dataclass
class ServicePattern:
    """SERVICE <endpoint> { group } — SPARQL 1.1 Federated Query (beyond
    the reference). ``group_text`` is the raw source span of the group,
    shipped verbatim (plus re-declared prefixes) as a SELECT * to the
    remote SPARQL-protocol endpoint."""

    endpoint: str
    group_text: str
    prefixes: dict
    silent: bool = False
    base: str = ""  # query-level BASE, re-declared in the shipped prologue


@dataclass
class ValuesTable:
    variables: list
    rows: list  # list of list[Term|None]; None == UNDEF


@dataclass
class SubSelect:
    query: "Query"


@dataclass
class Unit:
    """Empty group {} — the single empty solution."""


# ------------------------------------------------------------- updates
# SPARQL 1.1 Update ops (reference dispatch: update_op,
# src/frontend/update.c:215-423)
@dataclass(frozen=True)
class QuadPattern:
    """A triple with an optional graph slot (None = default graph)."""

    g: object  # Iri | Var | None
    s: object
    p: object
    o: object


@dataclass
class InsertDataOp:  # update.c:389-419
    quads: list


@dataclass
class DeleteDataOp:  # update.c:389-419
    quads: list


@dataclass
class ModifyOp:
    """DELETE/INSERT ... WHERE (update.c:277-381); also the DELETE WHERE
    shorthand the reference rejects (update.c:268-273) — we support it."""

    delete: list = field(default_factory=list)  # QuadPattern templates
    insert: list = field(default_factory=list)
    where: object = None
    with_graph: str | None = None
    using: list = field(default_factory=list)
    using_named: list = field(default_factory=list)


@dataclass
class LoadOp:  # fs_load, update.c:594
    source: str
    graph: str | None = None
    silent: bool = False


@dataclass
class ClearOp:  # fs_clear, update.c:632; DROP update.c:222-229
    target: object  # ('graph', iri) | 'default' | 'named' | 'all'
    drop: bool = False
    silent: bool = False


@dataclass
class CreateOp:  # no-op in the reference too (update.c:225-226)
    graph: str
    silent: bool = False


@dataclass
class GraphCopyOp:  # ADD/MOVE/COPY, update.c:709-885
    kind: str  # 'add' | 'move' | 'copy'
    src: str | None  # None = default graph
    dst: str | None
    silent: bool = False


# --------------------------------------------------------------- query
@dataclass
class Query:
    form: str  # SELECT ASK CONSTRUCT DESCRIBE
    pattern: object = None
    # SELECT: list of ('var', name) | ('expr', expr, name); empty == *
    projection: list = field(default_factory=list)
    distinct: bool = False
    reduced: bool = False
    group_by: list = field(default_factory=list)  # exprs or ('as', expr, var)
    having: list = field(default_factory=list)
    order_by: list = field(default_factory=list)  # (expr, ascending)
    limit: int | None = None
    offset: int | None = None
    values: ValuesTable | None = None  # trailing VALUES
    construct_template: list = field(default_factory=list)
    describe_terms: list = field(default_factory=list)
    from_graphs: list = field(default_factory=list)
    from_named: list = field(default_factory=list)
    base: str = ""  # prologue BASE; IRI(expr) resolves against it
