"""SPARQL 1.1 property paths — BEYOND the reference's surface (4store's
Rasqal frontend is BGP-only and rejected paths; compare parse_verb's old
behavior). Semantics per sparql11-query §9.1 / §18.4: sequences,
alternatives, inverses, negated property sets, and existential (cycle-
safe, distinct) * / + / ? closures evaluated as a distributed semi-naive
fixpoint over RID-keyed joins."""

import pytest

from fourstore_spark import SparqlEngine
from fourstore_spark.sources.rdfio import quads_from_nt_text

NT = "\n".join(
    [
        "<urn:a> <urn:knows> <urn:b> .",
        "<urn:b> <urn:knows> <urn:c> .",
        "<urn:c> <urn:knows> <urn:d> .",
        "<urn:a> <urn:likes> <urn:x> .",
        '<urn:b> <urn:name> "Bee" .',
    ]
)


@pytest.fixture(scope="module")
def eng(spark):
    return SparqlEngine(spark, quads_from_nt_text(spark, NT))


@pytest.fixture(scope="module")
def cyc(spark):
    return SparqlEngine(
        spark,
        quads_from_nt_text(spark, NT + "\n<urn:d> <urn:knows> <urn:a> ."),
    )


def rows(e, q):
    return sorted(tuple(r) for r in e.select(q).collect())


def test_sequence(eng):
    assert rows(
        eng, "SELECT ?x WHERE { <urn:a> <urn:knows>/<urn:knows> ?x }"
    ) == [("urn:c",)]


def test_alternative(eng):
    assert rows(
        eng, "SELECT ?x WHERE { <urn:a> <urn:knows>|<urn:likes> ?x }"
    ) == [("urn:b",), ("urn:x",)]


def test_inverse(eng):
    assert rows(eng, "SELECT ?x WHERE { ?x ^<urn:knows> <urn:c> }") == [
        ("urn:d",)
    ]


def test_one_or_more(eng):
    assert rows(eng, "SELECT ?x WHERE { <urn:a> <urn:knows>+ ?x }") == [
        ("urn:b",),
        ("urn:c",),
        ("urn:d",),
    ]


def test_zero_or_more_includes_start(eng):
    assert rows(eng, "SELECT ?x WHERE { <urn:a> <urn:knows>* ?x }") == [
        ("urn:a",),
        ("urn:b",),
        ("urn:c",),
        ("urn:d",),
    ]


def test_zero_or_one(eng):
    assert rows(eng, "SELECT ?x WHERE { <urn:a> <urn:knows>? ?x }") == [
        ("urn:a",),
        ("urn:b",),
    ]


def test_zero_length_off_graph_constant(eng):
    # spec: a constant endpoint reaches itself even when absent from the
    # graph (ZeroLengthPath over terms, not just graph nodes)
    assert rows(eng, "SELECT ?x WHERE { <urn:nowhere> <urn:knows>? ?x }") == [
        ("urn:nowhere",)
    ]


def test_bound_object_closure(eng):
    assert rows(eng, "SELECT ?x WHERE { ?x <urn:knows>+ <urn:d> }") == [
        ("urn:a",),
        ("urn:b",),
        ("urn:c",),
    ]


def test_unbound_both_closure(eng):
    got = rows(eng, "SELECT ?x ?y WHERE { ?x <urn:knows>+ ?y }")
    assert ("urn:a", "urn:d") in got and len(got) == 6


def test_negated_property_set(eng):
    assert rows(eng, "SELECT ?x WHERE { <urn:a> !(<urn:likes>) ?x }") == [
        ("urn:b",)
    ]


def test_negated_with_inverse_member(eng):
    got = rows(
        eng, "SELECT ?x WHERE { ?x !(^<urn:name>|<urn:likes>) <urn:c> }"
    )
    assert got == [("urn:b",), ("urn:d",)]


def test_grouped_path_closure(eng):
    assert rows(
        eng, "SELECT ?x WHERE { <urn:a> (<urn:knows>/<urn:knows>)+ ?x }"
    ) == [("urn:c",)]


def test_path_joins_with_bgp(eng):
    assert rows(
        eng,
        "SELECT ?n WHERE { <urn:a> <urn:knows>+ ?p . ?p <urn:name> ?n }",
    ) == [("Bee",)]


def test_cycle_terminates(cyc):
    # a -> b -> c -> d -> a: existential closure is cycle-safe
    assert rows(cyc, "SELECT ?x WHERE { <urn:a> <urn:knows>+ ?x }") == [
        ("urn:a",),
        ("urn:b",),
        ("urn:c",),
        ("urn:d",),
    ]


def test_ask_with_path(eng):
    assert eng.query("ASK { <urn:a> <urn:knows>+ <urn:c> }").ask() is True
    assert eng.query("ASK { <urn:c> <urn:knows>+ <urn:a> }").ask() is False


def test_paths_rejected_in_construct_template(eng):
    from fourstore_spark.sparql.tokenizer import SparqlSyntaxError

    with pytest.raises(SparqlSyntaxError):
        eng.query(
            "CONSTRUCT { ?s <urn:p>/<urn:q> ?o } WHERE { ?s <urn:p> ?o }"
        )


def test_path_long_chain(spark):
    # 40-hop chain: closure needs 40 iterations, well inside the cap
    nt = "\n".join(
        f"<urn:n{i}> <urn:next> <urn:n{i+1}> ." for i in range(40)
    )
    e = SparqlEngine(spark, quads_from_nt_text(spark, nt))
    got = rows(e, "SELECT ?x WHERE { <urn:n0> <urn:next>+ ?x }")
    assert len(got) == 40


def test_closure_over_empty_edge_set(eng):
    # no <urn:none> edges: + is empty, * still has the zero-length match
    assert rows(eng, "SELECT ?x WHERE { <urn:a> <urn:none>+ ?x }") == []
    assert rows(eng, "SELECT ?x WHERE { <urn:a> <urn:none>* ?x }") == [
        ("urn:a",)
    ]


def test_path_endpoint_var_equals_graph_var(spark):
    # GRAPH ?g { ?g <p>+ ?y }: the endpoint var collides with the
    # enclosing graph var — must become an RID filter against the ctx
    # column, not a duplicate output column (AMBIGUOUS_REFERENCE)
    nq = "\n".join(
        [
            "<urn:g1> <urn:knows> <urn:b> <urn:g1> .",
            "<urn:b> <urn:knows> <urn:c> <urn:g1> .",
            "<urn:g2> <urn:knows> <urn:z> <urn:g2> .",
        ]
    )
    e = SparqlEngine(spark, quads_from_nt_text(spark, nq))
    assert rows(
        e, "SELECT ?g ?y WHERE { GRAPH ?g { ?g <urn:knows>+ ?y } }"
    ) == [
        ("urn:g1", "urn:b"),
        ("urn:g1", "urn:c"),
        ("urn:g2", "urn:z"),
    ]
    # object-side collision: nobody points back at a graph node
    assert (
        rows(e, "SELECT ?g ?x WHERE { GRAPH ?g { ?x <urn:knows>+ ?g } }")
        == []
    )
