"""SPARQL Update tests, mirroring the reference's HTTP update scripts
(tests/httpd/scripts/add-and-delete, insert-delete-where, put-and-delete)."""

import pytest
from pyspark.sql import functions as F

from fourstore_spark.sparql.engine import SparqlEngine
from fourstore_spark.sparql.update import UpdateEngine, empty_quads


@pytest.fixture()
def ue(spark):
    return UpdateEngine(spark)


def names(df, var="o"):
    return {r[0] for r in df.select(F.col(var)["lex"]).collect()}


def test_insert_and_delete_data(spark, ue):
    # tests/httpd/scripts/add-and-delete shape: insert, query, delete, query
    ue.update(
        """PREFIX ex: <http://example.org/>
           INSERT DATA {
             ex:a ex:name "alice" .
             ex:b ex:name "bob" .
             GRAPH ex:g1 { ex:c ex:name "carol" } }"""
    )
    eng = SparqlEngine(spark, ue.quads)
    res = eng.query(
        "SELECT ?o WHERE { ?s <http://example.org/name> ?o }"
    )
    assert names(res.df) == {"alice", "bob", "carol"}

    ue.update(
        """PREFIX ex: <http://example.org/>
           DELETE DATA { ex:b ex:name "bob" }"""
    )
    eng = SparqlEngine(spark, ue.quads)
    res = eng.query("SELECT ?o WHERE { ?s <http://example.org/name> ?o }")
    assert names(res.df) == {"alice", "carol"}


def test_insert_is_set_semantics(spark, ue):
    ue.update('INSERT DATA { <urn:s> <urn:p> "v" }')
    ue.update('INSERT DATA { <urn:s> <urn:p> "v" }')
    assert ue.quads.count() == 1


def test_delete_insert_where(spark, ue):
    # tests/httpd/scripts/insert-delete-where shape
    ue.update(
        """INSERT DATA {
             <urn:x1> <urn:status> "old" .
             <urn:x2> <urn:status> "old" .
             <urn:x3> <urn:status> "fresh" }"""
    )
    ue.update(
        """DELETE { ?s <urn:status> "old" }
           INSERT { ?s <urn:status> "archived" }
           WHERE { ?s <urn:status> "old" }"""
    )
    eng = SparqlEngine(spark, ue.quads)
    rows = {
        (r[0], r[1])
        for r in eng.select(
            "SELECT ?s ?st WHERE { ?s <urn:status> ?st }"
        ).collect()
    }
    assert rows == {
        ("urn:x1", "archived"),
        ("urn:x2", "archived"),
        ("urn:x3", "fresh"),
    }


def test_delete_where_shorthand(spark, ue):
    ue.update(
        'INSERT DATA { <urn:a> <urn:t> "x" . <urn:b> <urn:t> "y" . '
        '<urn:a> <urn:u> "z" }'
    )
    ue.update("DELETE WHERE { ?s <urn:t> ?o }")
    eng = SparqlEngine(spark, ue.quads)
    assert ue.quads.count() == 1
    assert eng.ask('ASK { <urn:a> <urn:u> "z" }')


def test_clear_drop_graphs(spark, ue):
    ue.update(
        """INSERT DATA {
             <urn:d> <urn:p> "default" .
             GRAPH <urn:g1> { <urn:s1> <urn:p> "one" }
             GRAPH <urn:g2> { <urn:s2> <urn:p> "two" } }"""
    )
    ue.update("CLEAR GRAPH <urn:g1>")
    assert ue.quads.where(F.col("g") == "urn:g1").count() == 0
    assert ue.quads.count() == 2
    ue.update("CLEAR DEFAULT")
    assert ue.quads.count() == 1
    ue.update("CLEAR ALL")
    assert ue.quads.count() == 0


def test_add_move_copy(spark, ue):
    ue.update(
        """INSERT DATA {
             GRAPH <urn:src> { <urn:s> <urn:p> "v1" . <urn:s> <urn:p> "v2" }
             GRAPH <urn:dst> { <urn:t> <urn:p> "old" } }"""
    )
    ue.update("COPY GRAPH <urn:src> TO GRAPH <urn:dst>")
    assert ue.quads.where(F.col("g") == "urn:dst").count() == 2  # replaced
    ue.update("ADD GRAPH <urn:dst> TO GRAPH <urn:src>")
    assert ue.quads.where(F.col("g") == "urn:src").count() == 2
    ue.update("MOVE GRAPH <urn:src> TO GRAPH <urn:other>")
    assert ue.quads.where(F.col("g") == "urn:src").count() == 0
    assert ue.quads.where(F.col("g") == "urn:other").count() == 2


def test_add_from_self_derived_delta(spark, ue):
    # ADD's delta is derived from the store itself: with ambiguous
    # (unaliased) join columns this is exactly the self-join shape that
    # risks a trivially-true equals predicate; quads_add/quads_minus alias
    # both sides explicitly, so semantics must hold: ADD unions, is
    # idempotent, and never cross-contaminates other graphs
    ue.update(
        'INSERT DATA { GRAPH <urn:g1> { <urn:s> <urn:p> "v" . '
        '<urn:s2> <urn:p> "w" } GRAPH <urn:g2> { <urn:s> <urn:p> "x" } }'
    )
    ue.update("ADD <urn:g1> TO <urn:g2>")
    assert ue.quads.where(F.col("g") == "urn:g2").count() == 3
    assert ue.quads.where(F.col("g") == "urn:g1").count() == 2
    # idempotent: re-ADD inserts nothing (set semantics over the same
    # store-derived delta)
    ue.update("ADD <urn:g1> TO <urn:g2>")
    assert ue.quads.where(F.col("g") == "urn:g2").count() == 3
    assert ue.quads.count() == 5


def test_with_graph_modify(spark, ue):
    ue.update(
        'INSERT DATA { GRAPH <urn:g> { <urn:s> <urn:k> "a" } }'
    )
    ue.update(
        """WITH <urn:g>
           DELETE { ?s <urn:k> "a" }
           INSERT { ?s <urn:k> "b" }
           WHERE { ?s <urn:k> "a" }"""
    )
    row = ue.quads.collect()[0]
    assert row["g"] == "urn:g" and row["o_lex"] == "b"


def test_insert_data_bnodes_fresh(spark, ue):
    ue.update('INSERT DATA { _:x <urn:p> "1" }')
    ue.update('INSERT DATA { _:x <urn:p> "1" }')
    # same label in two requests = two distinct bnodes (import.c:546-586)
    assert ue.quads.count() == 2


def test_save_restore(spark, ue, tmp_path):
    ue.update('INSERT DATA { <urn:s> <urn:p> "v" }')
    path = str(tmp_path / "store")
    ue.save(path)
    ue2 = UpdateEngine.restore(spark, path)
    assert ue2.quads.count() == 1
    eng = SparqlEngine(spark, ue2.quads)
    assert eng.ask('ASK { <urn:s> <urn:p> "v" }')


def test_transaction_rollback_and_commit(spark, ue):
    ue.update('INSERT DATA { <urn:base> <urn:p> "base" }')
    ue.begin()
    ue.update('INSERT DATA { <urn:t1> <urn:p> "t1" }')
    assert ue.quads.count() == 2  # visible inside the txn
    ue.rollback()
    assert ue.quads.count() == 1  # discarded

    with ue.transaction():
        ue.update('INSERT DATA { <urn:t2> <urn:p> "t2" }')
    assert ue.quads.count() == 2  # committed

    import pytest as _pytest

    with _pytest.raises(ValueError):
        with ue.transaction():
            ue.update('INSERT DATA { <urn:t3> <urn:p> "t3" }')
            raise ValueError("abort")
    assert ue.quads.count() == 2  # failed txn reverted

    with _pytest.raises(RuntimeError):
        ue.rollback()  # no txn in progress
    ue.begin()
    with _pytest.raises(RuntimeError):
        ue.begin()  # nested txn rejected
    ue.rollback()


def test_insert_where_with_property_path(spark):
    """INSERT ... WHERE with a + closure: the update's WHERE goes through
    the same translator, so paths (beyond-reference) work in updates."""
    from fourstore_spark.sources.rdfio import quads_from_nt_text
    from fourstore_spark.sparql.update import UpdateEngine

    nt = "<urn:a> <urn:k> <urn:b> .\n<urn:b> <urn:k> <urn:c> ."
    ue = UpdateEngine(spark, quads_from_nt_text(spark, nt))
    ue.update("INSERT { ?x <urn:reach> ?y } WHERE { ?x <urn:k>+ ?y }")
    got = sorted(
        (r["s"], r["o_lex"])
        for r in ue.quads.where("p = 'urn:reach'").collect()
    )
    assert got == [
        ("urn:a", "urn:b"),
        ("urn:a", "urn:c"),
        ("urn:b", "urn:c"),
    ]


@pytest.mark.slow  # ~45s commit-cost sweep; functional update coverage stays in the rest of this file
def test_commit_is_o_delta_for_additive_writes(spark, ue):
    """r8 verdict item 4: an HTTP write window of INSERT DATA / LOAD /
    add_quads must NOT re-materialize the whole store per commit — only
    the delta is checkpointed, the base stays the same object, and the
    union folds into one materialization every compact_every commits."""
    ue.update('INSERT DATA { <u:s0> <u:p> "seed" }')
    ue.commit()  # first commit: additive onto the empty base
    base_after_seed = ue._base

    # additive window: base identity must not change, parts grow by one
    # checkpointed delta per commit
    for i in range(1, 4):
        ue.update(f'INSERT DATA {{ <u:s{i}> <u:p> "v{i}" }}')
        ue.commit()
        assert ue._base is base_after_seed, "base re-materialized"
    assert len(ue._parts) >= 3
    assert ue.quads.count() == 4
    assert not ue._dirty and not ue._pending

    # compaction: crossing the bound folds parts into a fresh base
    for i in range(4, 4 + 64):
        ue.update(f'INSERT DATA {{ <u:s{i}> <u:p> "v{i}" }}')
        ue.commit()
    assert len(ue._parts) < 64, "compaction never triggered"
    assert ue.quads.count() == 68

    # destructive op: falls back to a full materialization, resets parts
    ue.update("DELETE DATA { <u:s0> <u:p> \"seed\" }")
    ue.commit()
    assert ue._parts == [] and not ue._dirty
    assert ue.quads.count() == 67

    # set semantics survive the lazy-union representation
    ue.update('INSERT DATA { <u:s1> <u:p> "v1" }')  # duplicate
    ue.commit()
    assert ue.quads.count() == 67

    # external quads assignment is untracked -> next commit is full
    ue.quads = ue.quads
    assert ue._dirty
    ue.commit()
    assert not ue._dirty and ue.quads.count() == 67


def test_add_quads_tracked_path(spark, ue):
    from fourstore_spark.sources.rdfio import quads_from_nt_text

    ue.update('INSERT DATA { <u:a> <u:p> "x" }')
    ue.commit()
    base = ue._base
    ue.add_quads(
        quads_from_nt_text(spark, '<u:b> <u:p> "y" .\n<u:a> <u:p> "x" .')
    )
    ue.commit()
    assert ue._base is base
    assert ue.quads.count() == 2  # dedup inside the delta path
