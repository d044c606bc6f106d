"""SPARQL 1.1 Federated Query (SERVICE) — beyond the reference (4store
has no federation). Remote side: our own SPARQL-protocol HTTP endpoint."""

import urllib.parse
import urllib.request

import pytest

from fourstore_spark import SparqlEngine
from fourstore_spark.httpd import SparqlHttpServer
from fourstore_spark.sources.rdfio import quads_from_nt_text


@pytest.fixture(scope="module")
def remote(spark):
    srv = SparqlHttpServer(spark, port=0)
    srv.start()
    body = urllib.parse.urlencode(
        {
            "update": 'INSERT DATA { <urn:b> <urn:name> "Remote-B" . '
            '<urn:c> <urn:name> "Remote-C" . '
            "<urn:b> <urn:age> 42 }"
        }
    ).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/update/",
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def local(spark):
    nt = "<urn:a> <urn:knows> <urn:b> .\n<urn:a> <urn:knows> <urn:x> ."
    return SparqlEngine(spark, quads_from_nt_text(spark, nt))


def test_service_joins_remote(local, remote):
    q = f"""SELECT ?y ?nm WHERE {{
        <urn:a> <urn:knows> ?y .
        SERVICE <http://127.0.0.1:{remote.port}/sparql/> {{
            ?y <urn:name> ?nm }} }}"""
    got = sorted(tuple(r) for r in local.select(q).collect())
    # urn:x has no remote name -> inner-join drops it
    assert got == [("urn:b", "Remote-B")]


def test_service_numeric_filter(local, remote):
    # numeric literal from the remote participates in local FILTER math
    q = f"""SELECT ?y ?age WHERE {{
        SERVICE <http://127.0.0.1:{remote.port}/sparql/> {{
            ?y <urn:age> ?age }}
        FILTER(?age > 40) }}"""
    got = [tuple(r) for r in local.select(q, age="int").collect()]
    assert got == [("urn:b", 42)]


def test_service_silent_failure_is_empty(local):
    q = """SELECT ?s ?o WHERE {
        <urn:a> <urn:knows> ?s .
        SERVICE SILENT <http://127.0.0.1:1/sparql/> { ?s <urn:name> ?o } }"""
    # SILENT: failed endpoint contributes the unit solution — local rows
    # survive with ?o unbound
    got = sorted(r["s"] for r in local.select(q).collect())
    assert got == ["urn:b", "urn:x"]


def test_service_loud_failure_raises(local):
    q = """SELECT ?s WHERE {
        SERVICE <http://127.0.0.1:1/sparql/> { ?s ?p ?o } }"""
    with pytest.raises(Exception):
        local.select(q)
