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


def test_service_plan_not_cached(local, remote):
    # a SERVICE plan embeds the remote snapshot taken at plan time, so
    # the engine must NOT serve it from the plan cache: a second run
    # after a remote update must observe the mutation
    q = f"""SELECT ?nm WHERE {{
        SERVICE <http://127.0.0.1:{remote.port}/sparql/> {{
            <urn:mut> <urn:name> ?nm }} }}"""
    upd = urllib.parse.urlencode(
        {"update": 'INSERT DATA { <urn:mut> <urn:name> "v1" }'}
    ).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{remote.port}/update/",
        data=upd,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    assert [r["nm"] for r in local.select(q).collect()] == ["v1"]
    upd2 = urllib.parse.urlencode(
        {
            "update": 'DELETE DATA { <urn:mut> <urn:name> "v1" } ; '
            'INSERT DATA { <urn:mut> <urn:name> "v2" }'
        }
    ).encode()
    req2 = urllib.request.Request(
        f"http://127.0.0.1:{remote.port}/update/",
        data=upd2,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req2) as r:
        assert r.status == 200
    assert [r["nm"] for r in local.select(q).collect()] == ["v2"]


def test_service_long_query_posts(local, remote):
    # a query text past SERVICE_MAX_GET_URL must ship as protocol POST
    # (GET would blow typical URL limits) and still answer correctly
    pad = "A" * 2500  # cheap to evaluate, long enough to force POST
    q = f"""SELECT ?nm WHERE {{
        SERVICE <http://127.0.0.1:{remote.port}/sparql/> {{
            <urn:b> <urn:name> ?nm . FILTER(?nm != "{pad}") }} }}"""
    assert len(q) > 2000
    got = [r["nm"] for r in local.select(q).collect()]
    assert got == ["Remote-B"]


def test_service_remote_bnodes_are_scoped(local, remote):
    # remote bnode labels are result-set scoped (§18.5): they must not
    # RID-unify with a LOCAL bnode sharing the label, nor across two
    # SERVICE calls in one query
    upd = urllib.parse.urlencode(
        {"update": "INSERT DATA { _:shared <urn:tag> <urn:t1> }"}
    ).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{remote.port}/update/",
        data=upd,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    ep = f"http://127.0.0.1:{remote.port}/sparql/"
    q = f"""SELECT ?b1 ?b2 WHERE {{
        SERVICE <{ep}> {{ ?b1 <urn:tag> <urn:t1> }}
        SERVICE <{ep}> {{ ?b2 <urn:tag> <urn:t1> }} }}"""
    rows = local.select(q).collect()
    # both calls return one bnode row each; the cross product survives
    # (bnode labels don't join-unify across calls into fewer rows), and
    # the two labels must differ
    assert len(rows) == 1
    assert rows[0]["b1"] != rows[0]["b2"]


def test_service_prologue_redeclares_base(local, monkeypatch):
    # a query-level BASE must be re-declared in the shipped prologue so
    # relative IRIs inside the SERVICE group resolve identically remotely
    captured = {}

    class FakeResp:
        status = 200

        def read(self, n=-1):
            return (
                b'{"head":{"vars":["x"]},"results":{"bindings":[]}}'
            )

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        captured["url"] = req.full_url
        return FakeResp()

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    q = """BASE <http://ex.org/ns/>
        SELECT ?x WHERE {
          SERVICE <http://127.0.0.1:9/sparql/> { ?x <urn:p> ?y } }"""
    local.select(q).collect()
    sent = urllib.parse.parse_qs(
        urllib.parse.urlparse(captured["url"]).query
    )["query"][0]
    assert sent.startswith("BASE <http://ex.org/ns/>")


def test_service_bind_join_ships_values(local, remote, monkeypatch):
    # FedX-style bind join: the local side's distinct shared tuples ship
    # as a VALUES clause, so the endpoint returns only joinable rows
    sent = {}
    real = urllib.request.urlopen

    def spy(req, timeout=None):
        sent["url"] = getattr(req, "full_url", str(req))
        sent["data"] = getattr(req, "data", None)
        return real(req, timeout=timeout)

    monkeypatch.setattr(urllib.request, "urlopen", spy)
    q = f"""SELECT ?y ?nm WHERE {{
        <urn:a> <urn:knows> ?y
        SERVICE <http://127.0.0.1:{remote.port}/sparql/> {{
            ?y <urn:name> ?nm }} }}"""
    got = sorted(tuple(r) for r in local.select(q).collect())
    assert got == [("urn:b", "Remote-B")]
    shipped = urllib.parse.unquote_plus(
        sent["url"] if sent["data"] is None else sent["data"].decode()
    )
    assert "VALUES (?y)" in shipped, shipped
    assert "<urn:b>" in shipped and "<urn:x>" in shipped


def test_optional_service_bind_join(local, remote):
    # OPTIONAL { SERVICE ... }: matched rows get remote values, unmatched
    # local rows survive unbound; the bind-join restriction applies
    q = f"""SELECT ?y ?nm WHERE {{
        <urn:a> <urn:knows> ?y
        OPTIONAL {{ SERVICE <http://127.0.0.1:{remote.port}/sparql/> {{
            ?y <urn:name> ?nm }} }} }}"""
    got = sorted((r["y"], r["nm"]) for r in local.select(q).collect())
    assert got == [("urn:b", "Remote-B"), ("urn:x", None)]
