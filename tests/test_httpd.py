"""HTTP endpoint tests, shaped like the reference's tests/httpd/scripts
(insert -> query -> delete cycles over the SPARQL protocol)."""

import json
import urllib.parse
import urllib.request

import pytest

from fourstore_spark.httpd import SparqlHttpServer


@pytest.fixture(scope="module")
def server(spark):
    srv = SparqlHttpServer(spark, port=0)  # ephemeral port
    srv.start()
    yield srv
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return r.status, r.read().decode()


def _post(srv, path, data: dict):
    body = urllib.parse.urlencode(data).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        return r.status, r.read().decode()


def _put(srv, path, body: str):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=body.encode(),
        method="PUT",
        headers={"Content-Type": "application/n-triples"},
    )
    with urllib.request.urlopen(req) as r:
        return r.status, r.read().decode()


def test_http_cycle(server):
    # insert via /update/
    st, _ = _post(
        server,
        "/update/",
        {"update": 'INSERT DATA { <urn:s> <urn:p> "hello" }'},
    )
    assert st == 200
    # query via GET /sparql/
    q = urllib.parse.quote("SELECT ?o WHERE { <urn:s> <urn:p> ?o }")
    st, body = _get(server, f"/sparql/?query={q}&output=json")
    assert st == 200
    doc = json.loads(body)
    assert doc["results"]["bindings"][0]["o"]["value"] == "hello"
    # status endpoints
    st, body = _get(server, "/status/size/")
    assert st == 200 and body.strip() == "1"


def test_http_put_data_and_delete(server):
    graph = urllib.parse.quote("urn:g:put", safe="")
    st, _ = _put(server, f"/data/{graph}", '<urn:a> <urn:p> "v1" .')
    assert st == 201
    q = urllib.parse.quote(
        "SELECT ?o WHERE { GRAPH <urn:g:put> { ?s ?p ?o } }"
    )
    st, body = _get(server, f"/sparql/?query={q}&output=tsv")
    assert '"v1"' in body
    # PUT replaces
    st, _ = _put(server, f"/data/{graph}", '<urn:a> <urn:p> "v2" .')
    st, body = _get(server, f"/sparql/?query={q}&output=tsv")
    assert '"v2"' in body and '"v1"' not in body
    # DELETE drops the graph
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/data/{graph}", method="DELETE"
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    st, body = _get(server, f"/sparql/?query={q}&output=json")
    assert json.loads(body)["results"]["bindings"] == []


def test_http_bad_query_is_400(server):
    q = urllib.parse.quote("SELECT WHERE this is not sparql")
    try:
        _get(server, f"/sparql/?query={q}")
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised


def test_http_construct_ntriples(server):
    q = urllib.parse.quote(
        "CONSTRUCT { ?s <urn:copy> ?o } WHERE { <urn:s> <urn:p> ?o . ?s <urn:p> ?o }"
    )
    st, body = _get(server, f"/sparql/?query={q}")
    assert st == 200
    assert '<urn:s> <urn:copy> "hello" .' in body
