"""Randomized SERVICE bind-join exactness guard.

The FedX-style bind join (translator._service_bind_clause) ships the
local side's distinct shared-variable tuples as a VALUES clause so the
endpoint returns only joinable rows. It must be EXACTLY
result-preserving: for every query shape where it fires, the solution
multiset must equal the plain unrestricted-SERVICE evaluation. Hypothesis
generates correlated shapes (shared-var local patterns, 1-2 remote
patterns, optional remote FILTER / OPTIONAL, SERVICE under OPTIONAL) and
runs each twice against the in-process SPARQL-protocol endpoint — once
with the bind join enabled, once force-disabled (SERVICE_BIND_JOIN_MAX
monkeypatched to 0) — and compares multisets.
"""

from __future__ import annotations

import urllib.parse
import urllib.request
from collections import Counter

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from fourstore_spark import SparqlEngine
from fourstore_spark.httpd import SparqlHttpServer
from fourstore_spark.sources.rdfio import quads_from_nt_text
from fourstore_spark.sparql import translator as T


@pytest.fixture(scope="module")
def remote(spark):
    srv = SparqlHttpServer(spark, port=0)
    srv.start()
    # remote corpus: names for r0..r5 (skipping r3), ages for even ids,
    # a tag for r1/r4 — enough shape for OPTIONAL/FILTER variety
    triples = []
    for i in range(6):
        if i != 3:
            triples.append(f'<urn:r{i}> <urn:name> "Name-{i}" .')
        if i % 2 == 0:
            triples.append(f"<urn:r{i}> <urn:age> {30 + i} .")
        if i in (1, 4):
            triples.append(f'<urn:r{i}> <urn:tag> "hot" .')
    body = urllib.parse.urlencode(
        {"update": "INSERT DATA { " + " ".join(triples) + " }"}
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
    # local edges: a knows r0,r1,r2,r3 and two endpoint-unknown nodes;
    # b knows r4; a second predicate binds ?z for multi-var shapes
    nt = "\n".join(
        [
            "<urn:a> <urn:knows> <urn:r0> .",
            "<urn:a> <urn:knows> <urn:r1> .",
            "<urn:a> <urn:knows> <urn:r2> .",
            "<urn:a> <urn:knows> <urn:r3> .",
            "<urn:a> <urn:knows> <urn:u7> .",
            "<urn:b> <urn:knows> <urn:r4> .",
            "<urn:b> <urn:knows> <urn:u8> .",
            '<urn:a> <urn:city> "Paris" .',
            '<urn:b> <urn:city> "Oslo" .',
        ]
    )
    return SparqlEngine(spark, quads_from_nt_text(spark, nt))


remote_blocks = st.sampled_from(
    [
        "?y <urn:name> ?nm",
        "?y <urn:name> ?nm . ?y <urn:age> ?ag",
        "?y <urn:name> ?nm FILTER(STRLEN(?nm) > 3)",
        "?y <urn:age> ?ag FILTER(?ag > 31)",
        "?y <urn:name> ?nm OPTIONAL { ?y <urn:age> ?ag }",
        "?y <urn:name> ?nm OPTIONAL { ?y <urn:tag> ?tg }",
        "?y <urn:tag> ?tg",
    ]
)

shapes = st.fixed_dictionaries(
    {
        "who": st.sampled_from(["<urn:a>", "<urn:b>", "?x"]),
        "remote": remote_blocks,
        "optional_service": st.booleans(),
        "extra_local": st.booleans(),
        "project_distinct": st.booleans(),
    }
)

_SETTINGS = dict(
    max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "20")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _rows(engine, q):
    res = engine.query(q)
    out = []
    for r in res.df.collect():
        out.append(
            tuple(
                (None if r[c] is None or r[c]["kind"] is None else
                 (r[c]["kind"], r[c]["lex"], r[c]["dt"], r[c]["lang"]))
                for c in res.df.columns
            )
        )
    return Counter(out), list(res.df.columns)


@pytest.mark.slow  # ~42s two-engine SERVICE fuzz; test_service.py keeps the deterministic coverage
@given(shape=shapes)
@settings(**_SETTINGS)
def test_bind_join_matches_plain_service(local, remote, monkeypatch, shape):
    svc = (
        f"SERVICE <http://127.0.0.1:{remote.port}/sparql/> "
        f"{{ {shape['remote']} }}"
    )
    if shape["optional_service"]:
        svc = f"OPTIONAL {{ {svc} }}"
    body = f"{shape['who']} <urn:knows> ?y . {svc}"
    if shape["extra_local"]:
        body += f" {shape['who']} <urn:city> ?ct ."
    head = "SELECT DISTINCT *" if shape["project_distinct"] else "SELECT *"
    q = f"{head} WHERE {{ {body} }}"

    with_bind, cols_a = _rows(local, q)
    monkeypatch.setattr(T, "SERVICE_BIND_JOIN_MAX", 0)
    try:
        plain, cols_b = _rows(local, q)
    finally:
        monkeypatch.undo()
    assert cols_a == cols_b
    assert with_bind == plain, (q, with_bind, plain)
