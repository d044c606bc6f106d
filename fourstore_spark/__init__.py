"""fourstore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of 4store (https://github.com/4store/4store).

4store is a clustered RDF quad store with a SPARQL 1.1 (partial) engine;
this package re-expresses its data model (quads + typed terms), its SPARQL
query surface (SELECT/ASK/CONSTRUCT/DESCRIBE, filters, aggregates, solution
modifiers, updates) and its import/serialization paths as idiomatic Spark
DataFrame programs, letting Catalyst/Tungsten replace the reference's
hand-rolled indexes (src/backend/ptree.c) and scatter-gather network layer
(src/common/4s-client.c).

The name `4store_spark` is not a legal Python identifier, hence
``fourstore_spark``.
"""

from fourstore_spark.model import QUADS_SCHEMA, KIND_URI, KIND_BNODE, KIND_LITERAL
from fourstore_spark.sparql.engine import SparqlEngine

__all__ = [
    "QUADS_SCHEMA",
    "KIND_URI",
    "KIND_BNODE",
    "KIND_LITERAL",
    "SparqlEngine",
]

__version__ = "0.1.0"
