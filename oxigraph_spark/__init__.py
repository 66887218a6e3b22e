"""oxigraph-spark: a PySpark-native SPARQL 1.1 analytics engine.

Public surface (lazy imports keep `import oxigraph_spark` free of a
SparkSession dependency):

- :class:`oxigraph_spark.store.Store` — SPARQL text in, DataFrame out
- :func:`oxigraph_spark.session.get_spark` — session with the engine's
  required confs (see README "Session contract")
- :mod:`oxigraph_spark.sources` — RDF readers/writers + quad stores
- :mod:`oxigraph_spark.pipeline` — LLM-data-pipeline operators
- :class:`oxigraph_spark.server.SparqlEndpoint` — SPARQL 1.1 Protocol
"""

__all__ = ["Store", "get_spark", "SparqlEndpoint"]

__version__ = "0.4.0"


def __getattr__(name):
    if name == "Store":
        from .store import Store
        return Store
    if name == "get_spark":
        from .session import get_spark
        return get_spark
    if name == "SparqlEndpoint":
        from .server import SparqlEndpoint
        return SparqlEndpoint
    raise AttributeError(f"module 'oxigraph_spark' has no attribute {name!r}")
