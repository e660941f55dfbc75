"""nxapi-analog convenience layer: key<->id translation + dict outputs.

The reference wraps every kernel in an nxapi shim that converts inputs,
maps ids, and wraps outputs (``nxapi/``, SURVEY §2.3).  Kernels in this
engine speak dense long ids; this module is the only place string keys
appear (renumber-once rule, reference ``classes/_utils.py:11-18``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classes._utils import edges_from_keys, vector_to_dict
from .classes.graph import DiGraph, Graph


def graph_from_key_edges(
    raw: DataFrame,
    src_key: str,
    dst_key: str,
    weight: str | None = None,
    directed: bool = False,
):
    """Key-typed edge list -> (Graph/DiGraph, nodes dim table).

    ``nodes`` is the (id, key) dim table joined back only at the output
    boundary."""
    edges, nodes = edges_from_keys(raw, src_key, dst_key, weight)
    cls = DiGraph if directed else Graph
    return cls(edges, nodes.select("id")), nodes


def result_with_keys(result: DataFrame, nodes: DataFrame) -> DataFrame:
    """Join keys back onto an (id, ...) result vector for display."""
    return result.join(nodes, "id").select(
        "key", *[c for c in result.columns if c != "id"]
    )


def result_to_dict(result: DataFrame, nodes: DataFrame | None = None, val_col: str | None = None) -> dict:
    """Collect a result vector to {key_or_id: value} (test boundary;
    reference ``vector_to_dict`` ``_utils.py:112-119``)."""
    if nodes is None:
        return vector_to_dict(result, "id", val_col)
    keyed = result_with_keys(result, nodes)
    if val_col is None:
        val_col = [c for c in keyed.columns if c != "key"][0]
    return {r["key"]: r[val_col] for r in keyed.select("key", val_col).collect()}


def pagerank(raw: DataFrame, src_key: str, dst_key: str, **kw) -> dict:
    """End-to-end convenience: key edge list in, {key: rank} out."""
    from .operators.pagerank import pagerank as _pr

    G, nodes = graph_from_key_edges(raw, src_key, dst_key, directed=True)
    return result_to_dict(_pr(G, **kw), nodes, "rank")
