"""graphblas_algorithms_spark — a PySpark-native link-graph analytics engine.

Brand-new implementation (NOT a port) of the query surface of
python-graphblas/graphblas-algorithms, re-expressed as DataFrame
programs: iterative join+agg supersteps for the semiring mxv kernels,
oriented-wedge joins for triangles, delta-frontier loops for traversal,
plus checkpoint/resume and large-scale training-data pipeline operators
(dedup / similarity / text analysis) the reference doesn't have.
"""

from .classes.graph import DiGraph, Graph, from_edgelist, from_networkx
from .exceptions import ConvergenceFailure, NoPath, PointlessConcept, Unbounded
from .session import get_spark

__version__ = "0.1.0"
