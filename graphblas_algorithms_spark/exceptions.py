"""Engine exceptions, mirroring reference ``algorithms/exceptions.py:1-22``
and the nxapi translation layer (``nxapi/exception.py:1-44``)."""


class GraphBlasSparkException(Exception):
    pass


class ConvergenceFailure(GraphBlasSparkException):
    """Power iteration failed to converge within max_iter
    (reference raises this from pagerank/hits/katz/eigenvector)."""


class PointlessConcept(GraphBlasSparkException):
    """e.g. connectivity of the null graph (``exceptions.py``)."""


class Unbounded(GraphBlasSparkException):
    """Negative cycle in shortest-path (``weighted.py:87-100``)."""


class NoPath(GraphBlasSparkException):
    pass
