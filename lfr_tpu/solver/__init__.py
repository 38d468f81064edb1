from . import buckets, graph, lm, partition, solve, tracks  # noqa: F401
