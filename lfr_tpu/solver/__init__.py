from . import buckets, graph, lm, partition, tracks  # noqa: F401
