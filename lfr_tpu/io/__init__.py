from . import features, match_list, protos, wire  # noqa: F401
