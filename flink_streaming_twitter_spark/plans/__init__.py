from . import extensions, oracles, reference_queries  # noqa: F401
