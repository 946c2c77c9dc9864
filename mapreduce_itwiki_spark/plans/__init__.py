from .catalog import oracles, queries  # noqa: F401
