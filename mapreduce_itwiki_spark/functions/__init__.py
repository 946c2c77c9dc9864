from . import text, vectors, wiki  # noqa: F401
