from . import dedup, linkgraph, multimodal, similarity  # noqa: F401
