from . import dedup, geospatial, graphrank, multimodal, relational, similarity, textops  # noqa: F401
