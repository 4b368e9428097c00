from . import dedup, geospatial, multimodal, relational, similarity, textops  # noqa: F401
