from . import dedup, multimodal, relational, similarity, textops  # noqa: F401
