from .attention import dense_attention  # noqa: F401
