from . import dedup, multimodal, simsearch, text  # noqa: F401
