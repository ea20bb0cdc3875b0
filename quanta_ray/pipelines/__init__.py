from . import batch_cep, relational  # noqa: F401
