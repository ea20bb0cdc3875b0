from .runner import StreamingRunner, run_pipeline  # noqa: F401
