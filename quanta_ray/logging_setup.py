"""Structured logging from env (reference C5:
``/root/reference/internal/logging/logging.go:55-63`` — slog text/JSON
selected by ``QUANTA_LOG_LEVEL`` / ``QUANTA_LOG_JSON``)."""

from __future__ import annotations

import json
import logging
import os
import sys


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        if record.exc_info:
            payload["exc"] = self.formatException(record.exc_info)
        return json.dumps(payload)


def init_from_env() -> logging.Logger:
    level = os.environ.get("QUANTA_RAY_LOG_LEVEL", "INFO").upper()
    as_json = os.environ.get("QUANTA_RAY_LOG_JSON", "").lower() in ("1", "true", "yes")
    logger = logging.getLogger("quanta_ray")
    logger.setLevel(getattr(logging, level, logging.INFO))
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        if as_json:
            h.setFormatter(_JsonFormatter())
        else:
            h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s"))
        logger.addHandler(h)
    return logger
