"""Structured logging (SURVEY.md §5.5: the reference has no logging
framework, only prints).  One logger per subsystem, env-tunable level."""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s %(name)s %(levelname).1s: %(message)s"
_configured = False


def get_logger(name: str = "embracenet_tpu") -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, "%H:%M:%S"))
        root = logging.getLogger("embracenet_tpu")
        root.addHandler(handler)
        root.setLevel(os.environ.get("EMBRACENET_LOG", "INFO").upper())
        root.propagate = False
        _configured = True
    return logging.getLogger(name)
