"""Stdout logging, mirroring the reference CLI UX.

Reference behavior: every module does ``logging.basicConfig(stream=sys.stdout,
level=INFO, format="%(message)s")`` (e.g. /root/reference/neural_admixture/entry.py:17).
We centralize that here.
"""
import logging
import sys

_CONFIGURED = False


def setup_logging(level: int = logging.INFO) -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    logging.basicConfig(stream=sys.stdout, level=level, format="%(message)s")
    _CONFIGURED = True


log = logging.getLogger("neural_admixture_tpu")
