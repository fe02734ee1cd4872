"""Framework logger + output-suppression context.

Light mirror of the reference logging surface (boxmot/utils/__init__.py:
47-66 loguru LOGGER with per-process filters; utils/misc.py:149
suppression context) on the standard library: one shared `LOGGER`, a
`set_verbosity` switch, and `suppress_output()` to silence noisy
third-party imports (TF/absl) around export and conversion code.
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys

LOGGER = logging.getLogger("boxmot_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter(
            "%(asctime)s %(levelname)s [%(process)d] %(name)s: %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    LOGGER.addHandler(_h)
    LOGGER.setLevel(logging.INFO)
    LOGGER.propagate = False


def set_verbosity(verbose: bool) -> None:
    LOGGER.setLevel(logging.DEBUG if verbose else logging.INFO)


@contextlib.contextmanager
def suppress_output(stdout: bool = True, stderr: bool = True):
    """Redirect stdout/stderr to devnull for the block (misc.py:149)."""
    with open(os.devnull, "w") as devnull:
        old_out, old_err = sys.stdout, sys.stderr
        try:
            if stdout:
                sys.stdout = devnull
            if stderr:
                sys.stderr = devnull
            yield
        finally:
            sys.stdout, sys.stderr = old_out, old_err
