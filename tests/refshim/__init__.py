"""Loader for the reference implementation as a differential oracle.

`load_reference()` makes `import boxmot` resolve to /root/reference's
package, with this directory's `lap` shim satisfying its only missing
dependency.  Returns the imported reference package, or None when the
reference tree is absent (tests skip in that case).
"""

import os
import sys

_SHIM_DIR = os.path.dirname(os.path.abspath(__file__))
REFERENCE_ROOT = os.environ.get("BOXMOT_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "boxmot"))


def load_reference():
    if not reference_available():
        return None
    for p in (_SHIM_DIR, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import boxmot  # the reference package

    return boxmot
