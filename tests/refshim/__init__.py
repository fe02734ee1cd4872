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


def stub_missing_modules(*names):
    """Install empty module stubs for optional reference deps absent here.

    E.g. the reference's gta.py imports ``torchvision.transforms`` at module
    level but only uses it in the tracklet-*generation* CLI path; the
    split/connect functions under differential test never touch it.
    """
    import importlib.machinery
    import types

    for name in names:
        try:
            __import__(name)
            continue
        except ImportError:
            pass
        parts = name.split(".")
        for i in range(len(parts)):
            mod_name = ".".join(parts[: i + 1])
            if mod_name not in sys.modules:
                mod = types.ModuleType(mod_name)
                # a real spec so later importlib.util.find_spec(mod_name)
                # (e.g. transformers probing torchvision) doesn't raise
                # "__spec__ is None"
                mod.__spec__ = importlib.machinery.ModuleSpec(mod_name, None)
                sys.modules[mod_name] = mod
            if i:
                setattr(sys.modules[".".join(parts[:i])], parts[i], sys.modules[mod_name])
