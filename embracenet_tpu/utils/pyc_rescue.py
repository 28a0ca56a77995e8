"""Import fallback for source files destroyed by disk faults.

When a bad disk block makes ``pkg/mod.py`` unreadable (stat/open raise
``EIO``), the standard ``PathFinder`` treats the module as *missing* — the
directory listing shows the file, but the loader's stat of the source fails,
so the import ends in ``ModuleNotFoundError`` even though the compiled
bytecode ``pkg/__pycache__/mod.<tag>.pyc`` is fully intact.  ``install()``
appends a meta-path finder that, as a LAST resort (every normal finder has
already returned ``None``), locates that cached bytecode and loads it
sourcelessly.

Pure-Python modules only: C extensions (``.so``) cannot be rescued this way
(a half-readable shared object SIGBUSes the process at dlopen/mmap, which is
not catchable), so callers must still probe risky imports in a subprocess —
``tests/conftest.py`` does exactly that and only enables oracle test files
whose probe (with rescue installed) exits cleanly.

The rescue fires only when the source file is *present but unreadable*: a
module with no source at all is never resurrected from a stale ``__pycache__``
entry, so healthy environments see no behaviour change.

Motivation: this repo's round-2 build VM shipped bad ext4 sectors through
pandas/sklearn/torch/matplotlib (docs/STATUS.md).  The mechanism is generic
environment-resilience, not tied to any particular package.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from importlib.machinery import SourcelessFileLoader

_read_ok: dict = {}
_listing: dict = {}


def _fully_readable(path: str) -> bool:
    """True iff every block of ``path`` can actually be read (a bad sector
    mid-file raises EIO only when reached, so a stat/exists check is not
    enough)."""
    got = _read_ok.get(path)
    if got is None:
        got = False
        try:
            with open(path, "rb") as f:
                while f.read(1 << 20):
                    pass
            got = True
        except OSError:
            pass
        _read_ok[path] = got
    return got


def _listdir(base: str) -> frozenset:
    got = _listing.get(base)
    if got is None:
        try:
            got = frozenset(os.listdir(base))
        except OSError:
            got = frozenset()
        _listing[base] = got
    return got


class _PycRescueFinder:
    """Last-resort meta-path finder: source present-but-unreadable -> load the
    matching ``__pycache__`` bytecode via ``SourcelessFileLoader`` (which by
    design never consults the source)."""

    def find_spec(self, fullname, path=None, target=None):
        tag = sys.implementation.cache_tag
        if tag is None:  # bytecode caching disabled in this interpreter
            return None
        leaf = fullname.rpartition(".")[2]
        for base in (path if path is not None else sys.path):
            if not isinstance(base, str) or not base:
                continue
            if f"{leaf}.py" in _listdir(base):
                pyc = os.path.join(base, "__pycache__", f"{leaf}.{tag}.pyc")
                if _fully_readable(pyc):
                    return importlib.util.spec_from_loader(
                        fullname, SourcelessFileLoader(fullname, pyc),
                        origin=pyc)
            pkg_dir = os.path.join(base, leaf)
            if "__init__.py" in _listdir(pkg_dir):
                pyc = os.path.join(pkg_dir, "__pycache__",
                                   f"__init__.{tag}.pyc")
                if _fully_readable(pyc):
                    spec = importlib.util.spec_from_loader(
                        fullname, SourcelessFileLoader(fullname, pyc),
                        origin=pyc, is_package=True)
                    spec.submodule_search_locations = [pkg_dir]
                    return spec
        return None


_FINDER = _PycRescueFinder()


def install() -> None:
    """Append the rescue finder to ``sys.meta_path`` (idempotent)."""
    if _FINDER not in sys.meta_path:
        sys.meta_path.append(_FINDER)


def uninstall() -> None:
    if _FINDER in sys.meta_path:
        sys.meta_path.remove(_FINDER)
