"""pyc_rescue: last-resort bytecode loading when source files are unreadable
(environment-resilience for the disk-fault class of failure documented in
docs/STATUS.md)."""

import os
import py_compile
import sys

import pytest

from embracenet_tpu.utils import pyc_rescue


@pytest.fixture
def broken_pkg(tmp_path):
    """A module whose __pycache__ bytecode is intact but whose source has
    since changed (stand-in for 'unreadable': SourcelessFileLoader must never
    consult the source, so loading has to reflect the .pyc, not the .py)."""
    base = tmp_path / "site"
    base.mkdir()
    mod = base / "rescue_victim.py"
    mod.write_text("VALUE = 'from-bytecode'\n")
    tag = sys.implementation.cache_tag
    pyc = base / "__pycache__" / f"rescue_victim.{tag}.pyc"
    py_compile.compile(str(mod), cfile=str(pyc))
    mod.write_text("raise OSError('source must not be read')\n")
    return str(base)


def test_finder_loads_from_pycache(broken_pkg):
    spec = pyc_rescue._FINDER.find_spec("rescue_victim", path=[broken_pkg])
    assert spec is not None and spec.origin.endswith(".pyc")
    import importlib.util
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert m.VALUE == "from-bytecode"


def test_finder_requires_source_presence(broken_pkg):
    # a stale pyc with NO source alongside must not be resurrected
    os.remove(os.path.join(broken_pkg, "rescue_victim.py"))
    pyc_rescue._listing.clear()
    spec = pyc_rescue._FINDER.find_spec("rescue_victim", path=[broken_pkg])
    assert spec is None


def test_package_init_rescue(tmp_path):
    base = tmp_path / "site"
    pkg = base / "rescue_pkg"
    pkg.mkdir(parents=True)
    init = pkg / "__init__.py"
    init.write_text("WHO = 'pkg-bytecode'\n")
    tag = sys.implementation.cache_tag
    pyc = pkg / "__pycache__" / f"__init__.{tag}.pyc"
    py_compile.compile(str(init), cfile=str(pyc))
    init.write_text("raise OSError('source must not be read')\n")

    spec = pyc_rescue._FINDER.find_spec("rescue_pkg", path=[str(base)])
    assert spec is not None
    assert spec.submodule_search_locations == [str(pkg)]
    import importlib.util
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert m.WHO == "pkg-bytecode"


def test_install_idempotent_and_last_resort():
    pyc_rescue.install()
    pyc_rescue.install()
    assert sys.meta_path.count(pyc_rescue._FINDER) == 1
    assert sys.meta_path[-1] is pyc_rescue._FINDER  # after every normal finder
    pyc_rescue.uninstall()
    assert pyc_rescue._FINDER not in sys.meta_path
