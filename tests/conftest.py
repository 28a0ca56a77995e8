"""Test config: force CPU with a virtual 8-device mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4 strategy).

NOTE: env vars are not enough here — the machine's sitecustomize imports JAX
at interpreter startup with JAX_PLATFORMS=axon baked in, so we must override
through the config API before any backend is initialised.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# The slow tier is dominated by XLA:CPU compiles of the engine's chunk
# programs (measured: ~2/3 of its wall).  The machine-scoped persistent
# cache (utils/jaxcache — see its docstring for why it must be scoped by
# CPU feature set) makes every run after the first fast, which is the
# point of a pre-commit tier.  min_compile_secs=2: CPU programs are
# smaller than the TPU ones the default 5 s threshold was tuned for.
import os  # noqa: E402

from embracenet_tpu.utils import jaxcache as _jaxcache  # noqa: E402

_jaxcache.enable(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache"), min_compile_secs=2.0)

import ast  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Optional-dependency resilience: tests cross-verify against torch / sklearn /
# scipy / pandas where available, but the framework itself must stay testable
# without them (they are dev-time oracles, not runtime deps).  Skip collection
# of any test module whose top-level imports cannot be satisfied — this also
# keeps the suite green when an environment ships a broken install (import
# raising OSError rather than ImportError).
# ---------------------------------------------------------------------------
# Probe logic (subprocess deep-import + pyc-rescue fallback) lives in
# goldens.py so oracle-backed tests share the same availability cache and
# can fall back to committed golden fixtures when an oracle is broken.
from goldens import oracle_available as _importable  # noqa: E402


def _module_imports(path: str):
    """Top-level imports only: function-level oracle imports carry their own
    skip guards, so they must not disqualify the whole file."""
    try:
        tree = ast.parse(open(path).read())
    except Exception:
        return

    def walk_toplevel(body):
        for node in body:
            if isinstance(node, ast.Import):
                for a in node.names:
                    yield a.name
            elif isinstance(node, ast.ImportFrom) and node.level == 0 \
                    and node.module:
                yield node.module
            elif isinstance(node, (ast.If, ast.Try, ast.With)):
                for sub in ast.iter_child_nodes(node):
                    if isinstance(sub, (ast.Import, ast.ImportFrom)):
                        yield from walk_toplevel([sub])

    yield from walk_toplevel(tree.body)


_ORACLES = ("torch", "sklearn", "scipy", "pandas", "matplotlib", "optuna",
            "miceforest", "seaborn", "imblearn", "orbax", "tensorstore")


def pytest_configure(config):
    # steer package-internal optional imports away from broken installs
    # before any test module (or the package under test) attempts them —
    # a half-broken C extension can SIGBUS the interpreter, not just raise
    if not _importable("scipy"):
        os.environ["EMBRACENET_NO_SCIPY"] = "1"
    if not _importable("orbax"):
        os.environ["EMBRACENET_NO_ORBAX"] = "1"
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end module (engine fits, CV, "
        "fold fusion, mesh) — deselect with -m 'not slow' for the quick "
        "tier (~1-2 min on this 1-core VM vs ~45 min full)")


# Modules whose tests run real engine.fit / KfoldCV / HPO populations on
# CPU — minutes each on a 1-core VM.  Everything else (< a few seconds per
# test) forms the quick tier: `pytest tests/ -m 'not slow'`.
_SLOW_MODULES = {
    "test_engine", "test_hpo_cv", "test_fold_fusion", "test_mesh",
    "test_sweep", "test_api_golden", "test_io_pipeline", "test_discrim",
    "test_models", "test_pallas_embrace", "test_width_buckets",
    "test_pop_init", "test_visual",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        mod = os.path.splitext(os.path.basename(str(item.fspath)))[0]
        if mod in _SLOW_MODULES:
            item.add_marker(_pytest.mark.slow)


def pytest_ignore_collect(collection_path, config):
    p = str(collection_path)
    if not (os.path.basename(p).startswith("test_") and p.endswith(".py")):
        return None
    for mod in _module_imports(p):
        if mod.split(".")[0] in _ORACLES and not _importable(mod):
            print(f"[conftest] skipping {os.path.basename(p)}: "
                  f"'{mod}' unavailable in this environment")
            return True
    return None


@pytest.fixture
def rng():
    return np.random.default_rng(0)
