"""Cross-modal-gated generator: structural properties + ceiling separation.

The discriminative sweep itself runs on the chip (tools/discrim_bench.py);
these tests pin the generator's guarantees at CPU-friendly sizes.
"""

import jax.numpy as jnp
import numpy as np

from embracenet_tpu.data.synth import (MOTIF, _motif_present,
                                       gated_multimodal_task, oracle_scores)
from embracenet_tpu.ops.metrics import auprc_prob

GEN = dict(prevalence=0.15, gate_p=0.5, tab_shift=1.2, n_tab_features=6,
           motif_pos_rate=0.95, motif_bg_rate=0.03, gate_vis=0.3)


def _task(n=6000, seed=5):
    return gated_multimodal_task(n, 32, seed=seed, **GEN)


def test_generator_structure():
    data = _task()
    y, g = data["y"], data["g"]
    assert data["ffnn"].shape == (6000, 32)
    assert data["cnn"].shape == (6000, 256)
    assert 0.10 < y.mean() < 0.20
    # tabular shift only on (y=1, g=1) rows
    tab = data["ffnn"][:, 1:7].mean(axis=1)
    lifted = tab[(y == 1) & (g == 1)].mean()
    rest = tab[~((y == 1) & (g == 1))].mean()
    assert lifted - rest > 0.8  # shift 1.2 against sigma/sqrt(6) noise
    # motif planted predominantly on (y=1, g=0) rows
    present = _motif_present(data["cnn"])
    rate_sig = present[(y == 1) & (g == 0)].mean()
    rate_bg = present[~((y == 1) & (g == 0))].mean()
    assert rate_sig > 0.9 and rate_bg < 0.12


def test_motif_scanner_exact():
    codes = np.full((3, 20), 3, np.uint8)
    codes[1, 7:7 + len(MOTIF)] = MOTIF
    codes[2, 20 - len(MOTIF):] = MOTIF  # boundary placement
    np.testing.assert_array_equal(_motif_present(codes), [False, True, True])


def test_oracle_ceilings_separate():
    """Bayes ceilings: both-view strictly dominates each single view with a
    margin exceeding sampling noise — the property that makes the sweep able
    to discriminate fusion from single-modality models."""
    data = _task(n=8000, seed=9)
    sc = oracle_scores(data, **GEN)
    y = jnp.asarray(data["y"])
    ap = {v: float(auprc_prob(jnp.asarray(s), y)) for v, s in sc.items()}
    assert ap["both"] > ap["tab"] + 0.08
    assert ap["both"] > ap["seq"] + 0.15
    # no view leaks to perfection, none collapses to prevalence
    prev = float(np.mean(data["y"]))
    for v in ("tab", "seq", "both"):
        assert prev + 0.05 < ap[v] < 0.98


def test_oracle_posterior_calibrated():
    """The posterior is a probability: binning rows by predicted P(y=1)
    should recover the empirical positive rate (exactness check on the
    logsumexp posterior computation)."""
    data = _task(n=8000, seed=2)
    sc = oracle_scores(data, **GEN)["both"]
    y = np.asarray(data["y"])
    for lo, hi in [(0.0, 0.2), (0.2, 0.6), (0.6, 1.01)]:
        m = (sc >= lo) & (sc < hi)
        if m.sum() >= 200:
            assert abs(y[m].mean() - sc[m].mean()) < 0.06
