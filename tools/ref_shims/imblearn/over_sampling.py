"""imblearn.over_sampling.SMOTE shim for the parity harness.

The reference calls SMOTE two ways (`BIOINF_tesi/data_pipe/utils.py:574,629`):
  * ``sampling_strategy=<float r>``  — oversample positives until
    n_pos/n_neg reaches ``r`` (imblearn float semantics);
  * ``sampling_strategy={0: n0, 1: n1}`` — oversample each class to the
    given absolute count.

Sample construction (pick a minority point, pick one of its k nearest
same-class neighbours, interpolate with U(0,1)) is delegated to
``embracenet_tpu.data.sampling.smote_oversample``, which implements the
imblearn algorithm including its append order (class-0 synthetics before
class-1).  Sharing the generator between the torch and JAX sides removes
rebalancing as a confound in the head-to-head comparison — both sides see
the same *kind* of synthetic data.
"""

import numpy as np
import pandas as pd

from embracenet_tpu.data.sampling import smote_oversample


class SMOTE:
    def __init__(self, k_neighbors=5, sampling_strategy=0.1,
                 random_state=None):
        self.k_neighbors = k_neighbors
        self.sampling_strategy = sampling_strategy
        self.random_state = random_state

    def fit_resample(self, X, y):
        y = np.asarray(y).ravel()
        columns = X.columns if isinstance(X, pd.DataFrame) else None
        x = np.asarray(X, dtype=np.float64)
        n_pos = int((y == 1).sum())
        n_neg = int((y == 0).sum())

        if isinstance(self.sampling_strategy, dict):
            n_new_neg = max(0, int(self.sampling_strategy.get(0, n_neg)) - n_neg)
            n_new_pos = max(0, int(self.sampling_strategy.get(1, n_pos)) - n_pos)
        else:
            # imblearn float semantics TRUNCATE: n_target = int(r * n_maj)
            # (imblearn.utils._validation._sampling_strategy_float).  This
            # must not round: the reference's sequence-side rebalance count
            # is int(r*n_neg - n_pos) (data_pipe/utils.py:652-684), i.e.
            # the same floor — rounding here made the two multimodal views
            # differ by one row whenever frac(r*n_neg) >= 0.5, tripping the
            # reference's own assert(len(x_1)==len(x_2))
            # (training_models_multimodal.py:345).
            target_pos = int(float(self.sampling_strategy) * n_neg)
            n_new_pos = max(0, target_pos - n_pos)
            n_new_neg = 0

        seed = self.random_state
        if seed is None:
            # imblearn defaults to global numpy randomness; stay seedable
            # from the harness via np.random.seed
            seed = int(np.random.randint(0, 2**31 - 1))
        new_x, new_y = smote_oversample(
            x, y, n_new_pos=n_new_pos, n_new_neg=n_new_neg,
            k_neighbors=self.k_neighbors, random_state=seed)
        if columns is not None:
            new_x = pd.DataFrame(new_x, columns=columns)
        return new_x, new_y
