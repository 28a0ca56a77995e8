"""Read-only import of the reference's real Optuna storage
(`/root/reference/BIOINF_optuna_tuning.db`, 126 studies / 387 trials) and
param-census parity against this repo's declared search spaces
(hpo/space.py).  Skips cleanly when the reference checkout is absent."""

import os

import pytest

from embracenet_tpu.hpo import space
from embracenet_tpu.hpo.optuna_import import (
    load_optuna_db, param_census, parse_study_name)

REF_DB = "/root/reference/BIOINF_optuna_tuning.db"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_DB), reason="reference optuna DB not available")

KNOWN_MODELS = {"FFNN", "CNN", "CNN_LSTM",
                "EmbraceNetMultimodal", "ConcatNetMultimodal"}


@pytest.fixture(scope="module")
def studies():
    return load_optuna_db(REF_DB)


def test_study_and_trial_counts(studies):
    assert len(studies) == 126
    assert sum(len(s.trials) for s in studies.values()) == 387


def test_study_name_protocol(studies):
    from embracenet_tpu import CELL_LINES, TASKS

    for st in studies.values():
        assert st.model in KNOWN_MODELS, st.study_name
        assert st.cell_line in CELL_LINES, st.study_name
        assert st.task in TASKS, st.study_name
        assert st.fold in (1, 2, 3), st.study_name


def test_parse_augmentation_suffix():
    f = parse_study_name(
        "A549_active_E_vs_inactive_E_EmbraceNetMultimodal_1augmentation")
    assert f == {"cell_line": "A549", "task": "active_E_vs_inactive_E",
                 "model": "EmbraceNetMultimodal", "fold": 1,
                 "augmentation": True}


def test_param_census_matches_declared_space(studies):
    """Every param name the reference's HPO ever sampled exists in our
    space, every observed categorical value is in our menu, and every
    observed numeric value is inside our declared range."""
    census = param_census(studies)
    assert census, "no trials imported"
    for model, observed in census.items():
        ours = space.model_space(model)
        for pname, vals in observed.items():
            assert pname in ours, f"{model}: unknown param {pname}"
            dist = ours[pname]
            if isinstance(dist, space.Categorical):
                extra = set(vals) - set(dist.choices)
                assert not extra, f"{model}.{pname}: {extra} not in menu"
            elif isinstance(dist, space.IntUniform):
                assert all(dist.low <= v <= dist.high for v in vals), \
                    f"{model}.{pname} out of [{dist.low},{dist.high}]"
            else:  # LogUniform / FloatUniform
                assert all(dist.low <= v <= dist.high for v in vals), \
                    f"{model}.{pname} outside declared range"


def test_decoded_params_rebuild_our_hp(studies):
    """Best COMPLETE trial of each model family round-trips through
    params_to_hp — the imported reference params are directly consumable
    by this repo's supernet constructors."""
    seen = set()
    for st in studies.values():
        if st.model in seen or st.model == "CNN_LSTM":
            continue
        best = st.best_trial
        if best is None:
            continue
        missing = set(space.model_space(st.model)) - set(best.params)
        # optuna only stores params actually suggested (inactive layers'
        # params are absent); params_to_hp defaults those
        hp = space.params_to_hp(st.model, {
            **{k: v.sample(__import__("numpy").random.default_rng(0))
               for k, v in space.model_space(st.model).items()
               if k in missing},
            **best.params})
        assert hp is not None
        seen.add(st.model)
    # the real DB holds only the multimodal studies (96 EmbraceNet + 30
    # ConcatNet; the unimodal notebooks did not persist to this storage)
    assert {"EmbraceNetMultimodal", "ConcatNetMultimodal"} <= seen


def test_intermediate_values_present(studies):
    """The reference reports per-epoch test AUPRC (training_models.py:336);
    at least some trials must carry intermediate curves."""
    n = sum(1 for s in studies.values() for t in s.trials if t.intermediate)
    assert n > 0
