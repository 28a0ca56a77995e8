"""End-to-end data pipeline on a synthetic on-disk dataset in the reference's
layout (data/{enhancers,promoters}/{CELL.csv, *.bed, *.fa})."""

import os

import numpy as np
import pandas as pd
import pytest

from embracenet_tpu.data.io import load_dataset
from embracenet_tpu.data.pipeline import Pipeline
from embracenet_tpu.data.tasks import get_task

CELLS = ["K562", "H1"]


def _write_family(root, family, n, rng, n_feat=8, label_p=0.3):
    d = os.path.join(root, family)
    os.makedirs(d, exist_ok=True)
    coords = pd.DataFrame({
        "chrom": ["chr1"] * n,
        "chromStart": np.arange(n) * 300,
        "chromEnd": np.arange(n) * 300 + 256,
        "strand": ["+"] * n,
    })
    bed = coords[["chrom", "chromStart", "chromEnd"]].copy()
    for cell in CELLS:
        feats = rng.normal(size=(n, n_feat))
        labels = (rng.random(n) < label_p).astype(int)
        # plant signal: feature 0 correlates with label, feature 1 is a
        # near-copy of feature 0 (redundant), feature 7 is pure noise
        feats[:, 0] += labels * 2.0
        feats[:, 1] = feats[:, 0] * 1.5 + rng.normal(size=n) * 0.01
        df = pd.concat([coords, pd.DataFrame(
            feats, columns=[f"f{j}" for j in range(n_feat)])], axis=1)
        df.to_csv(os.path.join(d, f"{cell}.csv"), index=False)
        bed[cell] = labels
    bed.to_csv(os.path.join(d, f"{family}.bed"), sep="\t", index=False)
    with open(os.path.join(d, f"{family}.fa"), "w") as fh:
        for i in range(n):
            seq = "".join(rng.choice(list("acgt"), 256))
            fh.write(seq + "\n")
            fh.write(f">chr1:{i * 300}-{i * 300 + 256}\n")


@pytest.fixture
def data_root(tmp_path, rng):
    root = str(tmp_path / "data")
    _write_family(root, "enhancers", 60, rng)
    _write_family(root, "promoters", 90, rng)
    return root


def test_load_dataset(data_root):
    ds = load_dataset(data_root)
    e = ds["enhancers"]
    assert sorted(e.features) == sorted(CELLS)
    assert e.features["K562"].shape == (60, 8)
    assert e.codes.shape == (60, 256)
    assert len(e.labels["H1"]) == 60
    assert ds["promoters"].codes.shape == (90, 256)


def test_task_passthrough(data_root):
    ds = load_dataset(data_root)
    td = get_task(ds, "active_E_vs_inactive_E")
    assert td.features["K562"].shape == (60, 8)
    np.testing.assert_array_equal(td.sequence_codes("K562"),
                                  ds["enhancers"].codes)


def test_task_ep_vs_rest_concat(data_root):
    ds = load_dataset(data_root)
    td = get_task(ds, "active_EP_vs_inactive_rest")
    assert td.features["K562"].shape == (150, 8)
    assert len(td.labels["K562"]) == 150
    assert td.sequence_codes("K562").shape == (150, 256)
    np.testing.assert_array_equal(
        td.labels["K562"],
        np.concatenate([ds["enhancers"].labels["K562"],
                        ds["promoters"].labels["K562"]]))


def test_task_minority_relabel_and_index_fa(data_root):
    ds = load_dataset(data_root)
    td = get_task(ds, "active_E_vs_active_P")
    e_lab = ds["enhancers"].labels["K562"]
    p_lab = ds["promoters"].labels["K562"]
    n_active = (e_lab == 1).sum() + (p_lab == 1).sum()
    assert len(td.labels["K562"]) == n_active
    # minority family = enhancers (60 < 90 rows) -> enhancer rows get label 1
    orig = np.concatenate([e_lab, p_lab])
    idx = td.index_fa["K562"]
    np.testing.assert_array_equal(orig[idx], 1)
    want_labels = (idx < 60).astype(np.int64)
    np.testing.assert_array_equal(td.labels["K562"], want_labels)
    # sequence alignment: codes rows follow index_fa
    full_codes = np.concatenate([ds["enhancers"].codes, ds["promoters"].codes])
    np.testing.assert_array_equal(td.sequence_codes("K562"), full_codes[idx])

    td0 = get_task(ds, "inactive_E_vs_inactive_P")
    idx0 = td0.index_fa["K562"]
    np.testing.assert_array_equal(orig[idx0], 0)


def test_pipeline_selects_and_caches(data_root, tmp_path):
    cache = str(tmp_path / "cache")
    pipe = Pipeline(task="active_P_vs_inactive_P", root=data_root,
                    cache_dir=cache)
    d = pipe.cell_data("K562")
    n_sel = d["ffnn"].shape[1]
    assert d["ffnn"].shape[0] == 90
    assert d["cnn"].shape == (90, 256)
    assert n_sel < 8                      # redundant/noise columns dropped
    assert "f0" in pipe.feature_names["K562"] or \
           "f1" in pipe.feature_names["K562"]   # planted signal survives
    assert d["ffnn"].min() >= -1e-6 and d["ffnn"].max() <= 1 + 1e-6  # minmax

    # cache hit: reload must give identical arrays
    pipe2 = Pipeline(task="active_P_vs_inactive_P", root="/nonexistent",
                     cache_dir=cache)
    np.testing.assert_array_equal(pipe2.cell_data("K562")["ffnn"], d["ffnn"])
    np.testing.assert_array_equal(pipe2.cell_data("K562")["cnn"], d["cnn"])


def test_pipeline_unknown_task():
    with pytest.raises(ValueError):
        Pipeline(task="nope", root="/nonexistent", cache_dir=None)


def test_pipeline_return_data(data_root, tmp_path):
    pipe = Pipeline(task="active_P_vs_inactive_P", root=data_root,
                    cache_dir=None)
    tr, te = pipe.return_data("K562")
    assert len(tr["y"]) == 67 and len(te["y"]) == 23   # 0.25 split of 90
    trh, val = pipe.return_data("K562", hyper_tuning=True)
    assert len(val["y"]) == int(np.ceil(67 * 0.15))
    tr_seq, _ = pipe.return_data("K562", sequence=True)
    assert "ffnn" not in tr_seq and tr_seq["cnn"].shape[1] == 256
