"""CLI smoke tests (python -m embracenet_tpu ...)."""

import json
import os

import numpy as np
import pytest

from embracenet_tpu.__main__ import main


def _pandas_usable():
    import subprocess
    import sys

    return subprocess.run(
        [sys.executable, "-c", "import pandas; pandas.DataFrame({'a': [1]})"],
        capture_output=True, timeout=120).returncode == 0


requires_pandas = pytest.mark.skipif(not _pandas_usable(),
                                     reason="pandas unavailable")


@pytest.fixture
def data_root(tmp_path, rng):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_api_golden import _write_family

    root = str(tmp_path / "data")
    _write_family(root, "enhancers", 60, rng)
    _write_family(root, "promoters", 200, rng)
    return root


@requires_pandas
def test_cli_preprocess_and_train_and_evaluate(data_root, tmp_path, capsys,
                                               monkeypatch):
    monkeypatch.chdir(tmp_path)
    task = "active_P_vs_inactive_P"
    cache = str(tmp_path / "cache")

    assert main(["preprocess", "--task", task, "--root", data_root,
                 "--cache-dir", cache]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["K562"]["rows"] == 200

    assert main(["train", "--model", "FFNN", "--cell", "K562",
                 "--task", task, "--root", data_root, "--cache-dir", cache,
                 "--epochs", "2", "--folds", "2", "--trials", "1",
                 "--sampler", "random",
                 "--results", str(tmp_path / "r.json"),
                 "--storage", str(tmp_path / "s.db"),
                 "--checkpoint-dir", str(tmp_path / "models")]) == 0
    out = capsys.readouterr().out
    scores = json.loads(out[out.index("{"):])
    assert "average_CV_AUPRC" in scores

    ck = os.path.join(str(tmp_path / "models"),
                      "K562_FFNN_active_P_vs_inactive_P_0_test_")
    assert main(["evaluate", "--task", task, "--root", data_root,
                 "--cache-dir", cache, "--cell", "K562",
                 "--checkpoint", ck]) == 0
    ev = json.loads(capsys.readouterr().out)
    assert 0.0 <= ev["AUPRC"] <= 1.0 and "AUROC" in ev


@requires_pandas
def test_cli_parity(tmp_path, capsys, monkeypatch):
    import shutil

    shutil.copy(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE.md"), tmp_path / "BASELINE.md")
    (tmp_path / "r.json").write_text(json.dumps(
        {"K562": {"active_P_vs_inactive_P": {
            "FFNN": {"average_CV_AUPRC": 0.40}}}}))
    monkeypatch.chdir(tmp_path)
    assert main(["parity", "--results", "r.json"]) == 0
    out = capsys.readouterr().out
    assert "K562" in out and "0.3419" in out
