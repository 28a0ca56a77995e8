"""Native C++ runtime accelerator tests (skip without a toolchain)."""

import numpy as np
import pytest

from embracenet_tpu import runtime
from embracenet_tpu.data import codec

native = pytest.mark.skipif(not runtime.available(),
                            reason="g++ unavailable / build failed")


@native
def test_native_encode_matches_numpy_on_known_bases():
    seqs = ["acgt" * 64, "ACGT" * 64, "ttaa" * 64]
    got = runtime.encode_sequences_native(seqs, seed=7)
    want = codec.encode_sequences(seqs, rng=7, native=False)
    np.testing.assert_array_equal(got, want)


@native
def test_native_encode_fills_unknown_randomly():
    got = runtime.encode_sequences_native(["nxn?" * 64], seed=3)
    assert got.shape == (1, 256)
    assert set(np.unique(got)) <= {0, 1, 2, 3}


@native
def test_native_fasta_parse(tmp_path, rng):
    n = 50
    seqs = ["".join(rng.choice(list("acgt"), 256)) for _ in range(n)]
    path = tmp_path / "x.fa"
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(s + "\n")
            fh.write(f">chr1:{i * 300}-{i * 300 + 256}\n")
    codes, headers = runtime.parse_fasta_native(str(path), seq_len=256)
    assert codes.shape == (n, 256)
    np.testing.assert_array_equal(
        codes, codec.encode_sequences(seqs, native=False))
    assert headers[0] == ">chr1:0-256"
    assert headers[-1] == f">chr1:{(n - 1) * 300}-{(n - 1) * 300 + 256}"


@native
def test_native_fasta_length_mismatch_raises(tmp_path):
    path = tmp_path / "bad.fa"
    path.write_text("acgt\n>chr1:0-4\n")
    with pytest.raises(ValueError):
        runtime.parse_fasta_native(str(path), seq_len=256)


@native
def test_native_knn_matches_numpy(rng):
    x = rng.normal(size=(40, 6))
    k = 5
    got = runtime.knn_native(x, x, k, self_exclude=True)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.argsort(d2, axis=1)[:, :k]
    # same neighbour SETS (ordering may differ on exact ties)
    for q in range(40):
        assert set(got[q]) == set(want[q])


@native


def _pandas_usable():
    import subprocess
    import sys

    return subprocess.run(
        [sys.executable, "-c", "import pandas; pandas.DataFrame({'a': [1]})"],
        capture_output=True, timeout=120).returncode == 0


requires_pandas = pytest.mark.skipif(not _pandas_usable(),
                                     reason="pandas unavailable")

@requires_pandas
def test_native_read_fasta_via_io(tmp_path, rng):
    from embracenet_tpu.data.io import read_fasta

    seqs = ["".join(rng.choice(list("acgt"), 256)) for _ in range(10)]
    path = tmp_path / "y.fa"
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(s + "\n>chrX:%d-%d\n" % (i, i + 256))
    codes, coords = read_fasta(str(path), seq_len=256)
    assert codes.shape == (10, 256)
    assert list(coords.columns) == ["chrom", "chromStart", "chromEnd"]
    assert coords.iloc[0]["chrom"] == "chrX"
