import numpy as np

from embracenet_tpu.data import codec


def test_encode_decode_roundtrip(rng):
    seqs = ["acgt" * 64, "tttt" * 64]
    codes = codec.encode_sequences(seqs, rng)
    assert codes.shape == (2, 256)
    assert codes.dtype == np.uint8
    assert codec.decode_sequences(codes) == seqs


def test_unknown_base_random_fill():
    codes = codec.encode_sequences(["n" * 256], rng=42)
    assert codes.shape == (1, 256)
    assert set(np.unique(codes)) <= {0, 1, 2, 3}


def test_uppercase_handled():
    a = codec.encode_sequences(["ACGT" * 64])
    b = codec.encode_sequences(["acgt" * 64])
    np.testing.assert_array_equal(a, b)


def test_complement_matches_reference_semantics():
    # reference reverse_strand complements WITHOUT reversing order
    # (data_pipe/utils.py:327-339)
    assert codec.complement_strand("acgtn") == "tgcan"
    codes = codec.encode_sequences(["acgt"])
    np.testing.assert_array_equal(
        codec.complement_codes(codes),
        codec.encode_sequences(["tgca"]))


def test_one_hot_layout_matches_reference():
    # reference one-hot channel order is alphabetical a,c,g,t with output
    # transposed to [4, L] (data_pipe/utils.py:268-276)
    codes = codec.encode_sequences(["acgt"])
    oh = np.asarray(codec.one_hot(codes))
    assert oh.shape == (1, 4, 4)
    np.testing.assert_array_equal(oh[0], np.eye(4, dtype=np.float32))
