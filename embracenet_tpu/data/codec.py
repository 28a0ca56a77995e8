"""DNA sequence codec.

The reference encodes every 256-bp window per *sample, per epoch* in Python
(`BIOINF_tesi/data_pipe/utils.py:268-276` ``process_sequence`` and
`dataprepare.py:370-412` ``Dataset_Wrap.__getitem__``) — the slowest part of
its input path.  Here sequences are encoded **once** to ``uint8`` codes
``[N, 256]`` and one-hot is materialised on device as part of the jitted
compute graph, so the host never touches per-sample Python again.

Channel order parity: the reference fits ``OneHotEncoder`` on
``['t','g','c','a']`` whose sorted categories are ``['a','c','g','t']``
(`data_pipe/utils.py:270`), i.e. channels are alphabetical.  Codes here are
``a=0, c=1, g=2, t=3``; ``n`` (unknown base) is replaced by a uniformly random
base at encode time (`data_pipe/utils.py:272-274`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

BASE_ORDER = "acgt"
_A, _C, _G, _T = 0, 1, 2, 3

# Byte lookup table: ASCII -> code; 255 marks "n"/unknown (resolved randomly).
_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _b in enumerate(BASE_ORDER):
    _LUT[ord(_b)] = _i
    _LUT[ord(_b.upper())] = _i


def encode_sequences(seqs, rng: np.random.Generator | int = 0,
                     native: bool = True) -> np.ndarray:
    """Encode an iterable of equal-length DNA strings to uint8 codes [N, L].

    ``n`` bases are replaced with a random base (reference parity:
    `data_pipe/utils.py:272-274`).  Uses the native C++ codec
    (runtime/ioaccel.cpp) when available; the numpy fallback is identical
    except for the RNG stream filling unknown bases.
    """
    seqs = list(seqs)
    if not seqs:
        return np.zeros((0, 0), dtype=np.uint8)
    if native:
        from embracenet_tpu import runtime

        seed = rng if isinstance(rng, (int, np.integer)) else 0
        out = runtime.encode_sequences_native(seqs, seed=int(seed))
        if out is not None:
            return out
    if isinstance(rng, (int, np.integer)):
        rng = np.random.default_rng(int(rng))
    length = len(seqs[0])
    buf = np.frombuffer("".join(seqs).encode("ascii"), dtype=np.uint8)
    codes = _LUT[buf].reshape(len(seqs), length)
    unknown = codes == 255
    if unknown.any():
        codes[unknown] = rng.integers(0, 4, size=int(unknown.sum()), dtype=np.uint8)
    return codes


def decode_sequences(codes: np.ndarray) -> list[str]:
    """Inverse of :func:`encode_sequences` (codes must be in [0, 4))."""
    table = np.frombuffer(BASE_ORDER.encode(), dtype=np.uint8)
    return ["".join(map(chr, table[row])) for row in np.asarray(codes)]


def complement_codes(codes) -> np.ndarray:
    """Complement strand on codes: a<->t, c<->g, i.e. ``3 - code``.

    NOTE: the reference's ``reverse_strand`` (`data_pipe/utils.py:327-339`)
    only *complements*; it does NOT reverse base order.  We keep those exact
    semantics for parity.
    """
    codes = np.asarray(codes)
    return (3 - codes.astype(np.int16)).astype(codes.dtype)


_COMPLEMENT_TABLE = str.maketrans("acgtn", "tgcan")


def complement_strand(sequence: str) -> str:
    """String-level complement, ``n -> n`` (reference ``reverse_strand``)."""
    return sequence.lower().translate(_COMPLEMENT_TABLE)


def one_hot(codes, dtype=jnp.float32):
    """Device-side one-hot: uint8 codes [..., L] -> [..., 4, L].

    Output layout matches the reference's CNN input ``[B, 4, 256]``
    (`models/CNN_net.py:22`, `process_sequence` transpose).
    """
    import jax.nn

    return jnp.swapaxes(jax.nn.one_hot(codes, 4, dtype=dtype), -1, -2)
