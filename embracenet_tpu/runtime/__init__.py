"""Native runtime: ctypes bindings to the C++ IO/codec accelerator.

Built on first import with the system ``g++`` (cached as a shared library
next to the source); every entry point has a pure-numpy fallback so the
framework works without a toolchain.  Coverage of the native paths is in
``tests/test_runtime.py`` (skipped when no compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ioaccel.cpp")
_SO = os.path.join(_DIR, f"_ioaccel_{sys.implementation.cache_tag}.so")

_lib = None
_build_error: str | None = None


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as exc:  # no toolchain
        return str(exc)
    return proc.stderr if proc.returncode != 0 else None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    _build_error = _build()
    if _build_error is None:
        lib = ctypes.CDLL(_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        u64 = ctypes.c_uint64
        lib.enc_encode_sequences.argtypes = [u8p, i64, u8p, u64]
        lib.enc_complement.argtypes = [u8p, i64, u8p]
        lib.enc_parse_fasta.argtypes = [u8p, i64, i64, u8p, i64,
                                        ctypes.POINTER(i64), u64]
        lib.enc_parse_fasta.restype = i64
        lib.enc_knn.argtypes = [ctypes.POINTER(ctypes.c_double), i64,
                                ctypes.POINTER(ctypes.c_double), i64, i64,
                                i64, i64, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def encode_sequences_native(seqs: list[str], seed: int = 0) -> np.ndarray | None:
    """Native equivalent of data.codec.encode_sequences; None if unavailable."""
    lib = _load()
    if lib is None or not seqs:
        return None
    length = len(seqs[0])
    buf = np.frombuffer("".join(seqs).encode("ascii"), dtype=np.uint8)
    out = np.empty(buf.shape, np.uint8)
    lib.enc_encode_sequences(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_uint64(seed or 1))
    return out.reshape(len(seqs), length)


def parse_fasta_native(path: str, seq_len: int = 256, seed: int = 0):
    """-> (codes [N, seq_len] uint8, headers list[str]) or None."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = np.frombuffer(raw, dtype=np.uint8)
    max_rows = max(len(raw) // (seq_len + 2), 1)
    out = np.empty((max_rows, seq_len), np.uint8)
    offsets = np.empty(max_rows, np.int64)
    n = lib.enc_parse_fasta(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        seq_len, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_rows, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_uint64(seed or 1))
    if n < 0:
        raise ValueError(f"{path}: sequence length != {seq_len}")
    headers = []
    for off in offsets[:n]:
        end = raw.index(b"\n", off) if b"\n" in raw[off:] else len(raw)
        headers.append(raw[off:end].decode().strip())
    return out[:n].copy(), headers


def knn_native(ref: np.ndarray, query: np.ndarray, k: int,
               self_exclude: bool) -> np.ndarray | None:
    lib = _load()
    if lib is None or k > 64:
        return None
    ref = np.ascontiguousarray(ref, np.float64)
    query = np.ascontiguousarray(query, np.float64)
    out = np.empty((len(query), k), np.int32)
    lib.enc_knn(ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(ref),
                query.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(query), ref.shape[1], k, int(self_exclude),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
