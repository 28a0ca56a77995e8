"""Raw data ingestion: per-cell-line CSV (epigenomic features), BED (labels),
FASTA (256-bp windows).

Layout parity with `BIOINF_tesi/data_pipe/dataload.py:35-110`
(``Load_Create_Task.data_loader``/``load``): a directory with ``enhancers/``
and ``promoters/`` subdirs, each holding ``<cell-line>.csv`` files (feature
matrix with ``chrom, chromStart, chromEnd, strand`` info columns), one
``*.bed`` (tab-separated; one 0/1 column per cell line) and one ``*.fa``
(alternating ``>chrom:start-end`` header and sequence lines — note the
reference treats even lines as sequence, odd as header, i.e. sequence first).

Output is array-first: sequences are encoded once to uint8 codes here.
"""

from __future__ import annotations

import dataclasses
import os
import re

import numpy as np

from embracenet_tpu.data.codec import encode_sequences


def _pd():
    """Lazy pandas import: ingestion is the only layer that needs it, so the
    rest of the framework imports (and trains) without pandas installed."""
    import pandas as pd
    return pd

INFO_COLUMNS = ("chrom", "chromStart", "chromEnd", "strand")


@dataclasses.dataclass
class RegionSet:
    """One region family (enhancers or promoters) for all cell lines."""
    features: dict          # cell -> np.ndarray [N, D] float64
    feature_names: dict     # cell -> list[str]
    labels: dict            # cell -> np.ndarray [N] int64
    codes: np.ndarray       # [N, 256] uint8 DNA codes (shared across cells)
    coords: pd.DataFrame    # chrom/chromStart/chromEnd per row


def read_fasta(path: str, seq_rng=0, seq_len: int | None = None
               ) -> tuple[np.ndarray, pd.DataFrame]:
    """Parse the reference's .fa layout -> (codes [N, L] uint8, coords df).

    Uses the native C++ parser (runtime/ioaccel.cpp) when the sequence
    length is fixed and known; falls back to the Python line parser.
    """
    if seq_len is not None:
        from embracenet_tpu import runtime

        parsed = runtime.parse_fasta_native(path, seq_len=seq_len,
                                            seed=int(seq_rng)
                                            if isinstance(seq_rng, int) else 0)
        if parsed is not None:
            codes, headers = parsed
            coords = _pd().DataFrame(
                [re.split("[>:-]", h)[1:4] for h in headers],
                columns=["chrom", "chromStart", "chromEnd"])
            return codes, coords
    seqs, headers = [], []
    with open(path) as fh:
        for i, line in enumerate(fh):
            (seqs if i % 2 == 0 else headers).append(line.strip())
    coords = _pd().DataFrame(
        [re.split("[>:-]", h)[1:4] for h in headers],
        columns=["chrom", "chromStart", "chromEnd"])
    return encode_sequences(seqs, seq_rng), coords


def read_bed(path: str) -> pd.DataFrame:
    return _pd().read_csv(path, sep="\t")


def read_features_csv(path: str) -> tuple[np.ndarray, list, pd.DataFrame]:
    """-> (feature matrix, feature names, info columns df)."""
    df = _pd().read_csv(path)
    info = df[[c for c in INFO_COLUMNS if c in df.columns]]
    feats = df.drop(columns=[c for c in INFO_COLUMNS if c in df.columns])
    return feats.to_numpy(np.float64), list(feats.columns), info


def _cell_name_from_path(path: str) -> str:
    name = os.path.splitext(os.path.basename(path))[0]
    return re.sub("-", "", name).upper()


def load_region_dir(directory: str, seq_rng=0) -> RegionSet:
    """Load one of ``data/enhancers`` / ``data/promoters``."""
    features, names, labels = {}, {}, {}
    codes, coords, bed = None, None, None
    for fname in sorted(os.listdir(directory)):
        path = os.path.join(directory, fname)
        if fname.endswith(".csv"):
            cell = _cell_name_from_path(path)
            features[cell], names[cell], _ = read_features_csv(path)
        elif fname.endswith(".bed"):
            bed = read_bed(path)
        elif fname.endswith(".fa"):
            codes, coords = read_fasta(path, seq_rng)
    if bed is not None:
        for cell in features:
            if cell in bed.columns:
                labels[cell] = bed[cell].to_numpy(np.int64)
    return RegionSet(features=features, feature_names=names, labels=labels,
                     codes=codes, coords=coords)


def load_dataset(root: str = "data", seq_rng=0) -> dict:
    """-> {"enhancers": RegionSet, "promoters": RegionSet}
    (reference ``Load_Create_Task.load``, `dataload.py:78-110`)."""
    return {
        "enhancers": load_region_dir(os.path.join(root, "enhancers"), seq_rng),
        "promoters": load_region_dir(os.path.join(root, "promoters"), seq_rng),
    }
