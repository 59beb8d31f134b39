"""Per-read event aggregation: eventalign lines -> one feature row per position.

Behavior parity with the reference combiner
(reference: m6anet/utils/dataprep_utils.py:269-325): keep only successfully
aligned events (``reference_kmer == model_kmer``), aggregate events per
transcript position with sample-length weights, round the mean current to one
decimal, and shift positions by +2 to the 5-mer center — but implemented as a
direct bytes->numpy reducer (no pandas DataFrame per read slice).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# Aggregated per-read events: positions (center-shifted), 5-mers, and the
# (dwell_time, norm_std, norm_mean) feature triplet, position-sorted.
CombinedRead = Tuple[np.ndarray, np.ndarray, np.ndarray]


def combine_read(events_bytes: bytes) -> Optional[CombinedRead]:
    """Aggregate one read's eventalign byte-slice.

    Returns (positions, kmers, features(n,3)) with features ordered
    (dwell_time, norm_std, norm_mean) — the column order of the reference's
    positional recarray cast (reference: m6anet/utils/dataprep_utils.py:132-135)
    — or None when fewer than two positions survive (the reference drops
    those reads via its ``data.size > 1`` check,
    reference: m6anet/utils/dataprep_utils.py:384).
    """
    positions = []
    means = []
    stdvs = []
    lengths = []
    samples = []
    kmers = []
    for line in events_bytes.split(b"\n"):
        if not line:
            continue
        f = line.split(b"\t")
        # columns: contig, position, reference_kmer, read_index, strand,
        # event_index, event_level_mean, event_stdv, event_length, model_kmer,
        # model_mean, model_stdv, standardized_level, start_idx, end_idx
        if f[2] != f[9]:  # reference_kmer == model_kmer filter
            continue
        positions.append(int(f[1]))
        kmers.append(f[2])
        means.append(float(f[6]))
        stdvs.append(float(f[7]))
        lengths.append(float(f[8]))
        samples.append(int(f[14]) - int(f[13]))

    if not positions:
        return None

    pos = np.asarray(positions, dtype=np.int64)
    w = np.asarray(samples, dtype=np.float64)  # per-event sample count weight
    mean = np.asarray(means, dtype=np.float64)
    stdv = np.asarray(stdvs, dtype=np.float64)
    dwell = np.asarray(lengths, dtype=np.float64)

    uniq, inverse = np.unique(pos, return_inverse=True)
    n = len(uniq)
    if n <= 1:
        return None

    w_sum = np.bincount(inverse, weights=w, minlength=n)
    norm_mean = np.round(np.bincount(inverse, weights=mean * w, minlength=n) / w_sum, 1)
    norm_std = np.bincount(inverse, weights=stdv * w, minlength=n) / w_sum
    dwell_time = np.bincount(inverse, weights=dwell * w, minlength=n) / w_sum

    # first occurrence of each position supplies the 5-mer
    first_idx = np.full(n, len(pos), dtype=np.int64)
    np.minimum.at(first_idx, inverse, np.arange(len(pos)))
    kmer_arr = np.asarray(kmers, dtype="S5")[first_idx]

    features = np.stack([dwell_time, norm_std, norm_mean], axis=1)
    return uniq + 2, kmer_arr, features
