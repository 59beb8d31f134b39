"""Property/fuzz test: native eventalign parser == numpy fallback.

Feeds adversarial eventalign byte-slices (truncated fields, malformed
numerics, NaN/inf, over/underflow, >15 columns, \\r\\n endings, binary junk)
through both the native core (eventalign_parser.cpp: ea_combine_batch /
ea_featurize_batch) and the pure-Python fallbacks
(dataprep/combine.py::combine_read + dataprep/windowing.py::window_read) and
asserts identical accept/reject decisions and bit-identical aggregates.

The shared policy (documented in both implementations): a line is used iff it
has >= 15 tab-separated fields, reference_kmer == model_kmer, and every
numeric field parses strictly (whole field, no '+', no whitespace or
underscores, no int64/double overflow); otherwise the line is skipped.
"""
from __future__ import annotations

import numpy as np
import pytest

from m6anet_tpu.dataprep.combine import combine_read
from m6anet_tpu.dataprep.windowing import window_read
from m6anet_tpu.native import (
    get_lib,
    native_combine_batch,
    native_featurize_batch,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native core unavailable")

KMERS = [b"GGACT", b"AAACA", b"TGACC", b"CCCCC", b"GGGGG", b"AGACT"]

# strings that must be REJECTED identically by both numeric parsers
BAD_NUMERIC = [
    b"", b" ", b"+5", b" 5", b"5 ", b"1_0", b"0x10", b"abc", b"--3", b"1.2.3",
    b"12.3abc", b"5e", b"e5", b".", b"-", b"1e999", b"-1e999", b"1e-999",
    b"\xff\xfe", b"12\x00", b"NaN_", b"Infinity!", b"5\t",  # tab splits -> short field
]
# strings both parsers must ACCEPT (for float fields)
GOOD_FLOAT = [b"1.5", b"-0.25", b"103.7", b".5", b"5.", b"2e3", b"-1.5E-2",
              b"nan", b"NAN", b"inf", b"-inf", b"Infinity", b"0", b"-0.0", b"0e999"]
GOOD_INT = [b"0", b"7", b"123", b"-5", b"004", b"9223372036854775807"]
BAD_INT = [b"", b"+7", b"3.0", b"3e1", b"9223372036854775808", b" 7", b"7 ",
           b"1_0", b"abc", b"--1", b"-"]


def _line(rng, pos=None, kmer=None, mean=None, stdv=None, length=None,
          s13=None, s14=None, n_fields=15, mismatch=False, crlf=False):
    """Assemble one eventalign line, injecting adversarial fields."""
    pos = str(rng.integers(0, 40)).encode() if pos is None else pos
    kmer = KMERS[rng.integers(len(KMERS))] if kmer is None else kmer
    model = kmer + b"X" if mismatch else kmer
    mean = f"{rng.uniform(60, 140):.2f}".encode() if mean is None else mean
    stdv = f"{rng.uniform(0.5, 5):.3f}".encode() if stdv is None else stdv
    length = f"{rng.uniform(0.001, 0.05):.5f}".encode() if length is None else length
    if s13 is None:
        a = int(rng.integers(0, 10000))
        s13, s14 = str(a).encode(), str(a + int(rng.integers(1, 30))).encode()
    fields = [
        b"tx1", pos, kmer, b"0", b"t", b"12", mean, stdv, length, model,
        b"103.2", b"2.1", b"0.0", s13, s14,
    ]
    fields = fields[:n_fields]
    while len(fields) < n_fields:  # n_fields > 15 appends extra columns
        fields.append(b"extra")
    out = b"\t".join(fields)
    return out + (b"\r\n" if crlf else b"\n")


def _adversarial_read(rng) -> bytes:
    """One read's byte-slice: a mix of valid, malformed and hostile lines."""
    lines = []
    n = int(rng.integers(5, 60))
    # seed consecutive positions so windows can form
    base = int(rng.integers(0, 20))
    for i in range(n):
        kind = rng.random()
        if kind < 0.45:  # valid line, sometimes on a consecutive-position run
            pos = str(base + int(rng.integers(0, 8))).encode()
            lines.append(_line(rng, pos=pos, crlf=bool(rng.random() < 0.2)))
        elif kind < 0.55:  # duplicate position, different kmer (first wins)
            pos = str(base + int(rng.integers(0, 8))).encode()
            lines.append(_line(rng, pos=pos))
        elif kind < 0.65:  # kmer mismatch filter
            lines.append(_line(rng, mismatch=True))
        elif kind < 0.75:  # truncated / extended column counts
            lines.append(_line(rng, n_fields=int(rng.integers(0, 20))))
        elif kind < 0.93:  # malformed numerics in each numeric slot
            slot = int(rng.integers(0, 6))
            bad = BAD_NUMERIC[int(rng.integers(len(BAD_NUMERIC)))]
            kw = {}
            if slot == 0:
                kw["pos"] = BAD_INT[int(rng.integers(len(BAD_INT)))]
            elif slot == 1:
                kw["mean"] = bad
            elif slot == 2:
                kw["stdv"] = bad
            elif slot == 3:
                kw["length"] = bad
            elif slot == 4:
                kw["s13"] = BAD_INT[int(rng.integers(len(BAD_INT)))]
                kw["s14"] = b"10"
            else:
                kw["s13"] = b"1"
                kw["s14"] = BAD_INT[int(rng.integers(len(BAD_INT)))]
            lines.append(_line(rng, **kw))
        elif kind < 0.97:  # valid exotic-but-accepted numerics
            lines.append(_line(
                rng,
                mean=GOOD_FLOAT[int(rng.integers(len(GOOD_FLOAT)))],
                stdv=GOOD_FLOAT[int(rng.integers(len(GOOD_FLOAT)))],
                s13=GOOD_INT[int(rng.integers(len(GOOD_INT) - 1))],  # keep s14-s13 sane
                s14=b"99",
            ))
        else:  # raw junk
            junk = bytes(rng.integers(1, 255, size=int(rng.integers(0, 40))).astype(np.uint8))
            lines.append(junk.replace(b"\n", b"_") + b"\n")
    if rng.random() < 0.1 and lines:
        lines[-1] = lines[-1].rstrip(b"\n")  # no trailing newline
    return b"".join(lines)


def _write_corpus(tmp_path, seed, n_reads=40):
    rng = np.random.default_rng(seed)
    slices = [_adversarial_read(rng) for _ in range(n_reads)]
    path = tmp_path / f"fuzz_{seed}.txt"
    blob = b"".join(slices)
    path.write_bytes(blob)
    bounds = np.cumsum([0] + [len(s) for s in slices])
    return str(path), slices, bounds[:-1].astype(np.int64), bounds[1:].astype(np.int64)


def _assert_equal(a, b, what):
    assert a.shape == b.shape, f"{what}: shape {a.shape} vs {b.shape}"
    if a.dtype.kind == "f":
        assert np.array_equal(a, b, equal_nan=True), f"{what}: values differ"
    else:
        assert np.array_equal(a, b), f"{what}: values differ"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_combine_native_matches_python(tmp_path, seed):
    path, slices, starts, ends = _write_corpus(tmp_path, seed)
    res = native_combine_batch(path, starts, ends)
    assert res is not None
    pos, kmers, feats, bounds = res
    for r, blob in enumerate(slices):
        lo, hi = int(bounds[r]), int(bounds[r + 1])
        py = combine_read(blob)
        if py is None:
            # python gates out <2-position reads; native emits the raw rows
            assert hi - lo <= 1, f"read {r}: python rejected, native kept {hi - lo}"
            continue
        py_pos, py_kmer, py_feat = py
        _assert_equal(pos[lo:hi], py_pos, f"read {r} positions")
        _assert_equal(kmers[lo:hi], py_kmer, f"read {r} kmers")
        _assert_equal(feats[lo:hi], py_feat, f"read {r} features")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_featurize_native_matches_python(tmp_path, seed):
    w = 1
    path, slices, starts, ends = _write_corpus(tmp_path, seed)
    res = native_featurize_batch(path, starts, ends, w)
    assert res is not None
    pos, seqs, feats, bounds, npos = res
    for r, blob in enumerate(slices):
        lo, hi = int(bounds[r]), int(bounds[r + 1])
        py = combine_read(blob)
        if py is None:
            assert npos[r] <= 1, f"read {r}: python rejected, native npos={npos[r]}"
            assert hi == lo
            continue
        assert npos[r] == len(py[0]), f"read {r}: aggregated position count"
        pyw = window_read(py, w)
        if pyw is None:
            assert hi == lo, f"read {r}: python found no windows, native {hi - lo}"
            continue
        py_pos, py_seq, py_feat = pyw
        _assert_equal(pos[lo:hi], py_pos, f"read {r} window positions")
        _assert_equal(seqs[lo:hi], py_seq, f"read {r} window contexts")
        _assert_equal(feats[lo:hi], py_feat, f"read {r} window features")
