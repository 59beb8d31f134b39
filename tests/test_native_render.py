"""Native CSV renderer: byte-exact agreement with printf-style formatting.

The indiv_proba contract is 16-decimal fixed notation
(reference: m6anet/utils/inference_utils.py:62-67); the batch renderer uses
std::to_chars(fixed, 16), which must match %.16f digit for digit.
"""
import numpy as np
import pytest

from m6anet_tpu.native import get_lib, native_render_indiv_csv_batch


@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
def test_batch_renderer_matches_printf():
    rng = np.random.default_rng(7)
    counts = rng.integers(1, 40, 25).astype(np.int64)
    total = int(counts.sum())
    probs = rng.uniform(0, 1, total).astype(np.float32)
    probs[:6] = [0.0, 1.0, 1e-20, 0.9999999, 0.5, np.float32(1.0 / 3.0)]
    ids = rng.integers(0, 2**62, total)

    prefixes = [f"TX{i}.1,{i * 31},".encode() for i in range(len(counts))]
    off = np.concatenate([[0], np.cumsum([len(p) for p in prefixes])])
    out = native_render_indiv_csv_batch(b"".join(prefixes), off, counts, ids, probs)
    assert out is not None

    want = []
    row = 0
    for i, c in enumerate(counts):
        for _ in range(int(c)):
            want.append("TX%d.1,%d,%d,%.16f\n" % (i, i * 31, ids[row], float(probs[row])))
            row += 1
    assert out.decode() == "".join(want)


@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
def test_batch_renderer_rejects_non_int_ids():
    ids = np.array(["a_0", "b_1"])  # replicate-suffixed string ids
    assert (
        native_render_indiv_csv_batch(
            b"T,1,", np.array([0, 4]), np.array([2]), ids, np.zeros(2, np.float32)
        )
        is None
    )
