"""ctypes bindings for the native eventalign parsing core.

The shared library is compiled on first use (g++ -O3, ~1 s) and cached next
to the source; every entry point has a pure-numpy fallback, so the framework
works without a toolchain — just slower on the parsing hot path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "eventalign_parser.cpp")
_LIB = os.path.join(_DIR, "_libm6a_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_scratch = threading.local()  # per-thread reusable output buffers


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        stale = not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        if stale and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.ea_index.restype = ctypes.c_longlong
        lib.ea_index.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.ea_combine_batch.restype = ctypes.c_longlong
        lib.ea_combine_batch.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.ea_featurize_batch.restype = ctypes.c_longlong
        lib.ea_featurize_batch.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def native_index(eventalign_path: str, out_path: str) -> bool:
    """Native byte-range indexer; False => caller should use the Python path
    (missing toolchain, or gzipped input)."""
    if eventalign_path.endswith(".gz"):
        return False
    lib = get_lib()
    if lib is None:
        return False
    rows = lib.ea_index(eventalign_path.encode(), out_path.encode())
    return rows >= 0


def native_combine_batch(
    eventalign_path: str,
    starts: np.ndarray,
    ends: np.ndarray,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Parse+aggregate a transcript's read byte-slices natively.

    Returns (positions, kmers(S5), features(n,3), read_bounds(n_reads+1)) or
    None when the native path is unavailable.
    """
    if eventalign_path.endswith(".gz"):
        return None
    lib = get_lib()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    n = len(starts)
    # min well-formed eventalign line is > 30 bytes; pad for safety
    cap = int((ends - starts).sum() // 30 + n + 16)
    out_pos = np.empty(cap, np.int64)
    out_kmer = np.empty(cap * 5, np.uint8)
    out_feat = np.empty(cap * 3, np.float64)
    out_bounds = np.empty(n + 1, np.int64)
    total = lib.ea_combine_batch(
        eventalign_path.encode(), starts, ends, n, out_pos, out_kmer, out_feat, out_bounds, cap
    )
    if total < 0:
        return None
    return (
        out_pos[:total].copy(),
        out_kmer[: total * 5].view("S5").copy(),
        out_feat[: total * 3].reshape(-1, 3)[:total].copy(),
        out_bounds.copy(),
    )


_MOTIF_BUF = None


def _motif_buffer() -> np.ndarray:
    global _MOTIF_BUF
    if _MOTIF_BUF is None:
        from ..constants import M6A_KMERS

        _MOTIF_BUF = np.frombuffer("".join(M6A_KMERS).encode(), dtype=np.uint8).copy()
    return _MOTIF_BUF


def native_featurize_batch(
    eventalign_path: str,
    starts: np.ndarray,
    ends: np.ndarray,
    window_size: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Fused parse+aggregate+window+DRACH-filter for a transcript's reads.

    Returns (center_positions, sequence contexts S(5+2w), window features
    (n, 3*(2w+1)), window bounds per read (n_reads+1), aggregated position
    counts per read (n_reads,)) or None when unavailable.
    """
    if eventalign_path.endswith(".gz"):
        return None
    lib = get_lib()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    n = len(starts)
    motifs = _motif_buffer()
    seq_len = 5 + 2 * window_size
    width = 2 * window_size + 1
    cap = int((ends - starts).sum() // 30 + n + 16)
    out_pos = np.empty(cap, np.int64)
    out_seq = np.empty(cap * seq_len, np.uint8)
    out_feat = np.empty(cap * 3 * width, np.float64)
    out_bounds = np.empty(n + 1, np.int64)
    out_npos = np.empty(n, np.int64)
    total = lib.ea_featurize_batch(
        eventalign_path.encode(), starts, ends, n, motifs, len(motifs) // 5,
        window_size, out_pos, out_seq, out_feat, out_bounds, out_npos, cap,
    )
    if total < 0:
        return None
    return (
        out_pos[:total].copy(),
        out_seq[: total * seq_len].view(f"S{seq_len}").copy(),
        out_feat[: total * 3 * width].reshape(-1, 3 * width)[:total].copy(),
        out_bounds.copy(),
        out_npos.copy(),
    )


def native_process_transcript(
    eventalign_path: str,
    tx_id: str,
    read_slices,  # [(read_index, start, end), ...]
    window_size: int,
    min_segment_count: int,
    compress: bool,
    emit_json: bool,
):
    """Whole-transcript featurization in native code.

    Returns (site_pos, site_seq (S(5+2w)), site_nreads, features (n, 3*(2w+1))
    float64 in site-major read order, read_ids (n,), json_lines list[bytes] or
    None) — or None when the native path is unavailable.
    """
    if eventalign_path.endswith(".gz"):
        return None
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "ea_process_transcript"):
        return None
    import ctypes

    if not hasattr(lib, "_process_configured"):
        # Raw-pointer signature (c_void_p + array.ctypes.data): this wrapper
        # is called once per transcript and ndpointer's per-argument
        # validation measurably dominates on many-small-transcript inputs.
        # All arrays passed below are freshly allocated C-contiguous with the
        # exact dtypes the C side expects.
        lib.ea_process_transcript.restype = ctypes.c_longlong
        lib.ea_process_transcript.argtypes = (
            [ctypes.c_char_p, ctypes.c_char_p]
            + [ctypes.c_void_p] * 3
            + [ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
               ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
            + [ctypes.c_void_p] * 5
            + [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
               ctypes.c_int64, ctypes.c_int64]
        )
        lib._process_configured = True

    if (
        isinstance(read_slices, tuple)
        and len(read_slices) == 3
        and all(isinstance(a, np.ndarray) for a in read_slices)
    ):
        read_idx, starts, ends = (
            np.ascontiguousarray(a, dtype=np.int64) for a in read_slices
        )
    else:
        starts = np.array([s for _, s, _ in read_slices], dtype=np.int64)
        ends = np.array([e for _, _, e in read_slices], dtype=np.int64)
        read_idx = np.array([r for r, _, _ in read_slices], dtype=np.int64)
    n = len(starts)
    motifs = _motif_buffer()
    seq_len = 5 + 2 * window_size
    nfeat = 3 * (2 * window_size + 1)
    cap_windows = int((ends - starts).sum() // 30 + n + 16)
    cap_sites = cap_windows + 1
    json_cap = (cap_windows * 26 * (nfeat + 1) + cap_sites * (seq_len + 64)) if emit_json else 1

    # Per-thread reusable scratch (outputs are copied before return, so the
    # buffers can be handed straight back to the next call on this thread).
    sc = getattr(_scratch, "bufs", None)
    if sc is None or sc["cap_windows"] < cap_windows or sc["seq_len"] != seq_len or sc["json_cap"] < json_cap:
        grow_w = max(cap_windows, 0 if sc is None else sc["cap_windows"])
        grow_j = max(json_cap, 0 if sc is None else sc["json_cap"])
        sc = {
            "cap_windows": grow_w,
            "seq_len": seq_len,
            "json_cap": grow_j,
            "site_pos": np.empty(grow_w + 1, np.int64),
            "site_seq": np.empty((grow_w + 1) * seq_len, np.uint8),
            "site_nreads": np.empty(grow_w + 1, np.int64),
            "feat_out": np.empty(grow_w * nfeat, np.float64),
            "read_out": np.empty(grow_w, np.int64),
            "json_buf": np.empty(grow_j, np.uint8),
            "json_len": np.empty(grow_w + 1, np.int64),
        }
        _scratch.bufs = sc
    site_pos = sc["site_pos"]
    site_seq = sc["site_seq"]
    site_nreads = sc["site_nreads"]
    feat_out = sc["feat_out"]
    read_out = sc["read_out"]
    json_buf = sc["json_buf"]
    json_len = sc["json_len"]
    cap_sites = sc["cap_windows"] + 1
    cap_windows = sc["cap_windows"]
    json_cap = sc["json_cap"]

    n_sites = lib.ea_process_transcript(
        eventalign_path.encode(), tx_id.encode(),
        starts.ctypes.data, ends.ctypes.data, read_idx.ctypes.data, n,
        motifs.ctypes.data, len(motifs) // 5, window_size, min_segment_count,
        1 if compress else 0, 1 if emit_json else 0,
        site_pos.ctypes.data, site_seq.ctypes.data, site_nreads.ctypes.data,
        feat_out.ctypes.data, read_out.ctypes.data,
        json_buf.ctypes.data, json_cap, json_len.ctypes.data, cap_sites, cap_windows,
    )
    if n_sites < 0:
        return None
    n_sites = int(n_sites)
    total_rows = int(site_nreads[:n_sites].sum()) if n_sites else 0
    json_lines = None
    if emit_json:
        lens = json_len[:n_sites]
        raw = json_buf[: int(lens.sum())].tobytes()
        json_lines = []
        off = 0
        for ln in lens.tolist():
            json_lines.append(raw[off : off + ln])
            off += ln
    return (
        site_pos[:n_sites].copy(),
        site_seq[: n_sites * seq_len].view(f"S{seq_len}").copy(),
        site_nreads[:n_sites].copy(),
        feat_out[: total_rows * nfeat].reshape(-1, nfeat).copy(),
        read_out[:total_rows].copy(),
        json_lines,
    )


def native_parse_site_json(raw: bytes, n_cols: int):
    """Parse one data.json site line natively.

    Returns (kmer str, features (rows, n_cols) float64) or None when the
    native library is unavailable (caller falls back to json.loads).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "ea_parse_site_json"):
        return None
    import ctypes

    if not hasattr(lib, "_parse_configured"):
        lib.ea_parse_site_json.restype = ctypes.c_longlong
        lib.ea_parse_site_json.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib._parse_configured = True

    # rows are >= ~10 bytes each; generous cap
    cap_rows = len(raw) // (2 * n_cols) + 4
    out = np.empty((cap_rows, n_cols), np.float64)
    kmer_buf = ctypes.create_string_buffer(32)
    rows = lib.ea_parse_site_json(raw, len(raw), out, cap_rows, n_cols, kmer_buf, 32)
    if rows < 0:
        return None
    return kmer_buf.value.decode(), out[: int(rows)].copy()


def native_render_indiv_csv(prefix: bytes, read_ids: np.ndarray, probs: np.ndarray):
    """Render one site's indiv-probability CSV rows natively.

    Returns bytes, or None when unavailable (string read ids, no library).
    """
    if read_ids.dtype != np.int64:
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "ea_render_indiv_csv"):
        return None
    import ctypes

    if not hasattr(lib, "_render_configured"):
        lib.ea_render_indiv_csv.restype = ctypes.c_longlong
        lib.ea_render_indiv_csv.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib._render_configured = True
    n = len(read_ids)
    cap = (len(prefix) + 64) * n + 16
    buf = ctypes.create_string_buffer(cap)
    written = lib.ea_render_indiv_csv(
        prefix, len(prefix),
        np.ascontiguousarray(read_ids),
        np.ascontiguousarray(probs, dtype=np.float32),
        n, buf, cap,
    )
    if written < 0:
        return None
    return buf.raw[: int(written)]


def native_render_indiv_csv_batch(
    prefixes: bytes,
    prefix_off: np.ndarray,
    site_counts: np.ndarray,
    read_ids: np.ndarray,
    probs: np.ndarray,
):
    """Render a whole batch of sites' indiv-probability CSV rows in one call.

    ``prefixes``/``prefix_off`` hold each site's "tx,pos," prefix
    (concatenated bytes + n_sites+1 int64 offsets); ``site_counts`` the reads
    per site; ``read_ids``/``probs`` the flat per-read arrays.  Returns bytes
    or None when unavailable.
    """
    if read_ids.dtype != np.int64:
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "ea_render_indiv_csv_batch"):
        return None
    import ctypes

    if not hasattr(lib, "_render_batch_configured"):
        lib.ea_render_indiv_csv_batch.restype = ctypes.c_longlong
        lib.ea_render_indiv_csv_batch.argtypes = (
            [ctypes.c_char_p] + [ctypes.c_void_p] * 2 + [ctypes.c_int64]
            + [ctypes.c_void_p] * 3 + [ctypes.c_int64]
        )
        lib._render_batch_configured = True

    prefix_off = np.ascontiguousarray(prefix_off, dtype=np.int64)
    site_counts = np.ascontiguousarray(site_counts, dtype=np.int64)
    read_ids = np.ascontiguousarray(read_ids)
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    n_sites = len(site_counts)
    max_prefix = int(np.diff(prefix_off).max()) if n_sites else 0
    cap = (max_prefix + 64) * len(read_ids) + 16

    buf = getattr(_scratch, "csv_buf", None)
    if buf is None or len(buf) < cap:
        buf = np.empty(max(cap, 1 << 20), np.uint8)
        _scratch.csv_buf = buf
    written = lib.ea_render_indiv_csv_batch(
        prefixes, prefix_off.ctypes.data, site_counts.ctypes.data, n_sites,
        read_ids.ctypes.data, probs.ctypes.data, buf.ctypes.data, len(buf),
    )
    if written < 0:
        return None
    return buf[: int(written)].tobytes()


def native_load_index(index_path: str):
    """Parse eventalign.index natively: one pass, transcript ids factorized
    to first-appearance codes (no per-row Python strings).

    Returns (codes int32, read_idx int64, pos_start int64, pos_end int64,
    names list[str]) or None when unavailable.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "ea_load_index"):
        return None
    import ctypes

    if not hasattr(lib, "_load_index_configured"):
        lib.ea_load_index.restype = ctypes.c_longlong
        lib.ea_load_index.argtypes = (
            [ctypes.c_char_p] + [ctypes.c_void_p] * 4 + [ctypes.c_int64]
            + [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        )
        lib._load_index_configured = True

    fsize = os.path.getsize(index_path)
    # size by upper bound (min well-formed row is 8 bytes) instead of a
    # counting pre-pass; exact-size copies are taken below so the big
    # buffers are released immediately
    cap_rows = fsize // 8 + 2
    codes = np.empty(cap_rows, np.int32)
    read_idx = np.empty(cap_rows, np.int64)
    pos_start = np.empty(cap_rows, np.int64)
    pos_end = np.empty(cap_rows, np.int64)
    name_buf = np.empty(fsize + 1, np.uint8)
    meta = np.zeros(2, np.int64)  # [n_uniq, name_bytes]
    rows = lib.ea_load_index(
        index_path.encode(), codes.ctypes.data, read_idx.ctypes.data,
        pos_start.ctypes.data, pos_end.ctypes.data, cap_rows,
        name_buf.ctypes.data, len(name_buf), meta.ctypes.data,
    )
    if rows < 0:
        return None
    rows = int(rows)
    names = name_buf[: int(meta[1])].tobytes().decode().split("\n")[: int(meta[0])]
    return (
        codes[:rows].copy(),
        read_idx[:rows].copy(),
        pos_start[:rows].copy(),
        pos_end[:rows].copy(),
        names,
    )


def native_process_transcripts(
    eventalign_path: str,
    tx_names,  # list[str]
    tx_bounds: np.ndarray,  # int64[n_tx+1] prefix into the read arrays
    read_idx: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    window_size: int,
    min_segment_count: int,
    compress: bool,
    emit_json: bool,
):
    """Batched whole-transcript featurization: many transcripts, ONE native
    call (the per-call crossing dominates on many-small-transcript inputs).

    Returns (tx_site_counts int64[n_tx], site_pos, site_seq S(5+2w),
    site_nreads, features (rows, 3*(2w+1)) float64, read_ids, json_lines
    list[bytes] | None) — concatenated in transcript order — or None when
    the native path is unavailable.
    """
    if eventalign_path.endswith(".gz"):
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "ea_process_transcripts"):
        return None
    import ctypes

    if not hasattr(lib, "_process_batch_configured"):
        lib.ea_process_transcripts.restype = ctypes.c_longlong
        lib.ea_process_transcripts.argtypes = (
            [ctypes.c_char_p] + [ctypes.c_void_p] * 6 + [ctypes.c_int64]
            + [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
               ctypes.c_int32, ctypes.c_int32]
            + [ctypes.c_void_p] * 6
            + [ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        )
        lib._process_batch_configured = True

    tx_bounds = np.ascontiguousarray(tx_bounds, dtype=np.int64)
    read_idx = np.ascontiguousarray(read_idx, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    n_tx = len(tx_names)
    names_blob = "".join(tx_names).encode()
    name_off = np.zeros(n_tx + 1, np.int64)
    np.cumsum([len(n.encode()) for n in tx_names], out=name_off[1:])
    motifs = _motif_buffer()
    seq_len = 5 + 2 * window_size
    nfeat = 3 * (2 * window_size + 1)
    cap_windows = int((ends - starts).sum() // 30) + len(starts) + 16 * n_tx
    cap_sites = cap_windows + n_tx
    json_cap = (cap_windows * 26 * (nfeat + 1) + cap_sites * (seq_len + 64)) if emit_json else 1

    sc = getattr(_scratch, "batch_bufs", None)
    # release oversized scratch: buffers grow to the largest chunk seen, and
    # json_buf alone is ~100 MB per worker thread at the 8 MB chunk size —
    # rebuild when the current need is a small fraction of what is held
    if sc is not None and sc["json_cap"] > (256 << 20) and json_cap < sc["json_cap"] // 4:
        sc = None
    if sc is None or sc["cap_windows"] < cap_windows or sc["seq_len"] != seq_len or sc["json_cap"] < json_cap or sc["cap_sites"] < cap_sites:
        grow_w = max(cap_windows, 0 if sc is None else sc["cap_windows"])
        grow_s = max(cap_sites, 0 if sc is None else sc["cap_sites"])
        grow_j = max(json_cap, 0 if sc is None else sc["json_cap"])
        sc = {
            "cap_windows": grow_w,
            "cap_sites": grow_s,
            "seq_len": seq_len,
            "json_cap": grow_j,
            "site_pos": np.empty(grow_s, np.int64),
            "site_seq": np.empty(grow_s * seq_len, np.uint8),
            "site_nreads": np.empty(grow_s, np.int64),
            "feat_out": np.empty(grow_w * nfeat, np.float64),
            "read_out": np.empty(grow_w, np.int64),
            "json_buf": np.empty(grow_j, np.uint8),
            "json_len": np.empty(grow_s, np.int64),
        }
        _scratch.batch_bufs = sc

    tx_site_counts = np.zeros(n_tx, np.int64)
    n_sites = lib.ea_process_transcripts(
        eventalign_path.encode(), names_blob, name_off.ctypes.data,
        tx_bounds.ctypes.data, starts.ctypes.data, ends.ctypes.data,
        read_idx.ctypes.data, n_tx,
        motifs.ctypes.data, len(motifs) // 5, window_size, min_segment_count,
        1 if compress else 0, 1 if emit_json else 0,
        tx_site_counts.ctypes.data, sc["site_pos"].ctypes.data,
        sc["site_seq"].ctypes.data, sc["site_nreads"].ctypes.data,
        sc["feat_out"].ctypes.data, sc["read_out"].ctypes.data,
        sc["json_buf"].ctypes.data, sc["json_cap"], sc["json_len"].ctypes.data,
        sc["cap_sites"], sc["cap_windows"],
    )
    if n_sites < 0:
        return None
    n_sites = int(n_sites)
    site_nreads = sc["site_nreads"][:n_sites].copy()
    total_rows = int(site_nreads.sum()) if n_sites else 0
    json_lines = None
    if emit_json:
        lens = sc["json_len"][:n_sites]
        raw = sc["json_buf"][: int(lens.sum())].tobytes()
        json_lines = []
        off = 0
        for ln in lens.tolist():
            json_lines.append(raw[off : off + ln])
            off += ln
    return (
        tx_site_counts,
        sc["site_pos"][:n_sites].copy(),
        sc["site_seq"][: n_sites * seq_len].view(f"S{seq_len}").copy(),
        site_nreads,
        sc["feat_out"][: total_rows * nfeat].reshape(-1, nfeat).copy(),
        sc["read_out"][:total_rows].copy(),
        json_lines,
    )
