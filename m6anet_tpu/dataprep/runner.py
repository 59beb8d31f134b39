"""Dataprep orchestration: eventalign.txt -> data.json / data.info / data.log.

Same file contracts as the reference
(reference: m6anet/utils/dataprep_utils.py:328-488) with a different
process architecture: the reference parses the whole file serially in the
main process and farms only the windowing to lock-synchronised consumers;
here workers are handed (transcript, byte-range list) tasks, do their own
seek+parse+combine+window, and the main process is a single sequential writer
(no file locks, deterministic offset bookkeeping).

Output data.json lines are ``{"<tx>":{"<pos>":{"<7mer>":[[9 floats, read_id]...]}}}``
and data.info records the byte span of every line plus its read count, so the
reference's own readers (and ours) can seek straight to any site.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .combine import combine_read
from .indexer import build_index, open_eventalign, read_index
from .windowing import window_read

# One featurized site: (position, sequence context, features (n, 3*(2w+1))
# float64, read indices, pre-rendered data.json line (bytes) or None)
SiteRecord = Tuple[int, str, np.ndarray, np.ndarray, Optional[bytes]]

# data.log completion sentinel — the exact trailer the reference's
# is_successful() looks for (reference: m6anet/utils/helper.py:103-104);
# unlike the reference, run_dataprep actually writes it on success.
SUCCESS_TRAILER = "--- SUCCESSFULLY FINISHED ---\n"


def read_last_line(filepath: str) -> Optional[bytes]:
    """Last line of a file without reading it all (None if missing/empty).

    Reference: m6anet/utils/helper.py:90-101."""
    if not os.path.exists(filepath):
        return None
    with open(filepath, "rb") as f:
        chunk = b""
        f.seek(0, os.SEEK_END)
        end = f.tell()
        if end == 0:
            return None
        step = 4096
        while True:
            start = max(0, end - step)
            f.seek(start)
            chunk = f.read(end - start)
            # ignore the file's trailing newline when splitting
            body = chunk[:-1] if chunk.endswith(b"\n") else chunk
            nl = body.rfind(b"\n")
            if nl != -1 or start == 0:
                return chunk[nl + 1 :] if nl != -1 else chunk
            step *= 4


def is_successful(out_dir: str) -> bool:
    """True if ``out_dir``'s data.log carries the completion sentinel, i.e.
    dataprep ran to the end rather than being killed mid-write."""
    return read_last_line(os.path.join(out_dir, "data.log")) == SUCCESS_TRAILER.encode()


def featurize_transcript(
    tx_id: str,
    read_slices,
    n_neighbors: int,
    min_segment_count: int,
    compress: bool,
    eventalign_file=None,
    emit_json: bool = True,
    eventalign_path: Optional[str] = None,
) -> List[SiteRecord]:
    """Featurize one transcript: read byte slices -> per-site JSON lines.

    ``read_slices`` is [(read_index, start, end), ...] in eventalign.index
    order, or the equivalent columnar triple of int64 arrays
    ``(read_indices, starts, ends)`` (the fast path run_dataprep uses).
    Duplicated read_index keeps only the last occurrence, matching the
    reference's dict overwrite (reference: m6anet/utils/dataprep_utils.py:385).

    Parsing runs through the native C++ core when available
    (m6anet_tpu/native/); the numpy combiner is the fallback (gzipped input,
    missing toolchain).
    """
    path = eventalign_path
    if (
        isinstance(read_slices, tuple)
        and len(read_slices) == 3
        and all(isinstance(a, np.ndarray) for a in read_slices)
    ):
        slice_reads, slice_starts, slice_ends = read_slices
    else:
        slice_reads = np.array([r for r, _, _ in read_slices], dtype=np.int64)
        slice_starts = np.array([s for _, s, _ in read_slices], dtype=np.int64)
        slice_ends = np.array([e for _, _, e in read_slices], dtype=np.int64)

    # Preferred path: the whole transcript pipeline in native code (parse,
    # aggregate, window, DRACH filter, site grouping, JSON rendering).
    if path is not None:
        from ..native import native_process_transcript

        processed = native_process_transcript(
            path, tx_id, (slice_reads, slice_starts, slice_ends),
            n_neighbors, min_segment_count, compress, emit_json,
        )
        if processed is not None:
            site_pos, site_seq, site_nreads, feats, read_ids, json_lines = processed
            records: List[SiteRecord] = []
            off = 0
            for i in range(len(site_pos)):
                n = int(site_nreads[i])
                records.append(
                    (
                        int(site_pos[i]),
                        site_seq[i].decode(),
                        feats[off : off + n],
                        read_ids[off : off + n],
                        json_lines[i] if json_lines is not None else None,
                    )
                )
                off += n
            return records

    native_result = None
    if path is not None:
        from ..native import native_featurize_batch

        native_result = native_featurize_batch(path, slice_starts, slice_ends, n_neighbors)

    if native_result is not None:
        pos_all, seq_all, feat_all, wbounds, npos = native_result
        counts = np.diff(wbounds)
        keep = npos > 1  # reference's data.size > 1 gate
        if len(slice_reads) != len(np.unique(slice_reads)):
            # dict-overwrite semantics for duplicated read_index
            # (reference: dataprep_utils.py:384-385): keep last occurrence only
            last = {rd: i for i, rd in enumerate(slice_reads)}
            dup_mask = np.zeros(len(slice_reads), dtype=bool)
            dup_mask[list(last.values())] = True
            keep &= dup_mask
        if not keep.any():
            return []
        window_mask = np.repeat(keep, counts)
        positions = pos_all[window_mask]
        if len(positions) == 0:
            return []
        seqs = seq_all[window_mask]
        feats = feat_all[window_mask]
        read_ids = np.repeat(slice_reads, counts)[window_mask]
    else:
        per_read: Dict[int, Tuple] = {}
        f = eventalign_file
        if f is None:
            raise ValueError("no native library and no eventalign_file handle")
        for read_index, start, end in zip(slice_reads.tolist(), slice_starts.tolist(), slice_ends.tolist()):
            f.seek(start)
            combined = combine_read(f.read(end - start))
            if combined is not None:
                per_read[read_index] = combined

        all_pos: List[np.ndarray] = []
        all_seq: List[np.ndarray] = []
        all_feat: List[np.ndarray] = []
        all_read: List[np.ndarray] = []
        for read_index, combined in per_read.items():
            windowed = window_read(combined, n_neighbors)
            if windowed is None:
                continue
            pos, seq, feat = windowed
            all_pos.append(pos)
            all_seq.append(seq)
            all_feat.append(feat)
            all_read.append(np.full(len(pos), read_index, dtype=np.int64))

        if not all_pos:
            return []

        positions = np.concatenate(all_pos)
        seqs = np.concatenate(all_seq)
        feats = np.concatenate(all_feat)
        read_ids = np.concatenate(all_read)

    # Stable sort by position keeps reads in file order within a site
    # (reference: m6anet/utils/dataprep_utils.py:444-450).
    order = np.argsort(positions, kind="stable")
    positions, seqs, feats, read_ids = positions[order], seqs[order], feats[order], read_ids[order]
    uniq_pos, starts = np.unique(positions, return_index=True)
    bounds = np.concatenate([starts[1:], [len(positions)]])

    records: List[SiteRecord] = []
    for pos, s, e in zip(uniq_pos, starts, bounds):
        seq = seqs[s]
        n_reads = e - s
        # The reference additionally skips all-XXXXX placeholder motifs
        # (reference: m6anet/utils/dataprep_utils.py:465-467); unreachable
        # here because the DRACH center filter already excludes them.
        if n_reads < min_segment_count:
            continue
        feat = feats[s:e]
        if compress:
            feat = feat.round(decimals=3)
        line = None
        if emit_json:
            rows = np.concatenate([feat, read_ids[s:e, None].astype(np.float64)], axis=1)
            payload = {seq.decode(): rows.tolist()}
            line = (
                '{"%s":{"%d":%s}}\n'
                % (tx_id, int(pos), json.dumps(payload, separators=(",", ":")))
            ).encode()
        records.append((int(pos), seq.decode(), feat, read_ids[s:e], line))
    return records


def featurize_transcript_chunk(
    eventalign_path: str,
    names: List[str],
    read_idx_parts: List[np.ndarray],
    start_parts: List[np.ndarray],
    end_parts: List[np.ndarray],
    n_neighbors: int,
    min_segment_count: int,
    compress: bool,
    emit_json: bool,
):
    """Featurize MANY transcripts with one native call.

    Returns [(tx_id, [SiteRecord, ...]), ...] in input order, or None when
    the native batched path is unavailable (caller falls back per
    transcript).
    """
    from ..native import native_process_transcripts

    bounds = np.zeros(len(names) + 1, np.int64)
    np.cumsum([len(r) for r in read_idx_parts], out=bounds[1:])
    out = native_process_transcripts(
        eventalign_path, names, bounds,
        np.concatenate(read_idx_parts), np.concatenate(start_parts), np.concatenate(end_parts),
        n_neighbors, min_segment_count, compress, emit_json,
    )
    if out is None:
        return None
    tx_counts, site_pos, site_seq, site_nreads, feats, read_ids, json_lines = out
    results: List[Tuple[str, List[SiteRecord]]] = []
    site_cur = 0
    row_cur = 0
    for t, name in enumerate(names):
        records: List[SiteRecord] = []
        for _ in range(int(tx_counts[t])):
            n = int(site_nreads[site_cur])
            records.append(
                (
                    int(site_pos[site_cur]),
                    site_seq[site_cur].decode(),
                    feats[row_cur : row_cur + n],
                    read_ids[row_cur : row_cur + n],
                    json_lines[site_cur] if json_lines is not None else None,
                )
            )
            row_cur += n
            site_cur += 1
        results.append((name, records))
    return results


def iter_transcript_tasks(index_rows) -> Iterator[Tuple[str, List[Tuple[int, int, int]]]]:
    """Group index rows by transcript, preserving first-appearance order
    (reference: m6anet/utils/dataprep_utils.py:370-379)."""
    by_tx: Dict[str, List[Tuple[int, int, int]]] = {}
    for tx_id, read_index, start, end in index_rows:
        by_tx.setdefault(tx_id, []).append((read_index, start, end))
    yield from by_tx.items()


def iter_transcript_tasks_arrays(codes, names, read_idx, starts, ends):
    """Array-form grouping: yields (tx_id, (read_idx, starts, ends)) per
    transcript in first-appearance order (codes are first-appearance
    factorized, see indexer.read_index_grouped) — same ordering contract as
    :func:`iter_transcript_tasks` without one Python tuple per index row."""
    order = np.argsort(codes, kind="stable")
    sorted_codes = codes[order]
    bounds = np.flatnonzero(np.diff(sorted_codes)) + 1
    group_starts = np.concatenate([[0], bounds])
    group_ends = np.concatenate([bounds, [len(codes)]])
    for g in range(len(names)):
        idx = order[group_starts[g] : group_ends[g]]
        yield names[g], (
            np.ascontiguousarray(read_idx[idx]),
            np.ascontiguousarray(starts[idx]),
            np.ascontiguousarray(ends[idx]),
        )


def run_dataprep(
    eventalign_path: str,
    out_dir: str,
    n_processes: int = 1,
    chunk_size: int = 1_000_000,
    readcount_min: int = 1,
    readcount_max: int = 1000,
    min_segment_count: int = 20,
    n_neighbors: int = 1,
    compress: bool = False,
    skip_index: bool = False,
    output_format: str = "json",
    host_shard=None,
) -> None:
    """Full dataprep; gzipped input is decompressed once to a scratch file so
    the native parsing core (which needs seekable plain bytes) applies — the
    index's byte offsets refer to the decompressed stream either way, and
    per-read gzip seeks would otherwise re-inflate from the start of the
    member each time."""
    if eventalign_path.endswith(".gz"):
        import gzip
        import shutil
        import tempfile

        os.makedirs(out_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(suffix=".eventalign.txt", dir=out_dir)
        try:
            with gzip.open(eventalign_path, "rb") as src, os.fdopen(fd, "wb") as dst:
                shutil.copyfileobj(src, dst, 8 << 20)
            _run_dataprep(
                tmp, out_dir, n_processes, chunk_size, readcount_min,
                readcount_max, min_segment_count, n_neighbors, compress,
                skip_index, output_format, host_shard,
            )
        finally:
            os.remove(tmp)
        return
    _run_dataprep(
        eventalign_path, out_dir, n_processes, chunk_size, readcount_min,
        readcount_max, min_segment_count, n_neighbors, compress, skip_index,
        output_format, host_shard,
    )


def _run_dataprep(
    eventalign_path: str,
    out_dir: str,
    n_processes: int = 1,
    chunk_size: int = 1_000_000,
    readcount_min: int = 1,
    readcount_max: int = 1000,
    min_segment_count: int = 20,
    n_neighbors: int = 1,
    compress: bool = False,
    skip_index: bool = False,
    output_format: str = "json",
    host_shard=None,
) -> None:
    """Full dataprep: index (stage A) + featurize/write (stage B).

    ``chunk_size`` is accepted for CLI compatibility but unused — the
    streaming indexer has no chunking knob.  ``output_format`` is one of
    'json' (reference-compatible data.json), 'columnar' (memory-mappable
    store, see m6anet_tpu/data/columnar.py), or 'both'.  data.info is always
    written; in columnar-only mode its start/end byte offsets are zero.

    ``host_shard=(host_id, n_hosts)`` featurizes only this host's contiguous
    slice of the transcript list (multi-host dataprep: every host runs over
    the same eventalign + index but writes its own out_dir; the shard
    directories are consumed together via inference --concat_shards).
    """
    del chunk_size
    if output_format not in ("json", "columnar", "both"):
        raise ValueError(f"invalid output_format {output_format!r}")
    emit_json = output_format in ("json", "both")
    emit_columnar = output_format in ("columnar", "both")
    os.makedirs(out_dir, exist_ok=True)
    index_path = os.path.join(out_dir, "eventalign.index")
    if not skip_index or not os.path.exists(index_path):
        build_index(eventalign_path, out_dir)

    from .indexer import read_index_grouped

    idx_codes, idx_names, idx_read, idx_start, idx_end = read_index_grouped(index_path)

    json_path = os.path.join(out_dir, "data.json")
    info_path = os.path.join(out_dir, "data.info")
    log_path = os.path.join(out_dir, "data.log")

    tx_filter = None
    if host_shard is not None:
        host_id, n_hosts = host_shard
        all_tx = idx_names  # first-appearance order, already unique
        per = -(-len(all_tx) // n_hosts)
        tx_filter = set(all_tx[host_id * per : (host_id + 1) * per])

    def task_args():
        for tx_id, slices in iter_transcript_tasks_arrays(idx_codes, idx_names, idx_read, idx_start, idx_end):
            if tx_filter is not None and tx_id not in tx_filter:
                continue
            # readcount gates count *attempted* reads, capped by the break at
            # readcount_max (whose post-increment placement admits
            # readcount_max + 1 of them) — so a transcript with more reads
            # than the cap still only counts the cap toward readcount_min
            # (reference: m6anet/utils/dataprep_utils.py:379-390).
            if min(len(slices[0]), readcount_max + 1) < readcount_min:
                continue
            capped = tuple(a[: readcount_max + 1] for a in slices)
            yield tx_id, capped, n_neighbors, min_segment_count, compress, emit_json

    columnar_writer = None
    if emit_columnar:
        from ..data.columnar import ColumnarWriter

        columnar_writer = ColumnarWriter(out_dir, 2 * n_neighbors + 1)

    # data.json is written in binary with a manually tracked offset:
    # TextIOWrapper.tell() is O(slow) per call and the lines are pre-rendered
    # bytes whose lengths are the offsets (same contract as the reference's
    # f.tell() bookkeeping, reference: m6anet/utils/dataprep_utils.py:476-485).
    json_offset = 0

    with open(json_path, "wb") if emit_json else _null_file() as f_json, open(
        info_path, "w", encoding="utf-8"
    ) as f_info, open(log_path, "w", encoding="utf-8") as f_log:
        f_info.write("transcript_id,transcript_position,start,end,n_reads\n")

        def write_result(tx_id: str, records: List[SiteRecord]):
            nonlocal json_offset
            info_rows = []
            json_parts = []
            for pos, seq, feat, read_ids, line in records:
                start = end = 0
                if emit_json:
                    start = json_offset
                    json_parts.append(line)
                    json_offset += len(line)
                    end = json_offset
                if columnar_writer is not None:
                    columnar_writer.append_site(tx_id, pos, seq, feat, read_ids)
                info_rows.append(f"{tx_id},{pos},{start},{end},{len(read_ids)}\n")
            if json_parts:
                f_json.write(b"".join(json_parts))
            f_info.write("".join(info_rows))
            f_log.write(f"{tx_id}: Data preparation ... Done.\n")

        # Transcripts are grouped into multi-MB chunks so the native core is
        # crossed once per CHUNK, not once per transcript (the ctypes
        # round-trip dominates on many-small-transcript inputs).
        CHUNK_BYTES = 8 << 20
        CHUNK_TX = 256

        def chunk_args():
            names, ris, sss, ees, total = [], [], [], [], 0
            for tx_id, (ri, ss, ee), *_ in task_args():
                names.append(tx_id)
                ris.append(ri)
                sss.append(ss)
                ees.append(ee)
                total += int((ee - ss).sum())
                if total >= CHUNK_BYTES or len(names) >= CHUNK_TX:
                    yield names, ris, sss, ees
                    names, ris, sss, ees, total = [], [], [], [], 0
            if names:
                yield names, ris, sss, ees

        def run_chunk(chunk):
            names, ris, sss, ees = chunk
            out = featurize_transcript_chunk(
                eventalign_path, names, ris, sss, ees,
                n_neighbors, min_segment_count, compress, emit_json,
            )
            if out is None:  # no native library: per-transcript fallback
                out = []
                with open_eventalign(eventalign_path, buffering=1024 * 1024) as ev:
                    for name, ri, ss, ee in zip(names, ris, sss, ees):
                        out.append(
                            (
                                name,
                                featurize_transcript(
                                    name, (ri, ss, ee), n_neighbors,
                                    min_segment_count, compress,
                                    eventalign_file=ev, emit_json=emit_json,
                                ),
                            )
                        )
            return out

        if n_processes <= 1:
            for chunk in chunk_args():
                for tx_id, records in run_chunk(chunk):
                    write_result(tx_id, records)
        else:
            # Thread workers, not processes: the native core does the heavy
            # parsing with the GIL released (and is itself threaded over
            # reads), so threads scale like processes here — without fork/
            # spawn hazards (jax-thread deadlocks, __main__ re-execution) or
            # result pickling.  Ordered completion keeps the writer simple.
            from concurrent.futures import ThreadPoolExecutor
            from collections import deque

            # outer thread pool provides the parallelism; keep the native
            # core single-threaded per call to avoid oversubscription
            os.environ.setdefault("M6A_NATIVE_THREADS", "1")

            with ThreadPoolExecutor(max_workers=n_processes) as pool:
                pending = deque()
                max_pending = n_processes * 4
                for chunk in chunk_args():
                    pending.append(pool.submit(run_chunk, chunk))
                    while len(pending) >= max_pending:
                        for tx_id, records in pending.popleft().result():
                            write_result(tx_id, records)
                while pending:
                    for tx_id, records in pending.popleft().result():
                        write_result(tx_id, records)

        # completion sentinel: the reference defines is_successful()/
        # read_last_line() against this exact trailer but nothing there ever
        # writes it (reference: m6anet/utils/helper.py:90-104 — vestigial);
        # here a successful run really ends data.log with it, so downstream
        # tooling can distinguish a finished dataprep from a killed one.
        f_log.write(SUCCESS_TRAILER)

    if columnar_writer is not None:
        columnar_writer.finalize()


class _null_file:
    """Context manager standing in for data.json when JSON output is off."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def write(self, _):
        raise RuntimeError("JSON output disabled")

    def tell(self):
        return 0
