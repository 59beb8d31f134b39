"""Golden-contract dataprep tests against the reference demo fixtures
(same two contracts as the reference suite: eventalign.index equality after
sort, and data.info/data.json content equality — reference:
m6anet/tests/test_dataprep.py)."""
import json
import os

import numpy as np
import pandas as pd

from m6anet_tpu.dataprep import indexer


def test_index_matches_golden(eventalign_fpath, golden_eventalign_index, tmp_path):
    out = indexer.build_index(eventalign_fpath, str(tmp_path))
    got = pd.read_csv(out).sort_values(["transcript_id", "read_index"]).reset_index(drop=True)
    want = (
        pd.read_csv(golden_eventalign_index)
        .sort_values(["transcript_id", "read_index"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def _read_site(json_path, tx_id, tx_pos, start, end):
    with open(json_path, "r", encoding="utf-8") as f:
        f.seek(start)
        payload = json.loads(f.read(end - start))[tx_id][str(tx_pos)]
    assert len(payload) == 1
    kmer, features = next(iter(payload.items()))
    features = np.asarray(features)
    return kmer, features[:, -1].astype(int), features[:, :-1]


def test_dataprep_matches_golden(demo_dataprep_dir, golden_data_info, golden_data_json):
    got_info = (
        pd.read_csv(os.path.join(demo_dataprep_dir, "data.info"))
        .sort_values(["transcript_id", "transcript_position"])
        .reset_index(drop=True)
    )
    want_info = (
        pd.read_csv(golden_data_info)
        .sort_values(["transcript_id", "transcript_position"])
        .reset_index(drop=True)
    )
    assert (got_info["transcript_id"] == want_info["transcript_id"]).all()
    assert (got_info["transcript_position"] == want_info["transcript_position"]).all()
    assert (got_info["n_reads"] == want_info["n_reads"]).all()

    got_json = os.path.join(demo_dataprep_dir, "data.json")
    for (_, g), (_, w) in zip(got_info.iterrows(), want_info.iterrows()):
        kmer_g, reads_g, feat_g = _read_site(got_json, g.transcript_id, g.transcript_position, g.start, g.end)
        kmer_w, reads_w, feat_w = _read_site(
            golden_data_json, w.transcript_id, w.transcript_position, w.start, w.end
        )
        assert kmer_g == kmer_w
        assert feat_g.shape == feat_w.shape
        sg, sw = np.argsort(reads_g), np.argsort(reads_w)
        np.testing.assert_array_equal(reads_g[sg], reads_w[sw])
        np.testing.assert_allclose(feat_g[sg], feat_w[sw])


def test_dataprep_parallel_matches_serial(eventalign_fpath, demo_dataprep_dir, tmp_path):
    """2-process run produces the same site payloads as the session run."""
    from m6anet_tpu.dataprep import run_dataprep

    run_dataprep(
        eventalign_fpath,
        str(tmp_path),
        n_processes=1,
        readcount_min=1,
        readcount_max=1000,
        min_segment_count=1,
        n_neighbors=1,
    )
    a = pd.read_csv(os.path.join(tmp_path, "data.info")).sort_values(
        ["transcript_id", "transcript_position"]
    )
    b = pd.read_csv(os.path.join(demo_dataprep_dir, "data.info")).sort_values(
        ["transcript_id", "transcript_position"]
    )
    assert (a["n_reads"].values == b["n_reads"].values).all()


def test_native_combine_matches_python(eventalign_fpath, tmp_path):
    """C++ parser/aggregator parity against the numpy combiner."""
    from m6anet_tpu.dataprep.combine import combine_read
    from m6anet_tpu.native import get_lib, native_combine_batch

    if get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    out = indexer.build_index(eventalign_fpath, str(tmp_path))
    rows = indexer.read_index(out)
    by_tx = {}
    for tx, read, s, e in rows:
        by_tx.setdefault(tx, []).append((read, s, e))

    checked = 0
    with open(eventalign_fpath, "rb") as f:
        for tx, slices in list(by_tx.items())[:10]:
            starts = np.array([s for _, s, _ in slices], dtype=np.int64)
            ends = np.array([e for _, _, e in slices], dtype=np.int64)
            pos, kmers, feats, bounds = native_combine_batch(eventalign_fpath, starts, ends)
            for i, (_, s, e) in enumerate(slices):
                f.seek(s)
                py = combine_read(f.read(e - s))
                n = bounds[i + 1] - bounds[i]
                if py is None:
                    assert n <= 1
                    continue
                sl = slice(bounds[i], bounds[i + 1])
                np.testing.assert_array_equal(pos[sl], py[0])
                np.testing.assert_array_equal(kmers[sl], py[1])
                np.testing.assert_allclose(feats[sl], py[2], rtol=0, atol=0)
                checked += 1
    assert checked > 20


def test_dataprep_gzip_input(eventalign_fpath, demo_dataprep_dir, tmp_path):
    """Gzipped eventalign input produces identical site read counts."""
    import gzip
    import shutil

    from m6anet_tpu.dataprep import run_dataprep

    gz_path = str(tmp_path / "eventalign.txt.gz")
    with open(eventalign_fpath, "rb") as src, gzip.open(gz_path, "wb") as dst:
        shutil.copyfileobj(src, dst)

    out = tmp_path / "out"
    run_dataprep(gz_path, str(out), n_processes=1, readcount_min=1,
                 readcount_max=1000, min_segment_count=1, n_neighbors=1)
    a = pd.read_csv(out / "data.info").sort_values(["transcript_id", "transcript_position"])
    b = pd.read_csv(os.path.join(demo_dataprep_dir, "data.info")).sort_values(
        ["transcript_id", "transcript_position"]
    )
    assert (a["n_reads"].values == b["n_reads"].values).all()


def _write_synthetic_eventalign(path, n_reads=30, n_pos=40):
    """Synthetic eventalign with long consecutive-position runs (the demo
    fixture only contains 3-position runs around each DRACH site, so it
    cannot exercise n_neighbors > 1)."""
    import itertools
    import random

    rng = random.Random(0)
    seq = "".join(rng.choice("ACGT") for _ in range(n_pos + 10))
    # plant DRACH motifs so centers exist
    for i in range(5, n_pos, 7):
        seq = seq[:i] + "GGACT" + seq[i + 5 :]
    with open(path, "w") as f:
        f.write(
            "contig\tposition\treference_kmer\tread_index\tstrand\tevent_index\t"
            "event_level_mean\tevent_stdv\tevent_length\tmodel_kmer\tmodel_mean\t"
            "model_stdv\tstandardized_level\tstart_idx\tend_idx\n"
        )
        for read in range(n_reads):
            for pos in range(n_pos):
                kmer = seq[pos : pos + 5]
                mean = 90 + (pos * 7 + read) % 40 + 0.25
                f.write(
                    f"SYNTX.1\t{pos}\t{kmer}\t{read}\tt\t{pos}\t{mean}\t2.5\t0.004\t"
                    f"{kmer}\t100.0\t3.0\t0.5\t{pos * 10}\t{pos * 10 + 8}\n"
                )


def test_n_neighbors_2_subwindow_consistency(tmp_path):
    """dataprep with w=2 produces 9-position windows whose central w=1
    sub-window matches a plain w=1 run (native kernel w generalisation +
    dataset neighbour sub-selection)."""
    from m6anet_tpu.data.dataset import SiteDataset
    from m6anet_tpu.dataprep import run_dataprep

    ev = tmp_path / "synthetic.txt"
    _write_synthetic_eventalign(str(ev))

    w1 = tmp_path / "w1"
    w2 = tmp_path / "w2"
    for out, nn in ((w1, 1), (w2, 2)):
        run_dataprep(str(ev), str(out), n_processes=1, readcount_min=1,
                     readcount_max=1000, min_segment_count=1, n_neighbors=nn)

    ds1 = SiteDataset(str(w1), min_reads=1, norm_path=None, num_neighboring_features=1)
    ds1.norm_dict = None
    ds2 = SiteDataset(str(w2), min_reads=1, norm_path=None, num_neighboring_features=1)
    ds2.norm_dict = None
    assert ds2.total_neighboring_features == 2

    by_key = {(s.tx_id, s.tx_pos): s for s in ds2.iter_sites()}
    assert len(by_key) >= 3
    checked = 0
    for s1 in ds1.iter_sites():
        s2 = by_key.get((s1.tx_id, s1.tx_pos))
        if s2 is None:
            continue  # w=2 needs wider intact flanks
        assert s2.sequence == s1.sequence
        i1 = {r: i for i, r in enumerate(s1.read_ids)}
        i2 = {r: i for i, r in enumerate(s2.read_ids)}
        for r in list(i1)[:5]:
            np.testing.assert_allclose(s1.features[i1[r]], s2.features[i2[r]], rtol=1e-9)
        checked += 1
    assert checked >= 3


def test_native_w2_matches_python(tmp_path):
    """native fused featurize == python combine+window for w=2."""
    from m6anet_tpu.dataprep.combine import combine_read
    from m6anet_tpu.dataprep.windowing import window_read
    from m6anet_tpu.dataprep.indexer import build_index, read_index
    from m6anet_tpu.native import native_featurize_batch

    ev = tmp_path / "synthetic.txt"
    _write_synthetic_eventalign(str(ev))
    build_index(str(ev), str(tmp_path))
    rows = read_index(str(tmp_path / "eventalign.index"))
    starts = np.array([r[2] for r in rows], dtype=np.int64)
    ends = np.array([r[3] for r in rows], dtype=np.int64)
    res = native_featurize_batch(str(ev), starts, ends, 2)
    assert res is not None
    pos, seq, feat, bounds, npos = res
    assert len(pos) > 0
    with open(ev, "rb") as f:
        for i, (_, s, e) in enumerate([(r[1], r[2], r[3]) for r in rows]):
            f.seek(s)
            c = combine_read(f.read(e - s))
            wres = window_read(c, 2) if c is not None else None
            n = bounds[i + 1] - bounds[i]
            if wres is None:
                assert n == 0
                continue
            sl = slice(bounds[i], bounds[i + 1])
            np.testing.assert_array_equal(pos[sl], wres[0])
            np.testing.assert_array_equal(seq[sl], wres[1])
            np.testing.assert_allclose(feat[sl], wres[2], rtol=0, atol=0)


def test_malformed_lines_skipped(tmp_path):
    """Truncated/garbage lines are skipped, valid lines still processed."""
    from m6anet_tpu.dataprep import run_dataprep

    src = os.path.join(os.path.dirname(__file__), "data", "eventalign.txt")
    bad = tmp_path / "bad.txt"
    with open(src) as f:
        lines = f.readlines()
    # inject malformed lines mid-file (short rows; they share the contig of
    # neighbours so index ranges still cover them)
    lines.insert(100, "ENST00000361055.8\tgarbage\n")
    lines.insert(200, "\n")
    bad.write_text("".join(lines))

    out = tmp_path / "out"
    run_dataprep(str(bad), str(out), n_processes=1, readcount_min=1,
                 readcount_max=1000, min_segment_count=1, n_neighbors=1)
    info = pd.read_csv(out / "data.info")
    assert len(info) > 200  # bulk of sites still produced


def test_fuzz_native_vs_python_pipeline(tmp_path):
    """Randomized eventalign (multiple events per position, gaps, duplicate
    read ids, variable run lengths): the native fused pipeline and the pure
    numpy path must produce identical site records."""
    import random

    from m6anet_tpu.dataprep.indexer import build_index, read_index
    from m6anet_tpu.dataprep.runner import featurize_transcript

    rng = random.Random(7)
    path = tmp_path / "fuzz.txt"
    with open(path, "w") as f:
        f.write("contig\tposition\treference_kmer\tread_index\tstrand\tevent_index\t"
                "event_level_mean\tevent_stdv\tevent_length\tmodel_kmer\tmodel_mean\t"
                "model_stdv\tstandardized_level\tstart_idx\tend_idx\n")
        seq = "".join(rng.choice("ACGT") for _ in range(60))
        for i in range(4, 50, 9):
            seq = seq[:i] + "AGACA" + seq[i + 5 :]
        for read in range(25):
            read_id = read % 18  # duplicates: several reads share an id
            pos = 0
            while pos < 50:
                if rng.random() < 0.15:
                    pos += rng.randint(1, 4)  # gap
                    continue
                kmer = seq[pos : pos + 5]
                model = kmer if rng.random() > 0.1 else "NNNNN"  # failed align
                for _ in range(rng.randint(1, 3)):  # multiple events/position
                    mean = 80 + rng.random() * 40
                    stdv = 1 + rng.random() * 5
                    length = 0.001 + rng.random() * 0.01
                    s0 = rng.randint(0, 10**6)
                    f.write(f"FZTX.1\t{pos}\t{kmer}\t{read_id}\tt\t0\t{mean:.3f}\t"
                            f"{stdv:.3f}\t{length:.5f}\t{model}\t0\t0\t0\t{s0}\t{s0 + rng.randint(3, 50)}\n")
                pos += 1

    build_index(str(path), str(tmp_path))
    rows = read_index(str(tmp_path / "eventalign.index"))
    slices = [(r, s, e) for _, r, s, e in rows]

    native = featurize_transcript("FZTX.1", slices, 1, 1, False, eventalign_path=str(path))
    with open(path, "rb") as fh:
        python = featurize_transcript("FZTX.1", slices, 1, 1, False,
                                      eventalign_file=fh, eventalign_path=None)

    assert len(native) > 3
    assert len(native) == len(python)
    for (pn, sn, fn_, rn, jn), (pp, sp, fp_, rp, jp) in zip(native, python):
        assert pn == pp and sn == sp
        srt_n, srt_p = np.argsort(rn, kind="stable"), np.argsort(rp, kind="stable")
        np.testing.assert_array_equal(rn[srt_n], rp[srt_p])
        np.testing.assert_allclose(fn_[srt_n], fp_[srt_p], rtol=0, atol=0)
        # JSON lines parse to the same payloads
        import json as _json

        assert _json.loads(jn) and _json.loads(jp)


def test_interleaved_transcripts_group_in_first_appearance_order(tmp_path):
    """Transcripts whose reads interleave in eventalign.txt are still grouped
    per transcript, in first-appearance order (the reference's dict.setdefault
    grouping, m6anet/utils/dataprep_utils.py:370-379); the native factorized
    index loader and the chunked runner must preserve this."""
    from m6anet_tpu.dataprep.indexer import read_index_grouped
    from m6anet_tpu.dataprep.runner import run_dataprep

    src = os.path.join(os.path.dirname(__file__), "data", "eventalign.txt")
    with open(src) as f:
        header = f.readline()
        lines = f.readlines()

    # Split the demo's per-read blocks and interleave them between two
    # pseudo-transcript namespaces: A-reads, then B-reads, alternating.
    blocks = []
    cur_key, cur = None, []
    for ln in lines:
        tx, _, rest = ln.partition("\t")
        read = ln.split("\t")[3]
        key = (tx, read)
        if key != cur_key:
            if cur:
                blocks.append((cur_key, cur))
            cur_key, cur = key, []
        cur.append(ln)
    blocks.append((cur_key, cur))

    path = tmp_path / "interleaved.txt"
    with open(path, "w") as out:
        out.write(header)
        for i, ((tx, _), blk) in enumerate(blocks):
            ns = "A" if i % 2 == 0 else "B"
            for ln in blk:
                out.write(f"{ns}{ln}")

    out_dir = tmp_path / "out"
    run_dataprep(str(path), str(out_dir), n_processes=2, readcount_min=1,
                 readcount_max=1000, min_segment_count=1, n_neighbors=1)

    codes, names, *_ = read_index_grouped(str(out_dir / "eventalign.index"))
    # first-appearance order: names must appear in the order their first read
    # block appears in the file
    seen = []
    for i, ((tx, _), _b) in enumerate(blocks):
        ns = "A" if i % 2 == 0 else "B"
        nm = f"{ns}{tx}"
        if nm not in seen:
            seen.append(nm)
    assert names == seen

    # every transcript's data.info rows are contiguous, transcripts in
    # first-appearance order of those that produced sites
    info = pd.read_csv(out_dir / "data.info")
    tx_order = list(dict.fromkeys(info.transcript_id))
    assert info.transcript_id.tolist() == [
        t for t in tx_order for _ in range((info.transcript_id == t).sum())
    ]
    filtered_seen = [t for t in seen if t in set(tx_order)]
    assert tx_order == filtered_seen

    # read counts per namespaced site must match the original demo dataprep
    base_out = tmp_path / "base"
    run_dataprep(src, str(base_out), n_processes=1, readcount_min=1,
                 readcount_max=1000, min_segment_count=1, n_neighbors=1)
    base = pd.read_csv(base_out / "data.info")
    merged = info.copy()
    merged["orig"] = merged.transcript_id.str[1:]
    combined = merged.groupby(["orig", "transcript_position"]).n_reads.sum()
    base_keyed = base.set_index(["transcript_id", "transcript_position"]).n_reads
    for (tx, pos), n in combined.items():
        assert base_keyed.loc[(tx, pos)] == n, (tx, pos)


def test_compress_rounds_to_3_decimals(eventalign_fpath, demo_dataprep_dir, tmp_path):
    """--compress rounds every stored feature to 3 decimals
    (reference: m6anet/utils/dataprep_utils.py:460-461), in the chunked
    native pipeline too."""
    import json

    from m6anet_tpu.dataprep import run_dataprep

    out = tmp_path / "compressed"
    run_dataprep(eventalign_fpath, str(out), n_processes=2, readcount_min=1,
                 readcount_max=1000, min_segment_count=1, n_neighbors=1,
                 compress=True)

    plain_info = pd.read_csv(os.path.join(demo_dataprep_dir, "data.info"))
    comp_info = pd.read_csv(out / "data.info")
    assert (plain_info.n_reads.values == comp_info.n_reads.values).all()

    with open(os.path.join(demo_dataprep_dir, "data.json")) as f_plain, open(
        out / "data.json"
    ) as f_comp:
        for _ in range(25):
            plain = json.loads(f_plain.readline())
            comp = json.loads(f_comp.readline())
            for tx, positions in comp.items():
                for pos, kmers in positions.items():
                    for kmer, rows in kmers.items():
                        plain_rows = plain[tx][pos][kmer]
                        for r, pr in zip(rows, plain_rows):
                            assert r[:-1] == [round(v, 3) for v in pr[:-1]]
                            assert r[-1] == pr[-1]  # read id untouched


def test_dataprep_header_only_input(tmp_path):
    """An eventalign file with no event rows produces empty-but-valid outputs."""
    from m6anet_tpu.dataprep import run_dataprep

    path = tmp_path / "empty.txt"
    with open(path, "w") as f:
        f.write("contig\tposition\treference_kmer\tread_index\tstrand\tevent_index\t"
                "event_level_mean\tevent_stdv\tevent_length\tmodel_kmer\tmodel_mean\t"
                "model_stdv\tstandardized_level\tstart_idx\tend_idx\n")
    out = tmp_path / "out"
    run_dataprep(str(path), str(out), n_processes=2, readcount_min=1,
                 readcount_max=1000, min_segment_count=1, n_neighbors=1,
                 output_format="both")
    info = pd.read_csv(out / "data.info")
    assert len(info) == 0
    assert os.path.getsize(out / "data.json") == 0


def test_dataprep_completion_sentinel(tmp_path):
    """A finished dataprep ends data.log with the reference's success
    trailer (reference: m6anet/utils/helper.py:90-104 defines the check but
    nothing there writes the trailer; here run_dataprep does), so
    is_successful() distinguishes complete runs from killed ones."""
    from m6anet_tpu.dataprep import is_successful, read_last_line, run_dataprep
    from m6anet_tpu.dataprep.runner import SUCCESS_TRAILER

    path = tmp_path / "empty.txt"
    with open(path, "w") as f:
        f.write("contig\tposition\treference_kmer\tread_index\tstrand\tevent_index\t"
                "event_level_mean\tevent_stdv\tevent_length\tmodel_kmer\tmodel_mean\t"
                "model_stdv\tstandardized_level\tstart_idx\tend_idx\n")
    out = tmp_path / "out"
    run_dataprep(str(path), str(out), n_processes=1, readcount_min=1,
                 readcount_max=1000, min_segment_count=1, n_neighbors=1,
                 output_format="json")
    assert is_successful(str(out))
    assert read_last_line(str(out / "data.log")) == SUCCESS_TRAILER.encode()

    # simulate a killed run: truncate the trailer away
    log = out / "data.log"
    log.write_bytes(log.read_bytes()[: -len(SUCCESS_TRAILER)])
    assert not is_successful(str(out))
    # and a multi-line log whose last line is mid-write
    with open(log, "ab") as f:
        f.write(b"ENST0000001: Data preparation ... Do")
    assert not is_successful(str(out))
    assert not is_successful(str(tmp_path / "nonexistent"))


def test_native_index_loader_crlf_and_malformed(tmp_path):
    """The native index loader strips CRLF (parity with pandas universal
    newlines) and rejects non-digit bytes instead of corrupting offsets."""
    from m6anet_tpu.native import native_load_index

    src = os.path.join(os.path.dirname(__file__), "data", "eventalign.index")
    crlf = tmp_path / "crlf.index"
    crlf.write_bytes(open(src, "rb").read().replace(b"\n", b"\r\n"))
    a = native_load_index(str(crlf))
    b = native_load_index(src)
    if a is None and b is None:
        pytest.skip("native library unavailable")
    assert a[4] == b[4]
    for x, y in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(x, y)

    bad = tmp_path / "bad.index"
    bad.write_text("transcript_id,read_index,pos_start,pos_end\ntx,1,2x,3\n")
    assert native_load_index(str(bad)) is None
