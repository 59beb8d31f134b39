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
