"""Columnar site-store tests: dataprep --format both produces a store whose
inference output matches the data.json path, and whose contents round-trip."""
import os

import numpy as np
import pandas as pd
import pytest

from m6anet_tpu.constants import DEFAULT_MIN_READS, PRETRAINED_CONFIGS


@pytest.fixture(scope="module")
def columnar_dir(tmp_path_factory, eventalign_fpath):
    out = tmp_path_factory.mktemp("columnar_out")
    from m6anet_tpu.dataprep import run_dataprep

    run_dataprep(
        eventalign_fpath,
        str(out),
        n_processes=1,
        readcount_min=1,
        readcount_max=1000,
        min_segment_count=1,
        n_neighbors=1,
        output_format="both",
    )
    return str(out)


def test_columnar_matches_json_payloads(columnar_dir):
    from m6anet_tpu.data.columnar import ColumnarSiteDataset
    from m6anet_tpu.data.dataset import SiteDataset

    js = SiteDataset(columnar_dir, min_reads=1, norm_path=None, mode="Inference")
    js.norm_dict = None  # compare raw features
    col = ColumnarSiteDataset(columnar_dir, min_reads=1, norm_path=None, mode="Inference", compute_norm=False)
    assert len(js) == len(col)
    for i in range(0, len(js), 17):
        a = js.get_site(i)
        b = col.get_site(i)
        assert a.tx_id == b.tx_id and a.tx_pos == b.tx_pos and a.sequence == b.sequence
        np.testing.assert_array_equal(a.read_ids, b.read_ids)
        np.testing.assert_allclose(a.features, b.features, rtol=1e-6)


def test_columnar_inference_matches_json(columnar_dir, production_model, tmp_path):
    from m6anet_tpu.data.columnar import ColumnarSiteDataset
    from m6anet_tpu.data.dataset import SiteDataset
    from m6anet_tpu.inference.engine import run_inference

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]

    ds_json = SiteDataset(columnar_dir, min_reads=DEFAULT_MIN_READS, norm_path=norm)
    ds_col = ColumnarSiteDataset(columnar_dir, min_reads=DEFAULT_MIN_READS, norm_path=norm)
    run_inference(model, params, ds_json, str(tmp_path / "json"), read_proba_threshold=thr)
    run_inference(model, params, ds_col, str(tmp_path / "col"), read_proba_threshold=thr)

    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(tmp_path / "json" / name)
        b = pd.read_csv(tmp_path / "col" / name)
        assert len(a) == len(b)
        # columnar stores raw features as f32 (the json path normalizes in
        # f64): ~1e-5 relative quantization, far finer than the reference's
        # own --compress (3-decimal rounding)
        np.testing.assert_allclose(
            a["probability_modified"], b["probability_modified"], atol=5e-5
        )


def test_columnar_only_mode(tmp_path, eventalign_fpath):
    from m6anet_tpu.dataprep import run_dataprep

    run_dataprep(
        eventalign_fpath,
        str(tmp_path),
        n_processes=1,
        readcount_min=1,
        readcount_max=1000,
        min_segment_count=1,
        n_neighbors=1,
        output_format="columnar",
    )
    assert not os.path.exists(os.path.join(tmp_path, "data.json"))
    assert os.path.exists(os.path.join(tmp_path, "columnar", "meta.json"))
    info = pd.read_csv(os.path.join(tmp_path, "data.info"))
    assert len(info) > 0


def test_columnar_training_mode(columnar_dir):
    """Columnar store + data.info.labelled join: Train-mode access."""
    import shutil

    shutil.copyfile(
        os.path.join(os.path.dirname(__file__), "data", "data.info.labelled"),
        os.path.join(columnar_dir, "data.info.labelled"),
    )
    from m6anet_tpu.constants import DEFAULT_NORM_PATH
    from m6anet_tpu.data.columnar import ColumnarSiteDataset

    ds = ColumnarSiteDataset(columnar_dir, min_reads=20, norm_path=DEFAULT_NORM_PATH, mode="Train")
    assert len(ds) > 0
    features, kmers, label = ds[0]
    assert features.shape == (20, 9)
    assert kmers.shape == (20, 3)
    assert label in (0, 1)


def test_replicate_columnar_matches_json_replicates(columnar_dir, production_model, tmp_path):
    """ReplicateColumnarDataset agrees with the data.json replicate path:
    same merged sites, same read-id suffixing, same probabilities."""
    from m6anet_tpu.constants import DEFAULT_NORM_PATH, DEFAULT_READ_THRESHOLD
    from m6anet_tpu.data.columnar import ReplicateColumnarDataset
    from m6anet_tpu.data.dataset import ReplicateSiteDataset
    from m6anet_tpu.inference.engine import run_inference

    import shutil

    model, params = production_model
    rep2 = str(tmp_path / "rep2")
    shutil.copytree(columnar_dir, rep2)  # distinct dir = fake second replicate
    dirs = [columnar_dir, rep2]

    ds_col = ReplicateColumnarDataset(dirs, min_reads=20, norm_path=DEFAULT_NORM_PATH)
    ds_json = ReplicateSiteDataset(dirs, min_reads=20, norm_path=DEFAULT_NORM_PATH)
    assert len(ds_col) == len(ds_json)

    out_col = str(tmp_path / "col")
    out_json = str(tmp_path / "json")
    run_inference(model, params, ds_col, out_col, DEFAULT_READ_THRESHOLD)
    run_inference(model, params, ds_json, out_json, DEFAULT_READ_THRESHOLD)

    key = ["transcript_id", "transcript_position", "read_index"]
    a = pd.read_csv(os.path.join(out_col, "data.indiv_proba.csv")).sort_values(key).reset_index(drop=True)
    b = pd.read_csv(os.path.join(out_json, "data.indiv_proba.csv")).sort_values(key).reset_index(drop=True)
    # summed counts admit 10-19-read sites past the >=20 gate, so this is
    # more than 2x the single-run golden row count
    assert len(a) == len(b) and len(a) >= 2 * 5595
    assert (a.read_index == b.read_index).all()  # incl. _0/_1 suffixes
    # columnar stores raw features as f32 (json normalizes in f64): same
    # ~1e-5 quantization as the single-run comparison above
    np.testing.assert_allclose(a.probability_modified, b.probability_modified, atol=5e-5)

    sa = pd.read_csv(os.path.join(out_col, "data.site_proba.csv")).sort_values(key[:2]).reset_index(drop=True)
    sb = pd.read_csv(os.path.join(out_json, "data.site_proba.csv")).sort_values(key[:2]).reset_index(drop=True)
    np.testing.assert_allclose(sa.probability_modified, sb.probability_modified, atol=5e-5)
    # a read whose probability sits exactly at the threshold could flip its
    # mod_ratio contribution under the f32 quantization; allow one read
    np.testing.assert_allclose(sa.mod_ratio, sb.mod_ratio, atol=1.0 / 20)


def test_replicate_columnar_computed_norm(columnar_dir, tmp_path):
    """Without a norm_path the replicate dataset computes per-kmer factors
    from its own reads (reference: m6anet/utils/data_utils.py:429-495)."""
    from m6anet_tpu.data.columnar import ReplicateColumnarDataset

    import shutil

    rep2 = str(tmp_path / "rep2b")
    shutil.copytree(columnar_dir, rep2)
    ds = ReplicateColumnarDataset([columnar_dir, rep2], min_reads=20)
    assert ds.norm_dict
    site = ds.get_site(0)
    assert np.isfinite(site.features).all()
    # two identical replicates: normalized features tile exactly
    n = len(site.features) // 2
    np.testing.assert_array_equal(site.features[:n], site.features[n:])
    assert site.read_ids[0].endswith("_0") and site.read_ids[-1].endswith("_1")


def test_columnar_host_shard_and_resume_match_full(columnar_dir, production_model, tmp_path):
    """iter_packed honors the start/limit contract: host-sharded CSV shards
    merge to the full result, and --resume continues mid-run."""
    from m6anet_tpu.constants import DEFAULT_NORM_PATH, DEFAULT_READ_THRESHOLD
    from m6anet_tpu.data.columnar import ColumnarSiteDataset
    from m6anet_tpu.inference.engine import merge_host_shards, run_inference

    model, params = production_model
    ds = ColumnarSiteDataset(columnar_dir, min_reads=20, norm_path=DEFAULT_NORM_PATH)

    full = str(tmp_path / "full")
    run_inference(model, params, ds, full, DEFAULT_READ_THRESHOLD)

    shards = str(tmp_path / "shards")
    for host in range(3):
        run_inference(model, params, ds, shards, DEFAULT_READ_THRESHOLD, host_shard=(host, 3))
    merge_host_shards(shards, 3)

    def assert_same(dir_a, dir_b):
        # different batch packings reorder the f32 segment-reduction trees,
        # so probabilities match to ~1e-6 (vs the 1e-2 golden tolerance);
        # keys and counts are exact
        for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
            a = pd.read_csv(os.path.join(dir_a, name))
            b = pd.read_csv(os.path.join(dir_b, name))
            pd.testing.assert_frame_equal(a.drop(columns=["probability_modified"]),
                                          b.drop(columns=["probability_modified"]))
            np.testing.assert_allclose(a.probability_modified, b.probability_modified, atol=1e-5)

    assert_same(full, shards)

    # resume: run with small batches, truncate both CSVs mid-way, resume
    part = str(tmp_path / "part")
    run_inference(model, params, ds, part, DEFAULT_READ_THRESHOLD,
                  read_capacity=2048, site_capacity=16)
    site_path = os.path.join(part, "data.site_proba.csv")
    indiv_path = os.path.join(part, "data.indiv_proba.csv")
    site_lines = open(site_path).readlines()
    keep_sites = site_lines[: 1 + 40]  # header + 40 sites
    kept_keys = {tuple(l.split(",")[:2]) for l in keep_sites[1:]}
    indiv_lines = open(indiv_path).readlines()
    keep_indiv = [indiv_lines[0]] + [l for l in indiv_lines[1:] if tuple(l.split(",")[:2]) in kept_keys]
    open(site_path, "w").writelines(keep_sites)
    open(indiv_path, "w").writelines(keep_indiv)
    run_inference(model, params, ds, part, DEFAULT_READ_THRESHOLD,
                  read_capacity=2048, site_capacity=16, resume=True)
    assert_same(full, part)


def test_columnar_train_toml_surface(columnar_dir, tmp_path):
    """format='columnar' in the [dataset] TOML table trains off the store."""
    import shutil

    shutil.copyfile(
        os.path.join(os.path.dirname(__file__), "data", "data.info.labelled"),
        os.path.join(columnar_dir, "data.info.labelled"),
    )
    from m6anet_tpu.constants import DEFAULT_NORM_PATH
    from m6anet_tpu.train.builder import build_dataloader

    cfg = {
        "dataset": {
            "root_dir": columnar_dir,
            "format": "columnar",
            "min_reads": 20,
            "norm_path": DEFAULT_NORM_PATH,
            "num_neighboring_features": 1,
        },
        "dataloader": {
            "train": {"batch_size": 4, "shuffle": True},
            "val": {"batch_size": 4},
            "test": {"batch_size": 4},
        },
    }
    train_dl, val_dl, test_dl = build_dataloader(cfg, num_workers=0, verbose=False)
    batch = next(iter(train_dl))
    assert batch["X"].shape[1:] == (20, 9)
    assert batch["kmer"].shape[1:] == (20, 3)
    assert set(np.unique(batch["y"])) <= {0.0, 1.0}


def test_concat_shards_columnar(columnar_dir, production_model, tmp_path):
    """--concat_shards + --columnar: shard stores concatenate as one dataset."""
    from m6anet_tpu.constants import DEFAULT_NORM_PATH, DEFAULT_READ_THRESHOLD
    from m6anet_tpu.data.columnar import ColumnarSiteDataset
    from m6anet_tpu.data.dataset import ConcatSiteDataset

    ds1 = ColumnarSiteDataset(columnar_dir, min_reads=20, norm_path=DEFAULT_NORM_PATH)
    both = ConcatSiteDataset(
        [columnar_dir, columnar_dir], columnar=True, min_reads=20, norm_path=DEFAULT_NORM_PATH
    )
    assert len(both) == 2 * len(ds1)
    a, b = ds1.get_site(3), both.get_site(len(ds1) + 3)
    assert a.tx_id == b.tx_id and a.tx_pos == b.tx_pos
    np.testing.assert_array_equal(a.features, b.features)


def test_replicate_columnar_norm_uses_full_window(tmp_path):
    """Computed norm factors accumulate over the FULL stored window (w=2
    store read at w=1), matching the data.json replicate path."""
    import shutil
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_dataprep import _write_synthetic_eventalign

    from m6anet_tpu.data.columnar import ReplicateColumnarDataset
    from m6anet_tpu.data.dataset import ReplicateSiteDataset
    from m6anet_tpu.dataprep import run_dataprep

    ev = tmp_path / "synthetic.txt"
    _write_synthetic_eventalign(str(ev))
    d1 = str(tmp_path / "rep1")
    run_dataprep(str(ev), d1, n_processes=1, readcount_min=1, readcount_max=1000,
                 min_segment_count=1, n_neighbors=2, output_format="both")
    d2 = str(tmp_path / "rep2")
    shutil.copytree(d1, d2)

    col = ReplicateColumnarDataset([d1, d2], min_reads=1, num_neighboring_features=1)
    js = ReplicateSiteDataset([d1, d2], min_reads=1, num_neighboring_features=1)
    assert set(col.norm_dict) == set(js.norm_dict)
    # the store holds f32 features, the json path accumulates f64 text values
    for kmer in col.norm_dict:
        np.testing.assert_allclose(col.norm_dict[kmer][0], js.norm_dict[kmer][0], rtol=1e-5)
        np.testing.assert_allclose(col.norm_dict[kmer][1], js.norm_dict[kmer][1], rtol=1e-4, atol=1e-7)


def test_columnar_training_samplers(columnar_dir):
    """Class and motif balancing samplers work on the columnar dataset
    (labels + kmer metadata are exposed like SiteDataset's)."""
    import shutil

    shutil.copyfile(
        os.path.join(os.path.dirname(__file__), "data", "data.info.labelled"),
        os.path.join(columnar_dir, "data.info.labelled"),
    )
    from m6anet_tpu.constants import DEFAULT_NORM_PATH
    from m6anet_tpu.data.columnar import ColumnarSiteDataset
    from m6anet_tpu.data.samplers import SAMPLER_REGISTRY

    ds = ColumnarSiteDataset(columnar_dir, min_reads=20, norm_path=DEFAULT_NORM_PATH, mode="Train")
    assert ds.labels is not None and len(ds.labels) == len(ds)
    for name, cls in SAMPLER_REGISTRY.items():
        sampler = cls(ds)
        idx = np.fromiter(iter(sampler), dtype=np.int64)
        assert len(idx) == len(sampler) > 0, name
        assert idx.min() >= 0 and idx.max() < len(ds), name


def test_columnar_auto_norm_matches_json(columnar_dir):
    """Without norm_path the columnar dataset auto-computes factors like
    SiteDataset (silently-raw features were a trap)."""
    from m6anet_tpu.data.columnar import ColumnarSiteDataset
    from m6anet_tpu.data.dataset import SiteDataset

    col = ColumnarSiteDataset(columnar_dir, min_reads=20, norm_path=None)
    js = SiteDataset(columnar_dir, min_reads=20, norm_path=None)
    assert col.norm_dict and set(col.norm_dict) == set(js.norm_dict)
    for k in col.norm_dict:
        np.testing.assert_allclose(col.norm_dict[k][0], js.norm_dict[k][0], rtol=1e-5)
        np.testing.assert_allclose(col.norm_dict[k][1], js.norm_dict[k][1], rtol=1e-4, atol=1e-7)
