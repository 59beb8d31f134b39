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
    col = ColumnarSiteDataset(columnar_dir, min_reads=1, norm_path=None, mode="Inference")
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
        "/root/reference/m6anet/tests/data/data.info.labelled",
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
