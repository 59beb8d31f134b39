"""End-to-end demo inference for every pretrained model.

The reference ships golden outputs only for the default HCT116_RNA002 model;
for the other three, validate the full pipeline (converted weights, converted
norm factors, dataset normalization, engine, CSV contract) by recomputing a
sample of per-read probabilities with independent torch math on the same
normalized features and requiring 1e-5 agreement with the written CSV.
(BASELINE.md north star: matching demo outputs for all pretrained models.)
"""
import os
import tomllib

import numpy as np
import pandas as pd
import pytest

from m6anet_tpu.constants import DEFAULT_MODEL_CONFIG, PRETRAINED_CONFIGS
from m6anet_tpu.data.dataset import SiteDataset
from m6anet_tpu.inference.engine import run_inference
from m6anet_tpu.models import load_model

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "data", "reference_assets")

REFERENCE_STATE_DICTS = {
    "HCT116_RNA002": _ASSET_DIR + "/rna002_hct116.pt",
    "arabidopsis_RNA002": _ASSET_DIR + "/rna002_arabidopsis_virc.pt",
    "HEK293T_RNA004": _ASSET_DIR + "/rna004_hek293t_glori.pt",
    "HEK293T_RNA004_M6ACE": _ASSET_DIR + "/rna004_hek293t_m6ace.pt",
}


def _torch_read_probs(state_dict_path, X, K):
    """The production architecture evaluated with plain torch ops."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu")
    tX = torch.tensor(np.asarray(X))
    tK = torch.tensor(np.asarray(K), dtype=torch.long)
    emb = sd["read_level_encoder.1.embedding_layer.weight"][tK].reshape(len(tX), 6)
    h = torch.cat([tX, emb], dim=1)
    h = h @ sd["read_level_encoder.3.layers.0.weight"].T + sd["read_level_encoder.3.layers.0.bias"]
    h = (h - sd["read_level_encoder.3.layers.1.running_mean"]) / torch.sqrt(
        sd["read_level_encoder.3.layers.1.running_var"] + 1e-5
    )
    h = h * sd["read_level_encoder.3.layers.1.weight"] + sd["read_level_encoder.3.layers.1.bias"]
    h = torch.relu(h)
    h = torch.relu(h @ sd["read_level_encoder.4.layers.0.weight"].T + sd["read_level_encoder.4.layers.0.bias"])
    p = torch.sigmoid(
        h @ sd["pooling_filter.probability_layer.0.weight"].T + sd["pooling_filter.probability_layer.0.bias"]
    )
    return p.flatten().numpy()


@pytest.mark.parametrize("name", sorted(PRETRAINED_CONFIGS))
def test_demo_inference_every_pretrained_model(demo_dataprep_dir, tmp_path, name):
    weights_path, threshold, norm_path = PRETRAINED_CONFIGS[name]
    with open(DEFAULT_MODEL_CONFIG, "rb") as f:
        cfg = tomllib.load(f)
    model, params = load_model(cfg, weights_path)
    ds = SiteDataset(demo_dataprep_dir, min_reads=20, norm_path=norm_path)
    assert len(ds) == 101

    out = str(tmp_path / name)
    run_inference(model, params, ds, out, threshold)

    indiv = pd.read_csv(os.path.join(out, "data.indiv_proba.csv"))
    site = pd.read_csv(os.path.join(out, "data.site_proba.csv"))
    assert len(site) == 101 and len(indiv) == 5595
    assert site.probability_modified.between(0, 1).all()
    assert site.mod_ratio.between(0, 1).all()

    # Independent torch recomputation on a sample of sites
    by_key = indiv.set_index(["transcript_id", "transcript_position", "read_index"])
    for idx in (0, 31, 100):
        s = ds.get_site(idx)
        K = np.repeat(s.kmer_ids[None, :], len(s.features), axis=0)
        want = _torch_read_probs(REFERENCE_STATE_DICTS[name], s.features, K)
        got = np.array(
            [
                by_key.loc[(s.tx_id, s.tx_pos, int(r))].probability_modified
                for r in s.read_ids
            ]
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
        # exact noisy-OR over the site's reads matches the site CSV
        site_row = site[(site.transcript_id == s.tx_id) & (site.transcript_position == s.tx_pos)]
        expected_site = 1.0 - float(np.mean(1.0 - want.astype(np.float64))) ** 20
        assert abs(float(site_row.probability_modified.iloc[0]) - expected_site) < 1e-4
        # engine computes mod_ratio in f32 (same count, f32 division)
        assert abs(float(site_row.mod_ratio.iloc[0]) - float(np.mean(want >= threshold))) < 1e-7
