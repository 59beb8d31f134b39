"""Model-level numerics tests: block registry, shapes, and parity of the
production architecture against the released reference weights evaluated with
independent torch math (unit-level cross-check; the reference has no analog —
its suite is integration-only, see SURVEY.md §4)."""
import os
import tomllib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m6anet_tpu.constants import DEFAULT_MODEL_CONFIG, PRETRAINED_CONFIGS
from m6anet_tpu.models import BLOCK_REGISTRY, MILModel, load_model

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "data", "reference_assets")

REFERENCE_STATE_DICTS = {
    "HCT116_RNA002": _ASSET_DIR + "/rna002_hct116.pt",
    "arabidopsis_RNA002": _ASSET_DIR + "/rna002_arabidopsis_virc.pt",
    "HEK293T_RNA004": _ASSET_DIR + "/rna004_hek293t_glori.pt",
    "HEK293T_RNA004_M6ACE": _ASSET_DIR + "/rna004_hek293t_m6ace.pt",
}


def _load_cfg():
    with open(DEFAULT_MODEL_CONFIG, "rb") as f:
        return tomllib.load(f)


def _torch_reference_read_probs(state_dict_path, X, K):
    """Independent torch evaluation of the production architecture."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu")
    tX = torch.tensor(X)
    tK = torch.tensor(K, dtype=torch.long)
    emb = sd["read_level_encoder.1.embedding_layer.weight"][tK].reshape(len(X), 6)
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


def test_registry_has_all_reference_blocks():
    expected = {
        "DeaggregateNanopolish", "ExtractSignal", "ConcatenateFeatures", "Flatten",
        "KmerMultipleEmbedding", "Linear",
        "SigmoidProdPooling", "SigmoidMeanPooling", "SigmoidMaxPooling",
        "SummaryStatsAggregator", "MeanAggregator", "Attention", "GatedAttention",
        "ProbabilityAttention", "SummaryStatsProbability",
        "KDELayer", "KDEAttentionLayer", "KDEGatedAttentionLayer",
    }
    missing = expected - set(BLOCK_REGISTRY)
    assert not missing, f"missing blocks: {missing}"


@pytest.mark.parametrize("name", sorted(REFERENCE_STATE_DICTS))
def test_production_model_matches_reference_weights(name):
    model, params = load_model(_load_cfg(), PRETRAINED_CONFIGS[name][0])
    rng = np.random.default_rng(42)
    N = 80
    X = rng.normal(size=(N, 9)).astype(np.float32)
    K = rng.integers(0, 66, size=(N, 3)).astype(np.int32)

    p_ref = _torch_reference_read_probs(REFERENCE_STATE_DICTS[name], X, K)
    p_jax = np.asarray(model.per_read_probability(params, {"X": jnp.asarray(X), "kmer": jnp.asarray(K)}))
    np.testing.assert_allclose(p_jax, p_ref, atol=2e-6)

    site_ref = 1 - np.prod(1 - p_ref.reshape(-1, 20), axis=1)
    site_jax = np.asarray(model.site_probability(params, {"X": jnp.asarray(X), "kmer": jnp.asarray(K)})[0])
    np.testing.assert_allclose(site_jax, site_ref, atol=2e-6)


def test_forward_is_jittable():
    model, params = load_model(_load_cfg(), PRETRAINED_CONFIGS["HCT116_RNA002"][0])
    fwd = jax.jit(lambda p, b: model.site_probability(p, b)[0])
    batch = {
        "X": jnp.zeros((40, 9), jnp.float32),
        "kmer": jnp.zeros((40, 3), jnp.int32),
    }
    out = fwd(params, batch)
    assert out.shape == (2,)
    assert bool(jnp.all((out >= 0) & (out <= 1)))


def test_init_then_apply_all_pooling_variants():
    """Every pooling family initialises and runs with static shapes."""
    variants = [
        {"block_type": "SigmoidProdPooling", "input_channel": 32, "n_reads_per_site": 20},
        {"block_type": "SigmoidMeanPooling", "input_channel": 32, "n_reads_per_site": 20},
        {"block_type": "SigmoidMaxPooling", "input_channel": 32, "n_reads_per_site": 20},
        {"block_type": "SummaryStatsAggregator", "input_channel": 32, "n_reads_per_site": 20},
        {"block_type": "MeanAggregator", "input_channel": 32, "n_reads_per_site": 20},
        {"block_type": "Attention", "input_channel": 32, "hidden_layers": [16, 1], "n_reads_per_site": 20},
        {
            "block_type": "GatedAttention", "input_channel": 32,
            "hidden_layers_1": [16], "hidden_layers_2": [8, 1], "n_reads_per_site": 20,
        },
        {"block_type": "KDELayer", "input_channel": 1, "n_bins": 4, "sigma": 0.1, "n_reads_per_site": 20},
        {
            "block_type": "KDEAttentionLayer", "input_channel": 1, "hidden_layers": [4, 1],
            "n_bins": 4, "sigma": 0.1, "n_reads_per_site": 20,
        },
        {
            "block_type": "KDEGatedAttentionLayer", "input_channel": 1, "hidden_layers_1": [4],
            "hidden_layers_2": [4, 1], "n_bins": 4, "sigma": 0.1, "n_reads_per_site": 20,
        },
        {
            "block_type": "ProbabilityAttention", "input_channel": 1, "hidden_layers_1": [4],
            "hidden_layers_2": [4, 1], "n_bins": 4, "sigma": 0.1, "n_reads_per_site": 20,
        },
        {"block_type": "SummaryStatsProbability", "input_channel": 32, "n_reads_per_site": 20},
    ]
    key = jax.random.PRNGKey(0)
    for spec in variants:
        spec = dict(spec)
        name = spec.pop("block_type")
        blk = BLOCK_REGISTRY[name](**spec)
        params = blk.init(key)
        x = jnp.ones((40, spec["input_channel"]), jnp.float32) * 0.3
        y, _ = blk.apply(params, x)
        assert y.shape[0] == 2, name


def test_train_mode_batchnorm_updates():
    model = MILModel(_load_cfg())
    params = model.init(jax.random.PRNGKey(0))
    batch = {
        "X": jnp.asarray(np.random.default_rng(1).normal(size=(40, 9)), jnp.float32),
        "kmer": jnp.zeros((40, 3), jnp.int32),
    }
    out, updates = model.site_probability(params, batch, train=True, rng=jax.random.PRNGKey(1))
    assert "block3" in updates and "bn_mean" in updates["block3"]
    assert not bool(jnp.allclose(updates["block3"]["bn_mean"], params["block3"]["bn_mean"]))


def test_signal_only_config():
    from m6anet_tpu.constants import asset_path

    with open(asset_path("configs", "prod_pooling_signal.toml"), "rb") as f:
        cfg = tomllib.load(f)
    model = MILModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = {"X": jnp.zeros((40, 9), jnp.float32), "kmer": jnp.zeros((40, 3), jnp.int32)}
    out, _ = model.site_probability(params, batch)
    assert out.shape == (2,)
