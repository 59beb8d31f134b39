"""Block-by-block numerical parity against the *actual reference torch code*.

For every pooling filter and feature block in the reference zoo
(reference: m6anet/model/model_blocks/{blocks,pooling_blocks}.py), instantiate
the reference torch module, copy its randomly-initialised weights into our
param layout, run both on identical inputs, and require agreement to ~1e-6.

The reference package is imported from /root/reference with small stand-ins
for its unavailable third-party imports (pkg_resources/ujson/toml/tqdm) —
none of those touch the model math under test.
"""
import json
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m6anet_tpu.models import BLOCK_REGISTRY

# reference checkout root (a clone of GoekeLab/m6anet); overridable so CI
# lanes can place it anywhere
REFERENCE_DIR = os.environ.get("M6ANET_TPU_REFERENCE_DIR", "/root/reference")

# --------------------------------------------------------------------- imports


def _load_reference_blocks():
    """Import the reference model_blocks package (torch) with dep stand-ins."""
    if "pkg_resources" not in sys.modules:
        stub = types.ModuleType("pkg_resources")
        stub.resource_filename = lambda pkg, path: os.path.join(
            REFERENCE_DIR, pkg.replace(".", "/"), path
        )
        sys.modules["pkg_resources"] = stub
    if "ujson" not in sys.modules:
        uj = types.ModuleType("ujson")
        uj.dump, uj.dumps, uj.load, uj.loads = json.dump, json.dumps, json.load, json.loads
        sys.modules["ujson"] = uj
    if "toml" not in sys.modules:
        import tomllib

        tm = types.ModuleType("toml")
        tm.load = lambda f: (
            tomllib.load(open(f, "rb")) if isinstance(f, (str, os.PathLike)) else tomllib.loads(f.read())
        )

        def _dump(obj, f):  # the reference's train.py dumps train_info.toml
            import json

            f.write("# train_info (json): " + json.dumps(obj, default=str) + "\n")

        # keep this stub a superset of tools/compare_training.py's — within
        # one pytest process whichever suite imports first wins, and the
        # torch-parity slow lane runs BOTH (a dump-less stub broke the
        # reference train loop in the round-5 slow-lane validation)
        tm.dump = _dump
        sys.modules["toml"] = tm
    if "tqdm" not in sys.modules:
        import importlib.machinery

        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda it=None, *a, **k: it
        # torch._dynamo introspects module specs of everything imported
        tq.__spec__ = importlib.machinery.ModuleSpec("tqdm", None)
        sys.modules["tqdm"] = tq
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from m6anet.model.model_blocks import blocks as fb  # noqa: E402
    from m6anet.model.model_blocks import pooling_blocks as pb  # noqa: E402

    return fb, pb


# This suite alone needs the reference *source* (it parity-tests against the
# reference's own torch modules); the rest of the test suite runs from the
# vendored fixtures in tests/data and does not need /root/reference at all.
if not os.path.isdir(os.path.join(REFERENCE_DIR, "m6anet")):
    pytest.skip(
        "reference checkout not present; block-parity suite compares against "
        "the reference's own torch code",
        allow_module_level=True,
    )

FB, PB = _load_reference_blocks()
import torch  # noqa: E402  (after jax; see tests/conftest.py import-order note)

B, R = 3, 20  # sites, reads per site


# ------------------------------------------------------------- weight copying


def _seq_linears(seq):
    """Params of an nn.Sequential's Linear layers, in our MLP layout.

    .copy() everywhere: jnp.asarray can alias a numpy view of a torch buffer
    on the CPU backend, and torch mutates BN running stats in place.
    """
    layers = []
    for m in seq:
        if isinstance(m, torch.nn.Linear):
            layers.append(
                {
                    "w": jnp.asarray(m.weight.detach().numpy().copy().T),
                    "b": jnp.asarray(m.bias.detach().numpy().copy()),
                }
            )
    return {"layers": layers}


def _instance_params(mod):
    lin = mod.probability_layer[0]
    return {
        "w": jnp.asarray(lin.weight.detach().numpy().copy().T),
        "b": jnp.asarray(lin.bias.detach().numpy().copy()),
    }


def _attention_params(mod):
    return _seq_linears(mod.attention)


def _gated_params(mod):
    return {
        "attention_v": _seq_linears(mod.attention_v),
        "attention_h": _seq_linears(mod.attention_h),
        "attention": _attention_params(mod.attention),
    }


def _rand(shape, seed, scale=1.0, positive=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=shape).astype(np.float32) * scale
    if positive:
        x = rng.uniform(0.0, 1.0, size=shape).astype(np.float32)
    return x


def _cmp(ours, ref, atol=1e-6, rtol=1e-6):
    np.testing.assert_allclose(
        np.asarray(ours), ref.detach().numpy().copy(), atol=atol, rtol=rtol
    )


# ------------------------------------------------------------ instance pooling


@pytest.mark.parametrize(
    "name", ["SigmoidProdPooling", "SigmoidMeanPooling", "SigmoidMaxPooling"]
)
def test_instance_pooling_matches_torch(name):
    torch.manual_seed(0)
    tmod = getattr(PB, name)(input_channel=32, n_reads_per_site=R)
    ours = BLOCK_REGISTRY[name](input_channel=32, n_reads_per_site=R)
    params = _instance_params(tmod)

    x = _rand((B * R, 32), seed=1)
    with torch.no_grad():
        ref_site = tmod(torch.tensor(x))
        ref_read = tmod.predict_read_level_prob(torch.tensor(x))
    _cmp(ours.apply(params, jnp.asarray(x))[0], ref_site)
    _cmp(ours.read_level_prob(params, jnp.asarray(x)), ref_read)


# --------------------------------------------------------------- aggregators


@pytest.mark.parametrize("name", ["SummaryStatsAggregator", "MeanAggregator"])
def test_aggregators_match_torch(name):
    tmod = getattr(PB, name)(input_channel=8, n_reads_per_site=R)
    ours = BLOCK_REGISTRY[name](input_channel=8, n_reads_per_site=R)

    x = _rand((B * R, 8), seed=2)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
    _cmp(ours.apply({}, jnp.asarray(x))[0], ref)

    # dict passthrough contract (X aggregated, kmer untouched)
    kmer = _rand((B * R, 3), seed=3)
    with torch.no_grad():
        ref_d = tmod({"X": torch.tensor(x), "kmer": torch.tensor(kmer)})
    out_d, _ = ours.apply({}, {"X": jnp.asarray(x), "kmer": jnp.asarray(kmer)})
    _cmp(out_d["X"], ref_d["X"])
    np.testing.assert_array_equal(np.asarray(out_d["kmer"]), kmer)


def test_summary_stats_median_even_reads():
    """torch.median takes the lower of the two middle elements; jnp.median
    would average — guard the sorted-pick implementation."""
    tmod = PB.SummaryStatsAggregator(input_channel=1, n_reads_per_site=4)
    ours = BLOCK_REGISTRY["SummaryStatsAggregator"](input_channel=1, n_reads_per_site=4)
    x = np.array([[1.0], [2.0], [5.0], [9.0]], np.float32)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
    _cmp(ours.apply({}, jnp.asarray(x))[0], ref)


# ----------------------------------------------------------------- attention


def test_attention_matches_torch():
    torch.manual_seed(1)
    kw = dict(input_channel=16, hidden_layers=[8, 2], n_reads_per_site=R)
    tmod = PB.Attention(**kw)
    ours = BLOCK_REGISTRY["Attention"](**kw)
    params = _attention_params(tmod)

    x = _rand((B * R, 16), seed=4)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
        ref_w = tmod.get_attention_weights(torch.tensor(x))
        ref_p = tmod.predict_read_level_prob(torch.tensor(x))
    _cmp(ours.apply(params, jnp.asarray(x))[0], ref)
    _cmp(ours.attention_weights(params, jnp.asarray(x)), ref_w)
    _cmp(ours.read_level_prob(params, jnp.asarray(x)), ref_p)


def test_attention_single_hidden_layer_works_here():
    """hidden_layers=[K] crashes the reference (_create_attention_layers
    UnboundLocalError, reference: pooling_blocks.py:233-243); ours supports it."""
    ours = BLOCK_REGISTRY["Attention"](input_channel=16, hidden_layers=[2], n_reads_per_site=R)
    params = ours.init(jax.random.PRNGKey(0))
    y, _ = ours.apply(params, jnp.asarray(_rand((B * R, 16), seed=5)))
    assert y.shape == (B, 2 * 16)
    with pytest.raises(Exception):
        PB.Attention(input_channel=16, hidden_layers=[2], n_reads_per_site=R)


def test_gated_attention_matches_torch():
    torch.manual_seed(2)
    kw = dict(
        input_channel=16, hidden_layers_1=[8, 4], hidden_layers_2=[4, 2], n_reads_per_site=R
    )
    tmod = PB.GatedAttention(**kw)
    ours = BLOCK_REGISTRY["GatedAttention"](**kw)
    params = _gated_params(tmod)

    x = _rand((B * R, 16), seed=6)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
        ref_w = tmod.get_attention_weights(torch.tensor(x))
        ref_p = tmod.predict_read_level_prob(torch.tensor(x))
    _cmp(ours.apply(params, jnp.asarray(x))[0], ref)
    _cmp(ours.attention_weights(params, jnp.asarray(x)), ref_w)
    _cmp(ours.read_level_prob(params, jnp.asarray(x)), ref_p)


# ----------------------------------------------------------------- KDE family


def test_kde_layer_matches_torch():
    kw = dict(input_channel=2, n_bins=4, sigma=0.1, n_reads_per_site=R)
    tmod = PB.KDELayer(**kw)
    ours = BLOCK_REGISTRY["KDELayer"](**kw)
    x = _rand((B * R, 2), seed=7, positive=True)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
    _cmp(ours.apply({}, jnp.asarray(x))[0], ref, atol=2e-6)


def test_kde_attention_matches_torch():
    torch.manual_seed(3)
    kw = dict(input_channel=2, hidden_layers=[4, 2], n_bins=3, sigma=0.2, n_reads_per_site=R)
    tmod = PB.KDEAttentionLayer(**kw)
    ours = BLOCK_REGISTRY["KDEAttentionLayer"](**kw)
    params = {"attention": _attention_params(tmod.attention)}

    x = _rand((B * R, 2), seed=8, positive=True)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
        ref_p = tmod.predict_read_level_prob(torch.tensor(x))
    _cmp(ours.apply(params, jnp.asarray(x))[0], ref, atol=2e-6)
    _cmp(ours.read_level_prob(params, jnp.asarray(x)), ref_p, atol=2e-6)


def test_kde_gated_attention_matches_torch():
    torch.manual_seed(4)
    kw = dict(
        input_channel=2,
        hidden_layers_1=[4, 3],
        hidden_layers_2=[3, 2],
        n_bins=3,
        sigma=0.15,
        n_reads_per_site=R,
    )
    tmod = PB.KDEGatedAttentionLayer(**kw)
    ours = BLOCK_REGISTRY["KDEGatedAttentionLayer"](**kw)
    params = {"gated_attention": _gated_params(tmod.gated_attention)}

    x = _rand((B * R, 2), seed=9, positive=True)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
        ref_p = tmod.predict_read_level_prob(torch.tensor(x))
        ref_w = tmod.get_attention_weights(torch.tensor(x))
    _cmp(ours.apply(params, jnp.asarray(x))[0], ref, atol=2e-6)
    _cmp(ours.read_level_prob(params, jnp.asarray(x)), ref_p, atol=2e-6)
    _cmp(ours.attention_weights(params, jnp.asarray(x)), ref_w, atol=2e-6)


# ----------------------------------------------------------------- composites


def test_probability_attention_matches_torch():
    torch.manual_seed(5)
    kw = dict(
        input_channel=2,
        hidden_layers_1=[4, 3],
        hidden_layers_2=[3, 2],
        n_bins=3,
        sigma=0.2,
        n_reads_per_site=R,
    )
    tmod = PB.ProbabilityAttention(**kw)
    ours = BLOCK_REGISTRY["ProbabilityAttention"](**kw)
    params = {
        "site_decoder": {"gated_attention": _gated_params(tmod.site_decoder.gated_attention)},
        "read_classifier": _instance_params(tmod.read_classifier),
    }

    x = _rand((B * R, 2), seed=10, positive=True)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
        ref_p = tmod.predict_read_level_prob(torch.tensor(x))
        ref_w = tmod.get_attention_weights(torch.tensor(x))
    _cmp(ours.apply(params, jnp.asarray(x))[0], ref, atol=2e-6)
    _cmp(ours.read_level_prob(params, jnp.asarray(x)), ref_p, atol=2e-6)
    _cmp(ours.attention_weights(params, jnp.asarray(x)), ref_w, atol=2e-6)


@pytest.mark.parametrize("classifier", ["prod_pooling", "mean_pooling", "max_pooling"])
def test_summary_stats_probability_matches_torch(classifier):
    torch.manual_seed(6)
    tmod = PB.SummaryStatsProbability(
        input_channel=8, n_reads_per_site=R, read_classifier=classifier
    )
    ours = BLOCK_REGISTRY["SummaryStatsProbability"](
        input_channel=8, n_reads_per_site=R, read_classifier=classifier
    )
    params = {"read_classifier": _instance_params(tmod.read_classifier)}

    x = _rand((B * R, 8), seed=11)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
        ref_p = tmod.predict_read_level_prob(torch.tensor(x))
    _cmp(ours.apply(params, jnp.asarray(x))[0], ref)
    _cmp(ours.read_level_prob(params, jnp.asarray(x)), ref_p)


# -------------------------------------------------------------- feature blocks


def test_feature_chain_matches_torch():
    """Deaggregate -> KmerMultipleEmbedding -> ConcatenateFeatures, composed
    (the reference keeps kmer flat (-1, 1) between the first two; we keep
    (-1, 2w+1) — equivalent after the embedding reshape, so compare the
    composition)."""
    torch.manual_seed(7)
    t_de = FB.DeaggregateNanopolish(num_neighboring_features=1)
    t_emb = FB.KmerMultipleEmbedding(input_channel=66, output_channel=2)
    t_cat = FB.ConcatenateFeatures()

    o_de = BLOCK_REGISTRY["DeaggregateNanopolish"](num_neighboring_features=1)
    o_emb = BLOCK_REGISTRY["KmerMultipleEmbedding"](input_channel=66, output_channel=2)
    o_cat = BLOCK_REGISTRY["ConcatenateFeatures"]()
    emb_params = {
        "embedding": jnp.asarray(t_emb.embedding_layer.weight.detach().numpy().copy())
    }

    X = _rand((B * R, 9), seed=12)
    K = np.random.default_rng(13).integers(0, 66, size=(B * R, 3))
    with torch.no_grad():
        ref = t_cat(t_emb(t_de({"X": torch.tensor(X), "kmer": torch.tensor(K)})))
    x, _ = o_de.apply({}, {"X": jnp.asarray(X), "kmer": jnp.asarray(K, jnp.int32)})
    x, _ = o_emb.apply(emb_params, x)
    out, _ = o_cat.apply({}, x)
    _cmp(out, ref)


def test_extract_signal_and_flatten_match_torch():
    X = _rand((B, R, 9), seed=14)
    t_out = FB.ExtractSignal()({"X": torch.tensor(X), "kmer": None})
    o_out, _ = BLOCK_REGISTRY["ExtractSignal"]().apply({}, {"X": jnp.asarray(X)})
    _cmp(o_out, t_out)

    for start, end in [(1, 2), (0, 1), (1, -1)]:
        t_f = FB.Flatten(start, end)(torch.tensor(X))
        o_f, _ = BLOCK_REGISTRY["Flatten"](start, end).apply({}, jnp.asarray(X))
        assert o_f.shape == tuple(t_f.shape), (start, end)
        _cmp(o_f, t_f)


@pytest.mark.parametrize("activation", ["tanh", "sigmoid", "relu", "softmax"])
def test_linear_block_eval_matches_torch(activation):
    torch.manual_seed(8)
    tmod = FB.Linear(10, 6, activation=activation, batch_norm=True, dropout=0.0)
    # Non-trivial running stats: run a couple of train-mode batches through it.
    tmod.train()
    with torch.no_grad():
        for s in range(3):
            tmod(torch.tensor(_rand((32, 10), seed=20 + s, scale=2.0)))
    tmod.eval()

    ours = BLOCK_REGISTRY["Linear"](10, 6, activation=activation, batch_norm=True)
    lin, bn = tmod.layers[0], tmod.layers[1]
    params = {
        "w": jnp.asarray(lin.weight.detach().numpy().copy().T),
        "b": jnp.asarray(lin.bias.detach().numpy().copy()),
        "bn_scale": jnp.asarray(bn.weight.detach().numpy().copy()),
        "bn_bias": jnp.asarray(bn.bias.detach().numpy().copy()),
        "bn_mean": jnp.asarray(bn.running_mean.detach().numpy().copy()),
        "bn_var": jnp.asarray(bn.running_var.detach().numpy().copy()),
    }
    x = _rand((B * R, 10), seed=15)
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
    _cmp(ours.apply(params, jnp.asarray(x))[0], ref, atol=2e-6)


def test_linear_block_train_batchnorm_matches_torch():
    """Train-mode forward (biased batch var) AND the running-stat update
    (unbiased var, momentum 0.1) both match torch.nn.BatchNorm1d."""
    torch.manual_seed(9)
    tmod = FB.Linear(10, 6, activation="relu", batch_norm=True, dropout=0.0)
    ours = BLOCK_REGISTRY["Linear"](10, 6, activation="relu", batch_norm=True)
    lin, bn = tmod.layers[0], tmod.layers[1]
    params = {
        "w": jnp.asarray(lin.weight.detach().numpy().copy().T),
        "b": jnp.asarray(lin.bias.detach().numpy().copy()),
        "bn_scale": jnp.asarray(bn.weight.detach().numpy().copy()),
        "bn_bias": jnp.asarray(bn.bias.detach().numpy().copy()),
        "bn_mean": jnp.asarray(bn.running_mean.detach().numpy().copy()),
        "bn_var": jnp.asarray(bn.running_var.detach().numpy().copy()),
    }

    x = _rand((48, 10), seed=16)
    tmod.train()
    with torch.no_grad():
        ref = tmod(torch.tensor(x))
    out, updates = ours.apply(params, jnp.asarray(x), train=True)
    _cmp(out, ref, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(updates["bn_mean"]), bn.running_mean.detach().numpy().copy(), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(updates["bn_var"]), bn.running_var.detach().numpy().copy(), atol=2e-6
    )


def test_get_activation_softmax_axis_matches_torch():
    from m6anet_tpu.models.blocks import get_activation as our_act

    x = _rand((4, 5), seed=17)
    ref = FB.get_activation("softmax")(torch.tensor(x))
    _cmp(our_act("softmax")(jnp.asarray(x)), ref)
