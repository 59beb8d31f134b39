"""Training-engine tests: losses, samplers, tree serialisation, and a short
end-to-end training run on the demo labelled dataset (the reference suite has
no training tests at all — SURVEY.md §4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m6anet_tpu.constants import DEFAULT_NORM_PATH

REFERENCE_DIR = os.environ.get("M6ANET_TPU_REFERENCE_DIR", "/root/reference")

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def test_bce_matches_torch_semantics():
    import torch

    from m6anet_tpu.train.losses import binary_cross_entropy_loss, weighted_binary_cross_entropy_loss

    rng = np.random.default_rng(0)
    y_pred = rng.uniform(0.01, 0.99, size=32).astype(np.float32)
    y_true = rng.integers(0, 2, size=32).astype(np.float32)

    ours = float(binary_cross_entropy_loss(jnp.asarray(y_pred), jnp.asarray(y_true)))
    theirs = float(torch.nn.BCELoss()(torch.tensor(y_pred), torch.tensor(y_true)))
    assert abs(ours - theirs) < 1e-6

    # weighted: label-0 -> n_pos, label-1 -> n_neg (inverse-frequency pairing)
    n_pos, n_neg = y_true.sum(), len(y_true) - y_true.sum()
    w = np.where(y_true == 0, n_pos, n_neg)
    expected = float(
        (torch.nn.BCELoss(reduction="none")(torch.tensor(y_pred), torch.tensor(y_true)) * torch.tensor(w)).mean()
    )
    ours_w = float(weighted_binary_cross_entropy_loss(jnp.asarray(y_pred), jnp.asarray(y_true)))
    assert abs(ours_w - expected) < 1e-4


def test_bce_gradient_finite_at_saturation():
    """Noisy-OR pooling saturates site probabilities at exactly 0.0/1.0
    (prod underflow), where the naive autodiff of the clamped-log BCE gives
    0*inf = NaN; torch's native backward is (p-y)/max(p(1-p), 1e-12) —
    huge but finite.  The custom_vjp must match torch's gradients both at
    the boundary and in the interior (this NaN'd 2/5 multi-seed training
    runs before the fix)."""
    import torch

    from m6anet_tpu.train.losses import binary_cross_entropy_loss

    y_pred = np.array([0.0, 1.0, 1e-30, 1.0 - 1e-7, 0.3], np.float32)
    y_true = np.array([1.0, 0.0, 1.0, 0.0, 1.0], np.float32)

    g = jax.grad(lambda p: binary_cross_entropy_loss(p, jnp.asarray(y_true)))(
        jnp.asarray(y_pred)
    )
    g = np.asarray(g)
    assert np.isfinite(g).all(), g

    tp = torch.tensor(y_pred, requires_grad=True)
    torch.nn.BCELoss()(tp, torch.tensor(y_true)).backward()
    np.testing.assert_allclose(g, tp.grad.numpy(), rtol=1e-4)


def test_treeio_roundtrip(tmp_path):
    from m6anet_tpu.utils.treeio import load_tree, save_tree

    tree = {
        "block1": {"embedding": np.arange(6, dtype=np.float32).reshape(3, 2)},
        "block5": {"layers": [{"w": np.ones((2, 2))}, {"w": np.zeros((2, 1))}]},
    }
    path = os.path.join(tmp_path, "t.npz")
    save_tree(path, tree)
    back = load_tree(path)
    assert isinstance(back["block5"]["layers"], list)
    np.testing.assert_array_equal(back["block1"]["embedding"], tree["block1"]["embedding"])
    np.testing.assert_array_equal(back["block5"]["layers"][1]["w"], tree["block5"]["layers"][1]["w"])


@pytest.fixture(scope="module")
def train_datasets():
    from m6anet_tpu.data.dataset import SiteDataset

    common = dict(root_dir=DATA_DIR, min_reads=20, norm_path=DEFAULT_NORM_PATH)
    return (
        SiteDataset(**common, mode="Train"),
        SiteDataset(**common, mode="Val"),
    )


def test_samplers_balance(train_datasets):
    from m6anet_tpu.data.samplers import (
        ImbalanceKmerOverSampler,
        ImbalanceKmerUnderSampler,
        ImbalanceOverSampler,
        ImbalanceUnderSampler,
    )

    train_ds, _ = train_datasets
    labels = np.asarray(train_ds.labels)

    under = ImbalanceUnderSampler(train_ds)
    idx = np.fromiter(iter(under), dtype=int)
    assert len(idx) == len(under)
    counts = np.bincount(labels[idx])
    assert counts[0] == counts[1]

    over = ImbalanceOverSampler(train_ds)
    idx = np.fromiter(iter(over), dtype=int)
    assert len(idx) == len(over)
    counts = np.bincount(labels[idx])
    assert counts[0] == counts[1]

    for cls in (ImbalanceKmerUnderSampler, ImbalanceKmerOverSampler):
        sampler = cls(train_ds)
        idx = np.fromiter(iter(sampler), dtype=int)
        assert len(idx) == len(sampler) > 0


def test_training_learns(train_datasets, tmp_path):
    from m6anet_tpu.data.loader import TrainLoader
    from m6anet_tpu.models.mil import MILModel
    from m6anet_tpu.train.loop import make_optimizer, train
    from m6anet_tpu.train.losses import binary_cross_entropy_loss
    from m6anet_tpu.utils.config import load_toml
    from m6anet_tpu.constants import DEFAULT_MODEL_CONFIG

    train_ds, val_ds = train_datasets
    train_ds.rng = np.random.RandomState(0)
    val_ds.rng = np.random.RandomState(1)

    model = MILModel(load_toml(DEFAULT_MODEL_CONFIG))
    params = model.init(jax.random.PRNGKey(0))

    train_dl = TrainLoader(train_ds, batch_size=32, shuffle=True, num_workers=2)
    val_dl = TrainLoader(val_ds, batch_size=32, num_workers=2)

    optimizer = make_optimizer(lr=4e-3, weight_decay=1e-5, clip_grad=5.0)
    params, train_results, val_results = train(
        model,
        params,
        train_dl,
        val_dl,
        optimizer,
        n_epoch=4,
        loss_fn=binary_cross_entropy_loss,
        save_dir=str(tmp_path),
        save_per_epoch=2,
        n_iterations=2,
        seed=0,
    )
    assert len(train_results["avg_loss"]) == 4
    assert np.isfinite(train_results["avg_loss"]).all()
    assert train_results["avg_loss"][-1] < train_results["avg_loss"][0]
    assert os.path.exists(os.path.join(tmp_path, "model_states", "2", "model_states.npz"))
    assert os.path.exists(os.path.join(tmp_path, "model_states", "4", "model_states.npz"))
    # BN running stats must have moved away from init
    assert not np.allclose(np.asarray(params["block3"]["bn_mean"]), 0.0)


def test_detect_stall_window():
    """The detector needs the FULL trailing window inside the plateau —
    escaping runs (loss leaves the band) and short histories never fire."""
    from m6anet_tpu.train.loop import detect_stall

    plateau_l, plateau_r = [6.9] * 25, [0.50] * 25
    assert detect_stall(plateau_l, plateau_r, patience=20)
    # too short a history
    assert not detect_stall(plateau_l[:10], plateau_r[:10], patience=20)
    # converging: recent losses left the band
    assert not detect_stall(plateau_l[:-1] + [1.2], plateau_r, patience=20)
    # plateau loss but the model is actually ranking (ROC high)
    assert not detect_stall(plateau_l, plateau_r[:-1] + [0.9], patience=20)
    # patience 0 disables detection
    assert not detect_stall(plateau_l, plateau_r, patience=0)


def test_reseed_on_stall_restarts(train_datasets):
    """Restart mechanics: with lr=0 nothing can leave the fresh-init
    plateau, so a wide detection window fires after `patience` epochs and
    training restarts with derived seeds until the budget is spent."""
    from m6anet_tpu.data.loader import TrainLoader
    from m6anet_tpu.constants import DEFAULT_MODEL_CONFIG
    from m6anet_tpu.models.mil import MILModel
    from m6anet_tpu.train.loop import make_optimizer, train
    from m6anet_tpu.train.losses import binary_cross_entropy_loss
    from m6anet_tpu.utils.config import load_toml

    train_ds, val_ds = train_datasets
    model = MILModel(load_toml(DEFAULT_MODEL_CONFIG))
    params = model.init(jax.random.PRNGKey(0))
    train_dl = TrainLoader(train_ds, batch_size=32, num_workers=1)
    val_dl = TrainLoader(val_ds, batch_size=32, num_workers=1)

    init_seeds = []

    def init_fn(s):
        init_seeds.append(s)
        return model.init(jax.random.PRNGKey(s))

    params, tr, vr = train(
        model, params, train_dl, val_dl, make_optimizer(lr=0.0),
        n_epoch=3, loss_fn=binary_cross_entropy_loss, save_per_epoch=3,
        seed=7, init_fn=init_fn, reseed_on_stall=True, stall_patience=2,
        max_restarts=2,
        stall_loss_range=(0.0, 1e6), stall_roc_range=(0.0, 1.0),
    )
    # two restarts with distinct deterministic derived seeds, then the final
    # attempt runs to completion and its full series is returned
    assert init_seeds == [7 + 9973, 7 + 2 * 9973]
    assert len(tr["avg_loss"]) == 3 and len(vr["avg_loss"]) == 3

    with pytest.raises(ValueError, match="init_fn"):
        train(
            model, params, train_dl, val_dl, make_optimizer(lr=0.0),
            n_epoch=1, loss_fn=binary_cross_entropy_loss, save_per_epoch=1,
            reseed_on_stall=True,
        )


def test_saturation_aware_init_escapes_fixed_point():
    """Biasing the probability layer negative moves fresh-init site_p off
    the saturated noisy-OR boundary (site_p ~ 1) the stall study identified."""
    from m6anet_tpu.constants import DEFAULT_MODEL_CONFIG
    from m6anet_tpu.models.mil import MILModel
    from m6anet_tpu.train.loop import saturation_aware_init
    from m6anet_tpu.utils.config import load_toml

    model = MILModel(load_toml(DEFAULT_MODEL_CONFIG))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "X": rng.normal(size=(16, 20, 9)).astype(np.float32),
        "kmer": rng.integers(0, 66, size=(16, 20, 3)).astype(np.int32),
    }
    fresh, _ = model.site_probability(params, batch, train=False)
    biased_params = saturation_aware_init(model, params, bias=-4.0)
    biased, _ = model.site_probability(biased_params, batch, train=False)
    assert float(np.min(fresh)) > 0.99  # the fixed point: saturated at ~1
    assert float(np.max(biased)) < 0.9  # bias breaks the saturation
    # only the probability layer's bias changed
    np.testing.assert_array_equal(
        np.asarray(biased_params["block3"]["w"]), np.asarray(params["block3"]["w"])
    )


def test_toml_dump_roundtrip(tmp_path):
    from m6anet_tpu.utils.config import dump_toml, load_toml

    cfg = {
        "model": "prod",
        "block": [{"block_type": "Linear", "input_channel": 15}, {"block_type": "SigmoidProdPooling"}],
        "dataloader": {"train": {"batch_size": 256, "shuffle": True}},
    }
    path = os.path.join(tmp_path, "c.toml")
    dump_toml(cfg, path)
    back = load_toml(path)
    assert back == cfg


def test_checkpoint_resume_roundtrip(tmp_path):
    """save_checkpoint/restore_checkpoint reproduce params and Adam state."""
    import jax
    from m6anet_tpu.constants import DEFAULT_MODEL_CONFIG
    from m6anet_tpu.models.mil import MILModel
    from m6anet_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
    from m6anet_tpu.train.loop import make_optimizer, make_train_step
    from m6anet_tpu.train.losses import binary_cross_entropy_loss
    from m6anet_tpu.utils.config import load_toml

    model = MILModel(load_toml(DEFAULT_MODEL_CONFIG))
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    step = make_train_step(model, binary_cross_entropy_loss, optimizer)

    rng = np.random.default_rng(0)
    batch = {
        "X": rng.normal(size=(8, 20, 9)).astype(np.float32),
        "kmer": rng.integers(0, 66, size=(8, 20, 3)).astype(np.int32),
        "y": rng.integers(0, 2, size=(8,)).astype(np.float32),
    }
    params, opt_state, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(1))

    ckpt = str(tmp_path / "model_states" / "3")
    save_checkpoint(ckpt, params, opt_state, 3)
    assert latest_checkpoint(str(tmp_path)) == ckpt
    params2, opt_state2, epoch = restore_checkpoint(ckpt, optimizer)
    assert epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(opt_state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # stepping the restored state matches stepping the original
    p1, o1, l1, _ = step(params, opt_state, batch, jax.random.PRNGKey(2))
    p2, o2, l2, _ = step(params2, opt_state2, batch, jax.random.PRNGKey(2))
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_architecture_trains(train_datasets):
    """A non-production architecture (attention pooling + decoder blocks after
    the pooling filter) assembles and trains — exercises the decoder path of
    the model assembler (reference: m6anet/model/model.py:61-69)."""
    from m6anet_tpu.data.loader import TrainLoader
    from m6anet_tpu.models.mil import MILModel
    from m6anet_tpu.train.loop import make_optimizer, train
    from m6anet_tpu.train.losses import binary_cross_entropy_loss

    config = {
        "block": [
            {"block_type": "DeaggregateNanopolish", "num_neighboring_features": 1},
            {"block_type": "KmerMultipleEmbedding", "input_channel": 66, "output_channel": 2,
             "num_neighboring_features": 1},
            {"block_type": "ConcatenateFeatures"},
            {"block_type": "Linear", "input_channel": 15, "output_channel": 32,
             "activation": "relu", "batch_norm": True},
            {"block_type": "Attention", "input_channel": 32, "hidden_layers": [16, 1],
             "n_reads_per_site": 20},
            {"block_type": "Linear", "input_channel": 32, "output_channel": 1,
             "activation": "sigmoid", "batch_norm": False},
        ]
    }
    model = MILModel(config)
    assert model.decoder, "config must produce a decoder stage"
    params = model.init(jax.random.PRNGKey(0))

    train_ds, val_ds = train_datasets
    train_ds.rng = np.random.RandomState(2)
    val_ds.rng = np.random.RandomState(3)
    train_dl = TrainLoader(train_ds, batch_size=16, shuffle=True, num_workers=2)
    val_dl = TrainLoader(val_ds, batch_size=16, num_workers=2)

    optimizer = make_optimizer(lr=2e-3)
    params, tr, vr = train(
        model, params, train_dl, val_dl, optimizer, n_epoch=2,
        loss_fn=binary_cross_entropy_loss, save_dir=None, save_per_epoch=2,
        n_iterations=1, seed=0,
    )
    assert np.isfinite(tr["avg_loss"]).all()
    assert len(vr["roc_auc"]) == 2


def test_summary_stats_probability_architecture_infers():
    """SummaryStatsProbability pooling: site decoder + read classifier
    (reference: pooling_blocks.py:291-310)."""
    from m6anet_tpu.models.mil import MILModel

    config = {
        "block": [
            {"block_type": "DeaggregateNanopolish", "num_neighboring_features": 1},
            {"block_type": "ExtractSignal"},
            {"block_type": "Linear", "input_channel": 9, "output_channel": 8,
             "activation": "relu", "batch_norm": False},
            {"block_type": "SummaryStatsProbability", "input_channel": 8,
             "n_reads_per_site": 20},
            {"block_type": "Linear", "input_channel": 40, "output_channel": 1,
             "activation": "sigmoid", "batch_norm": False},
        ]
    }
    model = MILModel(config)
    params = model.init(jax.random.PRNGKey(1))
    batch = {
        "X": jnp.asarray(np.random.default_rng(0).normal(size=(40, 9)), jnp.float32),
        "kmer": jnp.zeros((40, 3), jnp.int32),
    }
    site, _ = model.site_probability(params, batch)
    assert site.shape == (2, 1)
    read_prob = model.read_probability(params, batch)
    assert read_prob.shape == (2, 20)
    flat = model.per_read_probability(params, batch)
    assert flat.shape == (40,)


@pytest.mark.skipif(
    not (os.path.isdir(os.path.join(REFERENCE_DIR, "m6anet")) and os.environ.get("M6ANET_TPU_SLOW_TESTS")),
    reason="opt-in (set M6ANET_TPU_SLOW_TESTS=1; needs the reference checkout): "
    "trains BOTH stacks to convergence (~3 min)",
)
def test_training_matches_reference_torch_loop():
    """End-to-end training comparison against the reference's actual torch
    loop (reference: m6anet/utils/training_utils.py:61-268) on the labelled
    demo data: same config/sampler/lr/epochs, final metrics within a
    statistical band (RNG streams differ).  See tools/compare_training.py;
    the documented run is recorded in PERFORMANCE.md."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from compare_training import compare

    rep = compare(epochs=300, num_iterations=5, seed=25)
    ours, ref = rep["ours"], rep["reference"]
    # both stacks must have learned the train split to a comparable level
    assert ours["train_roc_auc"] > 0.85, ours
    assert ref["train_roc_auc"] > 0.85, ref
    assert abs(ours["train_roc_auc"] - ref["train_roc_auc"]) < 0.1
    assert abs(ours["train_pr_auc"] - ref["train_pr_auc"]) < 0.12
    # val split has only 2 positives of 19 sites: wide statistical band
    assert ours["val_roc_auc"] > 0.6 and ref["val_roc_auc"] > 0.6


@pytest.mark.skipif(
    not (os.path.isdir(os.path.join(REFERENCE_DIR, "m6anet")) and os.environ.get("M6ANET_TPU_SLOW_TESTS")),
    reason="opt-in (set M6ANET_TPU_SLOW_TESTS=1; needs the reference checkout): "
    "multi-seed statistical training parity (~15 min)",
)
def test_training_parity_statistical():
    """Multi-seed statistical parity on a >=600-site synthesized labelled
    set: mean final metrics of both stacks must sit in overlapping bands,
    and no seed of ours may diverge (the BCE custom_vjp reproduces torch's
    clamped backward at noisy-OR saturation — before it, 2/5 seeds NaN'd).
    The documented 5-seed / 1000-site run is in PERFORMANCE.md."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from compare_training import compare_multi

    rep = compare_multi(n_seeds=3, epochs=120, num_iterations=3, n_sites=600)
    s = rep["summary"]
    assert s["ours"]["n_ok"] == 3, rep["errors"]
    assert s["reference"]["n_ok"] == 3, rep["errors"]
    for m in ("train_roc_auc", "val_roc_auc", "train_pr_auc", "val_pr_auc"):
        a, b = s["ours"][m], s["reference"][m]
        band = 0.05 + 2.0 * (a["sd"] + b["sd"])
        assert abs(a["mean"] - b["mean"]) <= band, (m, a, b)
