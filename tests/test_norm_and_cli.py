"""Norm-factor computation, convert utility, and CLI-level smoke coverage."""
import json
import os

import numpy as np
import pandas as pd
import pytest

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def test_compute_norm_dict_matches_naive():
    """Streaming per-kmer mean/std == naive per-kmer recomputation."""
    from m6anet_tpu.data.norm import annotate_kmer_information, compute_norm_dict

    info = pd.read_csv(os.path.join(DATA_DIR, "data.info.labelled"))
    info = info[info["set_type"] == "Train"].copy()
    json_path = os.path.join(DATA_DIR, "data.json")
    info = annotate_kmer_information(json_path, info, 1)
    norm = compute_norm_dict(json_path, info, 1)
    assert len(norm) >= 5  # the demo Train split covers few distinct 5-mers

    # naive recomputation for a few kmers
    sites = []
    with open(json_path, encoding="utf-8") as f:
        for _, row in info.iterrows():
            f.seek(row["start"])
            payload = json.loads(f.read(row["end"] - row["start"]))[row["transcript_id"]][
                str(row["transcript_position"])
            ]
            seq, feats = next(iter(payload.items()))
            sites.append((seq, np.asarray(feats)[:, :-1]))

    for kmer in list(norm)[:5]:
        cols = []
        for seq, feats in sites:
            for seg in range(len(seq) - 4):
                if seq[seg : seg + 5] == kmer:
                    cols.append(feats[:, 3 * seg : 3 * seg + 3])
        stacked = np.concatenate(cols)
        np.testing.assert_allclose(norm[kmer][0], stacked.mean(axis=0), rtol=1e-9)
        np.testing.assert_allclose(
            norm[kmer][1], np.sqrt((stacked**2).mean(axis=0) - stacked.mean(axis=0) ** 2), rtol=1e-6
        )


def test_compute_norm_factors_cli(tmp_path):
    """CLI writes both .npz and reference-compatible .joblib; they agree."""
    from types import SimpleNamespace

    from m6anet_tpu.data.norm import load_norm_factors
    from m6anet_tpu.scripts import compute_norm_factors

    compute_norm_factors.main(
        SimpleNamespace(input_dir=DATA_DIR, out_dir=str(tmp_path), n_processes=1)
    )
    npz = load_norm_factors(str(tmp_path / "norm_dict_nanopolish.npz"))
    jbl = load_norm_factors(str(tmp_path / "norm_dict_nanopolish.joblib"))
    assert set(npz) == set(jbl)
    for k in npz:
        np.testing.assert_allclose(npz[k][0], jbl[k][0])


def test_convert_cli(tmp_path):
    """Old data.index + data.readcount -> data.info
    (reference: m6anet/scripts/convert.py)."""
    from types import SimpleNamespace

    from m6anet_tpu.scripts import convert

    old = tmp_path / "old"
    old.mkdir()
    pd.DataFrame(
        {"transcript_id": ["tx1", "tx2"], "transcript_position": [10, 20], "start": [0, 100], "end": [100, 250]}
    ).to_csv(old / "data.index", index=False)
    pd.DataFrame(
        {"transcript_id": ["tx1", "tx2"], "transcript_position": [10, 20], "n_reads": [30, 44]}
    ).to_csv(old / "data.readcount", index=False)

    out = tmp_path / "new"
    convert.main(SimpleNamespace(input_dir=str(old), out_dir=str(out)))
    info = pd.read_csv(out / "data.info")
    assert set(info.columns) == {"transcript_id", "transcript_position", "n_reads", "start", "end"}
    assert len(info) == 2


def test_replicate_training_dataset(tmp_path):
    """Training-mode replicate dataset: merged labels, sampled reads."""
    import shutil

    from m6anet_tpu.constants import DEFAULT_NORM_PATH
    from m6anet_tpu.data.dataset import ReplicateSiteDataset

    rep = tmp_path / "rep"
    rep.mkdir()
    for name in ("data.info.labelled", "data.json"):
        shutil.copyfile(os.path.join(DATA_DIR, name), rep / name)

    ds = ReplicateSiteDataset(
        [DATA_DIR, str(rep)], min_reads=20, norm_path=DEFAULT_NORM_PATH, mode="Train"
    )
    assert len(ds) > 0
    features, kmers, label = ds[0]
    assert features.shape == (20, 9)
    assert kmers.shape == (20, 3)
    assert label in (0, 1)


def test_deprecated_shims_warn():
    import warnings

    from m6anet_tpu.deprecated import dataprep as dep

    class Args:
        pass

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        try:
            dep.main(Args())  # missing attrs -> fails after the warning
        except Exception:
            pass
        assert any(issubclass(w.category, DeprecationWarning) for w in caught)


def test_cli_help_surfaces():
    from m6anet_tpu.cli import main

    for cmd in ("dataprep", "inference", "train", "compute_norm_factors", "convert"):
        with pytest.raises(SystemExit) as exc:
            main([cmd, "--help"])
        assert exc.value.code == 0


def test_replicates_partial_overlap(tmp_path):
    """A site present in only one replicate still pools correctly (outer
    join, summed n_reads) — reference: data_utils.py:341-375."""
    from m6anet_tpu.constants import DEFAULT_NORM_PATH
    from m6anet_tpu.data.dataset import ReplicateSiteDataset, SiteDataset

    # replicate 2 = first half of the demo's data.info only
    rep = tmp_path / "rep"
    rep.mkdir()
    info = pd.read_csv(os.path.join(DATA_DIR, "data.info"))
    info.iloc[: len(info) // 2].to_csv(rep / "data.info", index=False)
    import shutil

    shutil.copyfile(os.path.join(DATA_DIR, "data.json"), rep / "data.json")

    ds = ReplicateSiteDataset([DATA_DIR, str(rep)], min_reads=20,
                              norm_path=DEFAULT_NORM_PATH)
    single = SiteDataset(DATA_DIR, min_reads=20, norm_path=DEFAULT_NORM_PATH)
    assert len(ds) >= len(single)

    halved = set(
        zip(info.iloc[: len(info) // 2]["transcript_id"],
            info.iloc[: len(info) // 2]["transcript_position"])
    )
    doubled = 0
    for i in range(len(ds)):
        site = ds.get_site(i)
        key = (site.tx_id, site.tx_pos)
        suffixes = {r.split("_")[-1] for r in site.read_ids}
        if key in halved:
            assert suffixes == {"0", "1"}
            doubled += 1
        else:
            assert suffixes == {"0"}
    assert doubled > 0


def test_replicate_computed_norm_matches_single(tmp_path):
    """Norm factors computed over duplicated replicates == single-run values
    (same mean; streaming accumulation across files)."""
    import shutil

    from m6anet_tpu.data.dataset import ReplicateSiteDataset, SiteDataset

    rep = tmp_path / "rep"
    rep.mkdir()
    for name in ("data.info.labelled", "data.json"):
        shutil.copyfile(os.path.join(DATA_DIR, name), rep / name)

    single = SiteDataset(DATA_DIR, min_reads=20, norm_path=None, mode="Train")
    # min_reads doubles under the summed-count filter, so 40 selects the
    # same site set as the single run at 20
    double = ReplicateSiteDataset([DATA_DIR, str(rep)], min_reads=40,
                                  norm_path=None, mode="Train")
    assert set(single.norm_dict) <= set(double.norm_dict)
    for k in list(single.norm_dict)[:5]:
        np.testing.assert_allclose(double.norm_dict[k][0], single.norm_dict[k][0], rtol=1e-9)
        np.testing.assert_allclose(double.norm_dict[k][1], single.norm_dict[k][1], rtol=1e-6)


def test_zero_std_norm_guard():
    """A kmer with constant signal (std 0) must not z-score to NaN/inf
    (the reference divides unguarded; deliberate behavioural fix)."""
    from m6anet_tpu.data.norm import site_norm_vectors

    norm = {"AAAAA": (np.zeros(3), np.zeros(3)), "AAAAC": (np.ones(3), np.ones(3)),
            "AAACA": (np.ones(3), np.ones(3))}
    mean, std = site_norm_vectors(norm, "AAAAACA", 3)
    assert (std > 0).all()
    x = np.zeros(9, np.float64)
    assert np.isfinite((x - mean) / std).all()


def test_weighted_bce_single_class_batch():
    """All-negative (or all-positive) batches fall back to plain BCE instead
    of zero loss / zero gradients (the reference crashes here)."""
    import jax.numpy as jnp

    from m6anet_tpu.train.losses import weighted_binary_cross_entropy_loss

    pred = jnp.asarray([0.2, 0.8, 0.5])
    loss0 = weighted_binary_cross_entropy_loss(pred, jnp.zeros(3))
    loss1 = weighted_binary_cross_entropy_loss(pred, jnp.ones(3))
    assert float(loss0) > 0 and float(loss1) > 0
    mixed = weighted_binary_cross_entropy_loss(pred, jnp.asarray([0.0, 1.0, 0.0]))
    assert float(mixed) > 0
