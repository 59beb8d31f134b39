"""Multi-device (8 virtual CPU devices) sharding tests: the sharded inference
path must produce the same CSVs as single-device, and the full training step
must compile and run over a dp mesh (the reference has no distributed path at
all — SURVEY.md §2.2)."""
import os
import sys

import filecmp

import numpy as np
import pandas as pd
import pytest

from m6anet_tpu.constants import DEFAULT_MIN_READS, PRETRAINED_CONFIGS
from m6anet_tpu.data.dataset import build_dataset
from m6anet_tpu.inference.engine import run_inference

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def test_sharded_inference_matches_single_device(production_model, tmp_path):
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")

    run_inference(model, params, ds, str(tmp_path / "mesh"), read_proba_threshold=thr,
                  use_mesh=True)
    run_inference(model, params, ds, str(tmp_path / "single"), read_proba_threshold=thr,
                  use_mesh=False)

    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(tmp_path / "mesh" / name)
        b = pd.read_csv(tmp_path / "single" / name)
        np.testing.assert_allclose(
            a["probability_modified"], b["probability_modified"], atol=1e-6
        )


def test_dryrun_multichip():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args) if not hasattr(fn, "lower") else fn(*args)
    jax.block_until_ready(out)


def test_host_shard_bounds():
    from m6anet_tpu.parallel.mesh import host_shard_bounds

    spans = [host_shard_bounds(10, 4, h) for h in range(4)]
    assert spans[0] == (0, 3)
    assert spans[-1][1] == 10
    covered = []
    for s, e in spans:
        covered.extend(range(s, e))
    assert covered == list(range(10))


def test_host_sharded_inference_merges_to_single_host_result(production_model, tmp_path):
    """3 host shards + merge == single-host run (placement-invariant keys)."""
    from m6anet_tpu.inference.engine import merge_host_shards

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")

    single = tmp_path / "single"
    run_inference(model, params, ds, str(single), read_proba_threshold=thr, method="mc",
                  num_iterations=50, seed=3)

    sharded = tmp_path / "sharded"
    for host in range(3):
        run_inference(model, params, ds, str(sharded), read_proba_threshold=thr, method="mc",
                      num_iterations=50, seed=3, host_shard=(host, 3))
    merge_host_shards(str(sharded), 3)

    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(single / name)
        b = pd.read_csv(sharded / name)
        pd.testing.assert_frame_equal(a, b)


def test_multiprocess_distributed_inference(production_model, tmp_path):
    """REAL multi-process distributed path: 2 subprocesses with
    jax.distributed.initialize() on the CPU backend run the inference CLI
    with --distributed; the cross-process barrier fires and host 0 merges
    the CSV shards.  The merged output must equal a single-process run
    (MC draws are placement-invariant).  SURVEY.md §2.2."""
    import subprocess
    import socket

    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out_dir = tmp_path / "dist"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(i), DATA_DIR, str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, logbytes in zip(procs, logs):
        assert p.returncode == 0, logbytes.decode(errors="replace")[-4000:]

    # single-process result with the same config (mc, 50 iters, seed 3)
    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    single = tmp_path / "single"
    run_inference(model, params, ds, str(single), read_proba_threshold=thr,
                  method="mc", num_iterations=50, seed=3)

    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(single / name)
        b = pd.read_csv(out_dir / name)
        np.testing.assert_allclose(
            a["probability_modified"], b["probability_modified"], atol=1e-6
        )
        assert list(a.columns) == list(b.columns) and len(a) == len(b)


def test_multiprocess_distributed_2hosts_fused(production_model, tmp_path):
    """2 processes running --distributed with --backend pallas_fused
    (interpret on CPU): the production multi-host combination, always-on.
    Two processes keep arrival skew far under Gloo's hard 30 s context-init
    deadline (the 4-process variant below is opt-in for that reason)."""
    import socket
    import subprocess

    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_dir = tmp_path / "dist2f"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(i),
             DATA_DIR, str(out_dir), "pallas_fused", "exact", "8192", "512"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, logbytes in zip(procs, logs):
        assert p.returncode == 0, logbytes.decode(errors="replace")[-4000:]

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    single = tmp_path / "single2f"
    run_inference(model, params, ds, str(single), read_proba_threshold=thr,
                  method="exact", backend="pallas_fused", precision="f32")
    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(single / name)
        b = pd.read_csv(out_dir / name)
        np.testing.assert_allclose(
            a["probability_modified"], b["probability_modified"], atol=1e-5
        )
        assert len(a) == len(b)


@pytest.mark.skipif(
    not os.environ.get("M6ANET_TPU_SLOW_TESTS"),
    reason="opt-in (set M6ANET_TPU_SLOW_TESTS=1): 4 concurrent jax "
    "processes trip Gloo's hard 30 s context-init deadline when the host "
    "is saturated (arrival skew), an environmental flake — the always-on "
    "2-process tests cover the distributed path",
)
def test_multiprocess_distributed_4hosts_uneven_fused(production_model, tmp_path):
    """4 processes with UNEVEN host shards (101 demo sites -> 26/25/25/25)
    running --distributed with --backend pallas_fused (interpret mode on the
    CPU backend): closes the never-executed pallas_fused + --distributed
    combination and exercises a non-divisible shard split.  The merged
    output must equal a single-process run of the same backend."""
    import socket
    import subprocess

    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    out_dir = tmp_path / "dist4"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # one retry: Gloo collectives have a hard ~30 s participation deadline,
    # and on a heavily loaded 2-vCPU host four concurrent jax startups can
    # skew past it regardless of the work size — an environmental flake,
    # not a code path failure.  Small explicit worker capacities (8192/512)
    # keep the interpret-mode pallas work itself far under the deadline.
    for attempt in range(2):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [
            subprocess.Popen(
                [sys.executable, worker, f"localhost:{port}", "4", str(i),
                 DATA_DIR, str(out_dir), "pallas_fused", "exact", "8192", "512"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(4)
        ]
        logs = [p.communicate(timeout=600)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
    for p, logbytes in zip(procs, logs):
        assert p.returncode == 0, logbytes.decode(errors="replace")[-4000:]

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(DATA_DIR, min_reads=DEFAULT_MIN_READS, norm_path=norm, mode="Inference")
    single = tmp_path / "single4"
    run_inference(model, params, ds, str(single), read_proba_threshold=thr,
                  method="exact", backend="pallas_fused", precision="f32")

    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(single / name)
        b = pd.read_csv(out_dir / name)
        # 1e-5, not 1e-6: the workers run small batch capacities (Gloo
        # deadline, above) while the single run uses defaults, and
        # ulp-level per-read differences across batch shapes accumulate to
        # ~2e-6 in a 662-read site sum (golden site tolerance is 1e-2)
        np.testing.assert_allclose(
            a["probability_modified"], b["probability_modified"], atol=1e-5
        )
        assert list(a.columns) == list(b.columns) and len(a) == len(b)


@pytest.mark.skipif(
    not os.environ.get("M6ANET_TPU_SLOW_TESTS"),
    reason="opt-in (set M6ANET_TPU_SLOW_TESTS=1): full dataprep -> "
           "multi-process distributed inference pipeline (~2 min)",
)
def test_full_pipeline_dataprep_to_distributed_inference(tmp_path):
    """Fresh dataprep output (not the vendored fixtures) driven through the
    2-process distributed inference path: the complete multi-host story —
    featurize, shard by process index, barrier, host-0 CSV merge."""
    import socket
    import subprocess

    dp_dir = tmp_path / "dp"
    subprocess.run(
        [sys.executable, "-m", "m6anet_tpu", "dataprep",
         "--eventalign", os.path.join(DATA_DIR, "eventalign.txt"),
         "--out_dir", str(dp_dir), "--n_processes", "2",
         "--min_segment_count", "20", "--format", "json"],
        check=True, env=dict(os.environ, JAX_PLATFORMS="cpu"),
        timeout=300,
    )

    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_dir = tmp_path / "dist"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(i),
             str(dp_dir), str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, logbytes in zip(procs, logs):
        assert p.returncode == 0, logbytes.decode(errors="replace")[-4000:]

    site = pd.read_csv(out_dir / "data.site_proba.csv")
    indiv = pd.read_csv(out_dir / "data.indiv_proba.csv")
    assert len(site) > 50 and len(indiv) == site["n_reads"].sum()
    assert site["probability_modified"].between(0, 1).all()


def test_mesh_training_runs_and_learns(tmp_path):
    """Data-parallel training over the 8-device CPU mesh."""
    import jax

    from m6anet_tpu.constants import DEFAULT_MODEL_CONFIG, DEFAULT_NORM_PATH
    from m6anet_tpu.data.dataset import SiteDataset
    from m6anet_tpu.data.loader import TrainLoader
    from m6anet_tpu.models.mil import MILModel
    from m6anet_tpu.parallel.mesh import make_mesh
    from m6anet_tpu.train.loop import make_optimizer, train
    from m6anet_tpu.train.losses import binary_cross_entropy_loss
    from m6anet_tpu.utils.config import load_toml

    common = dict(root_dir=DATA_DIR, min_reads=20, norm_path=DEFAULT_NORM_PATH)
    train_ds = SiteDataset(**common, mode="Train")
    val_ds = SiteDataset(**common, mode="Val")
    train_ds.rng = np.random.RandomState(0)
    val_ds.rng = np.random.RandomState(1)

    mesh = make_mesh()
    n_dev = len(mesh.devices.flat)
    assert n_dev == 8

    model = MILModel(load_toml(DEFAULT_MODEL_CONFIG))
    params = model.init(jax.random.PRNGKey(0))
    train_dl = TrainLoader(train_ds, batch_size=16, shuffle=True, num_workers=2,
                           pad_to_multiple=n_dev)
    val_dl = TrainLoader(val_ds, batch_size=16, num_workers=2, pad_to_multiple=n_dev)
    optimizer = make_optimizer(lr=4e-3)
    params, tr, vr = train(
        model, params, train_dl, val_dl, optimizer, n_epoch=2,
        loss_fn=binary_cross_entropy_loss, save_dir=None, save_per_epoch=2,
        n_iterations=1, seed=0, mesh=mesh,
    )
    assert np.isfinite(tr["avg_loss"]).all()
    assert tr["avg_loss"][-1] < tr["avg_loss"][0] * 1.2


def test_sharded_dataprep_concat_inference(production_model, eventalign_fpath, tmp_path,
                                           golden_site_proba):
    """2-host dataprep shards + concat inference == single-host golden."""
    from m6anet_tpu.data.dataset import ConcatSiteDataset
    from m6anet_tpu.dataprep import run_dataprep

    shards = []
    for host in range(2):
        out = tmp_path / f"shard{host}"
        run_dataprep(eventalign_fpath, str(out), n_processes=1, readcount_min=1,
                     readcount_max=1000, min_segment_count=1, n_neighbors=1,
                     host_shard=(host, 2))
        shards.append(str(out))

    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    model, params = production_model
    ds = ConcatSiteDataset(shards, min_reads=DEFAULT_MIN_READS, norm_path=norm)
    out = tmp_path / "merged"
    run_inference(model, params, ds, str(out), read_proba_threshold=thr, use_mesh=False)

    got = pd.read_csv(out / "data.site_proba.csv").sort_values(
        ["transcript_id", "transcript_position"]).reset_index(drop=True)
    want = pd.read_csv(golden_site_proba).sort_values(
        ["transcript_id", "transcript_position"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["transcript_id"] == want["transcript_id"]).all()
    np.testing.assert_allclose(got["probability_modified"], want["probability_modified"], atol=1e-2)
    np.testing.assert_allclose(got["mod_ratio"], want["mod_ratio"], atol=1e-6)
