"""End-to-end training system benchmark through the real CLI.

Round-3 verdict gap: the device train step measured 742k sites/s
(bench_variants.py 'train' variant) but no END-TO-END training number
existed — host featurize, batching, device step, metric evaluation,
checkpointing, all through `m6anet_tpu train`.  This tool builds a large
labelled corpus in the reference's data.json format (real demo feature
rows resampled with known labels — tools/eval_quality.py) and times the
training CLI on it.

The reference has no published training benchmark to compare against
(SURVEY.md §6); this records OUR system number and its stage breakdown.

Usage:
    python tools/bench_train_e2e.py [--n_sites 20000] [--epochs 3]
        [--device cpu|tpu] [--out_dir DIR]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TRAIN_CONFIG = """\
[loss_function]
loss_function_type = "binary_cross_entropy_loss"

[dataset]
root_dir = "{root}"
min_reads = 20
norm_path = "{norm}"
num_neighboring_features = 1

[dataloader]
    [dataloader.train]
    batch_size = 1024
    sampler = "ImbalanceOverSampler"

    [dataloader.val]
    batch_size = 1024
    shuffle = false

    [dataloader.test]
    batch_size = 1024
    shuffle = false
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/train_e2e_bench")
    ap.add_argument("--n_sites", type=int, default=20000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--num_iterations", type=int, default=1)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    ds_marker = os.path.join(args.out_dir, "labelled_ds", "data.info.labelled")
    if not os.path.exists(ds_marker):
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.devices()
        import eval_quality

        t0 = time.time()
        eval_quality.build_labelled_datajson(
            args.out_dir, args.n_sites, seed=11, count_range=(20, 120)
        )
        print(f"built {args.n_sites}-site labelled corpus in {time.time()-t0:.1f}s")
    ds_dir = os.path.join(args.out_dir, "labelled_ds")

    norm = os.path.join(REPO, "tests", "data", "reference_assets", "rna002_hct116.joblib")
    cfg = os.path.join(args.out_dir, "train_config.toml")
    with open(cfg, "w") as f:
        f.write(TRAIN_CONFIG.format(root=ds_dir, norm=norm))

    save_dir = os.path.join(args.out_dir, "run")
    cmd = [
        sys.executable, "-m", "m6anet_tpu", "train",
        "--train_config", cfg, "--save_dir", save_dir,
        "--device", args.device, "--epochs", str(args.epochs),
        "--save_per_epoch", str(args.epochs),
        "--num_iterations", str(args.num_iterations),
        "--n_processes", "2",
    ]
    env = dict(os.environ, PYTHONPATH=REPO + ":/root/.axon_site")
    t0 = time.time()
    subprocess.run(cmd, check=True, env=env)
    wall = time.time() - t0

    tr = json.load(open(os.path.join(save_dir, "train_results.json")))
    compute = sum(tr.get("compute_time", []))
    # ImbalanceOverSampler resamples to balance, so sites/epoch >= n_sites*0.6
    n_train = int(0.6 * args.n_sites)
    print(json.dumps({
        "metric": "train_e2e_sites_per_sec",
        "value": round(args.epochs * n_train / wall, 1),
        "unit": "trained sites/s (lower bound: oversampler adds sites)",
        "wall_s": round(wall, 1),
        "train_compute_s": round(compute, 1),
        "epochs": args.epochs,
        "n_sites": args.n_sites,
        "device": args.device,
        "final_train_roc": round(float(tr["roc_auc"][-1]), 4) if tr.get("roc_auc") else None,
    }))


if __name__ == "__main__":
    main()
