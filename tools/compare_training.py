"""End-to-end training comparison: this framework vs the reference torch loop.

Trains BOTH stacks on the same labelled demo dataset with the same
configuration (loss, sampler, lr, epochs, validation-averaging iterations)
and reports train/val ROC-AUC / PR-AUC trajectories side by side:

* ours:      m6anet_tpu.scripts.train (jax/optax, torch-Adam semantics)
* reference: m6anet.scripts.train at /root/reference (torch), imported with
  stand-ins for its unavailable third-party deps
  (reference: m6anet/utils/training_utils.py:61-268, scripts/train.py:55-131)

RNG streams differ between the stacks, so the comparison is statistical:
both must learn (final train ROC-AUC above a band) and agree on final
metrics within a tolerance.  Usage:

    python tools/compare_training.py [epochs] [out_json]
"""
import json
import os
import shutil
import sys
import tempfile
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# reference checkout root (a clone of GoekeLab/m6anet); overridable so CI
# lanes can place it anywhere
REFERENCE_DIR = os.environ.get("M6ANET_TPU_REFERENCE_DIR", "/root/reference")

DATA_DIR = os.path.join(REPO, "tests", "data")
NORM_JOBLIB = os.path.join(DATA_DIR, "reference_assets", "rna002_hct116.joblib")

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
    batch_size = 256
    sampler = "ImbalanceOverSampler"

    [dataloader.val]
    batch_size = 256
    shuffle = false

    [dataloader.test]
    batch_size = 256
    shuffle = false
"""


def _install_reference_stubs():
    # another suite (tests/test_torch_block_parity.py) may have installed a
    # thinner toml stub first in the same process; patch missing attrs
    # instead of assuming ours wins the import race
    tm_existing = sys.modules.get("toml")
    if tm_existing is not None and not hasattr(tm_existing, "dump"):
        def _dump_patch(obj, f):
            f.write("# train_info (json): " + json.dumps(obj, default=str) + "\n")

        tm_existing.dump = _dump_patch
    tq_existing = sys.modules.get("tqdm")
    if tq_existing is not None and getattr(tq_existing, "__spec__", None) is None:
        import importlib.machinery

        tq_existing.__spec__ = importlib.machinery.ModuleSpec("tqdm", None)
    if "pkg_resources" not in sys.modules:
        stub = types.ModuleType("pkg_resources")
        stub.resource_filename = lambda pkg, path: os.path.join(
            REFERENCE_DIR, pkg.replace(".", "/"), path
        )
        sys.modules["pkg_resources"] = stub
    if "ujson" not in sys.modules:
        uj = types.ModuleType("ujson")
        uj.dump, uj.dumps, uj.load, uj.loads = (
            json.dump, json.dumps, json.load, json.loads,
        )
        sys.modules["ujson"] = uj
    if "toml" not in sys.modules:
        import tomllib

        tm = types.ModuleType("toml")
        tm.load = lambda f: (
            tomllib.load(open(f, "rb"))
            if isinstance(f, (str, os.PathLike))
            else tomllib.loads(f.read())
        )

        def _dump(obj, f):  # reference only dumps train_info.toml
            json.dump(obj, open(os.devnull, "w"))
            f.write("# train_info (json): " + json.dumps(obj, default=str) + "\n")

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


def run_ours(config_path: str, save_dir: str, epochs: int, num_iterations: int,
             seed: int, extra=()):
    from m6anet_tpu.scripts import train as tr

    args = tr.argparser().parse_args(
        [
            "--train_config", config_path,
            "--save_dir", save_dir,
            "--device", "cpu",
            "--epochs", str(epochs),
            "--save_per_epoch", str(epochs),
            "--num_iterations", str(num_iterations),
            "--seed", str(seed),
            "--n_processes", "1",
            "--use_mesh", "off",
        ]
        + list(extra)
    )
    tr.main(args)
    train_results = json.load(open(os.path.join(save_dir, "train_results.json")))
    val_results = json.load(open(os.path.join(save_dir, "val_results.json")))
    return train_results, val_results


def run_reference(config_path: str, save_dir: str, epochs: int, num_iterations: int, seed: int):
    _install_reference_stubs()
    import joblib

    from m6anet.scripts import train as rtr  # noqa: E402 (reference source)

    args = rtr.argparser().parse_args(
        [
            "--train_config", config_path,
            "--save_dir", save_dir,
            "--device", "cpu",
            "--epochs", str(epochs),
            "--save_per_epoch", str(epochs),
            "--num_iterations", str(num_iterations),
            "--seed", str(seed),
            "--n_processes", "0",
        ]
    )
    rtr.main(args)
    train_results = joblib.load(os.path.join(save_dir, "train_results.joblib"))
    val_results = joblib.load(os.path.join(save_dir, "val_results.joblib"))
    return train_results, val_results


def compare(epochs: int = 20, num_iterations: int = 5, seed: int = 25, workdir=None):
    # jax backend must initialise before the reference imports torch
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.devices()

    own_dir = tempfile.mkdtemp(dir=workdir, prefix="ours_")
    ref_dir = tempfile.mkdtemp(dir=workdir, prefix="ref_")
    config_path = os.path.join(own_dir, "train_config.toml")
    with open(config_path, "w") as f:
        f.write(TRAIN_CONFIG.format(root=DATA_DIR, norm=NORM_JOBLIB))

    ours_train, ours_val = run_ours(config_path, own_dir, epochs, num_iterations, seed)
    ref_train, ref_val = run_reference(config_path, ref_dir, epochs, num_iterations, seed)

    def tail(d, k):
        return float(d[k][-1])

    report = {
        "epochs": epochs,
        "num_iterations": num_iterations,
        "seed": seed,
        "ours": {
            "train_roc_auc": tail(ours_train, "roc_auc"),
            "train_pr_auc": tail(ours_train, "pr_auc"),
            "val_roc_auc": tail(ours_val, "roc_auc"),
            "val_pr_auc": tail(ours_val, "pr_auc"),
            "train_loss": tail(ours_train, "avg_loss"),
            "val_loss": tail(ours_val, "avg_loss"),
            "roc_trajectory": [round(float(x), 4) for x in ours_train["roc_auc"]],
        },
        "reference": {
            "train_roc_auc": tail(ref_train, "roc_auc"),
            "train_pr_auc": tail(ref_train, "pr_auc"),
            "val_roc_auc": tail(ref_val, "roc_auc"),
            "val_pr_auc": tail(ref_val, "pr_auc"),
            "train_loss": tail(ref_train, "avg_loss"),
            "val_loss": tail(ref_val, "avg_loss"),
            "roc_trajectory": [round(float(x), 4) for x in ref_train["roc_auc"]],
        },
    }
    shutil.rmtree(own_dir, ignore_errors=True)
    shutil.rmtree(ref_dir, ignore_errors=True)
    return report


def compare_multi(
    n_seeds: int = 5,
    epochs: int = 40,
    num_iterations: int = 5,
    n_sites: int = 1200,
    workdir=None,
    base_seed: int = 100,
    stacks=("ours", "reference"),
    ours_extra=(),
):
    """Statistical training-parity comparison (round 4).

    Both stacks train on the SAME synthesized labelled dataset (>=1,000
    sites resampled from real labelled demo reads — see
    tools/eval_quality.py::build_labelled_datajson) for ``n_seeds``
    independent seeds each; reports mean±sd of the final train/val
    ROC-AUC / PR-AUC per stack.  RNG streams necessarily differ between
    torch and jax, so parity is a claim about the DISTRIBUTION of outcomes,
    not any single run."""
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.devices()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import eval_quality

    work = workdir or tempfile.mkdtemp(prefix="train_parity_")
    ds_dir = eval_quality.build_labelled_datajson(work, n_sites, seed=7)
    config_path = os.path.join(work, "train_config.toml")
    with open(config_path, "w") as f:
        f.write(TRAIN_CONFIG.format(root=ds_dir, norm=NORM_JOBLIB))

    metrics = ("train_roc_auc", "train_pr_auc", "val_roc_auc", "val_pr_auc")
    runs = {"ours": [], "reference": []}
    errors = {"ours": [], "reference": []}
    stack_fns = {"ours": run_ours, "reference": run_reference}
    for i in range(n_seeds):
        seed = base_seed + i
        for name in stacks:
            fn = stack_fns[name]
            if name == "ours" and ours_extra:
                fn = lambda *a, _f=stack_fns["ours"]: _f(*a, extra=ours_extra)  # noqa: E731
            run_dir = tempfile.mkdtemp(dir=work, prefix=f"{name}_s{seed}_")
            # the noisy-OR loss starts near -log(1 - (1-0.5)^20) ~ 7.5 on a
            # fresh init (site probabilities saturate at ~1), so individual
            # runs can diverge; a diverged seed is DATA for this comparison,
            # not a reason to lose the other seeds
            try:
                tr, va = fn(config_path, run_dir, epochs, num_iterations, seed)
                runs[name].append({
                    "seed": seed,
                    "train_roc_auc": float(tr["roc_auc"][-1]),
                    "train_pr_auc": float(tr["pr_auc"][-1]),
                    "val_roc_auc": float(va["roc_auc"][-1]),
                    "val_pr_auc": float(va["pr_auc"][-1]),
                })
            except Exception as e:  # noqa: BLE001 — record and continue
                errors[name].append({"seed": seed, "error": repr(e)[:300]})
        o = runs["ours"][-1]["val_roc_auc"] if runs["ours"] and runs["ours"][-1]["seed"] == seed else "ERR"
        r = runs["reference"][-1]["val_roc_auc"] if runs["reference"] and runs["reference"][-1]["seed"] == seed else "ERR"
        print(f"seed {seed}: ours val_roc {o}  ref val_roc {r}",
              file=sys.stderr, flush=True)

    report = {
        "n_seeds": n_seeds, "epochs": epochs, "n_sites": n_sites,
        "num_iterations": num_iterations, "runs": runs, "errors": errors,
        "summary": {},
    }
    for name in ("ours", "reference"):
        if not runs[name]:
            continue
        report["summary"][name] = {
            m: {
                "mean": round(float(np.mean([r[m] for r in runs[name]])), 4),
                "sd": round(float(np.std([r[m] for r in runs[name]], ddof=1)), 4)
                if len(runs[name]) > 1 else 0.0,
            }
            for m in metrics
        }
        report["summary"][name]["n_ok"] = len(runs[name])
    return report


def _main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("epochs", nargs="?", type=int, default=20)
    ap.add_argument("out_json", nargs="?", default=None)
    ap.add_argument("--multi", type=int, default=0, metavar="N_SEEDS",
                    help="statistical mode: N seeds on a synthesized "
                         ">=1000-site labelled set (both stacks)")
    ap.add_argument("--n_sites", type=int, default=1200)
    ap.add_argument("--num_iterations", type=int, default=5)
    ap.add_argument("--base_seed", type=int, default=100)
    ap.add_argument("--stacks", default="ours,reference",
                    help="comma-separated subset of {ours,reference} to run "
                         "(e.g. widen only the torch seed population)")
    ap.add_argument("--ours_flag", action="append", default=[],
                    help="extra flag(s) passed to our train CLI in --multi "
                         "mode (e.g. --ours_flag=--reseed_on_stall)")
    args = ap.parse_args()

    if args.multi:
        rep = compare_multi(
            n_seeds=args.multi, epochs=args.epochs,
            num_iterations=args.num_iterations, n_sites=args.n_sites,
            base_seed=args.base_seed,
            stacks=tuple(s for s in args.stacks.split(",") if s),
            ours_extra=tuple(args.ours_flag),
        )
    else:
        rep = compare(epochs=args.epochs)
    print(json.dumps(rep, indent=2))
    if args.out_json:
        json.dump(rep, open(args.out_json, "w"), indent=2)


if __name__ == "__main__":
    _main()
