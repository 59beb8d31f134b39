"""One-time conversion of reference binary assets into framework-native ``.npz``.

Reads the reference's torch state dicts (m6anet/model/model_states/*.pt) and
joblib norm-factor dicts (m6anet/model/norm_factors/*.joblib) and re-exports
them as plain numpy archives under ``m6anet_tpu/models/assets``.  torch/joblib
are conversion-time-only dependencies; the framework runtime never imports
them for the inference path.

Weight layout convention in the npz (functional param tree, flat keys):
  block{i}/<name>  — per-config-block parameters, linear weights stored
                     as (in, out) so device code does ``x @ w + b``.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/m6anet/model"
OUT = os.path.join(os.path.dirname(__file__), "..", "m6anet_tpu", "models", "assets")

WEIGHTS = [
    "rna002_hct116",
    "rna002_arabidopsis_virc",
    "rna004_hek293t_glori",
    "rna004_hek293t_m6ace",
]
NORMS = ["rna002_hct116", "rna002_arabidopsis_virc"]


def convert_weights():
    import torch

    os.makedirs(os.path.join(OUT, "weights"), exist_ok=True)
    for name in WEIGHTS:
        sd = torch.load(os.path.join(REF, "model_states", f"{name}.pt"), map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items() if k.endswith(("weight", "bias", "running_mean", "running_var"))}
        # Production architecture (all four released models share it):
        # block1 = KmerMultipleEmbedding, block3 = Linear15->150+BN,
        # block4 = Linear150->32, block5 = SigmoidProdPooling prob layer.
        out = {
            "block1/embedding": sd["read_level_encoder.1.embedding_layer.weight"],
            "block3/w": sd["read_level_encoder.3.layers.0.weight"].T,
            "block3/b": sd["read_level_encoder.3.layers.0.bias"],
            "block3/bn_scale": sd["read_level_encoder.3.layers.1.weight"],
            "block3/bn_bias": sd["read_level_encoder.3.layers.1.bias"],
            "block3/bn_mean": sd["read_level_encoder.3.layers.1.running_mean"],
            "block3/bn_var": sd["read_level_encoder.3.layers.1.running_var"],
            "block4/w": sd["read_level_encoder.4.layers.0.weight"].T,
            "block4/b": sd["read_level_encoder.4.layers.0.bias"],
            "block5/w": sd["pooling_filter.probability_layer.0.weight"].T,
            "block5/b": sd["pooling_filter.probability_layer.0.bias"],
        }
        path = os.path.join(OUT, "weights", f"{name}.npz")
        np.savez(path, **out)
        print("wrote", path, f"({len(out)} arrays)")


def convert_norm_factors():
    import joblib

    os.makedirs(os.path.join(OUT, "norm_factors"), exist_ok=True)
    for name in NORMS:
        nd = joblib.load(os.path.join(REF, "norm_factors", f"{name}.joblib"))
        kmers = sorted(nd.keys())
        mean = np.stack([np.asarray(nd[k][0], dtype=np.float64) for k in kmers])
        std = np.stack([np.asarray(nd[k][1], dtype=np.float64) for k in kmers])
        path = os.path.join(OUT, "norm_factors", f"{name}.npz")
        np.savez(path, kmers=np.array(kmers), mean=mean, std=std)
        print("wrote", path, f"({len(kmers)} kmers)")


if __name__ == "__main__":
    convert_weights()
    convert_norm_factors()
