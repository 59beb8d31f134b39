"""Model-quality floor on the synthesized labelled eval set.

In-repo stand-in for the reference's published arabidopsis single-molecule
ROC 0.89 / PR 0.90 (reference: README.md:271, docs/source/release_notes.rst:146
— that dataset is not in this environment).  tools/eval_quality.py resamples
real labelled demo reads into sequence-matched synthetic sites (sequence
content cannot leak the label) and scores them through the real CLI; this
test asserts the released HCT116 model stays above a quality floor well
below its measured ~0.95 ROC / ~0.94 PR, so a parity-breaking regression in
the pipeline (normalization, packing, kernels, CSV) trips it.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_pretrained_quality_floor(tmp_path):
    import eval_quality

    truth = eval_quality.build_eval_set(str(tmp_path), 300, seed=1)
    res = eval_quality.score_model(str(tmp_path), "HCT116_RNA002", "cpu", truth)
    assert res["n_scored"] == 300
    assert res["roc_auc"] >= 0.85, res
    assert res["pr_auc"] >= 0.85, res
