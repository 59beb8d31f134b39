"""Evaluation metrics (reference: m6anet/utils/training_utils.py:15-58)."""
from __future__ import annotations

import numpy as np
from sklearn.metrics import accuracy_score, auc, precision_recall_curve, roc_curve


def get_roc_auc(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    fpr, tpr, _ = roc_curve(y_true, y_pred)
    return auc(fpr, tpr)


def get_pr_auc(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    precision, recall, _ = precision_recall_curve(y_true, y_pred, pos_label=1)
    return auc(recall, precision)


def get_accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return accuracy_score(y_true, y_pred)
