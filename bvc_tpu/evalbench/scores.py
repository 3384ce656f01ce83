"""Embedding-quality scoring: kNN retrieval and linear probes.

Re-implements the notebook's ``get_nn_score`` / ``get_separability_score``
(``notebooks/EvaluateEmbeddings.ipynb`` cell 5): top-k ∈ {1,5,10,20,50}
retrieval accuracy under cosine/euclidean distance, and a
StandardScaler + SGDClassifier/LinearSVC probe with the same
hyperparameters (max_iter 5000, tol 1e-4).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pandas as pd

TOP_KS = (1, 5, 10, 20, 50)


def _dim_cols(df: pd.DataFrame) -> list[str]:
    return [c for c in df.columns if "dim" in c]


def get_nn_score(
    df_train: pd.DataFrame,
    df_test: pd.DataFrame,
    label: str,
    metric: str = "cosine",
    savedir: str | None = None,
    run_id: str | None = None,
) -> dict[int, float]:
    """Top-k retrieval accuracy of test embeddings against train."""
    from sklearn import preprocessing
    from sklearn.metrics.pairwise import cosine_distances, euclidean_distances

    le = preprocessing.LabelEncoder()
    y_train = le.fit_transform(df_train[label])
    cols = _dim_cols(df_train)
    x_train = df_train[cols].to_numpy()
    x_test = df_test[cols].to_numpy()
    y_test = le.transform(df_test[label])

    dist_fn = cosine_distances if metric == "cosine" else euclidean_distances
    distances = dist_fn(x_test, x_train)
    indices = np.argsort(distances)

    topk: dict[int, float] = {}
    for k in TOP_KS:
        hits = sum(
            1
            for ind, yt in zip(indices[:, :k], y_test)
            if yt in y_train[ind]
        )
        topk[k] = hits / len(y_test)

    if savedir is not None:
        if run_id is None:
            raise ValueError("run_id required when saving")
        with open(os.path.join(savedir, f"{run_id}_topk_correct.json"), "w") as f:
            json.dump(topk, f)
    return topk


def get_separability_score(
    df_train: pd.DataFrame,
    df_test: pd.DataFrame | None,
    label: str,
    method: str = "sgd",
    ret_preds: bool = False,
    n_jobs: int = 8,
):
    """Linear-probe train/test accuracy (notebook cell 5)."""
    from sklearn import preprocessing
    from sklearn.linear_model import SGDClassifier
    from sklearn.model_selection import train_test_split
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import LinearSVC

    le = preprocessing.LabelEncoder()
    y_train = le.fit_transform(df_train[label])
    cols = _dim_cols(df_train)
    x_train = df_train[cols]
    if df_test is not None:
        x_test = df_test[cols]
        y_test = le.transform(df_test[label])
    else:
        x_train, x_test, y_train, y_test = train_test_split(
            x_train, y_train, test_size=0.33, random_state=42
        )

    if method == "svm":
        clf = make_pipeline(StandardScaler(), LinearSVC(random_state=0, tol=1e-4))
    elif method == "sgd":
        clf = make_pipeline(
            StandardScaler(), SGDClassifier(max_iter=5000, tol=1e-4, n_jobs=n_jobs)
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    clf.fit(x_train, y_train)
    train_score = clf.score(x_train, y_train)
    test_score = clf.score(x_test, y_test)
    if ret_preds:
        return train_score, test_score, clf.predict(x_test), y_test
    return train_score, test_score
