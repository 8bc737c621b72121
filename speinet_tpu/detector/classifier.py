"""Sharp/blurry frame classifiers: logistic regression + decision tree.

Capability parity with the reference's sklearn usage
(LD_detector/sharp_detector_params_estimation_parallel.py:239-250,
LD_detector_gopros_train.py:203-245): train LogisticRegression and a CART
DecisionTree on the 6 focus features, report
accuracy/recall/precision/F1, pickle the models.

Implemented natively (no sklearn dependency in the inference path):
- LogisticRegressionJAX: L2-regularized (C=1, sklearn default) logistic
  regression fitted by IRLS/Newton — exact for the 6-feature problem;
  prediction is a one-liner jnp dot, so on-the-fly label inference
  (inference_SPEINet.py:349-353) runs on device with the feature pass.
- DecisionTree: small numpy CART (gini, no depth limit — sklearn default).
- `load_sklearn_pickle` adapts the reference's shipped .pkl classifiers
  (LD_detector/pickle/) when sklearn is importable.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp


def default_detector_path() -> str:
    """Packaged fallback logistic detector (scripts/train_default_detector.py)."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "default_logreg.pkl")


@dataclass
class LogisticRegressionJAX:
    coef: np.ndarray       # [F]
    intercept: float
    mean: Optional[np.ndarray] = None   # optional feature standardization
    scale: Optional[np.ndarray] = None

    def decision_function(self, x):
        x = jnp.asarray(x, jnp.float32)
        if self.mean is not None:
            x = (x - self.mean) / self.scale
        return x @ jnp.asarray(self.coef, jnp.float32) + self.intercept

    def predict(self, x):
        return (self.decision_function(x) > 0).astype(jnp.int32)

    def predict_proba(self, x):
        p = 1.0 / (1.0 + jnp.exp(-self.decision_function(x)))
        return jnp.stack([1 - p, p], axis=-1)

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump({"coef": np.asarray(self.coef),
                         "intercept": float(self.intercept),
                         "mean": None if self.mean is None else np.asarray(self.mean),
                         "scale": None if self.scale is None else np.asarray(self.scale)}, f)

    @staticmethod
    def load(path: Optional[str]) -> "LogisticRegressionJAX":
        """Load a pickled detector; with no path, the packaged default
        (the analog of the reference's shipped LD_detector/pickle/ fallback,
        inference_SPEINet.py:349-353) — see scripts/train_default_detector.py."""
        if path is None:
            path = default_detector_path()
            if not os.path.exists(path):
                raise FileNotFoundError(
                    "no detector pickle given and the packaged default "
                    f"({path}) is missing — pass --detector_pickle or "
                    "regenerate it with scripts/train_default_detector.py")
        with open(path, "rb") as f:
            d = pickle.load(f)
        if isinstance(d, dict):
            return LogisticRegressionJAX(d["coef"], d["intercept"],
                                         d.get("mean"), d.get("scale"))
        return load_sklearn_pickle_obj(d)


def fit_logistic_regression(x: np.ndarray, y: np.ndarray, c: float = 1.0,
                            max_iter: int = 100, tol: float = 1e-8,
                            standardize: bool = True) -> LogisticRegressionJAX:
    """IRLS fit of min_w  sum log(1+exp(-y w.x)) + ||w||^2 / (2c).

    Focus features span ~10 orders of magnitude, so features are
    standardized internally by default (folded into the stored affine
    transform — predictions remain a single dot product).
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64).reshape(-1)
    if standardize:
        mean = x.mean(axis=0)
        scale = x.std(axis=0)
        scale[scale == 0] = 1.0
        xs = (x - mean) / scale
    else:
        mean = scale = None
        xs = x
    n, f = xs.shape
    xb = np.concatenate([xs, np.ones((n, 1))], axis=1)
    w = np.zeros(f + 1)
    lam = np.ones(f + 1) / c
    lam[-1] = 0.0  # do not regularize the intercept (sklearn behavior)
    for _ in range(max_iter):
        z = xb @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = xb.T @ (p - y) + lam * w
        r = np.clip(p * (1 - p), 1e-10, None)
        h = (xb * r[:, None]).T @ xb + np.diag(lam)
        step = np.linalg.solve(h, g)
        w = w - step
        if np.abs(step).max() < tol:
            break
    return LogisticRegressionJAX(coef=w[:f].astype(np.float32),
                                 intercept=float(w[f]),
                                 mean=None if mean is None else mean.astype(np.float32),
                                 scale=None if scale is None else scale.astype(np.float32))


def load_sklearn_pickle_obj(obj) -> LogisticRegressionJAX:
    """Adapt a fitted sklearn LogisticRegression (e.g. the reference's
    shipped LD_detector/pickle/*.pkl)."""
    return LogisticRegressionJAX(coef=np.asarray(obj.coef_).reshape(-1),
                                 intercept=float(np.asarray(obj.intercept_).reshape(-1)[0]))


# ----------------------------------------------------------------------------
# CART decision tree (gini), numpy

@dataclass
class _Node:
    feature: int = -1
    threshold: float = 0.0
    left: Optional["_Node"] = None
    right: Optional["_Node"] = None
    value: int = 0


class DecisionTree:
    """Binary CART classifier, gini impurity, midpoint thresholds.

    `max_features` enables per-split feature subsampling (the randomness
    RandomForest needs); None considers every feature (sklearn
    DecisionTreeClassifier default)."""

    def __init__(self, max_depth: Optional[int] = None,
                 min_samples_split: int = 2,
                 max_features: Optional[int] = None,
                 rng: Optional[np.random.Generator] = None):
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.max_features = max_features
        self._rng = rng
        self.root: Optional[_Node] = None

    def fit(self, x: np.ndarray, y: np.ndarray) -> "DecisionTree":
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.int64).reshape(-1)
        self.root = self._build(x, y, 0)
        self._rng = None   # generators don't pickle portably; only fit needs it
        return self

    def _split_candidates(self, n_features: int):
        if self.max_features is None or self.max_features >= n_features:
            return range(n_features)
        return self._rng.choice(n_features, self.max_features, replace=False)

    def _build(self, x, y, depth) -> _Node:
        if (len(np.unique(y)) == 1 or len(y) < self.min_samples_split
                or (self.max_depth is not None and depth >= self.max_depth)):
            return _Node(value=int(np.bincount(y, minlength=2).argmax()))
        best = (None, None, 1e18)
        n = len(y)
        for f in self._split_candidates(x.shape[1]):
            order = np.argsort(x[:, f], kind="mergesort")
            xv, yv = x[order, f], y[order]
            ones_left = np.cumsum(yv)[:-1]
            n_left = np.arange(1, n)
            valid = xv[1:] != xv[:-1]
            if not valid.any():
                continue
            n_right = n - n_left
            ones_right = ones_left[-1] + yv[-1] - ones_left
            p_l = ones_left / n_left
            p_r = ones_right / n_right
            gini = (n_left * 2 * p_l * (1 - p_l) + n_right * 2 * p_r * (1 - p_r)) / n
            gini = np.where(valid, gini, 1e18)
            i = int(np.argmin(gini))
            if gini[i] < best[2]:
                best = (f, (xv[i] + xv[i + 1]) / 2.0, float(gini[i]))
        if best[0] is None:
            return _Node(value=int(np.bincount(y, minlength=2).argmax()))
        f, thr, _ = best
        mask = x[:, f] <= thr
        if mask.all() or (~mask).all():
            return _Node(value=int(np.bincount(y, minlength=2).argmax()))
        return _Node(feature=f, threshold=thr,
                     left=self._build(x[mask], y[mask], depth + 1),
                     right=self._build(x[~mask], y[~mask], depth + 1))

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        out = np.zeros(len(x), np.int64)
        for i, row in enumerate(x):
            node = self.root
            while node.left is not None:
                node = node.left if row[node.feature] <= node.threshold else node.right
            out[i] = node.value
        return out

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "DecisionTree":
        with open(path, "rb") as f:
            return pickle.load(f)


class RandomForest:
    """Bagged CART ensemble (parity: the reference's third classifier family,
    sharp_detector_params_estimation_parallel.py:21,247,280 — sklearn
    RandomForestClassifier defaults: 100 trees, bootstrap resampling, sqrt
    feature subsampling per split, unlimited depth, majority vote)."""

    def __init__(self, n_estimators: int = 100,
                 max_features: Optional[str | int] = "sqrt",
                 max_depth: Optional[int] = None, seed: int = 0):
        self.n_estimators = n_estimators
        self.max_features = max_features
        self.max_depth = max_depth
        self.seed = seed
        self.trees: list[DecisionTree] = []

    def fit(self, x: np.ndarray, y: np.ndarray) -> "RandomForest":
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.int64).reshape(-1)
        n, nf = x.shape
        if self.max_features == "sqrt":
            mf = max(1, int(np.sqrt(nf)))
        else:
            mf = self.max_features
        rng = np.random.default_rng(self.seed)
        self.trees = []
        for _ in range(self.n_estimators):
            idx = rng.integers(0, n, n)            # bootstrap sample
            t = DecisionTree(max_depth=self.max_depth, max_features=mf, rng=rng)
            t.fit(x[idx], y[idx])
            self.trees.append(t)
        return self

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        votes = np.stack([t.predict(x) for t in self.trees])   # [T, N]
        p1 = votes.mean(axis=0)
        return np.stack([1 - p1, p1], axis=-1)

    def predict(self, x: np.ndarray) -> np.ndarray:
        return (self.predict_proba(x)[:, 1] >= 0.5).astype(np.int64)

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "RandomForest":
        with open(path, "rb") as f:
            return pickle.load(f)


def binary_metrics(y_true, y_pred) -> dict:
    """accuracy / recall / precision / F1 (parity with the detector CSVs)."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    tp = int(((y_true == 1) & (y_pred == 1)).sum())
    fp = int(((y_true == 0) & (y_pred == 1)).sum())
    fn = int(((y_true == 1) & (y_pred == 0)).sum())
    acc = float((y_true == y_pred).mean())
    rec = tp / (tp + fn) if tp + fn else 0.0
    prec = tp / (tp + fp) if tp + fp else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"accuracy": acc, "recall": rec, "precision": prec, "f1": f1}
