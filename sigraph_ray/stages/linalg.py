"""Distributed dense linear algebra over an embedding column — the
Gram-matrix / covariance / PCA / softmax-regression family a
training-data pipeline runs over `list<float>` embeddings.

Scale shape shared by everything here: the per-block kernel is ONE
numpy matmul (`Xᵀ X` is d×d regardless of block rows), partials are
d²-sized rows — vocabulary-sized, never corpus-sized — and the fold is
exact float64 re-combination in a single bounded task. The corpus
streams; only d×d (or d×c) state moves. This is the standard
tree-aggregated statistics pattern (e.g. Zaharia et al., Spark MLlib:
all second-order methods reduce to gram/gradient partials).

Beyond-reference operators (the reference has no numeric/ML surface;
SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _stack(df: pd.DataFrame, col: str) -> np.ndarray:
    return np.stack(df[col].to_numpy()).astype(np.float64)


def gram_partials(ds, *, col: str = "embedding"):
    """Per-block (n, Σx, upper-triangle ΣXᵀX) partials in LONG form
    ``(i, j, s)`` — i=j=-1 carries n, j=-1 carries Σx_i — so the fold
    is one grouped sum on (i, j)."""
    from sigraph_ray.stages.collect import sorted_groupby_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"i": pd.Series(dtype="int64"),
                                 "j": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64")})
        x = _stack(df, col)
        d = x.shape[1]
        g = x.T @ x
        iu, ju = np.triu_indices(d)
        rows_i = np.concatenate(([-1], np.arange(d), iu))
        rows_j = np.concatenate(([-1], np.full(d, -1), ju))
        rows_s = np.concatenate(([float(len(x))], x.sum(axis=0),
                                 g[iu, ju]))
        return pd.DataFrame({"i": rows_i.astype("int64"),
                             "j": rows_j.astype("int64"), "s": rows_s})

    return sorted_groupby_sum(ds.map_batches(partial,
                                             batch_format="pandas"),
                              key=["i", "j"], sum_cols={"s": "s"})


def covariance_matrix(ds, *, col: str = "embedding"):
    """Sample covariance of every dimension pair, long form
    ``(i, j, cov)`` with i ≤ j, 1-indexed to match SQL ordinality:
    ``cov = (Σxy − Σx·Σy/n) / (n−1)`` — DuckDB ``covar_samp``."""
    folded = gram_partials(ds, col=col)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n, sums, gram = _unpack(df)
        d = len(sums)
        cov = (gram - np.outer(sums, sums) / n) / (n - 1.0)
        iu, ju = np.triu_indices(d)
        return pd.DataFrame({"i": (iu + 1).astype("int64"),
                             "j": (ju + 1).astype("int64"),
                             "cov": cov[iu, ju]})

    return (folded.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=None))


def _unpack(df: pd.DataFrame):
    """Long-form folded partials → (n, Σx vector, full ΣXᵀX matrix)."""
    n = float(df.loc[(df["i"] == -1) & (df["j"] == -1), "s"].iloc[0])
    sums_rows = df[(df["i"] >= 0) & (df["j"] == -1)].sort_values("i")
    sums = sums_rows["s"].to_numpy()
    d = len(sums)
    gram = np.zeros((d, d))
    gr = df[(df["i"] >= 0) & (df["j"] >= 0)]
    gi = gr["i"].to_numpy(np.int64)
    gj = gr["j"].to_numpy(np.int64)
    gram[gi, gj] = gr["s"].to_numpy()
    gram[gj, gi] = gr["s"].to_numpy()
    return n, sums, gram


def pca_project(ds, *, col: str = "embedding", n_components: int = 4,
                id_col: str = "vec_id"):
    """PCA projection to ``n_components``: ONE streaming pass folds the
    gram partials, the d×d eigendecomposition runs in one bounded task
    (d is embedding width, never corpus size), components are
    sign-fixed (largest-|loading| coordinate made positive) so the
    output is deterministic across parallelism, then a second
    streaming pass projects every row against the broadcast component
    matrix. Returns (id_col, pc1..pcK)."""
    folded = gram_partials(ds, col=col).to_pandas()
    n, sums, gram = _unpack(folded)
    mean = sums / n
    cov = (gram - np.outer(sums, sums) / n) / (n - 1.0)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order]
    flips = np.sign(comps[np.abs(comps).argmax(axis=0),
                          np.arange(comps.shape[1])])
    comps = comps * flips  # deterministic sign convention

    def project(df: pd.DataFrame) -> pd.DataFrame:
        x = _stack(df, col) - mean
        p = x @ comps
        out = {id_col: df[id_col].to_numpy()}
        for c in range(n_components):
            out[f"pc{c + 1}"] = p[:, c]
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pandas")


def softmax_train(ds, *, col: str = "embedding", label_col: str = "label",
                  n_classes: int, lr: float = 0.5, epochs: int = 30):
    """Multinomial logistic regression by full-batch gradient descent —
    the canonical iterative-ML loop as Ray dataflow: the feature
    matrix is materialized ONCE (epochs re-read blocks, not parquet),
    every epoch broadcasts the d×c weight matrix by closure, each
    block emits its exact gradient partial (two matmuls) plus loss/hit
    partials, and the driver folds #blocks × (d·c + 2) floats — model
    state, never data, crosses the wire. Deterministic: zero init,
    fixed lr/epochs, float64 partials.

    Returns (per-class weight-norm table, history DataFrame of
    (epoch, loss, accuracy))."""
    feats = ds.map_batches(
        lambda df: pd.DataFrame({"x": df[col], "y": df[label_col]
                                 .astype("int64")}),
        batch_format="pandas").materialize()

    head = feats.take(1)
    if not head:  # typed-empty guard: no rows → no model to fit
        norms = pd.DataFrame({
            "label": pd.Series(dtype="int64"),
            "weight_norm": pd.Series(dtype="float64"),
            "bias": pd.Series(dtype="float64")})
        hist = pd.DataFrame({"epoch": pd.Series(dtype="int64"),
                             "loss": pd.Series(dtype="float64"),
                             "accuracy": pd.Series(dtype="float64")})
        return norms, hist, (np.zeros((0, n_classes)),
                             np.zeros(n_classes))
    d = len(head[0]["x"])
    w = np.zeros((d, n_classes))
    b = np.zeros(n_classes)
    hist = []
    for epoch in range(epochs):
        w0, b0 = w, b  # freeze for closure

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            x = _stack(df, "x")
            y = df["y"].to_numpy(np.int64)
            z = x @ w0 + b0
            z -= z.max(axis=1, keepdims=True)
            e = np.exp(z)
            p = e / e.sum(axis=1, keepdims=True)
            onehot = np.zeros_like(p)
            onehot[np.arange(len(y)), y] = 1.0
            delta = p - onehot
            gw = x.T @ delta                     # d×c
            gb = delta.sum(axis=0)               # c
            loss = -np.log(np.clip(p[np.arange(len(y)), y],
                                   1e-12, None)).sum()
            hits = float((p.argmax(axis=1) == y).sum())
            flat = np.concatenate([gw.ravel(), gb,
                                   [loss, hits, float(len(y))]])
            return pd.DataFrame({"k": np.arange(len(flat),
                                                dtype="int64"),
                                 "v": flat})

        parts = (feats.map_batches(partial, batch_format="pandas")
                 .to_pandas())
        folded = parts.groupby("k", sort=True)["v"].sum().to_numpy()
        gw = folded[:d * n_classes].reshape(d, n_classes)
        gb = folded[d * n_classes:d * n_classes + n_classes]
        loss, hits, n = folded[-3], folded[-2], folded[-1]
        w = w0 - lr * gw / n
        b = b0 - lr * gb / n
        hist.append({"epoch": epoch, "loss": loss / n,
                     "accuracy": hits / n})

    norms = pd.DataFrame({
        "label": np.arange(n_classes, dtype="int64"),
        "weight_norm": np.linalg.norm(w, axis=0),
        "bias": b})
    return norms, pd.DataFrame(hist), (w, b)
