"""Distributed multinomial Naive Bayes text classifier — TRAINING as
dataflow (the count aggregation IS the fit) plus broadcast-model
scoring. The stand-in for the quality/source classifiers (fastText-
style) every training-data curation pipeline runs; public textbook
method (add-one/Laplace smoothing). The reference has no classifier
surface — beyond-reference per the brief.

Shape for 100 TB:

- **fit**: per-batch ``(class, term, count)`` partials (vectorized
  explode + groupby — a document is one row, so counts never split
  across batches) reduced by ONE grouped-sum stitch
  (stages/collect.sorted_groupby_agg) keyed ``(class, term)``; class
  priors from a second, class-cardinality-sized stitch. The fitted
  model is the aggregated count table — nothing iterative, nothing on
  the driver but the |classes| × |vocab| table itself.
- **score**: the model is packed into a dense ``(V+1) × C`` log-prob
  matrix (row V = out-of-vocabulary) and ``ray.put`` broadcast once;
  every batch classifies independently (searchsorted vocab lookup +
  one fancy-index + per-doc segment sum) — embarrassingly parallel.

Bound (documented): the model matrix must fit the object store —
8·V·C bytes (10⁷ terms × 100 classes ≈ 8 GB); past that hash terms
into a fixed feature space (fastText's trick) or keep the model a
Dataset and score via a term join.

Determinism: scores are float64 sums over a doc's token occurrences;
argmax ties break by class name ascending. The SQL oracle
(pipelines/queries.SQL_NB_CLASSIFY) reproduces fit + scoring exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TOKEN_RE = r"[a-z0-9]+"


def _tokens(df: pd.DataFrame, text_col: str) -> pd.Series:
    return df[text_col].str.lower().str.findall(_TOKEN_RE)


def nb_fit_predict(ds, *, text_col: str = "text",
                   label_col: str = "source", id_col: str = "doc_id",
                   holdout_mod: int = 5):
    """Fit on rows with ``id % holdout_mod != 0``, predict the label of
    the held-out rows → ``(id_col, predicted)`` Dataset (docs with zero
    tokens are excluded — they carry no evidence)."""
    import ray

    from sigraph_ray.stages.collect import sorted_groupby_agg

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[id_col] % holdout_mod != 0]
        if not len(df):
            return pd.DataFrame({label_col: pd.Series(dtype="object"),
                                 "term": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        toks = _tokens(df, text_col)
        lab = df[label_col].reindex(toks.index)
        long = pd.DataFrame({label_col: lab.to_numpy(),
                             "term": toks.to_numpy()}).explode("term")
        long = long.dropna(subset=["term"])
        g = (long.groupby([label_col, "term"], sort=False).size()
             .rename("c").reset_index())
        return g

    def docs_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[id_col] % holdout_mod != 0]
        return (df.groupby(label_col, sort=False).size()
                .rename("n").reset_index())

    counts = sorted_groupby_agg(
        ds.map_batches(count_partial, batch_format="pandas"),
        key=[label_col, "term"], aggs={"c": ("c", "sum")}).to_pandas()
    ndocs = sorted_groupby_agg(
        ds.map_batches(docs_partial, batch_format="pandas"),
        key=label_col, aggs={"n": ("n", "sum")}).to_pandas()

    if not len(counts):
        return ds.map_batches(
            lambda df: pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "predicted": pd.Series(dtype="object")}),
            batch_format="pandas")

    classes = np.sort(ndocs[label_col].to_numpy())
    c_idx = pd.Index(classes)
    vocab = np.sort(counts["term"].unique())
    v_idx = pd.Index(vocab)
    V = len(vocab)
    C = len(classes)
    # dense (V+1) × C log-prob matrix; row V = OOV (count 0)
    cnt = np.zeros((V + 1, C), dtype=np.float64)
    cnt[v_idx.get_indexer(counts["term"].to_numpy()),
        c_idx.get_indexer(counts[label_col].to_numpy())] = \
        counts["c"].to_numpy(dtype=np.float64)
    totals = cnt.sum(axis=0)
    logp = np.log(cnt + 1.0) - np.log(totals + V)
    n_by_class = np.zeros(C, dtype=np.float64)
    n_by_class[c_idx.get_indexer(ndocs[label_col].to_numpy())] = \
        ndocs["n"].to_numpy(dtype=np.float64)
    prior = np.log(n_by_class / n_by_class.sum())
    model_ref = ray.put((vocab, classes, logp, prior))

    def predict(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[id_col] % holdout_mod == 0]
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "predicted": pd.Series(dtype="object")})
        voc, cls, lp, pr = ray.get(model_ref)
        toks = _tokens(df.reset_index(drop=True), text_col)
        s = toks.explode().dropna()
        if not len(s):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "predicted": pd.Series(dtype="object")})
        terms = s.to_numpy()
        pos = np.searchsorted(voc, terms)
        pos = np.clip(pos, 0, len(voc) - 1)
        hit = voc[pos] == terms
        rows = np.where(hit, pos, len(voc))  # OOV → last row
        per_occ = lp[rows]                   # (n_occ, C)
        doc_of = s.index.to_numpy()
        order = np.argsort(doc_of, kind="stable")
        per_occ = per_occ[order]
        doc_sorted = doc_of[order]
        bounds = np.flatnonzero(
            np.r_[True, doc_sorted[1:] != doc_sorted[:-1]])
        sums = np.add.reduceat(per_occ, bounds, axis=0) + pr
        # argmax with class-name-ascending tie-break: classes are
        # sorted, np.argmax returns the FIRST maximum
        pred = cls[np.argmax(sums, axis=1)]
        doc_ids = df[id_col].reset_index(drop=True)\
            .iloc[doc_sorted[bounds]].to_numpy()
        return pd.DataFrame({id_col: doc_ids, "predicted": pred})

    return ds.map_batches(predict, batch_format="pandas")
