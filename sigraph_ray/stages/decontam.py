"""Benchmark decontamination — flag corpus documents sharing any
n-token shingle with an evaluation split (the GPT-3 appendix-C /
Dolma-style training-data hygiene pass; public method). The reference
has no corpus surface at all — beyond-reference per the build brief.

Shape for 100 TB: the EVAL side is small by definition (benchmark
suites are MBs, the corpus is the 100 TB side), so its distinct
shingle set is collected once and ``ray.put`` broadcast — the classic
small-side-broadcast join; the corpus side is one embarrassingly
parallel ``map_batches`` probe (vectorized pandas explode/shift gram
construction + C-hash ``isin`` membership), no shuffle anywhere. For
an eval set too big to broadcast raw, swap the string set for a
64-bit-hash set (8 bytes/shingle) — membership then admits a ~2⁻⁶⁴
false-positive rate, which only ever OVER-flags; the string set here
keeps the operator exactly SQL-checkable.

Tokenization is the shared ``\\S+`` rule (stages/textstats), so the
DuckDB oracle reproduces the scan bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _doc_grams(df: pd.DataFrame, n: int, text_col: str,
               id_col: str) -> tuple[pd.Series, pd.Series, np.ndarray]:
    """(doc_id, gram) long series for all n-token shingles, plus the
    per-row token count (aligned to ``df``)."""
    toks = df[text_col].str.findall(r"\S+")
    n_tokens = toks.str.len().to_numpy(dtype="int64")
    s = toks.explode().dropna()
    gram = s
    for i in range(1, n):
        gram = gram + " " + s.groupby(level=0).shift(-i)
    keep = gram.notna()
    doc = df[id_col].reindex(gram.index)[keep]
    return doc, gram[keep], n_tokens


def decontaminate(ds, *, n: int = 4, eval_mod: int = 20,
                  text_col: str = "text", id_col: str = "doc_id",
                  member: str = "string"):
    """Split ``ds`` into eval (``doc_id % eval_mod == 0``) and corpus
    rows; return per-corpus-document shingle totals, the count of
    shingle occurrences also present in the eval split, and a
    contamination flag. Documents with zero tokens are excluded
    (they have no shingles to test).

    ``member="string"`` broadcasts the eval shingles verbatim (exactly
    SQL-checkable); ``member="hash"`` broadcasts their 64-bit hashes —
    8 bytes per shingle, the 100 TB-eval-set path — admitting a ~2⁻⁶⁴
    per-probe false-positive rate that only ever OVER-flags (pytest
    pins both variants equal on planted corpora)."""
    import ray

    if member not in ("string", "hash"):
        raise ValueError(member)

    def eval_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[id_col] % eval_mod == 0]
        if not len(df):
            return pd.DataFrame({"gram": pd.Series(dtype="object")})
        _, gram, _ = _doc_grams(df, n, text_col, id_col)
        return pd.DataFrame({"gram": gram.unique()})

    eval_grams = np.unique(np.concatenate(
        [b["gram"].to_numpy() for b in
         ds.map_batches(eval_partial, batch_format="pandas")
         .iter_batches(batch_format="pandas")] or
        [np.empty(0, dtype=object)]))
    if member == "hash":
        grams_ref = ray.put(np.unique(pd.util.hash_pandas_object(
            pd.Series(eval_grams, dtype="object"),
            index=False).to_numpy().astype(np.uint64)))
    else:
        grams_ref = ray.put(pd.Index(eval_grams))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df[id_col] % eval_mod != 0)].reset_index(drop=True)
        toks_nonzero = df[text_col].str.count(r"\S+") > 0
        df = df[toks_nonzero].reset_index(drop=True)
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "n_grams": pd.Series(dtype="int64"),
                                 "n_contaminated": pd.Series(dtype="int64"),
                                 "contaminated": pd.Series(dtype="bool")})
        idx = ray.get(grams_ref)
        doc, gram, n_tokens = _doc_grams(df, n, text_col, id_col)
        if member == "hash":
            gh = pd.util.hash_pandas_object(
                gram.reset_index(drop=True),
                index=False).to_numpy().astype(np.uint64)
            pos = np.searchsorted(idx, gh)
            ok = pos < len(idx)
            ok[ok] = idx[pos[ok]] == gh[ok]
            hits = ok
        else:
            hits = gram.isin(idx).to_numpy()
        hit = (pd.DataFrame({"d": doc.to_numpy(), "h": hits})
               .groupby("d")["h"].sum())
        n_cont = (hit.reindex(df[id_col]).fillna(0)
                  .to_numpy(dtype="int64"))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_grams": np.maximum(n_tokens - (n - 1), 0),
            "n_contaminated": n_cont,
            "contaminated": n_cont > 0,
        })

    return ds.map_batches(probe, batch_format="pandas")
