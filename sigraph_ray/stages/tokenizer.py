"""BPE tokenizer TRAINING as dataflow — byte-pair-encoding merge
learning (Sennrich et al. 2016, public algorithm; the formulation all
practical trainers use, e.g. the original subword-nmt and HuggingFace
tokenizers: merges are learned from the WORD-FREQUENCY table, never by
re-scanning the corpus per merge).

Shape for 100 TB: the corpus contributes exactly ONE distributed pass
— per-batch word-count partials (vectorized findall + value_counts)
reduced by a grouped-sum stitch (stages/collect.sorted_groupby_agg).
Everything after runs on the (vocabulary-sized) word table: pair
counting and merging are O(|vocab| × word-length) per merge round.
Bound (documented): the distinct-word table must fit one process —
~10⁷-10⁸ types for web corpora (the same bound every production BPE
trainer has); past that, hash-shard the word table and tree-combine
pair counts per round.

Determinism: merge ties break on (pair frequency DESC, left ASC,
right ASC), so the learned merge list is identical across block
counts and parallelism levels (layout-invariance is pytest-pinned).
The reference has no tokenizer surface — beyond-reference per the
brief (the engine's training-export path, pipelines/training_export,
is the consumer).
"""

from __future__ import annotations

import pandas as pd

_WORD_RE = r"[a-z0-9]+"
_EOW = "</w>"


def word_counts(ds, *, text_col: str = "text") -> pd.DataFrame:
    """Distinct-word frequency table via one stitch — the only
    corpus-wide pass of BPE training."""
    from sigraph_ray.stages.collect import sorted_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = (df[text_col].str.lower().str.findall(_WORD_RE)
              .explode().dropna().value_counts())
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "c": vc.to_numpy()})

    out = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        key="word", aggs={"freq": ("c", "sum")}).to_pandas()
    if not len(out):
        return pd.DataFrame({"word": pd.Series(dtype="object"),
                             "freq": pd.Series(dtype="int64")})
    out["freq"] = out["freq"].astype("int64")
    return out.sort_values("word", kind="stable").reset_index(drop=True)


def bpe_from_word_counts(wc: pd.DataFrame,
                         n_merges: int) -> pd.DataFrame:
    """Learn up to ``n_merges`` merges from a (word, freq) table →
    DataFrame (rank, left, right, pair_freq). Stops early when no
    pair occurs twice."""
    seqs = {w: tuple(w) + (_EOW,) for w in wc["word"]}
    freq = dict(zip(wc["word"], wc["freq"]))
    merges = []
    for rank in range(n_merges):
        pairs: dict = {}
        for w, sym in seqs.items():
            f = freq[w]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (left, right), best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < 2:
            break
        merges.append({"rank": rank, "left": left, "right": right,
                       "pair_freq": int(best)})
        new = left + right
        for w, sym in seqs.items():
            if left not in sym:
                continue
            out = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(new)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            seqs[w] = tuple(out)
    return pd.DataFrame(merges, columns=["rank", "left", "right",
                                         "pair_freq"])


def bpe_train(ds, *, n_merges: int = 50,
              text_col: str = "text") -> pd.DataFrame:
    """One corpus pass + bounded merge loop (module docstring)."""
    return bpe_from_word_counts(word_counts(ds, text_col=text_col),
                                n_merges)
