"""A3 stage-0/stage-1 — report refinement (the two AICourt ensembles
that precede extraction in the reference).

The reference runs TWO debate ensembles over every raw report before
any triple is extracted (src/ai/ai_agent.py:405-454): stage-0 produces
an *overview* (victim / actor / campaign context) and stage-1 a
*behavior report* (the attack-flow text), and it is the refined
behavior text — not the raw report — that feeds
``LLMGraphTransformer``. This module restates that shape for the batch
engine: a :class:`ReportRefiner` actor stage materializes both refined
texts as COLUMNS (``overview``, ``behavior``) on the document stream,
and ``pipelines.kg.build_kg(refine=True)`` points the extractor at the
``behavior`` column.

The deterministic stand-in classifies sentences with the extraction
grammar's own verb alternation (a sentence that can never yield a
triple is context → overview; one that can is behavior), so extraction
over the refined column provably preserves the triple set — the same
co-design the reference gets from prompting both stages with one
contract (src/ai/prompt.py:17-59). A model-backed refiner drops in
through ``backend`` exactly like the extractor seam.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from sigraph_ray.functions import extract as X
from sigraph_ray.functions import verbs as V

#: sentence-level behavior test: does the sentence contain any
#: whitelist verb surface (the only sentences the grammar can parse
#: into triples)?
_BEHAVIOR = re.compile(rf"\b(?:{X._VERB_ALT})\b")
_SPECULATIVE = re.compile(V.SPECULATION_RE)
_FILELESS = re.compile("|".join(re.escape(m) for m in V.FILELESS_MARKERS))


def _split_sentences(texts: pd.Series) -> pd.DataFrame:
    """(doc_idx, sent) rows, sentence order preserved — the SAME
    splitter the extractor uses (functions/extract._SENT_SPLIT), so
    refined text re-splits into identical sentences downstream."""
    df = pd.DataFrame({"doc": range(len(texts)), "sent": texts})
    df["sent"] = df["sent"].str.split(X._SENT_SPLIT)
    df = df.explode("sent", ignore_index=True)
    return df[df["sent"].str.len() > 0]


def refine_reports(df: pd.DataFrame, *, text_col: str = "text",
                   min_votes: int = 1) -> pd.DataFrame:
    """Deterministic two-stage refinement over a document batch:
    returns ``overview`` and ``behavior`` string columns (newline-joined
    sentences; newline is a hard boundary for the extractor, so
    sentence identity survives the round trip).

    ``min_votes`` is the ensemble knob: each "debater" is a sentence
    classifier variant and a sentence enters the behavior report when
    ≥ ``min_votes`` variants endorse it (1 = single canonical
    classifier; 2 = the majority-of-3 AICourt shape,
    src/ai/ai_court.py:16-89)."""
    texts = df[text_col].fillna("")
    sents = _split_sentences(texts)
    low = sents["sent"].str.lower()
    verb = low.str.contains(_BEHAVIOR, regex=True)
    if min_votes <= 1:
        is_behavior = verb
    else:
        # three deterministic debaters: canonical (verb surface),
        # strict (verb AND not speculative), permissive (verb OR
        # fileless marker — catches "in memory" narration)
        votes = (verb.astype(int)
                 + (verb & ~low.str.contains(_SPECULATIVE, regex=True))
                 .astype(int)
                 + (verb | low.str.contains(_FILELESS, regex=True))
                 .astype(int))
        is_behavior = votes >= min_votes
    beh = (sents.loc[is_behavior].groupby("doc")["sent"]
           .agg("\n".join))
    ovw = (sents.loc[~is_behavior].groupby("doc")["sent"]
           .agg("\n".join))
    out = df.copy()
    idx = pd.RangeIndex(len(df))
    out["overview"] = ovw.reindex(idx).fillna("").to_numpy()
    out["behavior"] = beh.reindex(idx).fillna("").to_numpy()
    return out


class ReportRefiner:
    """Actor-pool refinement stage (the batch analog of the two warm
    AICourt ensembles, ai_agent.py:405-454): compiled classifiers load
    once per actor; each batch of documents gains ``overview`` and
    ``behavior`` columns.

    ``backend`` is the REFINER SEAM: None = deterministic canonical
    classifier, "ensemble" = the majority-of-3 debate shape, or any
    callable ``(df, text_col) -> df`` adding the two columns (where a
    real two-stage LLM refiner would construct its warm clients)."""

    def __init__(self, backend=None, text_col: str = "text") -> None:
        self.text_col = text_col
        if backend is None:
            self._refine = lambda df: refine_reports(
                df, text_col=text_col, min_votes=1)
        elif backend == "ensemble":
            self._refine = lambda df: refine_reports(
                df, text_col=text_col, min_votes=2)
        elif callable(backend):
            self._refine = lambda df: backend(df, text_col)
        else:
            raise ValueError(f"unknown refiner backend: {backend!r}")

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(self._refine(batch),
                                    preserve_index=False)


def refine_stage(docs, *, backend=None, text_col: str = "text",
                 concurrency: int = 2, batch_size: int = 256,
                 num_cpus: float = 0.5):
    """docs Dataset → same rows + (overview, behavior) columns.

    ``num_cpus`` defaults fractional: this pool is alive at the same
    time as the downstream extraction pool and the canonicalization
    shuffles — full-CPU actors in both pools would pin every slot of a
    small session and starve the shuffle map tasks (the documented
    pool+join deadlock, stages/joins.py)."""
    return docs.map_batches(
        ReportRefiner, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus,
        fn_constructor_kwargs={"backend": backend, "text_col": text_col})
