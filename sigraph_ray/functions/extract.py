"""Deterministic rule-based triple extraction (the batch stand-in for the
reference's LLM extraction chain).

The reference extracts (subj, pred, obj) triples from refined report
text with an LLM under a strict prompt contract
(src/ai/prompt.py:44-127 + structured output
src/ai/output_format.py:25-30); ``LLMGraphTransformer`` runs per chunk
(src/ai/ai_agent.py:243-247). In a sealed batch engine the extractor
must be deterministic per (url, chunk) — Ray task retries re-execute
lineage, and the north rule demands a reproducible triple set — so we
implement the prompt contract as an explicit grammar:

1. sentence split on ``[.!?]`` + whitespace;
2. V4 speculation filter (prompt.py:92-95);
3. V5 atomic clause split on ``; / and then / then / and``
   (prompt.py:96-99);
4. one master verb-alternation regex per clause → (subj, verb-surface,
   obj); clauses without a whitelist verb surface are background and are
   dropped (prompt.py:92-95 EXCLUDE);
5. V1 surface→verb normalization (verbs.SURFACE_TO_VERB);
6. V2 download atomization — a download-like clause emits
   ``http_request|network_request endpoint`` **plus** ``create
   basename(endpoint)`` (or ``inject → in memory`` when the sentence has
   a fileless marker) (prompt.py:83-99);
7. V3 generic-actor flagging — resolution to the document's first named
   actor happens in a per-url groupby stage
   (stages/triples.py), since chunks of one document may be in
   different batches.

All heavy steps are pandas/str-vectorized over exploded clause frames;
no per-row Python in the scan path except the final object cleanup maps.
"""

from __future__ import annotations

import posixpath
import re

import numpy as np
import pandas as pd

from . import verbs as V

# Verb alternation, longest-first so e.g. "network_connect" beats "connect".
_ALL_SURFACES = sorted(
    set(V.SURFACE_TO_VERB) | set(V.DOWNLOAD_SURFACES), key=len, reverse=True
)
_VERB_ALT = "|".join(re.escape(s) for s in _ALL_SURFACES)

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+|\n+")  # newline = hard boundary
_CLAUSE_SPLIT = re.compile(r"\s*(?:;|,?\s+and\s+then\s+|,?\s+then\s+|,?\s+and\s+)\s*")
_SPECULATION = re.compile(V.SPECULATION_RE)

# A3 ensemble variants (deterministic stand-in for the AICourt debate
# ensemble, src/ai/ai_court.py:16-89: 3 debaters — 1 "flexible" + 2
# "solid"): each variant perturbs the grammar the way a debater's
# temperature perturbs the LLM. Variant 0 is the canonical grammar
# (the reference returns debater[1]'s final answer; our tie-break
# equivalently prefers variant 0's fields).
VARIANTS: tuple[dict, ...] = (
    {},  # canonical
    {"clause_split": re.compile(        # aggressive: also split commas
        r"\s*(?:;|,|\s+and\s+then\s+|\s+then\s+|\s+and\s+)\s*")},
    {"speculation": re.compile(         # strict: also drop hedged verbs
        V.SPECULATION_RE + r"|\b(?:reportedly|allegedly|suspected)\b")},
)
_MASTER = re.compile(
    rf"^(?P<subj>.+?)\s+(?P<surface>{_VERB_ALT})\b"
    rf"(?:\s+(?:to|from|into|at|via|with|on)\b)?\s+(?P<obj>.+)$"
)
# V5 produces subject-elided clauses ("… and then persists via X"); the
# prompt contract resolves ellipsis to the running actor (prompt.py:66).
_NOSUBJ = re.compile(
    rf"^(?P<surface>{_VERB_ALT})\b"
    rf"(?:\s+(?:to|from|into|at|via|with|on)\b)?\s+(?P<obj>.+)$"
)
_FILELESS = re.compile("|".join(re.escape(m) for m in V.FILELESS_MARKERS))
_OBJ_TRIM = re.compile(r"""^["'`]+|["'`.,:)\]]+$""")
_TYPE_RULES = [(re.compile(pat, re.I), t) for pat, t in V.TYPE_RULES]

TRIPLE_COLUMNS = [
    "doc_url", "chunk_id", "ord", "subj", "subj_is_generic",
    "pred", "obj", "subj_type", "obj_type",
]


def _clean_obj(obj: str) -> str:
    # context after an em/double dash is rationale, not object; the
    # object itself is the first whitespace token (IoCs — URLs, paths,
    # process names, registry keys — are space-free; trailing adverbials
    # like "every 60 seconds" are rationale, prompt.py:108-112).
    obj = obj.split(" — ")[0].split(" -- ")[0].strip()
    obj = obj.split(" ", 1)[0] if obj else obj
    return _OBJ_TRIM.sub("", obj)


def _etype(value: str, default: str) -> str:
    for rx, t in _TYPE_RULES:
        if rx.search(value):
            return t
    return default


def extract_triples(df: pd.DataFrame, *, clause_split=None,
                    speculation=None) -> pd.DataFrame:
    """(url, chunk_id, text) rows → raw triple rows (TRIPLE_COLUMNS).

    ``ord`` is a deterministic within-document order key
    ``chunk_id * 10^6 + sentence_idx * 10^3 + clause_idx`` used for
    first-named-actor resolution and last-writer tie-breaks.
    ``clause_split`` / ``speculation`` override the canonical grammar
    (the A3 ensemble's perturbation hooks, see :data:`VARIANTS`).
    """
    clause_split = clause_split or _CLAUSE_SPLIT
    speculation = speculation or _SPECULATION
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series(dtype=_DTYPES[c]) for c in TRIPLE_COLUMNS})

    sents = df[["url", "chunk_id"]].copy()
    sents["sent"] = df["text"].str.split(_SENT_SPLIT)
    sents = sents.explode("sent", ignore_index=True)
    sents["sent_idx"] = sents.groupby(["url", "chunk_id"]).cumcount()
    sents = sents[sents["sent"].str.len() > 0]
    # V4 speculation filter
    sents = sents[~sents["sent"].str.contains(speculation, regex=True)]

    cl = sents.copy()
    cl["clause"] = cl["sent"].str.split(clause_split)
    cl = cl.explode("clause", ignore_index=True)
    cl["clause_idx"] = cl.groupby(["url", "chunk_id", "sent_idx"]).cumcount()
    cl = cl[cl["clause"].str.len() > 0]
    if len(cl) == 0:
        return pd.DataFrame({c: pd.Series(dtype=_DTYPES[c]) for c in TRIPLE_COLUMNS})

    m = cl["clause"].str.extract(_MASTER)
    # second chance: subject-elided clauses inherit the running subject
    nosubj = cl["clause"][m["surface"].isna()].str.extract(_NOSUBJ)
    m.loc[nosubj.index, "surface"] = nosubj["surface"]
    m.loc[nosubj.index, "obj"] = nosubj["obj"]
    cl = cl.assign(subj=m["subj"], surface=m["surface"], obj=m["obj"])
    cl = cl.dropna(subset=["surface"])
    if len(cl) == 0:
        return pd.DataFrame({c: pd.Series(dtype=_DTYPES[c]) for c in TRIPLE_COLUMNS})

    cl["subj"] = cl["subj"].str.strip()
    # forward-fill elided subjects from the previous clause of the same
    # sentence; still-unresolved ones are treated as generic ("it") and
    # resolved at document level (resolve_generic_actors).
    cl["subj"] = cl.groupby(["url", "chunk_id", "sent_idx"])["subj"].ffill()
    elided = cl["subj"].isna()
    cl.loc[elided, "subj"] = "it"
    # subjects that still carry a leading article ("the xenorat implant"
    # never appears in the grammar; "the malware" does) are matched
    # against the generic table as-is, lowercased.
    cl["subj_is_generic"] = cl["subj"].str.lower().isin(V.GENERIC_ACTORS)
    cl["obj"] = cl["obj"].map(_clean_obj)
    cl = cl[cl["obj"].str.len() > 0]
    cl["ord"] = (
        cl["chunk_id"].astype(np.int64) * 1_000_000
        + cl["sent_idx"].astype(np.int64) * 1_000
        + cl["clause_idx"].astype(np.int64)
    )
    cl["fileless"] = cl["sent"].str.contains(_FILELESS, regex=True)

    is_dl = cl["surface"].isin(V.DOWNLOAD_SURFACES)
    plain = cl[~is_dl].copy()
    plain["pred"] = plain["surface"].map(V.SURFACE_TO_VERB)

    dl = cl[is_dl]
    parts = [plain[["url", "chunk_id", "ord", "subj", "subj_is_generic", "pred", "obj"]]]
    if len(dl):
        is_http = dl["obj"].str.match(r"https?://", case=False)
        req = dl.assign(pred=np.where(is_http, "http_request", "network_request"))
        parts.append(req[["url", "chunk_id", "ord", "subj", "subj_is_generic", "pred", "obj"]])
        # second atom: create basename(endpoint) — or inject in memory
        second = dl.copy()
        second["pred"] = np.where(second["fileless"], "inject", "create")
        second["obj"] = np.where(
            second["fileless"],
            "in memory",
            second["obj"].map(_endpoint_basename),
        )
        second["ord"] = second["ord"] + 500  # orders after the request atom
        second = second[second["obj"].str.len() > 0]
        parts.append(second[["url", "chunk_id", "ord", "subj", "subj_is_generic", "pred", "obj"]])

    out = pd.concat(parts, ignore_index=True)
    out["subj_type"] = out["subj"].map(lambda s: _etype(s, "Process"))
    out["obj_type"] = out["obj"].map(lambda s: _etype(s, "Entity"))
    out = out.rename(columns={"url": "doc_url"})
    return out[TRIPLE_COLUMNS].astype(_DTYPES)


def _endpoint_basename(endpoint: str) -> str:
    """Local filename implied by a download endpoint: the URL basename
    (deterministic; prompt.py:83-91 requires a create <local path> atom
    even when the report names no path)."""
    path = endpoint.split("?", 1)[0].split("#", 1)[0]
    if "://" in path:
        path = path.split("://", 1)[1]
    base = posixpath.basename(path.rstrip("/"))
    return base


_DTYPES = {
    "doc_url": "object", "chunk_id": "int64", "ord": "int64",
    "subj": "object", "subj_is_generic": "bool", "pred": "object",
    "obj": "object", "subj_type": "object", "obj_type": "object",
}


def resolve_generic_actors(group: pd.DataFrame) -> pd.DataFrame:
    """V3 actor resolution for one document (one ``doc_url`` group):
    generic subjects become the document's FIRST named actor (min
    ``ord``); documents with no named actor drop their generic rows
    entirely (generic actors are banned, prompt.py:60-67)."""
    named = group.loc[~group["subj_is_generic"]]
    if named.empty:
        return group.loc[~group["subj_is_generic"]]
    first = named.loc[named["ord"].idxmin()]
    out = group.copy()
    mask = out["subj_is_generic"]
    out.loc[mask, "subj"] = first["subj"]
    out.loc[mask, "subj_type"] = first["subj_type"]
    return out


def resolve_generic_actors_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Batch-wide vectorized V3 resolution — same semantics as the
    per-document :func:`resolve_generic_actors` (verified equivalent in
    test_extract), applied to ALL documents of a batch in one pass:
    one idxmin groupby finds each document's first named actor, one
    ``map`` rewrites the generic rows, docs with no named actor drop
    their generic rows. Replaces a ``groupby.apply`` whose per-group
    ``.loc`` writes dominated the extraction stage profile."""
    if not len(df):
        return df
    gen = df["subj_is_generic"].to_numpy()
    named = df[~gen]
    if not len(named):
        return named
    first_idx = named.groupby("doc_url", sort=False)["ord"].idxmin()
    firsts = named.loc[first_idx.values].set_index("doc_url")
    has_named = df["doc_url"].isin(firsts.index).to_numpy()
    out = df[~gen | has_named].copy()
    m = out["subj_is_generic"].to_numpy()
    if m.any():
        urls = out.loc[m, "doc_url"]
        out.loc[m, "subj"] = urls.map(firsts["subj"]).to_numpy()
        out.loc[m, "subj_type"] = urls.map(firsts["subj_type"]).to_numpy()
    return out


def extract_triples_ensemble(df: pd.DataFrame, *, min_votes: int = 2) -> pd.DataFrame:
    """A3 — deterministic debate-ensemble extraction: run every grammar
    variant (:data:`VARIANTS`), keep triples endorsed by ≥ ``min_votes``
    variants (majority of 3), with field values taken from the lowest-
    index endorsing variant (the reference's "return debater[1]'s
    answer", ai_court.py:89, made order-free).

    Higher precision than single-grammar extraction on adversarial text
    (a clause only one perturbation parses is dropped); identical output
    on text where the variants agree."""
    outs = []
    for vi, cfg in enumerate(VARIANTS):
        out = extract_triples(df, **cfg)
        out = out.assign(_variant=vi)
        outs.append(out)
    allv = pd.concat(outs, ignore_index=True)
    if len(allv) == 0:
        return allv.drop(columns=["_variant"])
    key = ["doc_url", "subj", "pred", "obj"]
    votes = allv.drop_duplicates(key + ["_variant"]).groupby(
        key, sort=False).size()
    winners = votes[votes >= min_votes].index
    kept = allv.set_index(key).loc[winners].reset_index()
    kept = kept.sort_values("_variant", kind="stable").drop_duplicates(key)
    return kept.drop(columns=["_variant"]).reset_index(drop=True)[TRIPLE_COLUMNS]
