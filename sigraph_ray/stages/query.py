"""The query/RAG read surface (SURVEY.md §2 F3 + the reference's only
read API over the LLM graph).

Reference flow (src/ai/ai_agent.py:456-500 ``__graph_retriever`` /
``__full_retriever``):

1. F3 — entities are extracted from the question by the LLM
   (QUESTION_PROMPT, output_format.EntitiesFromQuestion) and unified
   ``strip().lower()`` (ai_agent.py:473, 401-403).
2. Per entity, KNOWLEDGE_GRAPH_QUERY (src/ai/prompt.py:151-173): ≤ 2
   nodes whose id STARTS WITH the entity, their out- then in-edges
   excluding MENTIONS, each formatted ``src - TYPE -> dst``, LIMIT 50.
3. Hybrid context: the graph lines concatenated with vector-retrieval
   top-k document texts (ai_agent.py:485-500).

Batch restatement: :func:`query_entities` is the deterministic F3
stand-in (IoC-shaped tokens via the closed TYPE_RULES vocabulary — the
same sealed-sandbox substitution as the A1 grammar extractor);
:func:`neighborhood` runs the per-seed retrieval BULK over a seed list
(Cypher's index order made deterministic: nodes sorted ascending,
out-leg before in-leg, lines sorted within each leg). Works over any
(nodes, edges) pair — the LLM KG's (entities, edges) or the provenance
graph's (nodes, edges)."""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa


def unify_entity(entity: str) -> str:
    """ai_agent.py:401-403 — strip + lower (E1)."""
    return entity.strip().lower()


# IoC-shaped question tokens (the deterministic F3 stand-in): filename,
# IP, registry path, process image, module — the same surface classes
# TYPE_RULES assigns (functions/verbs.py).
_ENTITY_TOKEN = re.compile(
    r"(?:[a-z0-9_\-.]+\.(?:exe|dll|tmp|ini|txt|bat|ps1)"
    r"|(?:\d{1,3}\.){3}\d{1,3}"
    r"|hklm\\[a-z0-9_\\.]+)",
    re.IGNORECASE)


def query_entities(question: str) -> list[str]:
    """F3 — entities from a question (deterministic stand-in for the
    LLM structured-output extraction, ai_agent.py:459-474). Order of
    first appearance, unified, deduplicated."""
    seen: dict[str, None] = {}
    for m in _ENTITY_TOKEN.finditer(question):
        seen.setdefault(unify_entity(m.group(0)), None)
    return list(seen)


class _NeighborhoodPartial:
    """Per-batch combiner over the edge table: emit each seed's edge
    lines (out-leg 0 / in-leg 1), keeping only the per-batch top
    ``max_lines`` by (leg, line) so hub nodes never flood the reduce."""

    def __init__(self, matched_ref, src_col, dst_col, type_col, max_lines):
        import ray

        # seed -> set of matched node ids (≤ max_nodes per seed)
        self.matched: dict[str, set] = ray.get(matched_ref)
        self.src_col, self.dst_col = src_col, dst_col
        self.type_col = type_col
        self.max_lines = max_lines

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        src = df[self.src_col].astype(str)
        dst = df[self.dst_col].astype(str)
        line = src + " - " + df[self.type_col].astype(str) + " -> " + dst
        rows = {"seed": [], "leg": [], "line": []}
        for seed, nodes in self.matched.items():
            out_hits = line[src.isin(nodes)]
            in_hits = line[dst.isin(nodes)]
            for leg, hits in ((0, out_hits), (1, in_hits)):
                for ln in hits:
                    rows["seed"].append(seed)
                    rows["leg"].append(leg)
                    rows["line"].append(ln)
        part = pd.DataFrame(rows)
        if len(part):
            part = (part.sort_values(["seed", "leg", "line"], kind="stable")
                    .groupby("seed", sort=False).head(self.max_lines))
        return pa.Table.from_pandas(part, preserve_index=False)


def neighborhood(nodes, edges, seeds, *, id_col: str = "artifact",
                 src_col: str = "src", dst_col: str = "dst",
                 type_col: str = "type", exclude_types: tuple = ("MENTIONS",),
                 max_nodes: int = 2, max_lines: int = 50) -> pd.DataFrame:
    """KNOWLEDGE_GRAPH_QUERY in bulk: for every seed string, ≤
    ``max_nodes`` prefix-matched nodes (sorted id — the Cypher leans on
    index order), their out- then in-edges excluding ``exclude_types``,
    formatted ``src - TYPE -> dst``, first ``max_lines`` lines.
    Returns a (seed, line) DataFrame (duplicates preserved — the
    reference's UNION ALL emits an edge once per matched endpoint).

    Distributed shape: node prefix-match is a per-batch combiner
    (≤ max_nodes × seeds rows leave each batch), the matched sets are
    broadcast (tiny), and the edge scan is a per-batch combiner keeping
    ≤ max_lines per seed — the final merge touches only
    O(seeds × blocks × max_lines) rows."""
    import ray

    seeds = [unify_entity(s) for s in seeds if s]
    if not seeds:
        return pd.DataFrame({"seed": [], "line": []})

    def match_partial(df: pd.DataFrame) -> pa.Table:
        ids = df[id_col].astype(str)
        rows = {"seed": [], "node": []}
        for s in seeds:
            hit = ids[ids.str.startswith(s)]
            for node in hit.sort_values().head(max_nodes):
                rows["seed"].append(s)
                rows["node"].append(node)
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    cand = nodes.map_batches(match_partial, batch_format="pandas").to_pandas()
    matched: dict[str, set] = {}
    if len(cand) and "seed" in cand.columns:
        for s, g in cand.groupby("seed"):
            matched[s] = set(g["node"].sort_values().head(max_nodes))
    if not matched:
        return pd.DataFrame({"seed": [], "line": []})

    ed = edges
    if exclude_types:

        def drop_excluded(df: pd.DataFrame) -> pd.DataFrame:
            return df[~df[type_col].isin(exclude_types)]

        ed = ed.map_batches(drop_excluded, batch_format="pandas")
    parts = ed.map_batches(
        _NeighborhoodPartial, batch_format="pandas",
        fn_constructor_kwargs={
            "matched_ref": ray.put(matched), "src_col": src_col,
            "dst_col": dst_col, "type_col": type_col,
            "max_lines": max_lines},
        concurrency=2).to_pandas()
    if not len(parts):
        return pd.DataFrame({"seed": [], "line": []})
    final = (parts.sort_values(["seed", "leg", "line"], kind="stable")
             .groupby("seed", sort=False).head(max_lines))
    return final[["seed", "line"]].reset_index(drop=True)


def hybrid_context(nodes, edges, docs_with_embeddings, question: str, *,
                   k: int = 4, id_col: str = "entity",
                   src_col: str = "src", dst_col: str = "dst",
                   type_col: str = "pred") -> str:
    """__full_retriever (ai_agent.py:485-500): graph neighborhood of the
    question's entities concatenated with vector top-k document texts.
    The vector leg embeds the question with the same deterministic
    hashed-ngram embedder the doc-embedding stage uses
    (functions/embed.py) and scores via brute-force cosine."""
    from sigraph_ray.functions.embed import embed_texts
    from sigraph_ray.stages.similarity import knn_cosine

    ents = query_entities(question)
    graph_df = neighborhood(nodes, edges, ents, id_col=id_col,
                            src_col=src_col, dst_col=dst_col,
                            type_col=type_col)
    graph_data = "\n".join(graph_df["line"]) or "No relevant graph data found."

    qvec = embed_texts([question])[0]
    queries = pd.DataFrame({"qid": [0], "vec": [qvec]})
    top = knn_cosine(docs_with_embeddings, queries, k=k,
                     id_col="doc_id", emb_col="embedding").to_pandas()
    texts = docs_with_embeddings.map_batches(
        lambda df: df[df["doc_id"].isin(set(top["vec_id"]))][
            ["doc_id", "text"]],
        batch_format="pandas").to_pandas()
    order = {v: r for v, r in zip(top["vec_id"], top["rank"])}
    texts = texts.sort_values("doc_id", key=lambda s: s.map(order))
    vector_data = "#Document ".join(texts["text"])
    return f"Graph Data:\n{graph_data}\nVector Data:\n{vector_data}"
