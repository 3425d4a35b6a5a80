"""Text-analysis operators: token counting, quality scoring, language
identification, document fingerprinting (training-data ops from the
build brief; the reference has no bulk text analytics — its only text
path is LLM refinement, so these are scale-path additions).

Token/quality kernels are pure pyarrow.compute (RE2) so the SQL oracle
can reproduce them exactly; language-ID is a stopword-profile heuristic
(rows-only check)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sigraph_ray.functions import hashing as H

# token = maximal run of non-whitespace (identical to DuckDB
# regexp_extract_all(text, '\S+'))
_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[.,;:!?]"
_STOP_RE = r"\b(?:the|and|of|a|to|in|is)\b"


def text_stats_batch(batch: pa.Table, *, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    txt = batch.column(text_col)
    n_chars = pc.utf8_length(txt)
    n_tokens = pc.count_substring_regex(txt, _TOKEN_RE)
    n_punct = pc.count_substring_regex(txt, _PUNCT_RE)
    n_stop = pc.count_substring_regex(txt, _STOP_RE)
    nt = pc.max_element_wise(n_tokens, pa.scalar(1))
    token_chars = pc.utf8_length(
        pc.replace_substring_regex(txt, r"\s", ""))
    return pa.table({
        id_col: batch.column(id_col),
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "n_punct": pc.cast(n_punct, pa.int64()),
        "n_stopwords": pc.cast(n_stop, pa.int64()),
        "mean_token_len": pc.divide(pc.cast(token_chars, pa.float64()),
                                    pc.cast(nt, pa.float64())),
    })


def text_stats(ds, **kw):
    return ds.map_batches(lambda b: text_stats_batch(b, **kw),
                          batch_format="pyarrow")


def quality_score_batch(batch: pa.Table, *, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Deterministic quality heuristic in [0,1]: length band +
    punctuation presence + stopword ratio band (C4-style signals made
    explicit and exactly reproducible in SQL)."""
    st = text_stats_batch(batch, text_col=text_col, id_col=id_col)
    n_tokens = st.column("n_tokens")
    n_punct = st.column("n_punct")
    n_stop = st.column("n_stopwords")
    nt = pc.cast(pc.max_element_wise(n_tokens, pa.scalar(1)), pa.float64())
    len_ok = pc.cast(pc.and_(pc.greater_equal(n_tokens, pa.scalar(10)),
                             pc.less_equal(n_tokens, pa.scalar(100000))),
                     pa.float64())
    punct_ok = pc.cast(pc.greater(n_punct, pa.scalar(0)), pa.float64())
    stop_ratio = pc.divide(pc.cast(n_stop, pa.float64()), nt)
    stop_ok = pc.cast(pc.greater_equal(stop_ratio, pa.scalar(0.01)),
                      pa.float64())
    score = pc.divide(pc.add(pc.add(len_ok, punct_ok), stop_ok),
                      pa.scalar(3.0))
    return pa.table({
        id_col: st.column(id_col),
        "n_tokens": n_tokens,
        "stop_ratio": stop_ratio,
        "quality_score": score,
    })


def quality_scores(ds, **kw):
    return ds.map_batches(lambda b: quality_score_batch(b, **kw),
                          batch_format="pyarrow")


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    (SQL-reproducible: md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))."""
    txt = batch.column(text_col)
    norm = pc.utf8_lower(pc.utf8_trim_whitespace(txt))
    norm = pc.replace_substring_regex(norm, r"\s+", " ")
    digests = H.md5_hex(norm.to_pylist())
    return pa.table({
        id_col: batch.column(id_col),
        "fingerprint": pa.array(digests, pa.string()),
    })


def fingerprints(ds, **kw):
    return ds.map_batches(lambda b: fingerprint_batch(b, **kw),
                          batch_format="pyarrow")


# --- language ID (stopword-profile heuristic; rows-only oracle) ------------

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for with as was on are this".split()),
    "de": frozenset("der die das und ist von mit nicht ein eine zu auf für den".split()),
    "es": frozenset("el la de que y en los se del las por un con una para".split()),
    "fr": frozenset("le la de et les des en un une du que pour dans est sur".split()),
    "ko": frozenset(),  # CJK handled by script detection below
    "zh": frozenset(),
}


class LangId:
    """Actor-pool language identifier: stopword-profile scores +
    unicode-script detection for CJK/Hangul; profiles built once per
    actor. Vectorized: per-batch pandas str kernels (count/findall) +
    one explode/isin membership pass per profile — no Python loop over
    rows (semantics byte-identical to the frozen golden)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.profiles = {k: v for k, v in _PROFILES.items() if v}
        self.langs = np.array(sorted(self.profiles), dtype=object)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        low = df[self.text_col].fillna("").str.lower()
        nchars = low.str.len().clip(lower=1).to_numpy()
        hangul = low.str.count("[가-힯]").to_numpy()
        cjk = low.str.count("[一-鿿]").to_numpy()
        toks = low.str.findall(r"[a-zà-ÿ]+")
        ntok = toks.map(len).to_numpy()
        ex = toks.explode().dropna()
        rows = []
        for lang in self.langs:
            hit = (ex.isin(self.profiles[lang])
                   .groupby(level=0).sum()
                   .reindex(df.index, fill_value=0).to_numpy())
            rows.append(hit / np.clip(ntok, 1, None))
        smat = np.vstack(rows)
        best_idx = smat.argmax(axis=0)        # first max wins — same
        best_s = smat.max(axis=0)             # tie-break as the loop
        pred = np.where(best_s > 0.02, self.langs[best_idx], "")
        score = np.round(best_s, 6)
        # precedence (original control flow): ko > zh > no-tokens > profile
        no_tok = ntok == 0
        pred = np.where(no_tok, "", pred)
        score = np.where(no_tok, 0.0, score)
        is_ko = hangul * 2 > nchars * 0.1
        is_zh = ~is_ko & (cjk * 2 > nchars * 0.1)
        pred = np.where(is_zh, "zh", pred)
        score = np.where(is_zh, 1.0, score)
        pred = np.where(is_ko, "ko", pred)
        score = np.where(is_ko, 1.0, score)
        return pd.DataFrame({self.id_col: df[self.id_col],
                             "pred_lang": pd.Series(pred, dtype=object),
                             "lang_score": score})


def lang_id(ds, *, concurrency: int = 2, **kw):
    return ds.map_batches(LangId, batch_format="pandas",
                          fn_constructor_kwargs=kw, concurrency=concurrency)


# token for the vocabulary operator = maximal [a-z0-9]+ run of
# lower(text) — identical to the DuckDB oracle's
# regexp_extract_all(lower(text), '[a-z0-9]+')
_WORD_RE = r"[a-z0-9]+"


def term_topk(ds, *, k: int = 50, text_col: str = "text") -> pd.DataFrame:
    """Global top-k vocabulary terms (exact heavy hitters): per-batch
    tokenize + count partials (at most |batch vocabulary| rows per
    batch reach the shuffle), grouped sum on the sorted-stitch
    operator, then a two-phase deterministic top-k
    (freq DESC, term ASC). The corpus never materializes anywhere —
    only per-batch vocabularies and the k-row partial tops move."""
    import re

    from sigraph_ray.stages.collect import sorted_groupby_sum

    rx = re.compile(_WORD_RE)

    def partial(df: pd.DataFrame) -> pa.Table:
        vc = (df[text_col].str.lower().str.findall(rx)
              .explode().dropna().value_counts())
        return pa.table({"term": vc.index.astype(str),
                         "cnt": vc.to_numpy().astype("int64")})

    parts = ds.map_batches(partial, batch_format="pandas")
    agg = sorted_groupby_sum(parts, key="term", sum_cols={"freq": "cnt"})

    def ptop(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["freq", "term"],
                              ascending=[False, True]).head(k)

    partials = agg.map_batches(ptop, batch_format="pandas").to_pandas()
    out = (partials.sort_values(["freq", "term"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["freq"] = out["freq"].astype("int64")
    return out


class TfIdfScorer:
    """Actor-pool TF-IDF scorer: the (vocabulary-sized) document-
    frequency table is fetched from the object store ONCE per actor in
    ``__init__`` (zero-copy ``ray.get`` of a broadcast Arrow table) and
    turned into a term→idf Series; ``__call__`` scores one batch of
    documents vectorized. At 100 TB the vocab table is ~10⁷ terms
    (hundreds of MB) — still broadcastable; beyond that swap the
    broadcast for a hash join on ``term``."""

    def __init__(self, *, df_ref, n_docs: int, k: int,
                 text_col: str, id_col: str):
        import re

        import ray

        t = ray.get(df_ref).to_pandas()
        # idf = ln(N / df) — identical expression to the SQL oracle
        self.idf = pd.Series(
            np.log(float(n_docs) / t["df"].to_numpy(dtype="float64")),
            index=t["term"])
        self.k = k
        self.text_col = text_col
        self.id_col = id_col
        self.rx = re.compile(_WORD_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            self.id_col: pd.Series(dtype="int64"),
            "term": pd.Series(dtype="object"),
            "tfidf": pd.Series(dtype="float64"),
            "rank": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        ex = (df[self.text_col].str.lower().str.findall(self.rx)
              .explode().dropna())
        if len(ex) == 0:
            return empty
        tf = (pd.DataFrame({"rid": ex.index, "term": ex.to_numpy()})
              .groupby(["rid", "term"], sort=False).size()
              .reset_index(name="tf"))
        # scores rounded to 6 dp BEFORE ranking (the oracle does the
        # same) so rank ties resolve by term identically on both sides
        # even when ln() differs by 1 ulp between libm implementations
        tf["tfidf"] = np.round(
            tf["tf"].to_numpy(dtype="float64")
            * self.idf.reindex(tf["term"]).to_numpy(), 6)
        tf = tf.sort_values(["rid", "tfidf", "term"],
                            ascending=[True, False, True], kind="stable")
        top = tf.groupby("rid", sort=False).head(self.k).copy()
        top["rank"] = top.groupby("rid", sort=False).cumcount() + 1
        top[self.id_col] = df[self.id_col].to_numpy()[
            top["rid"].to_numpy()]
        return top[[self.id_col, "term", "tfidf", "rank"]]


def tfidf_topk(ds, *, k: int = 3, text_col: str = "text",
               id_col: str = "doc_id", concurrency: int = 2):
    """Per-document top-k TF-IDF keyword extraction. Two passes over
    the corpus, zero corpus-sized shuffles: (1) per-batch DISTINCT
    (doc, term) partials → stitch-summed document frequencies (the only
    wide op, vocabulary-sized); (2) the df table is broadcast and an
    actor pool re-tokenizes + scores each batch locally (a document is
    one row, so tf is batch-exact)."""
    import ray
    import ray.data as rd
    import re

    from sigraph_ray.stages.collect import sorted_groupby_sum

    rx = re.compile(_WORD_RE)

    def df_partial(df: pd.DataFrame) -> pa.Table:
        ex = (df[text_col].str.lower().str.findall(rx)
              .explode().dropna())
        d = pd.DataFrame({"rid": ex.index,
                          "term": ex.to_numpy()}).drop_duplicates()
        vc = d["term"].value_counts()
        return pa.table({"term": vc.index.astype(str),
                         "cnt": vc.to_numpy().astype("int64")})

    n_docs = ds.count()
    dfds = sorted_groupby_sum(ds.map_batches(df_partial,
                                             batch_format="pandas"),
                              key="term", sum_cols={"df": "cnt"})
    # vocabulary-sized driver collect + zero-copy broadcast (see
    # TfIdfScorer docstring for the 100 TB bound)
    vocab = dfds.to_pandas()
    vocab["df"] = vocab["df"].astype("int64")
    df_ref = ray.put(pa.Table.from_pandas(vocab, preserve_index=False))
    return ds.map_batches(
        TfIdfScorer, batch_format="pandas", concurrency=concurrency,
        fn_constructor_kwargs={"df_ref": df_ref, "n_docs": n_docs,
                               "k": k, "text_col": text_col,
                               "id_col": id_col})


def repetition_stats_batch(df: pd.DataFrame, *, text_col: str = "text",
                           id_col: str = "doc_id") -> pd.DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021
    §A1.1, public): per document, the fraction of tokens that are the
    single most frequent token and the fraction of 2-gram occurrences
    that are repeats (1 − distinct/total). Document-local by
    construction — embarrassingly parallel, no shuffle, and the whole
    batch is processed with vectorized pandas group-bys (no per-row
    Python). Tokens are raw ``\\S+`` runs (same tokenizer as
    ``text_stats``) so the DuckDB oracle reproduces it exactly."""
    toks = df[text_col].str.findall(r"\S+")
    n_tokens = toks.str.len().to_numpy(dtype="int64")
    s = toks.explode().dropna()
    doc = df[id_col].reindex(s.index)
    # most-frequent-token count per doc (0 for empty docs)
    top = (pd.DataFrame({"d": doc.to_numpy(), "t": s.to_numpy()})
           .groupby(["d", "t"], sort=False).size()
           .groupby(level=0).max())
    top_cnt = (top.reindex(df[id_col]).fillna(0)
               .to_numpy(dtype="int64"))
    # 2-grams: join each token with its successor inside the same doc
    nxt = s.groupby(level=0).shift(-1)
    g = pd.DataFrame({"d": doc.to_numpy(),
                      "g": (s + " " + nxt).to_numpy()}).dropna()
    distinct2 = (g.drop_duplicates().groupby("d").size()
                 .reindex(df[id_col]).fillna(0).to_numpy(dtype="int64"))
    total2 = np.maximum(n_tokens - 1, 0)
    dup_frac = np.where(total2 > 0, 1.0 - distinct2 / np.maximum(total2, 1),
                        0.0)
    return pd.DataFrame({
        id_col: df[id_col].to_numpy(),
        "n_tokens": n_tokens,
        "top_token_frac": top_cnt / np.maximum(n_tokens, 1),
        "dup_2gram_frac": dup_frac,
    })


def repetition_stats(ds, **kw):
    return ds.map_batches(lambda b: repetition_stats_batch(b, **kw),
                          batch_format="pandas")


def unigram_logprob(ds, *, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Per-document mean unigram log-probability — the classic
    perplexity-proxy importance score (CCNet/Dolma-style corpus
    filtering signal, computed against the corpus's own unigram LM).

    Two-pass corpus-level composition: (1) global term totals via
    per-batch count partials + one grouped-sum stitch (the term_topk
    machinery); (2) the vocabulary table is ``ray.put`` ONCE and every
    probe batch scores its tokens by vectorized index lookup + ln —
    broadcast-small-side, never re-shipped per batch. Documents with
    zero tokens have no defined score and are excluded (matches the
    SQL oracle's join semantics). Tokens are raw ``\\S+`` runs shared
    with text_stats so the oracle reproduces the scan exactly."""
    import ray

    from sigraph_ray.stages.collect import sorted_groupby_sum

    def partial(df: pd.DataFrame) -> pa.Table:
        vc = (df[text_col].str.findall(r"\S+")
              .explode().dropna().value_counts())
        return pa.table({"term": vc.index.astype(str),
                         "cnt": vc.to_numpy().astype("int64")})

    parts = ds.map_batches(partial, batch_format="pandas")
    vocab = (sorted_groupby_sum(parts, key="term",
                                sum_cols={"c": "cnt"}).to_pandas())
    counts = vocab["c"].to_numpy().astype("float64")
    ref = ray.put((pd.Index(vocab["term"]), counts,
                   float(counts.sum())))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        idx, cnts, total = ray.get(ref)
        s = df[text_col].str.findall(r"\S+").explode().dropna()
        if not len(s):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "mean_log_freq": pd.Series(dtype="float64")})
        doc = df[id_col].reindex(s.index)
        lp = np.log(cnts[idx.get_indexer(s.to_numpy())] / total)
        g = (pd.DataFrame({id_col: doc.to_numpy(), "lp": lp})
             .groupby(id_col)["lp"].agg(["size", "mean"]).reset_index())
        return pd.DataFrame({id_col: g[id_col],
                             "n_tokens": g["size"].astype("int64"),
                             "mean_log_freq": g["mean"]})

    return ds.map_batches(probe, batch_format="pandas")


# GPT-2-style pre-tokenizer, RE2-safe subset (public pattern, Radford
# et al. 2019; the original's \s+(?!\S) lookahead is dropped — RE2 has
# no lookaround — and its effect restored by matching trailing
# whitespace runs last). Shared verbatim with the SQL oracle.
BPE_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
          r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")


def bpe_token_stats(ds, *, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Per-document BPE-ish token counts (the pre-tokenization a real
    BPE tokenizer segments further — within ~1.3× of true GPT-2 token
    counts on English text, the standard cheap budget estimator).
    Stateless zero-copy Arrow scan; count + chars-per-token ratio."""
    def f(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        n = pc.cast(pc.count_substring_regex(txt, BPE_RE), pa.int64())
        chars = pc.cast(pc.utf8_length(txt), pa.float64())
        return pa.table({
            id_col: batch.column(id_col),
            "n_bpe_tokens": n,
            "chars_per_token": pc.divide(
                chars, pc.cast(pc.max_element_wise(n, pa.scalar(1)),
                               pa.float64())),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def ngram_topk(ds, *, n: int = 2, k: int = 50,
               text_col: str = "text") -> pd.DataFrame:
    """Global top-k token n-grams (the n-gram LM / tokenizer-training
    count table, exact tier): per-batch vectorized n-gram construction
    (tokens exploded once, (n-1) doc-local shifts — a document is one
    row, so grams never cross batches) + count partials, one grouped
    sum on the sorted stitch, two-phase deterministic top-k
    (freq DESC, gram ASC). Only per-batch gram vocabularies and k-row
    partial tops move; the corpus never materializes."""
    import re

    from sigraph_ray.stages.collect import sorted_groupby_sum

    rx = re.compile(_WORD_RE)

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df[text_col].str.lower().str.findall(rx)
        s = toks.explode().dropna()
        gram = s
        for i in range(1, n):
            gram = gram + " " + s.groupby(level=0).shift(-i)
        vc = gram.dropna().value_counts()
        return pa.table({"gram": vc.index.astype(str),
                         "cnt": vc.to_numpy().astype("int64")})

    parts = ds.map_batches(partial, batch_format="pandas")
    agg = sorted_groupby_sum(parts, key="gram", sum_cols={"freq": "cnt"})

    def ptop(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["freq", "gram"],
                              ascending=[False, True]).head(k)

    partials = agg.map_batches(ptop, batch_format="pandas").to_pandas()
    out = (partials.sort_values(["freq", "gram"],
                                ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["freq"] = out["freq"].astype("int64")
    return out


def pmi_collocations(ds, *, min_count: int = 3, k: int = 50,
                     text_col: str = "text") -> pd.DataFrame:
    """PMI collocation extraction (Church & Hanks 1990) — the phrase/
    multi-word-entity mining step of a KG-construction pipeline:
    ``pmi(w1,w2) = ln(c_xy · N / (c_x · c_y))`` over adjacent token
    bigrams, N = total token count; bigrams below ``min_count`` are
    dropped (PMI is unstable at tiny counts), top-k by
    (pmi DESC, w1, w2).

    Dataflow: TWO grouped-sum stitches share one tokenizing scan shape
    (unigram counts; bigram counts pre-thresholded AFTER the stitch),
    the scalar N folds per-block partial sums, and the two marginal
    attachments run as bounded sorted-merge joins on w1 then w2 —
    no hash-join pool spin-up, nothing corpus-sized on the driver.
    The min_count filter runs before the joins, so only surviving
    bigrams shuffle; a Zipf-hot head word (``the``-style) bounds the
    join fan-out by its DISTINCT surviving partners, not its token
    frequency (the salted join tier covers degenerate cases)."""
    import re

    from sigraph_ray.stages.collect import sorted_groupby_sum
    from sigraph_ray.stages.joins import sorted_merge_join

    rx = re.compile(_WORD_RE)

    def uni_partial(df: pd.DataFrame) -> pa.Table:
        toks = df[text_col].str.lower().str.findall(rx)
        vc = toks.explode().dropna().value_counts()
        return pa.table({"term": vc.index.astype(str),
                         "cnt": vc.to_numpy().astype("int64")})

    def bi_partial(df: pd.DataFrame) -> pa.Table:
        toks = df[text_col].str.lower().str.findall(rx)
        s = toks.explode().dropna()
        gram = (s + " " + s.groupby(level=0).shift(-1)).dropna()
        vc = gram.value_counts()
        return pa.table({"gram": vc.index.astype(str),
                         "cnt": vc.to_numpy().astype("int64")})

    uni = sorted_groupby_sum(
        ds.map_batches(uni_partial, batch_format="pandas"),
        key="term", sum_cols={"c": "cnt"}).materialize()
    n_parts = uni.map_batches(
        lambda df: pd.DataFrame({"n": [int(df["c"].sum())]}),
        batch_format="pandas", batch_size=None).to_pandas()
    n_tokens = float(n_parts["n"].sum())

    bi = sorted_groupby_sum(
        ds.map_batches(bi_partial, batch_format="pandas"),
        key="gram", sum_cols={"c_xy": "cnt"})

    def split_gram(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["c_xy"] >= min_count]
        parts = d["gram"].str.split(" ", n=1, expand=True)
        if len(d) == 0:
            return pd.DataFrame({"w1": pd.Series(dtype="object"),
                                 "w2": pd.Series(dtype="object"),
                                 "c_xy": pd.Series(dtype="int64")})
        return pd.DataFrame({"w1": parts[0], "w2": parts[1],
                             "c_xy": d["c_xy"].astype("int64")})

    pairs = bi.map_batches(split_gram, batch_format="pandas")

    u1 = uni.map_batches(
        lambda df: df.rename(columns={"term": "w1", "c": "c_x"}),
        batch_format="pandas")
    u2 = uni.map_batches(
        lambda df: df.rename(columns={"term": "w2", "c": "c_y"}),
        batch_format="pandas")
    j1 = sorted_merge_join(pairs, u1, on="w1",
                           left_cols=["w2", "c_xy"], right_cols=["c_x"])
    j2 = sorted_merge_join(j1, u2, on="w2",
                           left_cols=["w1", "c_xy", "c_x"],
                           right_cols=["c_y"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # identical expression tree to the SQL oracle:
        # ln(CAST(c_xy AS DOUBLE) * N / (c_x * c_y))
        num = df["c_xy"].to_numpy(np.float64) * n_tokens
        den = (df["c_x"].to_numpy(np.int64)
               * df["c_y"].to_numpy(np.int64)).astype(np.float64)
        out = pd.DataFrame({"w1": df["w1"], "w2": df["w2"],
                            "c_xy": df["c_xy"].astype("int64"),
                            "pmi": np.log(num / den)})
        return out.sort_values(["pmi", "w1", "w2"],
                               ascending=[False, True, True]).head(k)

    partials = j2.map_batches(score, batch_format="pandas").to_pandas()
    return (partials.sort_values(["pmi", "w1", "w2"],
                                 ascending=[False, True, True])
            .head(k).reset_index(drop=True))


class _AhoCorasick:
    """Classic Aho-Corasick automaton (Aho & Corasick, CACM 1975 —
    public algorithm) with word-boundary filtering and per-term
    NON-overlapping counting, so its counts equal the
    ``re.compile(r'\\b'+escape(t)+r'\\b')`` / ``Series.str.count``
    kernel's exactly (regex counting restarts after each match; two
    overlapping hits of one term count once)."""

    def __init__(self, terms: list[str]):
        self.terms = list(terms)
        self.lens = [len(t) for t in self.terms]
        goto: list[dict] = [{}]
        out: list[list[int]] = [[]]
        for tid, term in enumerate(self.terms):
            s = 0
            for ch in term:
                nxt = goto[s].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[s][ch] = nxt
                s = nxt
            out[s].append(tid)
        fail = [0] * len(goto)
        from collections import deque

        q = deque()
        for s in goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in goto[s].items():
                q.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t \
                    else 0
                out[t] = out[t] + out[fail[t]]  # merged suffix outputs
        self.goto, self.fail, self.out = goto, fail, out

    @staticmethod
    def _is_word(ch: str) -> bool:
        return ch.isalnum() or ch == "_"

    def count_doc(self, text: str, mentions: np.ndarray,
                  docs_hit: np.ndarray) -> None:
        """Accumulate non-overlapping word-bounded counts for one
        document into ``mentions``; set ``docs_hit`` flags."""
        goto, fail, out, lens = self.goto, self.fail, self.out, self.lens
        next_free = {}
        s = 0
        n = len(text)
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                after_ok = i + 1 >= n or not self._is_word(text[i + 1])
                if not after_ok:
                    continue
                for tid in out[s]:
                    start = i + 1 - lens[tid]
                    if start > 0 and self._is_word(text[start - 1]):
                        continue
                    if start < next_free.get(tid, 0):
                        continue  # regex non-overlap: restart after hit
                    next_free[tid] = i + 1
                    mentions[tid] += 1
                    docs_hit[tid] = True


class GazetteerAC:
    """Actor-pool gazetteer kernel: the Aho-Corasick automaton is
    built ONCE per actor in ``__init__`` (10⁵-phrase dictionaries cost
    seconds to compile — never per batch), each batch is scanned once
    REGARDLESS of dictionary size, and the emitted partial is one row
    per term per batch — identical to the RE2 partial, so the same
    grouped-sum stitch folds it."""

    def __init__(self, terms: list[str], text_col: str = "text"):
        self.ac = _AhoCorasick(terms)
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_terms = len(self.ac.terms)
        mentions = np.zeros(n_terms, dtype=np.int64)
        docs = np.zeros(n_terms, dtype=np.int64)
        doc_hit = np.zeros(n_terms, dtype=bool)
        for text in df[self.text_col].str.lower():
            doc_hit[:] = False
            self.ac.count_doc(text, mentions, doc_hit)
            docs += doc_hit
        return pd.DataFrame({"term": self.ac.terms,
                             "n_mentions": mentions, "n_docs": docs})


def gazetteer_mentions(ds, terms: list[str], *,
                       text_col: str = "text",
                       kernel: str = "auto",
                       ac_threshold: int = 256,
                       concurrency: int = 2) -> pd.DataFrame:
    """Dictionary (gazetteer) mention tagging — the lexicon-match NER
    pass of a KG-construction pipeline (reference analog: the IoC /
    artifact-name matching surface, graph/query.py's property filters,
    done here over free text): for each dictionary phrase, count
    non-overlapping word-bounded occurrences across the corpus and the
    number of documents containing it.

    Two kernels behind one dataflow (partials are one row per term per
    block; the grouped-sum stitch folds |terms| rows):

    - ``re2`` — small lexicons: the dictionary broadcast by closure,
      each block scanned once per term with a compiled regex via the
      vectorized ``Series.str.count`` kernel. Per-block cost
      O(|terms| × block bytes) — unbeatable under a few hundred terms,
      linear-in-dictionary beyond.
    - ``ac`` — big dictionaries: an actor pool whose Aho-Corasick
      automaton is built once per actor in ``__init__``
      (:class:`GazetteerAC`); each block is scanned ONCE total, so
      per-block cost is O(block bytes + matches), independent of
      |terms|. Counting semantics are regex-identical (word-bounded,
      per-term non-overlapping) — parity is pytest-enforced.

    ``kernel='auto'`` picks ``ac`` at ≥ ``ac_threshold`` terms."""
    import re

    from sigraph_ray.stages.collect import sorted_groupby_agg

    if kernel == "auto":
        kernel = "ac" if len(terms) >= ac_threshold else "re2"

    if kernel == "ac":
        partials = ds.map_batches(
            GazetteerAC, batch_format="pandas",
            fn_constructor_kwargs={"terms": list(terms),
                                   "text_col": text_col},
            concurrency=concurrency)
    else:
        compiled = [(t, re.compile(r"\b" + re.escape(t) + r"\b"))
                    for t in terms]

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            low = df[text_col].str.lower()
            rows = []
            for t, rx in compiled:
                cnt = low.str.count(rx)
                rows.append((t, int(cnt.sum()), int((cnt > 0).sum())))
            return pd.DataFrame(rows, columns=["term", "n_mentions",
                                               "n_docs"])

        partials = ds.map_batches(partial, batch_format="pandas")

    out = sorted_groupby_agg(
        partials, key="term",
        aggs={"n_mentions": ("n_mentions", "sum"),
              "n_docs": ("n_docs", "sum")}).to_pandas()
    out = out.sort_values("term").reset_index(drop=True)
    return out.astype({"n_mentions": "int64", "n_docs": "int64"})


def mention_snippets(ds, terms: list[str], *, text_col: str = "text",
                     id_col: str = "doc_id", window: int = 20,
                     k: int = 100) -> pd.DataFrame:
    """Evidence-snippet (KWIC) extraction — the provenance step of KG
    construction that keeps a context window around each matched
    dictionary phrase so every extracted edge can cite its evidence
    (reference analog: the matched raw Sigma documents kept alongside
    MATCHES edges, stages/syslog.py).

    For each (term, doc) with ≥1 occurrence: the FIRST occurrence's
    1-based position and a ±``window``-char snippet. Plain substring
    semantics (no word boundary) so the SQL oracle is exactly
    ``strpos``/``substr``. Vectorized ``Series.str.find`` per term per
    block; global order (term, id) with a two-phase top-k so only
    per-block heads reach the bounded final fold."""
    terms = sorted(terms)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        low = df[text_col].str.lower()
        outs = []
        for t in terms:
            pos0 = low.str.find(t)
            hit = pos0 >= 0
            if not hit.any():
                continue
            pos = pos0[hit] + 1                      # 1-based like strpos
            start = (pos - window).clip(lower=1)
            length = pos + len(t) + window - start   # chars through +window
            txt = df.loc[hit, text_col]
            snip = [s[st - 1:st - 1 + ln] for s, st, ln
                    in zip(txt, start, length)]
            outs.append(pd.DataFrame({
                "term": t,
                id_col: df.loc[hit, id_col].to_numpy(),
                "pos": pos.to_numpy().astype("int64"),
                "snippet": snip}))
        if not outs:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 id_col: pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64"),
                                 "snippet": pd.Series(dtype="object")})
        return (pd.concat(outs, ignore_index=True)
                .sort_values(["term", id_col]).head(k))

    partials = (ds.map_batches(partial, batch_format="pandas")
                .to_pandas())
    return (partials.sort_values(["term", id_col])
            .head(k).reset_index(drop=True))


def bm25_topk(ds, query_terms: list[str], *, k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text",
              id_col: str = "doc_id") -> pd.DataFrame:
    """BM25 document ranking (Robertson & Zaragoza 2009) for one
    broadcast query — the retrieval scorer a RAG / dedup-aware corpus
    pipeline runs next to embedding search:
    ``score = Σ_t idf_t · tf/(tf + k1·(1−b+b·dl/avgdl))`` with
    ``idf = ln(1 + (N−df+0.5)/(df+0.5))``.

    Dataflow: ONE tokenizing scan emits per-doc (dl, tf_t…) rows,
    materialized once for two consumers; the corpus statistics
    (N, Σdl, df_t) fold from per-block partials (|terms|+2 scalars
    each); idf/avgdl broadcast back by closure for the scoring pass;
    top-k is two-phase. Token-exact term matching (word-bounded regex
    count — 'join' does not hit 'joins').

    Scale note: the materialized projection is NARROW (one int64 per
    term + dl per doc — tens of bytes/row vs the corpus's kilobytes),
    and Ray's object store spills it; for corpora whose ROW COUNT
    alone exceeds spill capacity, drop the materialize and pay a
    second tokenizing scan (stats pass + scoring pass) — same
    semantics, trade chosen per deployment."""
    import re

    terms = list(query_terms)
    rxs = [(t, re.compile(r"\b" + re.escape(t) + r"\b")) for t in terms]
    tok = re.compile(_WORD_RE)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        low = df[text_col].str.lower()
        out = {id_col: df[id_col].to_numpy(),
               "dl": low.str.count(tok).to_numpy().astype("int64")}
        for t, rx in rxs:
            out[f"tf_{t}"] = low.str.count(rx).to_numpy().astype("int64")
        return pd.DataFrame(out)

    per_doc = ds.map_batches(stats, batch_format="pandas").materialize()

    def fold_partial(df: pd.DataFrame) -> pd.DataFrame:
        row = {"n": float(len(df)), "sum_dl": float(df["dl"].sum())}
        for t in terms:
            row[f"df_{t}"] = float((df[f"tf_{t}"] > 0).sum())
        return pd.DataFrame([row])

    g = (per_doc.map_batches(fold_partial, batch_format="pandas")
         .to_pandas().sum())
    if len(g) == 0 or float(g["n"]) == 0.0:
        # typed-empty guard: an empty corpus has no ranking (and no
        # avgdl to divide by)
        return pd.DataFrame({id_col: pd.Series(dtype="object"),
                             "score": pd.Series(dtype="float64")})
    n, avgdl = float(g["n"]), float(g["sum_dl"]) / float(g["n"])
    idf = {t: float(np.log(1.0 + (n - g[f"df_{t}"] + 0.5)
                           / (g[f"df_{t}"] + 0.5))) for t in terms}

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(np.float64)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(df))
        for t in terms:
            tf = df[f"tf_{t}"].to_numpy(np.float64)
            s += idf[t] * tf / (tf + denom_base)
        out = pd.DataFrame({id_col: df[id_col], "score": s})
        return out.sort_values(["score", id_col],
                               ascending=[False, True]).head(k)

    partials = (per_doc.map_batches(score, batch_format="pandas")
                .to_pandas())
    return (partials.sort_values(["score", id_col],
                                 ascending=[False, True])
            .head(k).reset_index(drop=True))


def vocab_summary(ds, *, text_col: str = "text") -> pd.DataFrame:
    """One-row corpus vocabulary summary — Heaps'-law inputs and the
    hapax share (the vocabulary-health screen of corpus curation):
    total tokens, distinct terms, hapax legomena count. One tokenizing
    scan into the grouped-sum stitch (term-count table is
    vocabulary-sized), then a scalar fold of (rows, freq==1, Σfreq)."""
    import re

    from sigraph_ray.stages.collect import sorted_groupby_sum

    rx = re.compile(_WORD_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = (df[text_col].str.lower().str.findall(rx)
              .explode().dropna().value_counts())
        return pd.DataFrame({"term": vc.index.astype(str),
                             "c": vc.to_numpy().astype("int64")})

    counts = sorted_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        key="term", sum_cols={"c": "c"})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "vocab": [int(len(df))],
            "hapax": [int((df["c"] == 1).sum())],
            "tokens": [int(df["c"].sum())]})

    g = counts.map_batches(fold, batch_format="pandas").to_pandas().sum()
    return pd.DataFrame({"vocab": [int(g["vocab"])],
                         "hapax": [int(g["hapax"])],
                         "tokens": [int(g["tokens"])]})


def rrf_fuse(rankings: list[pd.DataFrame], *, id_col: str,
             c: int = 60, k: int = 20) -> pd.DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of bounded
    top-k lists: ``rrf(d) = Σ_r 1/(c + rank_r(d))`` summed over the
    lists d appears in; top-k by (rrf DESC, id). Each ranking frame
    MUST carry ``id_col`` plus a 1-based ``rank`` column (validated).
    Operates on already-bounded ranker outputs (each ≤ its own k), so
    the fuse is a bounded final fold by construction — the heavy
    lifting happened inside each ranker's distributed pass."""
    scores: dict = {}
    for r in rankings:
        if "rank" not in r.columns or id_col not in r.columns:
            raise ValueError(
                f"rrf_fuse: each ranking needs columns ({id_col!r}, "
                f"'rank'); got {list(r.columns)}")
        # positional access — itertuples attribute lookup breaks on
        # non-identifier column names
        for rid, rk in zip(r[id_col].to_numpy(), r["rank"].to_numpy()):
            scores[rid] = scores.get(rid, 0.0) + 1.0 / (c + rk)
    out = pd.DataFrame({id_col: list(scores), "rrf": list(scores.values())})
    return (out.sort_values(["rrf", id_col], ascending=[False, True])
            .head(k).reset_index(drop=True))


_CHAR_CLASSES = [("alpha", r"[a-z]"), ("digit", r"[0-9]"),
                 ("space", r" "), ("other", r"[^a-z0-9 ]")]


def charclass_entropy_by_source(ds, *, text_col: str = "text",
                                group_col: str = "source"):
    """Per-source mean character-class Shannon entropy — the
    gibberish / boilerplate screen of corpus quality scoring (a page of
    repeated punctuation or digit noise scores far from prose):
    per doc, H = −Σ_c p_c ln p_c over {alpha, digit, space, other}
    fractions of lowercased characters; then mean per source.

    One scan (four vectorized class-count kernels per block → per-doc
    H), per-block (sum H, n) partials per source, one grouped-sum
    stitch of |sources| rows."""
    import re

    from sigraph_ray.stages.collect import sorted_groupby_sum

    compiled = [(name, re.compile(rx)) for name, rx in _CHAR_CLASSES]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        low = df[text_col].str.lower()
        total = low.str.len().to_numpy(np.float64)
        h = np.zeros(len(df))
        for _, rx in compiled:
            c = low.str.count(rx).to_numpy(np.float64)
            p = np.divide(c, total, out=np.zeros_like(c),
                          where=total > 0)
            h -= np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0)),
                          0.0)
        g = (pd.DataFrame({group_col: df[group_col], "h": h,
                           "n": np.ones(len(df), dtype="int64")})
             .groupby(group_col, sort=False)
             .agg(h=("h", "sum"), n=("n", "sum")).reset_index())
        return g

    agg = sorted_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        key=group_col, sum_cols={"h": "h", "n": "n"}).to_pandas()
    out = pd.DataFrame({group_col: agg[group_col],
                        "mean_entropy": agg["h"].to_numpy(np.float64)
                        / agg["n"].to_numpy(np.float64),
                        "n_docs": agg["n"].astype("int64")})
    return out.sort_values(group_col).reset_index(drop=True)


def lexical_diversity_by_source(ds, *, text_col: str = "text",
                                group_col: str = "source"):
    """Per-source mean type-token ratio (distinct tokens / total
    tokens per doc) — the lexical-diversity quality signal (template
    farms and keyword-stuffed pages sit far below prose). Same
    one-scan + |sources|-row stitch shape as the entropy screen."""
    import re

    from sigraph_ray.stages.collect import sorted_groupby_sum

    rx = re.compile(_WORD_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(rx)
        ex = toks.explode().dropna()
        total = ex.groupby(level=0).size()
        distinct = ex.groupby(level=0).nunique()
        ttr = (distinct / total).reindex(df.index)
        keep = ttr.notna()
        g = (pd.DataFrame({group_col: df.loc[keep, group_col],
                           "t": ttr[keep].to_numpy(np.float64),
                           "n": 1})
             .groupby(group_col, sort=False)
             .agg(t=("t", "sum"), n=("n", "sum")).reset_index())
        return g

    agg = sorted_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        key=group_col, sum_cols={"t": "t", "n": "n"}).to_pandas()
    out = pd.DataFrame({group_col: agg[group_col],
                        "mean_ttr": agg["t"].to_numpy(np.float64)
                        / agg["n"].to_numpy(np.float64),
                        "n_docs": agg["n"].astype("int64")})
    return out.sort_values(group_col).reset_index(drop=True)


def mmr_diversify(candidates: pd.DataFrame, *, id_col: str,
                  text_col: str, score_col: str, k: int = 10,
                  lam: float = 0.7) -> pd.DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) of a BOUNDED candidate list (a ranker's top-k):
    greedily pick argmax λ·rel − (1−λ)·max_sel cos(d, selected).
    Relevance is min-max-normalized to [0, 1] so λ weighs comparable
    scales. Runs on the driver by design — the input is already a
    bounded top-k (the distributed work happened in the ranker);
    embeddings are the deterministic hashed-ngram stand-in."""
    from sigraph_ray.functions.embed import embed_texts

    if len(candidates) == 0:
        return candidates.assign(mmr=pd.Series(dtype="float64"))
    cand = candidates.reset_index(drop=True)
    vecs = np.stack(embed_texts(cand[text_col].tolist()))
    rel = cand[score_col].to_numpy(np.float64)
    span = rel.max() - rel.min()
    rel = (rel - rel.min()) / span if span > 0 else np.ones_like(rel)
    sims = vecs @ vecs.T
    selected: list[int] = []
    mmr_scores: list[float] = []
    remaining = list(range(len(cand)))
    while remaining and len(selected) < k:
        if selected:
            penalty = sims[np.ix_(remaining, selected)].max(axis=1)
        else:
            penalty = np.zeros(len(remaining))
        obj = lam * rel[remaining] - (1 - lam) * penalty
        # deterministic tie-break: lowest candidate index
        best = int(np.lexsort((np.array(remaining), -obj))[0])
        mmr_scores.append(float(obj[best]))
        selected.append(remaining.pop(best))
    out = cand.iloc[selected][[id_col, score_col]].copy()
    out["mmr"] = mmr_scores
    return out.reset_index(drop=True)
