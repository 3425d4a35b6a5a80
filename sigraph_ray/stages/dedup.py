"""Deduplication operators over a document table — the training-data
ops a 100 TB pipeline needs beyond the reference's exact-distinct
(SURVEY.md §2.7 notes the reference has exact dedup only; these are the
scale-path additions required by the build brief).

All follow the same shape: vectorized per-batch signature computation →
hash-partition groupby on the signature → candidate verification →
connected components (stages/canonicalize.connected_components) →
deterministic representative (min id per component).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min

logger = logging.getLogger(__name__)

from sigraph_ray.functions import hashing as H
from sigraph_ray.stages.canonicalize import connected_components

# --- exact dedup -----------------------------------------------------------


def add_md5(ds, text_col: str = "text"):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["content_md5"] = H.md5_hex(df[text_col].fillna(""))
        return df
    return ds.map_batches(f, batch_format="pandas")


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the minimum-id row per distinct text (partition by content
    digest + per-group min — 'hash-partition + per-group first' from
    the brief). Returns (kept_ids Dataset). The grouped min runs as
    the range-sort + blockwise stitch (stages/collect), not Ray's
    aggregate reduce: exact dedup feeds ~one row per document into the
    global phase, exactly the row-heavy shape whose per-row reduce
    combine (~100 µs each) would dominate at corpus scale."""
    from sigraph_ray.stages.collect import sorted_groupby_agg

    hashed = add_md5(ds, text_col)
    return sorted_groupby_agg(
        hashed.map_batches(
            lambda df: df[["content_md5", id_col]], batch_format="pandas"),
        key="content_md5", aggs={"kept_id": (id_col, "min")})


# --- MinHash + LSH near-dedup ----------------------------------------------

NUM_PERM = 64
NUM_BANDS = 16  # 4 rows per band → catches jaccard ≳ 0.7 reliably


class MinHashSignatures:
    """Shingle → minhash → band hashes. Permutation seeds built once
    per worker (task tier via ``_memo_stage``; deterministic seeds, so
    every worker computes identical signatures)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 3):
        self.seeds = H.make_seeds(NUM_PERM)
        self.text_col = text_col
        self.id_col = id_col
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # batch-wide vectorized: explode word tokens, build k-shingle
        # strings by shifted concatenation (masked at doc boundaries),
        # hash ALL shingles in one pass, per-doc per-perm min via one
        # minimum.reduceat over doc-contiguous segments. Bit-identical
        # to the per-doc H.shingle_hashes/minhash_signature path
        # (min over duplicates == min over uniques; same token hash).
        n = len(df)
        toks = df[self.text_col].fillna("").str.split()
        lens = toks.str.len().to_numpy()
        sig = np.full((n, NUM_PERM), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        nonempty = lens > 0
        if nonempty.any():
            flat = pd.Series(
                [t for sub in toks[nonempty] for t in sub], dtype="object")
            nl = lens[nonempty]
            # per-doc shingle counts: max(len - k + 1, 1)
            scnt = np.maximum(nl - self.k + 1, 1)
            starts = np.concatenate(([0], np.cumsum(nl)[:-1]))
            # shingle j of doc d = tokens[starts[d]+j : +k] joined; for
            # short docs (len < k) one shingle of all tokens.
            doc_of = np.repeat(np.arange(len(nl)), scnt)
            offs = (np.arange(len(doc_of))
                    - np.repeat(np.concatenate(
                        ([0], np.cumsum(scnt)[:-1])), scnt))
            base = starts[doc_of] + offs
            vals = flat.to_numpy()
            parts = [pd.Series(vals[base], dtype="object")]
            end = starts[doc_of] + nl[doc_of]
            for j in range(1, self.k):
                idx = np.minimum(base + j, end - 1)
                nxt = pd.Series(vals[idx], dtype="object")
                # short-doc single shingle: stop at the doc's last token
                valid = base + j <= end - 1
                parts.append(nxt.where(pd.Series(valid), ""))
            sh_str = parts[0]
            for p in parts[1:]:
                sh_str = sh_str + np.where(p.to_numpy() == "", "", " ") + p
            hs = H.splitmix64(pd.util.hash_pandas_object(
                sh_str, index=False).to_numpy().astype(np.uint64))
            # (perm, shingles) mix then segmented min per doc
            seg_starts = np.concatenate(([0], np.cumsum(scnt)[:-1]))
            mins = np.empty((NUM_PERM, len(scnt)), dtype=np.uint64)
            for p0 in range(0, NUM_PERM, 8):  # bound the (perm, shingle)
                mixed = H.splitmix64(          # scratch to ~8 rows
                    hs[None, :] ^ self.seeds[p0:p0 + 8, None])
                mins[p0:p0 + 8] = np.minimum.reduceat(
                    mixed, seg_starts, axis=1)
            sig[nonempty] = mins.T
        rows_per_band = NUM_PERM // NUM_BANDS
        segs = sig.reshape(n, NUM_BANDS, rows_per_band)
        bxor = np.bitwise_xor.reduce(segs, axis=2)
        bh = H.splitmix64(
            bxor ^ np.arange(NUM_BANDS, dtype=np.uint64)[None, :])
        out = pd.DataFrame({
            "doc_id": np.repeat(df[self.id_col].to_numpy(), NUM_BANDS),
            "band": np.tile(np.arange(NUM_BANDS, dtype=np.int64), n),
            "band_hash": bh.reshape(-1).astype(np.int64)})
        # Arrow out — the band groupby shuffles these blocks
        return pa.Table.from_pandas(out, preserve_index=False)


class VerifyJaccard:
    """Recompute true shingle Jaccard per candidate pair. The texts
    arrive ON the pair rows (attached upstream by two distributed hash
    joins), so no driver-side corpus scan or broadcast text dict; a
    per-actor shingle cache exploits the star shape of the candidate
    set (anchor docs repeat across pairs)."""

    def __init__(self, threshold: float, k: int):
        self.threshold = threshold
        self.k = k
        self._cache: dict[int, np.ndarray] = {}

    def _sh(self, i: int, text: str) -> np.ndarray:
        if i not in self._cache:
            if len(self._cache) > 50_000:
                self._cache.clear()
            self._cache[i] = H.shingle_hashes(text or "", self.k)
        return self._cache[i]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        keep = [H.jaccard(self._sh(u, tu), self._sh(v, tv)) >= self.threshold
                for u, tu, v, tv in zip(df["u"], df["text_u"],
                                        df["v"], df["text_v"])]
        return df.loc[pd.Series(keep, index=df.index), ["u", "v"]]


class _ParticipantTexts:
    """Corpus filter: keep only the (id, text) rows whose id appears
    in the candidate-pair table. The pair table ships as object-store
    block refs (driver ships refs only, same idiom as
    stages/traversal._AdjacencyIndex); the id SET builds once per
    WORKER (task tier via ``_memo_stage``). One distributed corpus
    scan, small output."""

    def __init__(self, pair_refs: list, id_col: str, text_col: str):
        import ray

        ids: set = set()
        for t in ray.get(list(pair_refs)):
            if t.num_rows:
                ids.update(t.column("u").to_pylist())
                ids.update(t.column("v").to_pylist())
        self.ids = ids
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame):
        import pyarrow as pa

        sub = df[df[self.id_col].isin(self.ids)]
        # emit Arrow (exact block sizing): pandas object-dtype empties
        # trip Ray's size estimator (np.vectorize on size-0 input) into
        # a per-block warning log
        return pa.table({"side_id": pa.array(sub[self.id_col]),
                         "side_text": pa.array(sub[self.text_col],
                                               type=pa.string())})


class _RefVerifyJaccard(VerifyJaccard):
    """Jaccard verify with the participating texts fetched from block
    refs in ``__init__`` (bounded: ≤ 2 × pairs texts — the broadcast
    tier only runs under ``broadcast_pairs``). Runs over the PAIR rows;
    no join needed to co-locate the two texts of a pair."""

    def __init__(self, text_refs: list, threshold: float, k: int):
        import ray

        super().__init__(threshold, k)
        texts: dict = {}
        for t in ray.get(list(text_refs)):
            if t.num_rows:
                texts.update(zip(t.column("side_id").to_pylist(),
                                 t.column("side_text").to_pylist()))
        self.texts = texts

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        tx = self.texts
        keep = [H.jaccard(self._sh(u, tx.get(u)),
                          self._sh(v, tx.get(v))) >= self.threshold
                for u, v in zip(df["u"], df["v"])]
        return df.loc[pd.Series(keep, index=df.index), ["u", "v"]]


class _RefLabelAssign:
    """Corpus scan assigning cluster labels from a small broadcast
    node→comp map (block refs, built once per actor) — replaces a
    corpus-wide left-outer hash join when the label table is small."""

    def __init__(self, label_refs: list, id_col: str):
        import ray

        comp: dict = {}
        for t in ray.get(list(label_refs)):
            if t.num_rows:
                comp.update(zip(t.column("node").to_pylist(),
                                t.column("comp").to_pylist()))
        self.comp = comp
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df[self.id_col]
        return pd.DataFrame({
            "doc_id": ids,
            "cluster_id": ids.map(self.comp).fillna(ids)
            .astype(ids.dtype)})


# Task-tier wrappers: setup once per reused task worker instead of an
# actor pool per stage (see stages/memo — measured ~1-1.5 s of pool
# spin-up each at 32 cpus, pure fixed cost around these sub-second
# scans; every memoized state is broadcast-class by contract).
from sigraph_ray.stages.memo import memo_stage as _memo_stage


def _signatures_batch(df: pd.DataFrame, **kw) -> pa.Table:
    return _memo_stage(MinHashSignatures, kw)(df)


def _ptexts_batch(df: pd.DataFrame, **kw) -> pa.Table:
    return _memo_stage(_ParticipantTexts, kw)(df)


def _ref_verify_batch(df: pd.DataFrame, **kw) -> pd.DataFrame:
    return _memo_stage(_RefVerifyJaccard, kw)(df)


def _ref_label_batch(df: pd.DataFrame, **kw) -> pd.DataFrame:
    return _memo_stage(_RefLabelAssign, kw)(df)


def _identity_clusters(ds, id_col: str):
    return ds.map_batches(
        lambda df: pd.DataFrame({"doc_id": df[id_col],
                                 "cluster_id": df[id_col]}),
        batch_format="pandas")


def _star_pairs_from_lists_factory(idt: pa.DataType):
    """Per-bucket sorted member lists → (min, other) star pairs, all
    vectorized (a bucket of n docs yields n-1 pairs, which connected
    components collapses to one cluster)."""
    schema = pa.schema([("u", idt), ("v", idt)])

    def f(df: pd.DataFrame) -> pa.Table:
        vals = df["values"] if len(df) else pd.Series([], dtype=object)
        sub = vals[vals.map(len) > 1]
        if not len(sub):
            return schema.empty_table()
        ex = pd.DataFrame({"u": sub.str[0], "v": sub.str[1:]}).explode("v")
        return pa.Table.from_pandas(ex, preserve_index=False).cast(schema)
    return f


def minhash_lsh_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.8, k: int = 3,
                      concurrency: int = 4, num_partitions: int = 16,
                      max_bucket: int | None = 512,
                      broadcast_pairs: int = 1_000_000):
    """Near-duplicate clusters via shingle→minhash→band→bucket-groupby
    (the brief's scale path). Returns a Dataset (doc_id, cluster_id)
    where cluster_id = min doc_id of the near-dup component; docs
    without near-dups map to themselves.

    Every step is dataflow — nothing corpus-sized touches the driver:

    1. signatures (actor pool) → band rows;
    2. per-bucket sorted member lists via ONE ``sorted_collect`` range
       sort, exploded to (bucket-min, other) star pairs vectorized
       (no per-bucket Python, no corpus×bands join);
    3. candidate-pair texts co-located with the pairs. Two tiers,
       picked by the (known, materialized) pair count — the same
       small/large split ``connected_components`` uses:
       ≤ ``broadcast_pairs``: ONE corpus scan gathers the ≤ 2·pairs
       participating texts (pair ids broadcast as block refs), and
       verify actors build an id→text dict from the gathered blocks —
       zero hash joins ("broadcast small sides with ray.put + lookup
       inside map_batches instead of a shuffle join");
       above it: two distributed hash joins attach texts onto the pair
       rows — the path for corpora whose near-dup mass is itself huge;
    4. Jaccard verification in an actor pool over the pair rows;
    5. components via ``connected_components`` (min-id labels; small
       pair sets take its bounded worker-task fast path), assignment
       via a broadcast label map (small tier) or one left join.

    Only the tiny candidate/verified pair tables are materialized (to
    guard the empty cases and to pin the connected-components input).

    ``max_bucket`` (standard LSH bucket-width cap): buckets that
    collect more than this many members are skipped entirely — a
    degenerate corpus (many byte-identical documents) concentrates one
    band key, and an unbounded bucket would both blow the
    one-bucket-fits-a-block assumption of ``sorted_collect`` and add
    no information (identical texts are exact-dedup's job, and a
    genuinely hot near-dup cluster still pairs up through its other,
    below-cap band keys). The skipped-bucket count is logged. ``None``
    disables the cap (and the extra counting pass).
    """
    from sigraph_ray.stages.joins import column_type, safe_join

    idt = column_type(ds, id_col)
    txt = column_type(ds, text_col)

    from sigraph_ray.stages.collect import sorted_collect

    # bucket member lists via ONE range sort (sorted_collect) — no
    # corpus×bands hash join, no per-bucket Python. Bucket key is a
    # single composite string; members arrive doc_id-sorted so the
    # list head is the star anchor. (Assumption, documented per the
    # brief: one bucket's members fit a worker block — a pathological
    # all-identical corpus concentrates one bucket.)
    sigs = ds.map_batches(
        _signatures_batch, batch_format="pandas",
        fn_kwargs={"text_col": text_col, "id_col": id_col, "k": k})

    def bucket_key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bk": df["band"].astype(str) + "_" + df["band_hash"].astype(str),
            "doc_id": df["doc_id"]})

    from sigraph_ray.stages.blocks import right_size

    # the band-row stream inherits the corpus read's block count; the
    # range sort's task grid follows it, so coalesce to byte-
    # proportional blocks first (the sort materializes its input
    # anyway — this adds no extra residency class, just fewer blocks)
    keyed = right_size(
        sigs.map_batches(bucket_key, batch_format="pandas").materialize())
    # the cap rides the collect itself (zero extra shuffles): per-block
    # lists are truncated at cap+1 inside sorted_collect, so a
    # degenerate key can never blow a block or the boundary stitch, and
    # any returned list LONGER than the cap is the overflow sentinel —
    # dropped below (with a driver-side count) before pairing.
    buckets = sorted_collect(
        keyed, key="bk", order_col="doc_id", value="doc_id",
        max_members=None if max_bucket is None else int(max_bucket) + 1)
    if max_bucket is not None:
        cap = int(max_bucket)

        def count_over(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"n": [int((df["values"].str.len() > cap).sum())]})

        # cheap: re-runs only the post-materialize filter chain inside
        # sorted_collect, not the range sort
        n_over = int(buckets.map_batches(
            count_over, batch_format="pandas").sum("n") or 0)
        if n_over:
            logger.warning(
                "minhash LSH: skipping %d oversized buckets "
                "(> %d members each) — bucket-width cap", n_over, cap)
            buckets = buckets.map_batches(
                lambda df: df[df["values"].str.len() <= cap],
                batch_format="pandas")
    # candidate pairs stay UN-deduplicated: a pair found by several
    # bands repeats, but the verify actors cache shingles per doc and
    # connected_components' seed groupby dedups edges anyway — cheaper
    # than a dedicated distinct shuffle here
    pairs = buckets.map_batches(_star_pairs_from_lists_factory(idt),
                                batch_format="pandas").materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return _identity_clusters(ds, id_col)

    pair_schema = pa.schema([("u", idt), ("v", idt)])
    docs_schema = pa.schema([("side_id", idt), ("side_text", txt)])
    small = n_pairs <= broadcast_pairs
    if small:
        # broadcast tier (the normal LSH outcome: candidates ≪ corpus).
        # Texts for the ≤ 2·pairs participating docs are gathered by ONE
        # distributed corpus scan (pair ids shipped as block refs) and
        # pinned in the object store; verify runs over the PAIR rows
        # with per-actor ref-built dicts. Zero hash joins — each Ray
        # hash join costs a full aggregator-pool spin-up, which for
        # kilobyte pair tables is pure fixed cost (measured ~15-20 s
        # per join at 32 cpus vs <2 s for the scan+dict path).
        pair_refs = list(pairs.to_arrow_refs())
        ptexts = ds.map_batches(
            _ptexts_batch, batch_format="pandas",
            fn_kwargs={"pair_refs": pair_refs,
                       "id_col": id_col, "text_col": text_col}).materialize()
        verified = pairs.map_batches(
            _ref_verify_batch, batch_format="pandas",
            fn_kwargs={"text_refs": list(ptexts.to_arrow_refs()),
                       "threshold": threshold, "k": k}).materialize()
    else:
        docs = ds.map_batches(
            lambda df: df[[id_col, text_col]].rename(
                columns={id_col: "side_id", text_col: "side_text"}),
            batch_format="pandas")
        with_u = (safe_join(pairs, docs, "inner", num_partitions, ("u",),
                            right_on=("side_id",),
                            left_schema=pair_schema,
                            right_schema=docs_schema)
                  .map_batches(
                      lambda df: df[["u", "v", "side_text"]].rename(
                          columns={"side_text": "text_u"}),
                      batch_format="pandas")
                  .materialize())  # pair-sized; keeps one join in flight
        withu_schema = pair_schema.append(pa.field("text_u", txt))
        with_uv = (safe_join(with_u, docs, "inner", num_partitions, ("v",),
                             right_on=("side_id",),
                             left_schema=withu_schema,
                             right_schema=docs_schema)
                   .map_batches(
                       lambda df: df[["u", "v", "text_u", "side_text"]]
                       .rename(columns={"side_text": "text_v"}),
                       batch_format="pandas"))
        # num_cpus=0.5: this pool runs CONCURRENTLY with the with_uv
        # join, whose aggregator actors already reserve half the
        # session CPUs (hash_shuffle.py: CPU/2 budget); a full-CPU pool
        # here would leave zero slots for the upstream map tasks and
        # deadlock the pipeline.
        verified = with_uv.map_batches(
            VerifyJaccard, batch_format="pandas",
            fn_constructor_kwargs={"threshold": threshold, "k": k},
            concurrency=2, num_cpus=0.5).materialize()
    if verified.count() == 0:
        return _identity_clusters(ds, id_col)

    labels = connected_components(verified, node_type=idt).materialize()
    if small:
        # label table ≤ participating nodes — broadcast it back over
        # the corpus instead of a corpus-wide left-outer hash join
        return ds.map_batches(
            _ref_label_batch, batch_format="pandas",
            fn_kwargs={"label_refs": list(labels.to_arrow_refs()),
                       "id_col": id_col})
    ids = ds.map_batches(lambda df: pd.DataFrame({"doc_id": df[id_col]}),
                         batch_format="pandas")
    out = safe_join(ids, labels, "left_outer", num_partitions, ("doc_id",),
                    right_on=("node",),
                    left_schema=pa.schema([("doc_id", idt)]),
                    right_schema=pa.schema([("node", idt), ("comp", idt)]))

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = t.column("doc_id")
        return pa.table({"doc_id": doc,
                         "cluster_id": pc.coalesce(t.column("comp"), doc)})

    return out.map_batches(assign, batch_format="pyarrow")


# --- SimHash near-dedup ----------------------------------------------------


class SimHashStage:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sh = [H.simhash64(t.split()) for t in df[self.text_col].fillna("")]
        out = pd.DataFrame({"doc_id": df[self.id_col],
                            "simhash": np.array(sh, dtype=np.uint64)
                            .astype(np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)


_SEP = "\x1f"


def simhash_candidates(ds, *, max_hamming: int = 3,
                       num_partitions: int = 16, **kw):
    """SimHash near-dup candidate pairs: 4-segment banding (two 16-bit
    segments must match for hamming ≤ 3 by pigeonhole over 4 segments —
    we emit per-segment buckets and verify hamming exactly).

    Per-bucket anchors come from an encoded ``Min`` aggregate (the
    zero-padded min doc id carries its own simhash behind a separator),
    members re-attach with a hash join and hamming is one vectorized
    SWAR pass — no per-bucket or per-pair Python groups anywhere."""
    sigs = ds.map_batches(SimHashStage, batch_format="pandas",
                          fn_constructor_kwargs=kw, concurrency=2)

    def explode(df: pd.DataFrame) -> pa.Table:
        h = df["simhash"].to_numpy().astype(np.uint64)
        n = len(df)
        doc = np.tile(df["doc_id"].to_numpy(), 4)
        seg = np.repeat(np.arange(4, dtype=np.int64), n)
        seg_val = np.concatenate(
            [((h >> np.uint64(16 * s)) & np.uint64(0xFFFF)).astype(np.int64)
             for s in range(4)])
        sim = np.tile(df["simhash"].to_numpy(), 4)
        mv = (pd.Series(doc).astype(str).str.zfill(20)
              + _SEP + pd.Series(np.tile(h, 4)).astype(str))
        return pa.Table.from_pandas(
            pd.DataFrame({"doc_id": doc, "seg": seg, "seg_val": seg_val,
                          "simhash": sim, "mv": mv}),
            preserve_index=False)

    from sigraph_ray.stages.collect import sorted_groupby_agg

    ex = sigs.map_batches(explode, batch_format="pandas").materialize()
    # anchors input is 4 rows per DOCUMENT (row-heavy): range-sort +
    # blockwise stitch min, not Ray's per-row aggregate reduce
    anchors = sorted_groupby_agg(
        ex.map_batches(lambda t: t.select(["seg", "seg_val", "mv"]),
                       batch_format="pyarrow"),
        key=["seg", "seg_val"], aggs={"mv": ("mv", "min")})
    members = ex.map_batches(
        lambda t: t.select(["doc_id", "seg", "seg_val", "simhash"]),
        batch_format="pyarrow")
    joined = members.join(anchors, "inner", num_partitions,
                          on=("seg", "seg_val"))

    def hpairs(df: pd.DataFrame) -> pa.Table:
        u = df["mv"].str.slice(0, 20).astype("int64").to_numpy()
        uh = df["mv"].str.slice(21).astype("uint64").to_numpy()
        v = df["doc_id"].to_numpy()
        keep = v != u
        hd = H.hamming64(df["simhash"].to_numpy()[keep].astype(np.uint64),
                         uh[keep])
        out = pd.DataFrame({"u": u[keep], "v": v[keep], "hamming": hd})
        return pa.Table.from_pandas(out[out["hamming"] <= max_hamming],
                                    preserve_index=False)

    pairs = joined.map_batches(hpairs, batch_format="pandas")
    # pair-heavy dedup (a pair can match in several segments): same
    # stitch min instead of the aggregate reduce
    return sorted_groupby_agg(pairs, key=["u", "v"],
                              aggs={"hamming": ("hamming", "min")})


# --- exact n-gram Jaccard near-dup pairs -----------------------------------

def _ngram_set(text: str, n: int) -> list[str]:
    """Distinct word n-grams, lexicographically sorted. Token/gram
    semantics mirror the SQL oracle exactly: ``lower()`` + split on
    single spaces (empties kept), grams joined with one space, docs
    shorter than ``n`` tokens yield none."""
    toks = (text or "").lower().split(" ")
    if len(toks) < n:
        return []
    return sorted({" ".join(toks[i:i + n])
                   for i in range(len(toks) - n + 1)})


def _prefix_rows_factory(id_col: str, text_col: str, n: int,
                         threshold: float):
    import math

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        grams: list[str] = []
        for i, txt in zip(df[id_col], df[text_col]):
            g = _ngram_set(txt, n)
            if not g:
                continue
            m = len(g)
            p = m - math.ceil(threshold * m) + 1
            ids.extend([i] * p)
            grams.extend(g[:p])
        return pd.DataFrame({"gram": grams, "doc_id": ids})
    return f


class _RefVerifyNgramJaccard:
    """Exact n-gram Jaccard verify over candidate pair rows; texts from
    block refs (broadcast tier, cf. :class:`_RefVerifyJaccard`). Gram
    sets are the literal strings (no hashing), so the accepted pair set
    is bit-identical to the SQL oracle's double-precision comparison."""

    def __init__(self, text_refs: list, threshold: float, n: int):
        import ray

        texts: dict = {}
        for t in ray.get(list(text_refs)):
            if t.num_rows:
                texts.update(zip(t.column("side_id").to_pylist(),
                                 t.column("side_text").to_pylist()))
        self.texts = texts
        self.threshold = threshold
        self.n = n
        self._cache: dict = {}

    def _g(self, i):
        if i not in self._cache:
            if len(self._cache) > 50_000:
                self._cache.clear()
            self._cache[i] = set(_ngram_set(self.texts.get(i), self.n))
        return self._cache[i]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        keep = []
        for u, v in zip(df["u"], df["v"]):
            a, b = self._g(u), self._g(v)
            inter = len(a & b)
            denom = len(a) + len(b) - inter
            keep.append(bool(denom) and inter / denom >= self.threshold)
        return df.loc[pd.Series(keep, index=df.index), ["u", "v"]]


def ngram_jaccard_pairs(ds, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.7, concurrency: int = 4):
    """EXACT word-n-gram Jaccard near-dup pairs (u < v) — the
    deterministic sibling of :func:`minhash_lsh_dedup` (which is
    probabilistic and can miss pairs). Exactness comes from PPJoin-style
    prefix filtering (Xiao et al., WWW'08): under ANY global total
    order on grams (lexicographic here — no frequency pass needed),
    two docs with J ≥ t MUST share a gram within their first
    ``|d| - ceil(t·|d|) + 1`` grams, so emitting only those prefix
    grams into the bucket groupby finds every qualifying pair while
    shrinking the inverted index by ~t/(1+t).

    Stages: prefix rows → ``sorted_collect`` buckets → within-bucket
    all-pairs (u < v; duplicates across buckets allowed) → broadcast-
    tier exact verify → ``sorted_distinct``. Partitioning assumption
    (documented): one prefix-gram's posting list fits a worker block —
    a corpus where a single gram leads the prefix of unboundedly many
    documents needs the frequency-ordered prefix refinement.
    """
    from sigraph_ray.stages.collect import sorted_collect, sorted_distinct
    from sigraph_ray.stages.joins import column_type

    idt = column_type(ds, id_col)
    rows = ds.map_batches(
        _prefix_rows_factory(id_col, text_col, n, threshold),
        batch_format="pandas")
    buckets = sorted_collect(rows, key="gram", order_col="doc_id",
                             value="doc_id", dedup=True)

    schema = pa.schema([("u", idt), ("v", idt)])

    def allpairs(df: pd.DataFrame) -> pa.Table:
        us, vs = [], []
        for vals in df["values"]:
            if len(vals) > 1:
                a = np.asarray(vals)
                iu, iv = np.triu_indices(len(a), 1)
                us.append(a[iu])
                vs.append(a[iv])
        if not us:
            return schema.empty_table()
        return pa.table({"u": np.concatenate(us),
                         "v": np.concatenate(vs)}).cast(schema)

    pairs = buckets.map_batches(allpairs,
                                batch_format="pandas").materialize()
    if pairs.count() == 0:
        return pairs
    ptexts = ds.map_batches(
        _ParticipantTexts, batch_format="pandas",
        fn_constructor_kwargs={"pair_refs": list(pairs.to_arrow_refs()),
                               "id_col": id_col, "text_col": text_col},
        concurrency=concurrency).materialize()
    verified = pairs.map_batches(
        _RefVerifyNgramJaccard, batch_format="pandas",
        fn_constructor_kwargs={"text_refs": list(ptexts.to_arrow_refs()),
                               "threshold": threshold, "n": n},
        concurrency=2)
    return sorted_distinct(verified, ["u", "v"])


def dup_passages(ds, *, n: int = 6, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Exact duplicate-PASSAGE detection — per-document counts of
    n-token windows that also occur in at least one OTHER document
    (the substring-level dedup signal of "Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022, applied at window
    granularity; doc-level exact/near dedup misses these). The
    reference has no corpus surface — beyond-reference per the brief.

    Dataflow (three passes, one wide op):
      1. per-batch vectorized window construction (shared ``\\S+``
         tokenizer, stages/decontam._doc_grams) + per-doc distinct —
         exact because one document is one row in one batch;
      2. per-window distinct-doc counts on the sorted stitch
         (stages/collect.sorted_groupby_agg) — windows seen in ≥2 docs
         form the duplicate set;
      3. the duplicate set is ``ray.put`` broadcast and every batch
         re-derives its windows and probes membership (C-hash isin).

    Scale bound (documented): the DUPLICATE window set must fit the
    object store — it is bounded by the volume of *duplicated* content,
    not the corpus (and windows could be hashed to 8 bytes as in
    stages/decontam ``member="hash"``); past that, replace the
    broadcast probe with a semi-join of the window stream against the
    duplicate set (stages/joins.safe_join) — step 2 is unchanged.
    String windows are kept here so the operator stays exactly
    SQL-checkable.

    Output: ``(doc_id, n_windows, n_dup_windows, dup_fraction)`` over
    documents with ≥ n tokens, counting DISTINCT windows per doc.
    """
    import ray

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.decontam import _doc_grams

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "gram": pd.Series(dtype="object")})
        doc, gram, _ = _doc_grams(df, n, text_col, id_col)
        out = pd.DataFrame({id_col: doc.to_numpy(),
                            "gram": gram.to_numpy()})
        return out.drop_duplicates()  # per-doc distinct (doc-local)

    pair_ds = ds.map_batches(pairs, batch_format="pandas")
    counts = sorted_groupby_agg(pair_ds, key="gram",
                                aggs={"n_docs": (id_col, "count")})
    dup = counts.filter(expr="n_docs >= 2")
    dup_grams = np.unique(np.concatenate(
        [b["gram"].to_numpy() for b in
         dup.iter_batches(batch_format="pandas")] or
        [np.empty(0, dtype=object)]))
    dup_ref = ray.put(pd.Index(dup_grams))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        p = pairs(df)
        if not len(p):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "n_windows": pd.Series(dtype="int64"),
                                 "n_dup_windows": pd.Series(dtype="int64"),
                                 "dup_fraction": pd.Series(dtype="float64")})
        idx = ray.get(dup_ref)
        hit = p["gram"].isin(idx)
        g = (p.assign(h=hit.to_numpy())
             .groupby(id_col, sort=False)
             .agg(n_windows=("gram", "size"), n_dup_windows=("h", "sum"))
             .reset_index())
        g["n_dup_windows"] = g["n_dup_windows"].astype("int64")
        g["dup_fraction"] = g["n_dup_windows"] / g["n_windows"]
        return g

    return ds.map_batches(probe, batch_format="pandas")


def remove_dup_passages(ds, *, n: int = 6, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Duplicate-passage REMOVAL — the rewrite tier over
    :func:`dup_passages`' detection signal ("Deduplicating Training
    Data Makes Language Models Better", Lee et al. 2022 §4.2 actually
    DELETES the duplicated spans; detection alone leaves the tokens in
    the training mix). The reference has no corpus surface —
    beyond-reference per the build brief.

    Removal rule (deterministic, order-free): an n-token window whose
    text occurs in ≥2 distinct documents is a duplicate; its minimum
    ``id_col`` document is the keeper. In every NON-keeper document,
    all token positions covered by any occurrence of a duplicate
    window are deleted; the keeper keeps its copy. Interval cover is
    computed with one +1/−1 difference array per batch (vectorized
    ``np.add.at`` + cumsum) — overlapping windows never double-count.

    Output per document with ≥1 token: ``(doc_id, n_tokens,
    n_removed, clean_text)`` where ``clean_text`` is the surviving
    tokens joined by single spaces (the rewrite is whitespace-
    normalizing, as any token-level rewrite must be).

    Dataflow / scale bound: identical to :func:`dup_passages` — one
    (doc, gram) distinct + grouped (count, min) stitch builds the
    duplicate→keeper table, which is ``ray.put`` broadcast (bounded
    by the volume of *duplicated* content, not the corpus); every
    batch then re-derives occurrences and rewrites locally,
    shuffle-free. Past the broadcast bound, the same semi-join
    fallback documented on :func:`dup_passages` applies.
    """
    import ray

    from sigraph_ray.stages.collect import sorted_groupby_agg
    from sigraph_ray.stages.decontam import _doc_grams

    def occurrences(df: pd.DataFrame):
        """(row-aligned token explode, all window occurrences)."""
        toks = df[text_col].str.findall(r"\S+")
        n_tokens = toks.str.len().to_numpy(dtype="int64")
        s = toks.explode().dropna()
        gram = s
        for i in range(1, n):
            gram = gram + " " + s.groupby(level=0).shift(-i)
        start = gram.groupby(level=0).cumcount()
        keep = gram.notna()
        occ = pd.DataFrame({
            id_col: df[id_col].reindex(gram.index)[keep].to_numpy(),
            "row": gram.index[keep],
            "start": start[keep].to_numpy(dtype="int64"),
            "gram": gram[keep].to_numpy()})
        return toks, n_tokens, occ

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "gram": pd.Series(dtype="object")})
        doc, gram, _ = _doc_grams(df, n, text_col, id_col)
        return pd.DataFrame({id_col: doc.to_numpy(),
                             "gram": gram.to_numpy()}).drop_duplicates()

    counts = sorted_groupby_agg(
        ds.map_batches(pairs, batch_format="pandas"), key="gram",
        aggs={"n_docs": (id_col, "count"), "keeper": (id_col, "min")})
    dup = counts.filter(expr="n_docs >= 2")
    frames = [b[["gram", "keeper"]] for b in
              dup.iter_batches(batch_format="pandas")]
    dup_map = (pd.concat(frames).set_index("gram")["keeper"]
               if frames else
               pd.Series(dtype="int64", index=pd.Index([], dtype=object)))
    dup_ref = ray.put(dup_map)

    empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                          "n_tokens": pd.Series(dtype="int64"),
                          "n_removed": pd.Series(dtype="int64"),
                          "clean_text": pd.Series(dtype="object")})

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty.copy()
        df = df.reset_index(drop=True)
        toks, n_tokens, occ = occurrences(df)
        total = int(n_tokens.sum())
        if total == 0:
            return empty.copy()
        offsets = np.concatenate(([0], np.cumsum(n_tokens)))
        delta = np.zeros(total + 1, dtype=np.int64)
        if len(occ):
            keeper = occ["gram"].map(ray.get(dup_ref))
            hit = keeper.notna() & (keeper != occ[id_col])
            if hit.any():
                g0 = (offsets[occ.loc[hit, "row"].to_numpy()]
                      + occ.loc[hit, "start"].to_numpy())
                np.add.at(delta, g0, 1)
                np.add.at(delta, g0 + n, -1)
        removed = np.cumsum(delta[:-1]) > 0
        flat = toks.explode().dropna()
        kept = flat[~removed]
        joined = kept.groupby(level=0).agg(" ".join)
        # per-row removed counts via prefix sums (safe for zero-token
        # rows, which np.add.reduceat's offset pairs are not)
        csum = np.concatenate(([0], np.cumsum(removed.astype(np.int64))))
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": n_tokens,
            "n_removed": csum[offsets[1:]] - csum[offsets[:-1]]})
        out["clean_text"] = (joined.reindex(out.index).fillna("")
                             .to_numpy(dtype=object))
        return out[n_tokens > 0].reset_index(drop=True)

    return ds.map_batches(rewrite, batch_format="pandas")


# --- blocked edit-distance (string-similarity) join -------------------------


def _levenshtein(a: str, b: str) -> int:
    """Exact edit distance, two-row DP with the inner column loop
    vectorized: the sequential cur[j-1]+1 insertion term is folded
    into one ``np.minimum.accumulate`` via f(j) = cur[j] − j, whose
    recurrence f(j) = min(m[j] − j, f(j−1)) is a running min. O(len(a))
    Python iterations of O(len(b)) numpy ops instead of O(len(a)·
    len(b)) Python. Property-tested against the textbook DP."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    bb = np.array(list(b))
    prev = np.arange(lb + 1, dtype=np.int64)
    idx = np.arange(1, lb + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        sub = prev[:-1] + (bb != ca)
        m = np.minimum(prev[1:] + 1, sub)
        f = np.minimum.accumulate(np.concatenate(([i], m - idx)))
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = f[1:] + idx
        prev = cur
    return int(prev[-1])


def blocked_levenshtein_pairs(ds, *, id_col: str, text_col: str,
                              block_cols: list[str], max_dist: int):
    """Blocked string-similarity join: all pairs within the same
    blocking bucket (equal ``block_cols``) at edit distance ≤
    ``max_dist`` — the classic entity-resolution candidate step
    (blocking makes the O(n²) comparison local; the length-difference
    prune skips pairs that cannot qualify). Returns
    ``(id_a, id_b, dist)`` with ``id_a < id_b``.

    Scale shape: ONE groupby shuffle on the blocking key; per-bucket
    work is O(B²) pair DPs with B bounded by the blocking design
    (buckets here are catalog cells, not row-scale groups — the
    blocking-key choice is the user's scale contract, same as LSH
    band width)."""

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "dist": pd.Series(dtype="int64")})
        n = len(df)
        if n < 2:
            return empty
        df = df.sort_values(id_col, kind="stable")
        ids = df[id_col].to_numpy()
        texts = df[text_col].tolist()
        lens = np.asarray([len(t) for t in texts], dtype=np.int64)
        out_a, out_b, out_d = [], [], []
        for i in range(n - 1):
            # length-difference prune: |len(a)−len(b)| > d ⇒ dist > d
            cand = np.nonzero(
                np.abs(lens[i + 1:] - lens[i]) <= max_dist)[0]
            for off in cand:
                j = i + 1 + int(off)
                d = _levenshtein(texts[i], texts[j])
                if d <= max_dist:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_d.append(d)
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.asarray(out_a, np.int64),
                             "id_b": np.asarray(out_b, np.int64),
                             "dist": np.asarray(out_d, np.int64)})

    return ds.groupby(block_cols).map_groups(per_group,
                                             batch_format="pandas")


# --- sparse TF-IDF cosine similarity join ------------------------------------

_TFIDF_PACK = 1 << 20  # packed posting = doc_id * PACK + min(tf, PACK-1)


def tfidf_cosine_pairs(ds, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       threshold: float = 0.3, df_cap: int = 200):
    """EXACT sparse cosine similarity join over TF-IDF weighted
    bag-of-words vectors: all document pairs (id_a < id_b) with
    cosine ≥ ``threshold`` after dropping terms with document
    frequency > ``df_cap`` (frequency-based stop-word removal — the
    standard trick that simultaneously bounds every posting list, so
    the candidate step is local to a term bucket). The sparse sibling
    of the dense ``embed_cosine_pairs``; weights tf·ln(N/df).

    Dataflow: per-batch vectorized (doc, term, tf) rows (a doc is one
    row in one batch, so tf is exact) → ONE ``sorted_collect`` into
    per-term posting lists with the ``max_members = df_cap + 1``
    overflow sentinel (an over-cap term is skipped EXACTLY — the
    sentinel list is longer than the cap, never truncated into wrong
    weights) → per-bucket outer-product dot contributions and per-doc
    norm² contributions → two grouped-sum stitches → two bounded
    sort-merge joins to attach norms → threshold filter. Driver state
    stays O(#blocks); nothing corpus-sized is collected.

    Partitioning assumption (documented per the brief): one term's
    capped posting list (≤ df_cap entries) fits a worker block —
    guaranteed by the cap itself."""
    import ray.data as rd

    from sigraph_ray.stages.collect import (sorted_collect,
                                            sorted_groupby_agg)
    from sigraph_ray.stages.joins import sorted_merge_join

    n_docs = ds.count()

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"term": pd.Series(dtype="object"),
                              id_col: pd.Series(dtype="int64"),
                              "packed": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        toks = df[text_col].str.lower().str.findall(r"[a-z0-9]+")
        e = (df[[id_col]].assign(term=toks).explode("term")
             .dropna(subset=["term"]))
        if len(e) == 0:
            return empty
        g = (e.groupby([id_col, "term"], sort=False).size()
             .rename("tf").reset_index())
        packed = (g[id_col].to_numpy(np.int64) * _TFIDF_PACK
                  + np.minimum(g["tf"].to_numpy(np.int64),
                               _TFIDF_PACK - 1))
        return pd.DataFrame({"term": g["term"],
                             id_col: g[id_col].astype("int64"),
                             "packed": packed})

    rows = ds.map_batches(tf_rows, batch_format="pandas")
    buckets = sorted_collect(rows, key="term", order_col=id_col,
                             value="packed",
                             max_members=df_cap + 1).materialize()

    def unpack(vals):
        arr = np.asarray(vals, dtype=np.int64)
        ids = arr // _TFIDF_PACK
        w = ((arr % _TFIDF_PACK).astype(np.float64)
             * np.log(n_docs / len(arr)))
        return ids, w

    def pair_contribs(df: pd.DataFrame) -> pd.DataFrame:
        a_, b_, d_ = [], [], []
        for vals in df["values"]:
            if not (1 < len(vals) <= df_cap):
                continue  # singleton or df-cap overflow sentinel
            ids, w = unpack(vals)
            iu, iv = np.triu_indices(len(ids), 1)
            a_.append(ids[iu])
            b_.append(ids[iv])
            d_.append(w[iu] * w[iv])
        if not a_:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "dot_p": pd.Series(dtype="float64")})
        return pd.DataFrame({"id_a": np.concatenate(a_),
                             "id_b": np.concatenate(b_),
                             "dot_p": np.concatenate(d_)})

    def norm_contribs(df: pd.DataFrame) -> pd.DataFrame:
        i_, n_ = [], []
        for vals in df["values"]:
            if len(vals) > df_cap:
                continue
            ids, w = unpack(vals)
            i_.append(ids)
            n_.append(w * w)
        if not i_:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "nsq_p": pd.Series(dtype="float64")})
        return pd.DataFrame({id_col: np.concatenate(i_),
                             "nsq_p": np.concatenate(n_)})

    pairs = sorted_groupby_agg(
        buckets.map_batches(pair_contribs, batch_format="pandas"),
        key=["id_a", "id_b"], aggs={"dot": ("dot_p", "sum")})
    norms = sorted_groupby_agg(
        buckets.map_batches(norm_contribs, batch_format="pandas"),
        key=[id_col], aggs={"nsq": ("nsq_p", "sum")})

    empty_out = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
    if pairs.count() == 0:
        return rd.from_pandas(empty_out)

    def rename_norm(col_out):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({col_out: df[id_col].astype("int64"),
                                 f"nsq_{col_out[-1]}": df["nsq"]})
        return f

    na = norms.map_batches(rename_norm("id_a"), batch_format="pandas")
    nb = norms.map_batches(rename_norm("id_b"), batch_format="pandas")
    j1 = sorted_merge_join(pairs, na, on="id_a",
                           left_cols=["id_b", "dot"],
                           right_cols=["nsq_a"])
    j2 = sorted_merge_join(j1, nb, on="id_b",
                           left_cols=["id_a", "dot", "nsq_a"],
                           right_cols=["nsq_b"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty_out
        cos = (df["dot"].to_numpy()
               / (np.sqrt(df["nsq_a"].to_numpy())
                  * np.sqrt(df["nsq_b"].to_numpy())))
        out = pd.DataFrame({"id_a": df["id_a"].astype("int64"),
                            "id_b": df["id_b"].astype("int64"),
                            "cos": cos})
        return out[out["cos"] >= threshold]

    return j2.map_batches(finish, batch_format="pandas")


def _jaro_winkler(s1: str, s2: str) -> float:
    """Classic Jaro-Winkler (Winkler '90): match window
    ``max(l)//2 - 1``, transposition count FLOOR-halved (DuckDB's
    convention — ``t/2.0`` disagrees on odd counts), prefix boost
    p=0.1 capped at 4 applied only when jaro > 0.7 — verified
    value-identical to DuckDB ``jaro_winkler_similarity`` on 4000
    random fuzz pairs plus the standard cases (martha/marhta 0.9611,
    dixon/dicksonx 0.8133, boost-threshold and prefix-cap cases)."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t, j = 0, 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    jaro = (m / l1 + m / l2 + (m - t // 2) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    p = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        p += 1
    return jaro + p * 0.1 * (1.0 - jaro)


def blocked_jaro_winkler_pairs(ds, *, id_col: str, text_col: str,
                               block_cols: list[str],
                               threshold: float):
    """Blocked Jaro-Winkler similarity join — the fuzzy-name
    entity-resolution candidate step (census/record-linkage metric;
    complements :func:`blocked_levenshtein_pairs`, which charges whole
    edits, where JW rewards shared prefixes). All pairs within the
    same blocking bucket with similarity ≥ ``threshold``; returns
    ``(id_a, id_b, jw)`` with ``id_a < id_b``.

    Scale shape: identical to the editdist join — ONE groupby shuffle
    on the blocking key, O(B²) per-bucket comparisons with B bounded
    by the blocking design. Length prune: jaro ≤
    (min/l1 + min/l2 + 1)/3 with m ≤ min(l1, l2), and the Winkler
    boost maps bound b to b + 0.4(1-b) at most, so pairs whose length
    bound falls under ``threshold`` are skipped without scoring."""

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "jw": pd.Series(dtype="float64")})
        n = len(df)
        if n < 2:
            return empty
        df = df.sort_values(id_col, kind="stable")
        ids = df[id_col].to_numpy()
        texts = df[text_col].tolist()
        lens = np.asarray([len(t) for t in texts], dtype=np.float64)
        out_a, out_b, out_s = [], [], []
        for i in range(n - 1):
            li = lens[i]
            lo = np.minimum(lens[i + 1:], li)
            bound = (lo / li + lo / lens[i + 1:] + 1.0) / 3.0
            bound = bound + 0.4 * (1.0 - bound)   # max Winkler boost
            cand = np.nonzero(bound >= threshold)[0]
            for off in cand:
                j = i + 1 + int(off)
                s = _jaro_winkler(texts[i], texts[j])
                if s >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_s.append(s)
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.asarray(out_a, np.int64),
                             "id_b": np.asarray(out_b, np.int64),
                             "jw": np.asarray(out_s, np.float64)})

    return ds.groupby(block_cols).map_groups(per_group,
                                             batch_format="pandas")
