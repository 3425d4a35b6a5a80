"""PII-redaction tests. The sf testdata word-soup contains no PII, so
the driver's oracle run proves scan parity on clean text; these tests
plant real PII and prove (a) the redaction semantics by hand-written
expectations and (b) RE2 parity vs the SAME DuckDB oracle SQL on the
planted corpus."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from sigraph_ray.stages.textclean import pii_scrub

PLANTED = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4],
    "text": [
        "contact bob.smith+spam@mail-host.example.org or alice@ex.io now",
        "ssn 123-45-6789 phone 555-867-5309 mixed 123-456-7890",
        "server at 10.0.42.7 and 192.168.1.255, dotted phone 123.456.7890",
        "no pii here, just words and 42 numbers like 3.14",
        "dup alice@ex.io alice@ex.io and ip 8.8.8.8",
    ],
})


def _scrub(df: pd.DataFrame) -> pd.DataFrame:
    out = pii_scrub(rd.from_pandas(df).repartition(3)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_planted_pii_redaction_and_counts(ray_session):
    got = _scrub(PLANTED)
    assert got.loc[0, "text"] == "contact <EMAIL> or <EMAIL> now"
    assert got.loc[0, "n_emails"] == 2
    # SSN claimed before the generic phone pattern sees it
    assert got.loc[1, "text"] == "ssn <ID> phone <PHONE> mixed <PHONE>"
    assert (got.loc[1, ["n_ids", "n_phones"]] == [1, 2]).all()
    # dotted phone consumed by PHONE (runs before IPv4); real IPs by IP
    assert got.loc[2, "text"] == \
        "server at <IP> and <IP>, dotted phone <PHONE>"
    assert (got.loc[2, ["n_ips", "n_phones"]] == [2, 1]).all()
    # short decimals are not IPv4; bare ints are not phones
    assert got.loc[3, "text"] == PLANTED.loc[3, "text"]
    assert (got.loc[3, ["n_emails", "n_ids", "n_phones", "n_ips"]]
            == 0).all()
    assert got.loc[4, "n_emails"] == 2 and got.loc[4, "n_ips"] == 1


def test_planted_pii_matches_duckdb_oracle(ray_session):
    """The exact oracle SQL the driver runs, but over a corpus that
    actually exercises every pattern."""
    from sigraph_ray.pipelines.queries import SQL_PII_SCRUB

    got = _scrub(PLANTED)
    con = duckdb.connect()
    con.register("documents", PLANTED)
    want = con.sql(SQL_PII_SCRUB).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(got[sorted(got.columns)].dtypes),
    )


REP_PLANTED = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4],
    "text": ["a a a b", "x y x y x", "", "solo",
             "the cat sat on the mat the cat sat"],
})


def test_repetition_stats_hand_values(ray_session):
    from sigraph_ray.stages.textstats import repetition_stats

    got = (repetition_stats(rd.from_pandas(REP_PLANTED).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(got["n_tokens"]) == [4, 5, 0, 1, 9]
    # doc0: top 'a'=3/4; 2-grams {a a ×2, a b} → 1 - 2/3
    assert got.loc[0, "top_token_frac"] == 0.75
    assert abs(got.loc[0, "dup_2gram_frac"] - (1 - 2 / 3)) < 1e-12
    # doc1: alternating → every 2-gram is one of 2 distinct among 4
    assert got.loc[1, "dup_2gram_frac"] == 0.5
    # empty and single-token docs are 0/0 by definition
    assert (got.loc[2:3, "dup_2gram_frac"] == 0.0).all()
    assert got.loc[3, "top_token_frac"] == 1.0


def test_repetition_stats_matches_duckdb_on_planted(ray_session):
    from sigraph_ray.pipelines.queries import SQL_REPETITION_STATS
    from sigraph_ray.stages.textstats import repetition_stats

    got = (repetition_stats(rd.from_pandas(REP_PLANTED).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", REP_PLANTED)
    want = con.sql(SQL_REPETITION_STATS).df()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)


def test_decontaminate_planted(ray_session):
    """Planted 4-gram leak: corpus docs that quote the eval doc are
    flagged with the right occurrence counts; clean docs are not."""
    from sigraph_ray.stages.decontam import decontaminate

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 20],   # 0 and 20 are eval (mod 20)
        "text": [
            "the secret answer is fourty two okay",       # eval
            "i think the secret answer is hidden",        # 1 leaked gram
            "totally clean text with no overlap at all",  # clean
            "tiny doc",                                   # <4 tokens
            "another eval doc entirely",                  # eval
        ],
    })
    got = (decontaminate(rd.from_pandas(docs).repartition(2),
                         n=4, eval_mod=20)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # eval docs excluded; <4-token doc present with zero grams
    assert list(got["doc_id"]) == [1, 2, 3]
    assert list(got["n_grams"]) == [4, 5, 0]
    # doc1 contains "the secret answer is" exactly once
    assert list(got["n_contaminated"]) == [1, 0, 0]
    assert list(got["contaminated"]) == [True, False, False]


def test_mixture_sample_rates_and_layout_invariance(ray_session):
    from sigraph_ray.stages.sample import mixture_sample

    df = pd.DataFrame({"doc_id": np.arange(4000),
                       "source": np.where(np.arange(4000) % 2 == 0,
                                          "keep_all", "keep_some")})
    outs = []
    for blocks in (1, 6):
        got = (mixture_sample(rd.from_pandas(df).repartition(blocks),
                              key="doc_id", stratum="source",
                              rates={"keep_all": 1.0}, default_rate=0.25)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    kept = outs[0]
    assert (kept["source"] == "keep_all").sum() == 2000   # rate 1.0 keeps all
    frac = (kept["source"] == "keep_some").sum() / 2000   # ≈ 0.25
    assert 0.2 < frac < 0.3


def test_unigram_logprob_hand_values(ray_session):
    from sigraph_ray.stages.textstats import unigram_logprob

    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["a a b", "b c", ""]})
    got = (unigram_logprob(rd.from_pandas(docs).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # vocab: a=2, b=2, c=1, total=5; empty doc excluded
    assert list(got["doc_id"]) == [0, 1]
    assert list(got["n_tokens"]) == [3, 2]
    assert abs(got.loc[0, "mean_log_freq"] - np.log(0.4)) < 1e-12
    want1 = (np.log(0.4) + np.log(0.2)) / 2
    assert abs(got.loc[1, "mean_log_freq"] - want1) < 1e-12


def test_pack_sequences_invariants(ray_session):
    from sigraph_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(23)
    docs = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [" ".join(["w"] * int(k))
                 for k in rng.integers(0, 70, 40)],
    })
    n_per_doc = docs["text"].str.split().str.len().fillna(0).astype(int)
    outs = []
    for blocks in (1, 5):
        got = (pack_sequences(rd.from_pandas(docs).repartition(blocks),
                              max_tokens=32)
               .to_pandas().sort_values(["doc_id", "seq_id"])
               .reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # layout-invariant
    got = outs[0]
    # every token of every non-empty doc is packed exactly once
    per_doc = got.groupby("doc_id")["n_tokens"].sum()
    want = n_per_doc[n_per_doc > 0]
    assert per_doc.to_dict() == {i: int(v) for i, v in want.items()}
    # every sequence except the last is exactly full
    per_seq = got.groupby("seq_id")["n_tokens"].sum().sort_index()
    assert (per_seq.iloc[:-1] == 32).all()
    assert 0 < per_seq.iloc[-1] <= 32
    # a >max_tokens doc spans consecutive sequences with contiguous
    # offsets
    big = got[got["doc_id"] == int(n_per_doc.idxmax())]
    if len(big) > 1:
        assert (np.diff(big["seq_id"]) == 1).all()
        assert (big["doc_offset"].iloc[1:].to_numpy()
                == big["doc_offset"].iloc[:-1].to_numpy()
                + big["n_tokens"].iloc[:-1].to_numpy()).all()


def test_decontaminate_hash_variant_matches_string(ray_session):
    from sigraph_ray.stages.decontam import decontaminate

    rng = np.random.default_rng(51)
    vocab = [f"w{i}" for i in range(40)]
    docs = pd.DataFrame({
        "doc_id": np.arange(120),
        "text": [" ".join(rng.choice(vocab, size=30)) for _ in range(120)],
    })
    ds = rd.from_pandas(docs).repartition(4)
    a = (decontaminate(ds, n=3, eval_mod=10, member="string")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (decontaminate(ds, n=3, eval_mod=10, member="hash")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["contaminated"].any()   # dense vocab → real overlaps


def test_weighted_sample_proportional_and_invariant(ray_session):
    """ES-key sampling: heavy rows are sampled ~proportionally more,
    and the draw is layout-invariant (pure function of the key)."""
    from sigraph_ray.stages.sample import weighted_sample_k

    n = 4000
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "w": np.where(np.arange(n) % 2 == 0, 10.0, 1.0)})
    outs = []
    for blocks in (1, 6):
        got = weighted_sample_k(rd.from_pandas(df).repartition(blocks),
                                key="doc_id", weight="w", k=400)
        outs.append(got.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    heavy = (outs[0]["w"] == 10.0).mean()
    # 10:1 weights → heavy rows should dominate the sample
    assert heavy > 0.75


def test_url_canonicalization_rules():
    """Each normalization rule fires; already-canonical URLs are
    fixpoints; distinct resources stay distinct."""
    import pandas as pd

    from sigraph_ray.stages.weburl import canonicalize_batch

    cases = {
        "HTTP://WWW.Site3.Example.COM:443/p/9": "http://site3.example.com/p/9",
        "https://site7.example.com/p/1/?utm_source=a&utm_medium=b":
            "https://site7.example.com/p/1",
        "https://a.com:80/x#frag": "https://a.com/x",
        "https://a.com/x": "https://a.com/x",          # fixpoint
        "https://a.com/x?q=real": "https://a.com/x?q=real",  # real query kept
        "https://b.com/x": "https://b.com/x",
    }
    got = canonicalize_batch(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())
    # idempotent
    again = canonicalize_batch(pd.Series(got)).tolist()
    assert again == got


def test_nb_classifier_separable_corpus(ray_session):
    """Two classes with disjoint vocabularies: held-out docs classify
    perfectly; a doc of unseen tokens gets the deterministic
    name-ascending tie-break under equal priors/totals."""
    import numpy as np
    import ray.data as rd

    from sigraph_ray.stages.nbayes import nb_fit_predict

    rows = []
    for i in range(40):
        cls = "cats" if i % 2 == 0 else "dogs"
        word = "meow purr whiskers" if cls == "cats" else "woof bark fetch"
        rows.append({"doc_id": i, "text": f"{word} {word}", "source": cls})
    df = pd.DataFrame(rows)
    out = (nb_fit_predict(rd.from_pandas(df).repartition(3))
           .to_pandas().set_index("doc_id").sort_index())
    held = df[df.doc_id % 5 == 0].set_index("doc_id")
    assert len(out) == len(held)
    assert (out["predicted"] == held["source"]).all()


def test_bpe_train_matches_sequential_reference(ray_session):
    """Distributed word-count + merge loop equals an independent
    sequential BPE on the raw corpus; layout-invariant across block
    counts; deterministic tie-break."""
    import ray.data as rd

    from sigraph_ray.stages.tokenizer import bpe_train

    texts = ["low low low low low lower lower",
             "newest newest newest newest newest newest",
             "widest widest widest"]
    df = pd.DataFrame({"doc_id": range(3), "text": texts})

    # independent reference: per-corpus char-pair counting from scratch
    def ref_merges(texts, n):
        import re
        words = {}
        for t in texts:
            for w in re.findall(r"[a-z0-9]+", t.lower()):
                words[w] = words.get(w, 0) + 1
        seqs = {w: tuple(w) + ("</w>",) for w in words}
        out = []
        for _ in range(n):
            pairs = {}
            for w, sym in seqs.items():
                for i in range(len(sym) - 1):
                    p = (sym[i], sym[i + 1])
                    pairs[p] = pairs.get(p, 0) + words[w]
            if not pairs:
                break
            (l, r), best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            if best < 2:
                break
            out.append((l, r, best))
            for w, sym in seqs.items():
                res, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                        res.append(l + r); i += 2
                    else:
                        res.append(sym[i]); i += 1
                seqs[w] = tuple(res)
        return out

    want = ref_merges(texts, 10)
    got1 = bpe_train(rd.from_pandas(df).repartition(1), n_merges=10)
    got3 = bpe_train(rd.from_pandas(df).repartition(3), n_merges=10)
    for got in (got1, got3):
        assert [tuple(r) for r in
                got[["left", "right", "pair_freq"]].itertuples(index=False)
                ] == want
    # 'newest' dominates: its suffix pairs must be learned early
    assert ("e", "s") in {(l, r) for l, r, _ in want} or \
           ("s", "t") in {(l, r) for l, r, _ in want}
