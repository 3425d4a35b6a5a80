"""Deterministic synthetic corpora (FIXTURES.md F1/F2/F4).

Two generators, both **partition-independent**: every row is a pure
function of ``(seed, i)`` via a splitmix64 hash, so generating row i in
any Ray task, in any order, at any parallelism yields identical bytes.

- :func:`page_rows` — Common-Crawl-style pages per BASELINE.json
  input_hint ``(url, warc_ts, html, text, lang)``, with behavioral
  sentences drawn from the reference's verb contract (F4 vocabulary).
  Each page also yields its *intended* triples — the generator is the
  oracle for the P/R ≥ 0.95 gate (triples the extraction pipeline must
  recover after normalization/canonicalization).
- :func:`event_rows` — provenance events mirroring the reference's
  ingest record (src/graph/graph_model.py:14-46), with a hot parent
  artifact (``explorer.exe@PROCESS``) on ≥30% of rows to exercise
  salted canonicalization, malformed provenance rows that must be
  quarantined, and out-of-order timestamps.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

SEED = 42

FAMILIES = ["XenoRAT", "Emotet", "LokiBot", "AgentTesla", "IcedId",
            "QakBot", "RedLine", "Formbook"]
PROCESSES = ["powershell.exe", "rundll32.exe", "cmd.exe", "loader.exe",
             "svchost.exe", "wscript.exe"]
GENERIC = ["The malware", "It", "The implant", "The threat actor"]
LANGS = ["en", "en", "en", "en", "en", "en", "en", "ko", "de", ""]


def _mix(seed: int, i: int, salt: int) -> int:
    """splitmix64 over (seed, i, salt) — the only randomness source."""
    x = (seed * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9 + salt * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return x


def _pick(seq, seed, i, salt):
    return seq[_mix(seed, i, salt) % len(seq)]


def _norm(s: str) -> str:
    """Expected-triple normalization = E1 strip/lower + E2 defang
    (ai_agent.py:394-403) — what the pipeline must produce."""
    return s.strip().lower().replace("[.]", ".")


def page_rows(i: int, seed: int = SEED) -> tuple[dict, list[dict]]:
    """One page row + its intended (normalized) triples."""
    fam = _pick(FAMILIES, seed, i, 1)
    proc = _pick(PROCESSES, seed, i, 2)
    proc2 = _pick(PROCESSES, seed, i, 3)
    k = _mix(seed, i, 4) % 1000
    dom = f"c2-{k}.evil{_mix(seed, i, 5) % 10}.com"
    dom_sf = dom.replace(".", "[.]") if _mix(seed, i, 6) % 2 else dom
    url_dl = f"http://{dom}/drop/payload{k}.exe"
    fpath = f"c:\\users\\admin\\appdata\\stage{k}.dll"
    fpath2 = f"c:\\windows\\temp\\log{k}.txt"
    reg = f"hklm\\software\\microsoft\\windows\\run\\upd{k}"
    lang = _pick(LANGS, seed, i, 7)
    url = f"https://site-{i % 97}.example/p/{i}"
    ts = 1_700_000_000_000_000 + (_mix(seed, i, 8) % 31_536_000) * 1_000_000

    sents: list[str] = []
    triples: list[tuple[str, str, str, str, str]] = []  # subj, st, pred, obj, ot

    def t(subj, st, pred, obj, ot):
        triples.append((_norm(subj), st, pred, _norm(obj), ot))

    if lang == "en":
        # case-variant family surface on some sentences (canonicalization food)
        fam_v = fam.upper() if _mix(seed, i, 9) % 3 == 0 else fam
        sents.append(f"{fam} executes {proc} on the victim host.")
        t(fam, "Process", "launch", proc, "Process")
        sents.append(f"{_pick(GENERIC, seed, i, 10)} beacons to {dom_sf} every 60 seconds.")
        t(fam, "Process", "network_connect", dom, "Network")
        sents.append(f"{fam_v} downloads {url_dl} and then persists via {reg}.")
        t(fam, "Process", "http_request", url_dl, "Network")
        t(fam, "Process", "create", f"payload{k}.exe", "Process")
        t(fam, "Process", "persist", reg, "Registry")
        if _mix(seed, i, 11) % 2:
            sents.append(f"It may possibly connect to backup-{k}.example.org later.")
            # speculation — intentionally NO triple
        if _mix(seed, i, 12) % 2:
            sents.append(f"{fam} reads {fpath} and deletes {fpath2}.")
            t(fam, "Process", "read", fpath, "Process")
            t(fam, "Process", "delete", fpath2, "File")
        else:
            sents.append(f"{fam_v} injects {proc2}; the implant encrypts {fpath2}.")
            t(fam, "Process", "inject", proc2, "Process")
            t(fam, "Process", "encrypt", fpath2, "File")
        sents.append("The campaign was first reported by researchers in spring.")
    else:
        sents.append(f"bericht {k} ohne verhalten seite {i} inhalt neutral.")

    body = " ".join(sents)
    nav = "<nav><a href='/'>Home</a> <a href='/x'>R&amp;D</a></nav>"
    script = "<script>var t = 1 &lt; 2;</script>"
    html = (
        f"<html><head><title>doc {i}</title>{script}"
        f"<style>p {{margin:0}}</style></head><body>{nav}"
        f"<div><h1>Report {i}</h1><p>{body}</p></div>"
        f"<footer>copyright {2020 + i % 5}</footer></body></html>"
    )
    page = {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": body,
        "lang": lang,
    }
    expected = [
        {"doc_url": url, "subj": s, "subj_type": st, "pred": p,
         "obj": o, "obj_type": ot}
        for (s, st, p, o, ot) in triples
    ]
    return page, expected


def pages_batch(ids) -> pa.Table:
    """Batch kernel for ``ray.data.range(n).map_batches`` — ids in,
    pages table out (partition-independent)."""
    rows = [page_rows(int(i))[0] for i in ids]
    df = pd.DataFrame(rows)
    return pa.Table.from_pandas(df, preserve_index=False).set_column(
        1, "warc_ts", pa.compute.cast(pa.array(df["warc_ts"], pa.int64()),
                                      pa.timestamp("us")))


def expected_triples(n: int, seed: int = SEED) -> pd.DataFrame:
    """Driver-side oracle triple set for pages 0..n-1 (deduplicated the
    same way the pipeline dedups: distinct (doc_url, subj, pred, obj))."""
    rows: list[dict] = []
    for i in range(n):
        rows.extend(page_rows(i, seed)[1])
    df = pd.DataFrame(rows, columns=["doc_url", "subj", "subj_type",
                                     "pred", "obj", "obj_type"])
    return df.drop_duplicates(["doc_url", "subj", "pred", "obj"]).reset_index(drop=True)


# --- provenance events (F2) -------------------------------------------------

_ART_SPECS = [
    ("file_{a}.tmp", "FILE", "CREATE", "WRITE_SEND"),
    ("10.0.{b}.{a}", "NETWORK", "CONNECT", "WRITE_SEND"),
    ("hklm\\software\\k{a}", "REGISTRY", "REG_SET", "WRITE_SEND"),
    ("mod_{a}.dll", "MODULE", "LOAD", "READ_RECV"),
    ("cfg_{a}.ini", "FILE", "MODIFY", "READ_RECV"),
    ("child_{a}.exe", "PROCESS", "LAUNCH", "NOT_ACTOR"),
]
_MALFORMED = ["no_at_sign", "x@NOTATYPE@CONNECT@WRITE_SEND",
              "y@FILE@BOGUS@WRITE_SEND", "z@FILE@CREATE@", ""]


def event_rows(i: int, seed: int = SEED) -> dict:
    """One provenance event. ~35% of rows share the hot parent
    ``explorer.exe@PROCESS``; ~2% are malformed (quarantine food);
    some traces have exactly one event (orphan-prune food,
    schema.py:112-125)."""
    user = _mix(seed, i, 20) % 200
    spec = _ART_SPECS[_mix(seed, i, 21) % len(_ART_SPECS)]
    a = _mix(seed, i, 22) % 300
    b = _mix(seed, i, 23) % 64
    name = spec[0].format(a=a, b=b)
    prov = f"{name}@{spec[1]}@{spec[2]}@{spec[3]}"
    if _mix(seed, i, 24) % 50 == 0:  # ~2% malformed
        prov = _MALFORMED[_mix(seed, i, 25) % len(_MALFORMED)]
    hot = _mix(seed, i, 26) % 100 < 35
    pproc = "explorer.exe" if hot else f"proc_{user % 23}.exe"
    parent = f"{pproc}@PROCESS@LAUNCH@NOT_ACTOR"
    r = _mix(seed, i, 34) % 100
    if r < 2:
        parent = "badparent@NOTATYPE@LAUNCH@NOT_ACTOR"  # whole event quarantined
    elif r < 4:
        parent = None  # provenance null but span id present → no parent sequence
    singleton = _mix(seed, i, 27) % 25 == 0
    trace = f"trace_{i}_solo" if singleton else f"trace_{user}_{_mix(seed, i, 28) % 4}"
    return {
        "trace_id": trace,
        "span_id": f"span_{i:09d}",
        "unit_id": f"unit_{user % 3}",
        "system_provenance": prov,
        "timestamp": 1_700_000_000_000_000 + (_mix(seed, i, 29) % 86_400_000) * 1000,
        "weight": 1 + _mix(seed, i, 30) % 9,
        "process_name": None if _mix(seed, i, 31) % 10 == 0 else pproc,
        "related_rule_ids": (
            [f"rule_{_mix(seed, i, 32) % 12}"] if _mix(seed, i, 33) % 5 == 0 else []
        ),
        "parent_span_id": None if singleton else f"pspan_{user:06d}",
        "parent_system_provenance": None if singleton else parent,
    }


def events_batch(ids) -> pa.Table:
    rows = [event_rows(int(i)) for i in ids]
    df = pd.DataFrame(rows)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    idx = tbl.schema.get_field_index("timestamp")
    return tbl.set_column(
        idx, "timestamp",
        pa.compute.cast(pa.array(df["timestamp"], pa.int64()), pa.timestamp("us")))
