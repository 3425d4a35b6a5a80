"""Sigma rule compilation (S8/A5): uploaded YAML → vectorized
predicate IR over the flattened syslog ``raw_data`` columns.

Reference flow (src/rule/session.py:24-123): uploaded Sigma YAML is
parsed with pySigma, converted per rule to an OpenSearch Lucene DSL
query, every field key in the query string is prefixed
``raw_data.Metadata.<field>`` (session.py:110-123, regex
``\\b([A-Za-z0-9_]+):``), and the rule's ``logsource.category`` is kept
for the mandatory ``raw_data.EventName`` term
(src/db/db_session.py:256-264). Queries whose bool-clause count reaches
1024 are split: ALL leaf clauses are extracted and re-ORed in chunks of
1024, each chunk queried separately and the results concatenated
(db_session.py:67-124) — note this deliberately reproduces the
reference's flattening of nested boolean structure on split.

This module re-expresses that pipeline without pySigma/OpenSearch
(neither ships in the runtime): a self-contained parser for the Sigma
subset the reference's rules exercise —

- ``logsource.category``;
- ``detection`` selections mapping ``field`` or ``field|modifier`` to a
  scalar or a list (list = OR; ``|all`` flips it to AND);
- modifiers ``contains``, ``startswith``, ``endswith``, ``re``;
  plain values support Sigma ``*``/``?`` wildcards;
- ``condition``: identifiers, ``and`` / ``or`` / ``not``, parentheses,
  ``1 of <pattern>`` / ``all of <pattern>`` (``them`` = ``*``).

String matching is case-insensitive except ``|re`` (Sigma spec
defaults). The field-prefix rewrite is applied at field-resolution
time: field F reads column ``<prefix>.F`` — the same effect as the
reference's prefixing of the rendered query string.

KNOWN SEMANTIC DIVERGENCE from the reference's OpenSearch backend
(deliberate, Sigma-spec-first — rule authors take note):

- ``|re`` here is an UNANCHORED substring search (Sigma spec: "the
  regular expression is matched against the field value, partial
  matches count"), while Lucene ``regexp`` queries are implicitly
  anchored to the FULL value — an uploaded ``|re: foo`` rule can match
  MORE rows here than in the reference. Anchor explicitly
  (``^foo$``) for Lucene-equivalent behavior.
- ``eq``/``contains``/``startswith``/``endswith`` are
  case-insensitive per the Sigma spec, while the reference's
  dynamically-mapped ``keyword`` fields (db_model.py dynamic
  templates) compare case-SENSITIVELY unless the rule author relied
  on an analyzed field.

Null semantics match the reference: a document missing the field (or
holding null) never matches any predicate, including ``|re``.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

MAX_CLAUSES = 1024  # db_session.py:116 split threshold

_MODIFIERS = ("contains", "startswith", "endswith", "re", "all")


def _wildcard_to_regex(value: str) -> str:
    """Sigma ``*`` / ``?`` wildcards → anchored regex (rest escaped)."""
    out = []
    for ch in value:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


@dataclass(frozen=True)
class Leaf:
    """One field predicate — the clause unit counted for splitting."""

    column: str           # prefixed column name
    kind: str             # eq | contains | startswith | endswith | re
    values: tuple         # raw values (case preserved for |re)
    conjunct: bool = False  # |all: AND the values instead of OR

    def mask(self, df: pd.DataFrame) -> np.ndarray:
        if self.column not in df.columns:
            return np.zeros(len(df), dtype=bool)
        # Absent (null) field values never match any predicate — the
        # reference's OpenSearch term/wildcard/regexp queries only hit
        # documents that HAVE the field. Without this, astype(str) would
        # turn None/NaN into the literal strings 'None'/'nan' and a rule
        # like ``User|contains: 'one'`` would match rows missing the field.
        present = df[self.column].notna().to_numpy()
        col = df[self.column].fillna("").astype(str)
        low = col.str.lower()
        per_value = []
        for v in self.values:
            if self.kind == "re":
                per_value.append(col.str.contains(v, regex=True,
                                                  na=False).to_numpy())
                continue
            lv = str(v).lower()
            if self.kind == "eq":
                if "*" in lv or "?" in lv:
                    m = low.str.contains(_wildcard_to_regex(lv), regex=True,
                                         na=False)
                else:
                    m = low == lv
            elif self.kind == "contains":
                m = low.str.contains(lv, regex=False, na=False)
            elif self.kind == "startswith":
                m = low.str.startswith(lv, na=False)
            elif self.kind == "endswith":
                m = low.str.endswith(lv, na=False)
            else:
                raise ValueError(f"unknown modifier {self.kind}")
            per_value.append(np.asarray(m, dtype=bool))
        if not per_value:
            return np.zeros(len(df), dtype=bool)
        stack = np.vstack(per_value)
        combined = stack.all(axis=0) if self.conjunct else stack.any(axis=0)
        return combined & present


# condition AST: ("leafset", [Leaf,...]) | ("and"/"or", [..]) | ("not", x)


def _selection_leaves(name: str, mapping: dict, prefix: str) -> list[Leaf]:
    if not isinstance(mapping, dict):
        raise ValueError(
            f"selection {name!r}: only field-map selections are supported")
    leaves = []
    for key, value in mapping.items():
        parts = key.split("|")
        fld, mods = parts[0], parts[1:]
        for m in mods:
            if m not in _MODIFIERS:
                raise ValueError(f"unsupported modifier {m!r} in {key!r}")
        kind = next((m for m in mods if m != "all"), "eq")
        values = tuple(value) if isinstance(value, list) else (value,)
        leaves.append(Leaf(column=f"{prefix}.{fld}", kind=kind,
                           values=values, conjunct="all" in mods))
    return leaves


class _ConditionParser:
    """Recursive-descent parser for the Sigma condition subset."""

    def __init__(self, text: str, selections: dict[str, list[Leaf]]):
        self.tokens = re.findall(r"\(|\)|[^\s()]+", text)
        self.pos = 0
        self.selections = selections

    def _peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self):
        tok = self._peek()
        self.pos += 1
        return tok

    def parse(self):
        node = self._or()
        if self._peek() is not None:
            raise ValueError(f"trailing tokens in condition: {self.tokens}")
        return node

    def _or(self):
        node = self._and()
        while self._peek() == "or":
            self._next()
            node = ("or", [node, self._and()])
        return node

    def _and(self):
        node = self._unary()
        while self._peek() == "and":
            self._next()
            node = ("and", [node, self._unary()])
        return node

    def _unary(self):
        tok = self._peek()
        if tok == "not":
            self._next()
            return ("not", self._unary())
        if tok == "(":
            self._next()
            node = self._or()
            if self._next() != ")":
                raise ValueError("unbalanced parentheses in condition")
            return node
        if tok in ("1", "all") and self.tokens[self.pos + 1:self.pos + 2] == ["of"]:
            quant = self._next()
            self._next()  # 'of'
            pat = self._next()
            pat = "*" if pat == "them" else pat
            names = [n for n in self.selections if fnmatch.fnmatch(n, pat)]
            if not names:
                raise ValueError(f"no selection matches {pat!r}")
            kids = [("leafset", self.selections[n]) for n in names]
            return ("or" if quant == "1" else "and", kids)
        name = self._next()
        if name not in self.selections:
            raise ValueError(f"unknown selection {name!r} in condition")
        return ("leafset", self.selections[name])


def _eval_node(node, df: pd.DataFrame) -> np.ndarray:
    op = node[0]
    if op == "leafset":
        leaves = node[1]
        if not leaves:
            return np.zeros(len(df), dtype=bool)
        return np.vstack([lf.mask(df) for lf in leaves]).all(axis=0)
    if op == "not":
        return ~_eval_node(node[1], df)
    masks = np.vstack([_eval_node(k, df) for k in node[1]])
    return masks.all(axis=0) if op == "and" else masks.any(axis=0)


def _collect_leaves(node) -> list[Leaf]:
    if node[0] == "leafset":
        return list(node[1])
    if node[0] == "not":
        return _collect_leaves(node[1])
    out = []
    for k in node[1]:
        out.extend(_collect_leaves(k))
    return out


@dataclass
class CompiledRule:
    title: str
    rule_id: str
    category: str | None
    tree: tuple
    leaves: list[Leaf] = field(default_factory=list)

    @property
    def n_clauses(self) -> int:
        return len(self.leaves)

    def chunks(self, max_clauses: int = MAX_CLAUSES) -> list[tuple]:
        """The reference's 1024-clause split (db_session.py:85-124):
        below the threshold the structured tree runs as one query;
        at/above it ALL leaf clauses are extracted and re-ORed in
        chunks of ``max_clauses`` — deliberately reproducing the
        reference's loss of nested boolean structure on split."""
        if self.n_clauses < max_clauses:
            return [self.tree]
        return [("or", [("leafset", [lf]) for lf in
                        self.leaves[i:i + max_clauses]])
                for i in range(0, len(self.leaves), max_clauses)]

    def mask(self, df: pd.DataFrame,
             max_clauses: int = MAX_CLAUSES) -> np.ndarray:
        """Union of the chunk results (the reference concatenates chunk
        hits; we OR the masks — identical doc set, no duplicate rows)."""
        out = np.zeros(len(df), dtype=bool)
        for chunk in self.chunks(max_clauses):
            out |= _eval_node(chunk, df)
        return out


def compile_rules(yaml_text: str | bytes,
                  prefix: str = "raw_data.Metadata") -> list[CompiledRule]:
    """Sigma YAML (one or more ``---``-separated rules) → compiled
    rules. ``prefix`` is the reference's field rewrite
    (rule/session.py:32: default ``raw_data.Metadata``)."""
    import yaml

    if isinstance(yaml_text, bytes):
        yaml_text = yaml_text.decode("utf-8")
    rules = []
    for doc in yaml.safe_load_all(yaml_text):
        if not doc:
            continue
        detection = doc.get("detection")
        if not isinstance(detection, dict) or "condition" not in detection:
            raise ValueError(
                f"rule {doc.get('title')!r}: detection/condition required")
        selections = {
            name: _selection_leaves(name, mapping, prefix)
            for name, mapping in detection.items() if name != "condition"
        }
        tree = _ConditionParser(str(detection["condition"]),
                                selections).parse()
        rules.append(CompiledRule(
            title=str(doc.get("title", "")),
            rule_id=str(doc.get("id", "")),
            category=(doc.get("logsource") or {}).get("category"),
            tree=tree,
            leaves=_collect_leaves(tree)))
    return rules
