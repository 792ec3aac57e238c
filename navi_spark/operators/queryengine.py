"""Query parsing + snippets (reference ops Q1-Q3, queryengine/*).

Driver-side Python (these are not data-plane operators — the reference runs
them per HTTP request): the char-scan tokenizer keeping quoted phrases
whole (QueryEngine.java:168-222), the phrase/operator grammar validator
(:73-166), and the sliding-window snippet generator (:242-296) applied to
the collected top-k rows."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from navi_spark.functions.stemmer import porter_stem


@dataclass
class ParsedQuery:
    kind: str                       # 'terms' | 'phrase' | 'boolean' | 'invalid'
    terms: list[str] = field(default_factory=list)       # stemmed terms
    phrases: list[list[str]] = field(default_factory=list)
    operators: list[str] = field(default_factory=list)   # AND/OR/NOT
    error: Optional[str] = None


def tokenize_query(query: str) -> Optional[list[str]]:
    """Q1: whitespace split, quoted phrases kept whole (with quotes);
    unmatched quote → None (QueryEngine.java:168-222)."""
    tokens: list[str] = []
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        if c == '"':
            j = query.find('"', i + 1)
            if j < 0:
                return None  # unmatched quote → invalid
            tokens.append(query[i : j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not query[j].isspace() and query[j] != '"':
                j += 1
            tokens.append(query[i:j])
            i = j
    return tokens


_OPERATORS = {"and", "or", "not"}  # case-insensitive (QueryEngine.java:224-228)


def parse_query(query: str, stopwords: set[str] = frozenset()) -> ParsedQuery:
    """Q2: non-quoted → stopword-filter + stem each token; quoted →
    alternating phrase/operator grammar, ≤2 operators, must end with a
    phrase (QueryEngine.java:73-166)."""
    tokens = tokenize_query(query)
    if tokens is None or not tokens:
        return ParsedQuery("invalid", error="empty or unmatched quote")
    quoted = [t for t in tokens if t.startswith('"')]
    if not quoted:
        terms = [
            porter_stem(w)
            for w in (t.lower() for t in tokens)
            if re.sub(r"[^a-z]", "", w) not in stopwords and w
        ]
        return ParsedQuery("terms", terms=terms)
    # phrase/boolean grammar: phrase (operator phrase)*
    phrases: list[list[str]] = []
    operators: list[str] = []
    expect_phrase = True
    for t in tokens:
        if expect_phrase:
            if not (t.startswith('"') and t.endswith('"') and len(t) >= 2):
                return ParsedQuery("invalid", error=f"expected phrase, got {t}")
            phrases.append(t[1:-1].split())
            expect_phrase = False
        else:
            if t.lower() not in _OPERATORS:
                return ParsedQuery("invalid", error=f"expected operator, got {t}")
            operators.append(t.upper())
            expect_phrase = True
    if expect_phrase:
        return ParsedQuery("invalid", error="query must end with a phrase")
    if len(operators) > 2:  # ≤3 phrases / ≤2 operators (QueryEngine.java:148)
        return ParsedQuery("invalid", error="too many operators")
    if len(phrases) == 1:
        return ParsedQuery("phrase", phrases=phrases)
    return ParsedQuery("boolean", phrases=phrases, operators=operators)


def snippet(
    content: str, query_tokens: list[str],
    window: int = 400, stride: int = 50,
) -> str:
    """Q3: slide a `window`-char window by `stride`, pick the window with
    the most query-token hits, <b>-wrap tokens (QueryEngine.java:242-296)."""
    if not content:
        return ""
    lowered = content.lower()
    toks = [t.lower() for t in query_tokens if t]
    best_start, best_hits = 0, -1
    for start in range(0, max(len(content) - window, 0) + 1, stride):
        seg = lowered[start : start + window]
        hits = sum(seg.count(t) for t in toks)
        if hits > best_hits:
            best_start, best_hits = start, hits
    seg = content[best_start : best_start + window]
    for t in sorted(set(toks), key=len, reverse=True):
        # prefix match (\w* suffix): query tokens arrive Porter-stemmed
        # ("river"), the page text carries surface forms ("rivers")
        seg = re.sub(
            rf"\b({re.escape(t)}\w*)", r"<b>\1</b>", seg, flags=re.IGNORECASE
        )
    return seg
