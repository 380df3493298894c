"""The shared Python-side gram kernel — the ONE home of the tokenize /
gram / md5 conventions every Arrow-batched text kernel must replay in
lockstep with the SQL oracles (CLAUDE.md: keep formulas in one source).

Conventions (mirrored by ``oracles_beyond._TOKENS`` / ``_shingles``):

- tokens: ASCII ``\\s+`` split (NOT Python's Unicode-aware default — the
  JVM/DuckDB tokenizers are ASCII), empty tokens dropped;
- word k-grams: space-joined, stride 1, non-distinct; fewer than k
  tokens → the WHOLE text as one gram (''.join of no words = '');
- hash: 60-bit md5 prefix (``int(md5(g)[:15], 16)``) — the cross-engine
  hash (Spark's hash/xxhash64 don't exist in DuckDB);
- NULL text: propagate None, produce NO grams.

Pandas UDFs import these at module level; cloudpickle serializes the
closure by module reference, so workers resolve the same single source.
"""

from __future__ import annotations

import hashlib
import re

#: the ONE whitespace class every tokenizer shares (r14, ADVICE r13):
#: bare \s is ENGINE-DEPENDENT — Java's and Python-ASCII's include \x0B
#: (vertical tab), RE2/DuckDB's does not — so a \x0B in a future data
#: tier would split the hash contract. The explicit class is RE2's set,
#: spelled with backslash escapes so it interpolates safely into SQL
#: string literals and Spark pattern strings alike. Consumers:
#: text.tokens (Catalyst), text.BPE_ISH_PATTERN (negated form),
#: oracles_beyond._TOKENS (DuckDB), WS_ASCII below (pandas kernels).
WS_CLASS = r"[ \t\n\r\f]"

#: the shared class, compiled for the Python kernels (replaces the old
#: re.ASCII \s+, whose set still included \x0B)
WS_ASCII = re.compile(WS_CLASS + "+")


def ascii_words(text: str) -> list[str]:
    """Whitespace tokens under the shared ASCII convention."""
    return [w for w in WS_ASCII.split(text) if w]


def md5_60(s: str) -> int:
    """60-bit md5 prefix — the engine-portable hash (functions/hashing.h60
    is its Catalyst twin, oracles_beyond._h60 the DuckDB twin)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def word_grams(words: list[str], k: int) -> list[str]:
    """Non-distinct word k-grams, stride 1; <k tokens → one whole-text
    gram (mirrors oracles_beyond._shingles exactly)."""
    n = max(len(words) - (k - 1), 1)
    return [" ".join(words[i : i + k]) for i in range(n)]
