"""Deterministic byte-pair-encoding tokenizer over a FIXED merges table.

The missing "real subword tokenization" piece of the training-data
pipeline (VERDICT r10 missing #4): whitespace token counts undersize
transformer batches, so packing/chunking need counts in learned subword
units. This module provides a fully deterministic BPE whose merge table is
a committed public fixture (regenerate with ``tools/train_bpe_merges.py``
— training is Sennrich et al. 2016 Algorithm 1 on the fixed seed text in
that tool), NOT data-derived state.

Encoding semantics — the string-replace formulation, chosen because it is
expressible IDENTICALLY in Python and DuckDB SQL (the oracle-parity
requirement). Every symbol is wrapped in an open/close marker pair:

    s = "".join(OPEN + ch + CLOSE for ch in pre_token)
    for (a, b) in MERGES, in order:                      # training rank
        s = s.replace(OPEN+a+CLOSE + OPEN+b+CLOSE, OPEN+a+b+CLOSE)

One greedy non-overlapping left-to-right pass per merge, merges applied
strictly in training-rank order. The WRAPPED representation is what makes
a raw string replace a correct symbol-level merge: with a bare single
separator, ``a + SEP + b`` also matches where ``b`` is a PREFIX of the
actual next symbol (or ``a`` a suffix of the previous one) — e.g. pattern
``a␟s`` inside ``a␟sc`` — merging across a symbol boundary (caught by the
property fuzz in tests/test_beyond.py). With each symbol carrying its own
``OPEN…CLOSE`` frame, the pattern can only match a complete adjacent
symbol pair, and consecutive matches share no characters, so one pass has
exactly the reference greedy-merge semantics. Rank-order application then
matches the classic "repeatedly merge the lowest-rank pair present" loop
— a merge's constituents are produced only by earlier-ranked merges, so
by the time rank r runs every lower rank is exhausted — which the
property test pins against a reference implementation of that loop.

Pre-tokenization is the repo's whitespace convention (``text.tokens`` —
ASCII ``\\s``) over lowercased text with BOTH marker bytes stripped
(``\\x1f``/``\\x1e`` in a document would corrupt the representation, so
both engines remove them first).

The SQL twin (oracles_beyond._bpe_ctes) compiles MERGES into a recursive
merge CTE running the same ``replace`` passes in the same order over the
same representation: both sides run the LITERAL same algorithm.
"""

from __future__ import annotations

#: symbol open/close markers of the wrapped representation; stripped from
#: input text on both engines before encoding
BPE_SEP = "\x1f"
BPE_CLOSE = "\x1e"


def bpe_pieces(
    token: str, merges: list[tuple[str, str]] | None = None
) -> list[str]:
    """Subword pieces of one (lowercased, marker-free) pre-token.
    ``merges``: an ordered merges table from
    :func:`~...operators.text.train_bpe_merges` (round 12 — a corpus
    tokenizer's whole point); default = the committed public fixture."""
    if not token:
        return []
    s = "".join(BPE_SEP + ch + BPE_CLOSE for ch in token)
    for a, b in MERGES if merges is None else merges:
        s = s.replace(
            BPE_SEP + a + BPE_CLOSE + BPE_SEP + b + BPE_CLOSE,
            BPE_SEP + a + b + BPE_CLOSE,
        )
    return s[1:-1].split(BPE_CLOSE + BPE_SEP)


def bpe_piece_count(
    token: str,
    _memo: dict[str, int] | None = None,
    merges: list[tuple[str, str]] | None = None,
) -> int:
    """Number of BPE pieces of one pre-token (memoize across a batch —
    corpus tokens are Zipf-distributed, so the cache hit rate is high;
    the caller owns one memo per merges table)."""
    if _memo is None:
        return len(bpe_pieces(token, merges))
    n = _memo.get(token)
    if n is None:
        n = _memo[token] = len(bpe_pieces(token, merges))
    return n


def bpe_token_count(
    tokens: list[str],
    _memo: dict[str, int] | None = None,
    merges: list[tuple[str, str]] | None = None,
) -> int:
    """Total BPE piece count of a pre-token sequence."""
    return sum(bpe_piece_count(t, _memo, merges) for t in tokens)


# --- AUTOGEN BELOW: merges table (tools/train_bpe_merges.py) ----------------------
MERGES: list[tuple[str, str]] = [
    ('h', 'e'),
    ('t', 'he'),
    ('e', 's'),
    ('a', 'n'),
    ('i', 'n'),
    ('o', 'r'),
    ('an', 'd'),
    ('e', 'r'),
    ('r', 'e'),
    ('t', 'o'),
    ('l', 'e'),
    ('e', 'n'),
    ('l', 'l'),
    ('t', 'a'),
    ('o', 'u'),
    ('a', 'r'),
    ('o', 'f'),
    ('o', 'w'),
    ('r', 'i'),
    ('s', 't'),
    ('d', 'e'),
    ('m', 'a'),
    ('a', 't'),
    ('f', 'or'),
    ('t', 's'),
    ('u', 'm'),
    ('b', 'le'),
    ('c', 'e'),
    ('f', 'i'),
    ('i', 'm'),
    ('in', 'g'),
    ('ma', 'll'),
    ('o', 'l'),
    ('or', 'd'),
    ('ou', 'n'),
    ('p', 'l'),
    ('p', 's'),
    ('q', 'u'),
    ('s', 'mall'),
    ('t', 'er'),
    ('ta', 'ble'),
    ('w', 'h'),
    ('a', 'c'),
    ('a', 'in'),
    ('a', 'st'),
    ('c', 'ol'),
    ('d', 's'),
    ('es', 't'),
    ('g', 'e'),
    ('i', 'de'),
    ('i', 'e'),
    ('j', 'o'),
    ('m', 'o'),
    ('o', 'n'),
    ('p', 'u'),
    ('r', 'ow'),
    ('r', 'u'),
    ('s', 'c'),
    ('s', 'es'),
    ('t', 'e'),
    ('t', 'h'),
    ('t', 'im'),
    ('w', 'ord'),
    ('a', 'f'),
    ('a', 'm'),
    ('a', 're'),
    ('ac', 'h'),
    ('af', 'ter'),
    ('an', 's'),
    ('ar', 'ri'),
    ('b', 'i'),
    ('b', 'y'),
    ('c', 'at'),
    ('c', 'es'),
    ('c', 'l'),
    ('c', 'oun'),
    ('ce', 'll'),
    ('col', 'um'),
    ('colum', 'n'),
    ('column', 's'),
    ('coun', 'ts'),
    ('d', 'o'),
    ('d', 'ow'),
    ('e', 'ach'),
    ('e', 'ar'),
    ('en', 'ts'),
    ('fi', 'l'),
    ('fil', 'ter'),
    ('g', 'h'),
    ('g', 'r'),
    ('g', 're'),
    ('gr', 'ou'),
    ('i', 's'),
    ('in', 's'),
    ('k', 'e'),
    ('l', 'u'),
    ('m', 'e'),
    ('n', 'es'),
    ('o', 'p'),
    ('p', 'e'),
    ('p', 'ie'),
    ('pu', 's'),
    ('r', 'o'),
    ('row', 's'),
    ('s', 'e'),
    ('s', 'h'),
    ('s', 'ide'),
    ('t', 'en'),
    ('tim', 'e'),
    ('v', 'e'),
    ('v', 'er'),
    ('v', 'es'),
    ('w', 'ar'),
    ('w', 'he'),
    ('w', 'ri'),
    ('wh', 'i'),
    ('a', 'd'),
    ('a', 'ds'),
    ('a', 'g'),
    ('a', 'ge'),
    ('a', 'lu'),
    ('a', 'p'),
    ('a', 's'),
    ('a', 'ta'),
    ('a', 've'),
    ('a', 'z'),
    ('ac', 'k'),
    ('ack', 's'),
    ('ad', 'c'),
    ('adc', 'ast'),
    ('adcast', 's'),
    ('ag', 'ain'),
    ('again', 'st'),
    ('ain', 'ing'),
    ('alu', 'es'),
    ('am', 'pl'),
    ('ampl', 'es'),
    ('an', 'g'),
    ('an', 'ing'),
    ('an', 'n'),
    ('an', 'y'),
    ('ang', 'u'),
    ('angu', 'age'),
    ('ann', 'er'),
    ('ar', 'ge'),
    ('arri', 'es'),
    ('arri', 'ves'),
    ('as', 'ses'),
    ('at', 'c'),
    ('atc', 'h'),
    ('az', 'y'),
    ('b', 'atch'),
    ('b', 'e'),
    ('b', 'er'),
    ('b', 'lu'),
    ('b', 'ri'),
    ('b', 'ro'),
    ('b', 'row'),
    ('bi', 'g'),
    ('bi', 'r'),
    ('bir', 'ds'),
    ('blu', 'e'),
    ('bri', 'gh'),
    ('brigh', 't'),
    ('bro', 'adcasts'),
    ('brow', 'n'),
    ('c', 'arries'),
    ('c', 'k'),
    ('c', 'le'),
    ('c', 'or'),
    ('c', 't'),
    ('c', 'um'),
    ('cat', 'e'),
    ('cell', 's'),
    ('cl', 'o'),
    ('cl', 'ou'),
    ('cle', 'an'),
    ('clo', 'ses'),
    ('clou', 'ds'),
    ('col', 'd'),
    ('cor', 'pus'),
    ('ct', 'or'),
    ('cum', 'ents'),
    ('d', 'ata'),
    ('d', 'er'),
    ('d', 'ri'),
    ('d', 'u'),
    ('de', 'e'),
    ('de', 'l'),
    ('de', 'x'),
    ('dee', 'p'),
    ('do', 'cuments'),
]
