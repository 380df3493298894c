"""Regenerate the committed byte-BPE merges fixture (functions/bpe.py).

Classic BPE training (Sennrich et al. 2016 "Neural Machine Translation of
Rare Words with Subword Units", Algorithm 1): start from characters, count
adjacent symbol pairs over the word-frequency table, repeatedly merge the
most frequent pair. Training is fully deterministic — ties break on
(count DESC, pair ASC) — and runs on the fixed SEED text below, so the
merges table is a reproducible public artifact checked into the repo, not
data-derived state (re-running this script must be a no-op diff).

The ENCODER's semantics are deliberately the string-replace formulation
(see functions/bpe.py docstring): applying merges strictly in rank order
with one greedy left-to-right non-overlapping pass per merge is equivalent
to the reference "merge the lowest-rank pair present" loop, because a
merge's constituents are produced only by earlier-ranked merges — and the
replace formulation is expressible IDENTICALLY in Python (str.replace) and
DuckDB SQL (replace), which is what makes the operator oracle-checkable.

Usage: python tools/train_bpe_merges.py  (rewrites functions/bpe.py in
place, preserving everything below the AUTOGEN marker).
"""

from __future__ import annotations

import os
import re
from collections import Counter

N_MERGES = 192

# Fixed public seed: generic English prose (original text written for this
# repo) mixed with data-engineering vocabulary, so merges cover both common
# English units (th, er, ing, the) and the domain words a pipeline corpus
# actually contains. NEVER derive the seed from test data.
SEED = """
the quick brown fox jumps over the lazy dog while the slow grey cat sleeps
by the warm fire and the small birds sing in the tall green trees of the
old quiet forest where rivers run fast and stones stay still for many long
years under a wide open sky full of bright white clouds that drift past
the high cold mountains toward the deep blue sea

a data pipeline reads a table of rows and columns then filters the rows
joins the small table to the big table groups the values sums the counts
sorts the result and writes the output to a new table the query planner
pushes the filter down to the scan prunes the columns broadcasts the small
side of the join and shuffles the large side by the group key a stream of
events arrives in order with a timestamp and a session window closes when
the gap passes the batch job packs the documents into fixed sequences
counts the tokens scores the text against the language model removes the
duplicate spans and samples the clean corpus for training the index maps
each vector to a cell and the probe scans only the nearest cells

there is a time for work and a time for rest a word after a word after a
word is power and the simple things are often the most true people write
to remember to explain and to share what they have found each sentence
carries a small piece of meaning and together the pieces make the whole
"""


def tokenize(text: str) -> list[str]:
    # ASCII whitespace split (the repo's tokens() convention: Java/RE2 \s,
    # NOT Python's Unicode-wide \s) over lowercased text
    return [t for t in re.split(r"[ \t\n\r\f\v]+", text.lower()) if t]


def train(seed: str, n_merges: int) -> list[tuple[str, str]]:
    vocab = Counter(tuple(w) for w in tokenize(seed))
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        # deterministic: highest count, ties by lexicographically smallest
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab: Counter = Counter()
        for word, freq in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


MARKER = "# --- AUTOGEN BELOW: merges table"


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    target = os.path.join(
        os.path.dirname(here),
        "flink_clickstream_processor_msk_spark",
        "functions",
        "bpe.py",
    )
    merges = train(SEED, N_MERGES)
    with open(target) as f:
        head = f.read().split(MARKER)[0]
    lines = [f"{MARKER} (tools/train_bpe_merges.py) ----------------------"]
    lines.append("MERGES: list[tuple[str, str]] = [")
    for a, b in merges:
        lines.append(f"    ({a!r}, {b!r}),")
    lines.append("]")
    with open(target, "w") as f:
        f.write(head + "\n".join(lines) + "\n")
    print(f"wrote {len(merges)} merges to {target}")


if __name__ == "__main__":
    main()
