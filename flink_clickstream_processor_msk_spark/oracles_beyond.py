"""DuckDB SQL twins for the beyond-reference operators.

Generated with the SAME literal constants (permutation coefficients,
hyperplanes, stopword profiles) as the Spark operators import, so both
sides evaluate identical formulas — md5-derived hashing and sequential
double folds make the results bit-identical, not just approximately equal.
"""

from __future__ import annotations

from flink_clickstream_processor_msk_spark.functions.grams import WS_CLASS
from flink_clickstream_processor_msk_spark.functions.hashing import (
    H28_MOD,
    MOD_P,
    perm_coefficients,
)
from flink_clickstream_processor_msk_spark.operators.dedup import (
    COSINE_THRESHOLD,
    JACCARD_THRESHOLD,
    N_BANDS,
    N_PERMS,
    N_PLANES,
    NGRAM_JACCARD_THRESHOLD,
    NGRAM_N,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    hyperplanes,
)
from flink_clickstream_processor_msk_spark.operators.similarity import (
    KMEANS_SUM_SCALE,
)
from flink_clickstream_processor_msk_spark.operators.text import (
    BPE_ISH_PATTERN,
    LANG_PROFILES,
    SHINGLE_K,
)

_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
# WS_CLASS, not \s (r14): RE2's \s already equals this set, but spelling
# it keeps the tokenizer lockstep with the Spark/Python sides EXPLICIT —
# Java's and Python-ASCII's \s include \x0B, RE2's does not
_TOKENS = (
    "list_filter(regexp_split_to_array({x}, '" + WS_CLASS + "+'), t -> t != '')"
)


def _h60(x: str) -> str:
    return _H60.format(x=x)


def _shingles(words: str, k: int = SHINGLE_K) -> str:
    # Two NULL-adjacent input classes must replay the Python kernels'
    # conventions exactly (none exist in current tiers, but the driver
    # regenerates data between rounds):
    # - EMPTY token list (empty/whitespace-only text): the kernels emit
    #   the single '' whole-text gram (''.join of no words), but DuckDB's
    #   array_to_string over the empty slice is NULL → COALESCE to ''.
    # - NULL text: the kernels propagate None → NO grams; but
    #   greatest(len(NULL)-2,1)=1 would run the comprehension once and
    #   the COALESCE would fabricate a '' gram → the outer CASE returns
    #   NULL instead (unnest/list_transform of NULL yield no rows/NULL,
    #   matching the Spark side's NULL array).
    return (
        f"CASE WHEN {words} IS NULL THEN NULL ELSE "
        f"[COALESCE(array_to_string({words}[i:i+{k - 1}], ' '), '') "
        f"for i in range(1, greatest(len({words}) - {k - 1}, 1) + 1)] END"
    )


def text_stats() -> str:
    stop_list = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
WITH toks AS (
  SELECT doc_id, text, {_TOKENS.format(x="text")} AS w FROM documents
)
SELECT doc_id,
  CAST(len(w) AS INTEGER)                                   AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INTEGER) AS bpe_tokens,
  CAST(length(text) AS INTEGER)                             AS n_chars,
  length(text) / len(w)                                     AS avg_token_len,
  len(list_filter(w, t -> lower(t) IN ({stop_list}))) / len(w) AS stopword_ratio,
  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) AS alpha_ratio,
  (len(list_filter(w, t -> lower(t) IN ({stop_list}))) / len(w)) * 0.4
   + (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text)) * 0.4
   + least(len(w) / 64.0, 1.0) * 0.2                        AS quality_score
FROM toks
"""


def redact_pii() -> str:
    """SQL twin of text.redact_pii: the same PII_* patterns (RE2-safe
    subset), same replace order, each count taken on the text state its
    replace sees. Library oracle — parity-pinned in tests/test_beyond.py
    on crafted PII fixtures (the synthetic documents table contains no
    PII, so a driver row would vacuously pass)."""
    from flink_clickstream_processor_msk_spark.operators.text import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
    )

    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
s1 AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INTEGER)
      AS n_emails,
    regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t
  FROM d
),
s2 AS (
  SELECT doc_id, n_emails,
    CAST(len(regexp_extract_all(t, '{PII_IPV4}')) AS INTEGER) AS n_ipv4,
    regexp_replace(t, '{PII_IPV4}', '<IP>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_ipv4,
    CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS INTEGER) AS n_phones,
    regexp_replace(t, '{PII_PHONE}', '<PHONE>', 'g') AS t
  FROM s2
)
SELECT doc_id, t AS redacted_text, n_emails, n_ipv4, n_phones FROM s3
"""


def charset_stats() -> str:
    """SQL twin of text.charset_stats. All columns are integers; the char
    histogram comes from unnest(string_split(text, '')) (string_split of
    an EMPTY string yields [''], so zero-length texts are excluded from
    the histogram CTE and LEFT-join back as zeros — matching the Spark
    kernel's explicit empty-text row). Class counts use RE2 ASCII classes,
    the same ranges the Spark kernel checks explicitly; len() counts
    codepoints in both engines."""
    return r"""
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
c AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM d WHERE len(text) > 0
),
hist AS (SELECT doc_id, ch, count(*) AS n FROM c GROUP BY doc_id, ch),
agg AS (
  SELECT doc_id,
    CAST(count(*) AS INTEGER) AS n_distinct_chars,
    CAST(max(n) AS INTEGER) AS top_char_n
  FROM hist GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(len(d.text) AS INTEGER) AS n_chars,
  COALESCE(a.n_distinct_chars, 0) AS n_distinct_chars,
  COALESCE(a.top_char_n, 0) AS top_char_n,
  CAST(len(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS INTEGER)
    AS n_alpha,
  CAST(len(regexp_replace(d.text, '[^0-9]', '', 'g')) AS INTEGER)
    AS n_digit,
  CAST(len(regexp_replace(d.text, '[^ \t\n\r\f\v]', '', 'g')) AS INTEGER)
    AS n_space
FROM d LEFT JOIN agg a USING (doc_id)
"""


def quality_filter(min_quality: float = 0.5, min_tokens: int = 10) -> str:
    """SQL twin of text.quality_filter (same text_stats formulas, so the
    threshold comparisons see bit-identical doubles)."""
    return f"""
WITH base AS ({text_stats()})
SELECT doc_id, ws_tokens, quality_score
FROM base
WHERE quality_score >= {min_quality} AND ws_tokens >= {min_tokens}
"""


def token_histogram(k: int = 100) -> str:
    """SQL twin of text.token_histogram (count desc, token asc — total
    order, deterministic top-k cut)."""
    toks = _TOKENS.format(x="lower(text)")
    return f"""
SELECT token, count(*) AS token_count
FROM (SELECT unnest({toks}) AS token FROM documents)
GROUP BY token
ORDER BY token_count DESC, token ASC
LIMIT {k}
"""


def train_test_split(test_pct: int = 10) -> str:
    """SQL twin of text.train_test_split (md5-derived bucket)."""
    bucket = f"({_h60('doc_id::VARCHAR')}) % 100"
    return f"""
SELECT doc_id,
  CAST({bucket} AS INTEGER) AS split_bucket,
  CASE WHEN {bucket} < {test_pct} THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def stratified_sample(k: int = 100, group_col: str = "lang") -> str:
    """SQL twin of text.stratified_sample (md5-hash-ordered exact
    per-stratum top-k; (sample_key, doc_id) is a total order)."""
    key = _h60("doc_id::VARCHAR")
    return f"""
WITH keyed AS (
  SELECT {group_col}, doc_id, ({key}) AS sample_key FROM documents
)
SELECT {group_col}, doc_id, sample_key, sample_rank
FROM (
  SELECT {group_col}, doc_id, sample_key,
    CAST(row_number() OVER (
      PARTITION BY {group_col} ORDER BY sample_key ASC, doc_id ASC
    ) AS INTEGER) AS sample_rank
  FROM keyed
)
WHERE sample_rank <= {k}
"""


def difficulty_buckets(n_buckets: int = 4, group_col: str = "lang") -> str:
    """SQL twin of text.difficulty_buckets: NTILE over the text_stats
    quality composite (same term order → bit-identical doubles, proven by
    the text_stats oracle), undefined-score rows excluded on the raw
    counts BEFORE any division (x/0 and NULL-ordering conventions differ
    between engines, so neither side ever produces such a score)."""
    stop_list = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
WITH toks AS (
  SELECT {group_col}, doc_id, text, {_TOKENS.format(x="text")} AS w
  FROM documents WHERE text IS NOT NULL
),
scored AS (
  SELECT {group_col}, doc_id,
    (len(list_filter(w, t -> lower(t) IN ({stop_list}))) / len(w)) * 0.4
     + (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text)) * 0.4
     + least(len(w) / 64.0, 1.0) * 0.2 AS quality_score
  FROM toks
  WHERE len(w) > 0 AND length(text) > 0
)
SELECT {group_col}, doc_id, quality_score,
  CAST(ntile({n_buckets}) OVER (
    PARTITION BY {group_col} ORDER BY quality_score ASC, doc_id ASC
  ) AS INTEGER) AS difficulty_bucket
FROM scored
"""


def repetition_filter(
    max_dup_2gram: float = 0.06, max_dup_3gram: float = 0.02
) -> str:
    """SQL twin of text.repetition_filter: duplicate word-k-gram fractions
    over the same shingle convention (_shingles mirrors the gram loop in
    text.repetition_stats's pandas UDF), integer counts divided once so
    the doubles are bit-identical.

    Token-less documents (empty/whitespace-only text) keep an explicit
    0.0 branch (the Python kernel's whole-text-gram convention gives one
    distinct gram → frac 0.0); NULL text propagates NULL fracs through
    `_shingles`' CASE and the WHERE drops the row, matching the Spark
    side's NULL-propagating filter. Both classes are pinned by the
    parquet round-trip lockstep tests in tests/test_beyond.py."""
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(x="text")} AS w FROM documents
),
grams AS (
  SELECT doc_id, len(w) AS nw,
    {_shingles("w", 2)} AS g2,
    {_shingles("w", 3)} AS g3
  FROM toks
),
fracs AS (
  SELECT doc_id,
    CASE WHEN nw = 0 THEN 0.0
         ELSE (len(g2) - len(list_distinct(g2))) / len(g2) END AS dup_2gram_frac,
    CASE WHEN nw = 0 THEN 0.0
         ELSE (len(g3) - len(list_distinct(g3))) / len(g3) END AS dup_3gram_frac
  FROM grams
)
SELECT doc_id, dup_2gram_frac, dup_3gram_frac
FROM fracs
WHERE dup_2gram_frac <= {max_dup_2gram} AND dup_3gram_frac <= {max_dup_3gram}
"""


def _sqlq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bpe_ctes() -> str:
    """The shared BPE-encode CTE block (toks → vocab → merges → enc →
    counts): the fixed public merges table (functions/bpe.MERGES) compiled
    into a RECURSIVE merge CTE — one greedy left-to-right ``replace`` pass
    per merge, in training-rank order, over the WRAPPED symbol
    representation (every symbol framed chr(31)…chr(30), which is what
    makes a raw string replace a correct symbol-level merge — see
    functions/bpe.py's docstring for the prefix/suffix ambiguity a bare
    separator has). This is literally the Python kernel's algorithm
    (functions/bpe.bpe_pieces uses str.replace, so both engines run the
    same passes); recursion instead of 192 nested replace() calls because
    DuckDB's binder caps expression depth at 128. Encoding the DISTINCT
    vocabulary then joining counts back is the kernel's memoization,
    expressed relationally. Requires the query to open with
    ``WITH RECURSIVE``. Symbol count = count of chr(31) frames."""
    from flink_clickstream_processor_msk_spark.functions.bpe import MERGES

    vals = ",\n    ".join(
        f"({i + 1}, "
        f"chr(31) || {_sqlq(a)} || chr(30) || chr(31) || {_sqlq(b)} || chr(30), "
        f"chr(31) || {_sqlq(a + b)} || chr(30))"
        for i, (a, b) in enumerate(MERGES)
    )
    toks = _TOKENS.format(
        x="lower(replace(replace(text, chr(31), ''), chr(30), ''))"
    )
    return f"""toks AS (
  SELECT doc_id, unnest({toks}) AS t FROM documents
),
vocab AS (SELECT DISTINCT t FROM toks),
merges(r, src, tgt) AS (VALUES
    {vals}),
enc(t, s, r) AS (
  SELECT t,
    chr(31) || array_to_string(
      regexp_split_to_array(t, ''), chr(30) || chr(31)) || chr(30),
    0
  FROM vocab
  UNION ALL
  SELECT e.t, replace(e.s, m.src, m.tgt), e.r + 1
  FROM enc e JOIN merges m ON m.r = e.r + 1
),
counts AS (
  SELECT t, len(s) - len(replace(s, chr(31), '')) AS n
  FROM enc WHERE r = {len(MERGES)}
)"""


def bpe_merge_candidates(k: int = 20) -> str:
    """SQL twin of text.bpe_merge_candidates: adjacent character-pair
    counts over the word-frequency table (the first train_bpe_merges
    iteration), ranked by the trainer's argmax tie-break (count DESC,
    pair ASC). Char split is regexp_split_to_array(t, '') — per code
    point, the same unit the Spark side's Arrow kernel emits (astral
    input included)."""
    toks = _TOKENS.format(
        x="lower(replace(replace(text, chr(31), ''), chr(30), ''))"
    )
    return f"""
WITH toks AS (
  SELECT unnest({toks}) AS t FROM documents
),
vocab AS (SELECT t, COUNT(*) AS freq FROM toks GROUP BY t),
chars AS (SELECT regexp_split_to_array(t, '') AS cs, freq FROM vocab),
pairs AS (
  SELECT cs[i] AS sym_a, cs[i + 1] AS sym_b, freq
  FROM (
    SELECT cs, freq,
      unnest(generate_series(1, len(cs) - 1)) AS i
    FROM chars
  )
),
counts AS (
  SELECT sym_a, sym_b, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM pairs GROUP BY sym_a, sym_b
),
ranked AS (
  SELECT sym_a, sym_b, pair_count,
    CAST(row_number() OVER (
      ORDER BY pair_count DESC, sym_a ASC, sym_b ASC
    ) AS INTEGER) AS merge_rank
  FROM counts
)
SELECT sym_a, sym_b, pair_count, merge_rank
FROM ranked WHERE merge_rank <= {k}
"""


def bpe_token_stats() -> str:
    """SQL twin of text.bpe_token_stats: real subword counts under the
    fixed public BPE — per doc, whitespace pre-token count, total BPE
    piece count, and their single-division ratio."""
    return f"""
WITH RECURSIVE {_bpe_ctes()}
SELECT doc_id,
  CAST(COUNT(*) AS INTEGER) AS n_word_tokens,
  CAST(SUM(c.n) AS BIGINT) AS n_bpe_tokens,
  CAST(SUM(c.n) AS DOUBLE) / COUNT(*) AS bpe_per_word
FROM toks JOIN counts c USING (t) GROUP BY doc_id
"""


def pack_sequences_bpe(ctx_len: int = 2048, n_shards: int = 32) -> str:
    """SQL twin of text.pack_sequences_bpe: the pack_sequences machinery
    (same shard/window/floor formulas) over BPE piece counts — the count
    CTE is :func:`bpe_token_stats`'s block verbatim and the packing tail
    is :func:`pack_sequences`'s verbatim, which is why this row sits in
    the tail (composition-spanned). NULL text keeps its row with NULL
    seq_tokens (SUM skips it on both engines); token-less text packs 0."""
    shard = f"({_h60('doc_id::VARCHAR')}) % {n_shards}"
    return f"""
WITH RECURSIVE {_bpe_ctes()},
doc_bpe AS (
  SELECT doc_id, SUM(c.n) AS n FROM toks JOIN counts c USING (t)
  GROUP BY doc_id
),
base AS (
  SELECT d.doc_id,
    CAST({shard} AS INTEGER) AS shard,
    CASE WHEN d.text IS NULL THEN NULL
         ELSE CAST(COALESCE(b.n, 0) AS BIGINT) END AS seq_tokens
  FROM documents d LEFT JOIN doc_bpe b USING (doc_id)
),
cum AS (
  SELECT doc_id, shard, seq_tokens,
    COALESCE(SUM(seq_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM base
)
SELECT doc_id, shard,
  CAST(seq_tokens AS INTEGER) AS seq_tokens,
  CAST(start % {ctx_len} AS INTEGER) AS pack_offset,
  CAST(shard AS BIGINT) * {1 << 32}
    + CAST(floor(start / {float(ctx_len)}) AS BIGINT) AS pack_id
FROM cum
"""


def pack_sequences(ctx_len: int = 2048, n_shards: int = 32) -> str:
    """SQL twin of text.pack_sequences (md5-derived shard, windowed
    running token sum, floor-of-double pack index — same formula order)."""
    shard = f"({_h60('doc_id::VARCHAR')}) % {n_shards}"
    return f"""
WITH base AS (
  SELECT doc_id,
    CAST({shard} AS INTEGER) AS shard,
    CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT) AS seq_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, seq_tokens,
    COALESCE(SUM(seq_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM base
)
SELECT doc_id, shard,
  CAST(seq_tokens AS INTEGER) AS seq_tokens,
  CAST(start % {ctx_len} AS INTEGER) AS pack_offset,
  CAST(shard AS BIGINT) * {1 << 32}
    + CAST(floor(start / {float(ctx_len)}) AS BIGINT) AS pack_id
FROM cum
"""


def language_id() -> str:
    scores = {
        lang: f"len(list_filter(w, t -> t IN ({', '.join(repr(x) for x in words)})))"
        for lang, words in LANG_PROFILES.items()
    }
    score_cols = ",\n  ".join(
        f"CAST({expr} AS INTEGER) AS score_{lang}" for lang, expr in scores.items()
    )
    langs = list(LANG_PROFILES)
    best = f"greatest({', '.join('score_' + lang for lang in langs)})"
    whens = " ".join(f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs)
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(x="lower(text)")} AS w FROM documents
),
scored AS (
  SELECT doc_id,
  {score_cols}
  FROM toks
)
SELECT doc_id, {', '.join('score_' + lang for lang in langs)},
  CASE WHEN {best} = 0 THEN 'und' {whens} END AS predicted_lang
FROM scored
"""


def fingerprints() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, text, {_TOKENS.format(x="text")} AS w FROM documents
),
sh AS (
  SELECT doc_id, text, {_shingles("w")} AS shingles FROM toks
)
SELECT doc_id,
  list_min(list_transform(shingles, s -> {_h60("s")})) AS min_shingle_hash,
  list_max(list_transform(shingles, s -> {_h60("s")})) AS max_shingle_hash,
  {_h60("text")} AS content_hash
FROM sh
"""


def exact_duplicates() -> str:
    return f"""
SELECT min(doc_id) AS doc_id, content_hash, CAST(count(*) AS INTEGER) AS group_size
FROM (SELECT doc_id, {_h60("text")} AS content_hash FROM documents)
GROUP BY content_hash
"""


def _word_shingle_shset_cte() -> str:
    """CTEs ending in shset(doc_id, shingles): word-3-gram 28-bit hash sets."""
    return f"""
toks AS (
  SELECT doc_id, {_TOKENS.format(x="text")} AS w FROM documents
),
shset AS (
  SELECT doc_id,
    list_distinct(list_transform({_shingles("w")},
                                 s -> {_h60("s")} % {H28_MOD})) AS shingles
  FROM toks
)"""


def _char_ngram_shset_cte(n: int) -> str:
    """CTEs ending in shset(doc_id, shingles): char-n-gram 28-bit hash sets."""
    grams = f"[substr(text, i, {n}) for i in range(1, greatest(length(text) - {n - 1}, 1) + 1)]"
    return f"""
shset AS (
  SELECT doc_id,
    list_distinct(list_transform({grams}, g -> {_h60("g")} % {H28_MOD})) AS shingles
  FROM documents
)"""


def _signature_sql(shset_ctes: str | None = None) -> tuple[str, str]:
    """CTEs computing (doc_id, shingles28 list, s0..s15 signature cols)."""
    coeffs = perm_coefficients(N_PERMS)
    sig_cols = ",\n  ".join(
        f"list_min(list_transform(shingles, h -> ({a} * h + {b}) % {MOD_P})) AS s{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    if shset_ctes is None:
        shset_ctes = _word_shingle_shset_cte()
    ctes = f"""
{shset_ctes.strip()},
sigs AS (
  SELECT doc_id, shingles,
  {sig_cols}
  FROM shset
)"""
    return ctes, "sigs"


def _banded_sql() -> str:
    rows = N_PERMS // N_BANDS
    selects = []
    for i in range(N_BANDS):
        cols = ", ".join(f"s{i * rows + j}" for j in range(rows))
        selects.append(
            f"SELECT doc_id, {i} AS band_idx, concat_ws('-', {cols}) AS band_key FROM sigs"
        )
    return "\nUNION ALL\n".join(selects)


def _lsh_verified_sql(shset_ctes: str, sim_name: str, threshold: float) -> str:
    """Shared SQL twin of dedup._lsh_verified_pairs: band-bucket candidate
    pairs over any shset(doc_id, shingles) CTE chain, exact-Jaccard verify."""
    ctes, _ = _signature_sql(shset_ctes)
    jac = (
        "len(list_intersect(sa.shingles, sb.shingles))"
        " / len(list_distinct(list_concat(sa.shingles, sb.shingles)))"
    )
    return f"""
WITH {ctes.strip()},
banded AS (
  {_banded_sql()}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  {jac} AS {sim_name}
FROM pairs
JOIN sigs sa ON sa.doc_id = doc_a
JOIN sigs sb ON sb.doc_id = doc_b
WHERE {jac} >= {threshold}
"""


def minhash_near_duplicates(threshold: float = JACCARD_THRESHOLD) -> str:
    return _lsh_verified_sql(_word_shingle_shset_cte(), "jaccard", threshold)


def ngram_jaccard_near_duplicates(
    n: int = NGRAM_N, threshold: float = NGRAM_JACCARD_THRESHOLD
) -> str:
    return _lsh_verified_sql(_char_ngram_shset_cte(n), "ngram_jaccard", threshold)


def simhash_near_duplicates(max_hamming: int = 3) -> str:
    votes = ",\n  ".join(
        f"list_sum(list_transform(wh, h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(SIMHASH_BITS)
    )
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {i} AS band_idx, "
        f"(simhash >> {i * band_width}) & {(1 << band_width) - 1} AS band_val FROM fp"
        for i in range(SIMHASH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, list_transform({_TOKENS.format(x="text")}, t -> {_h60("t")}) AS wh
  FROM documents
),
votes AS (
  SELECT doc_id,
  {votes}
  FROM toks
),
fp AS (
  SELECT doc_id, {fp} AS simhash FROM votes
),
banded AS (
  {bands}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def _plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _bucket_expr(vec: str, planes: list[list[float]]) -> str:
    terms = []
    for p, plane in enumerate(planes):
        dot = (
            f"list_sum(list_transform(range(1, {len(plane)} + 1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({_plane_literal(plane)})[i]))"
        )
        terms.append(f"CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


_COS = (
    "list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


def embedding_near_duplicates(threshold: float = COSINE_THRESHOLD) -> str:
    planes = hyperplanes(N_PLANES, dim=64)
    cos = _COS.format(a="a.embedding", b="b.embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_bucket_expr("embedding", planes)} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


def multimodal_frame_sample(frame_bytes: int = 64, every_n: int = 4) -> str:
    """SQL twin of multimodal.frame_sample over attach_media(documents)
    (payload = UTF-8 text bytes; the corpus is ASCII so byte chunks equal
    character substrings). The driver-facing projection carries each
    sampled frame's md5 + length, not raw bytes (scalar-only contract)."""
    frame = f"substr(text, idx * {frame_bytes} + 1, {frame_bytes})"
    return f"""
WITH exploded AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(length(text) / {frame_bytes}.0) AS BIGINT),
                      {every_n})) AS idx
  FROM documents
)
SELECT doc_id,
  CAST(idx AS INTEGER)            AS frame_idx,
  md5({frame})                    AS frame_md5,
  CAST(length({frame}) AS INTEGER) AS frame_len
FROM exploded
"""


def multimodal_byte_stats() -> str:
    """Oracle for operators.multimodal.byte_stats over attach_media(documents).

    The corpus is ASCII, so bytes == characters: md5(text) equals the md5 of
    the UTF-8 payload and per-character distinct counts equal distinct bytes.
    """
    return """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  CAST(len(list_distinct([text[i] for i in range(1, length(text) + 1)]))
       AS INTEGER)                            AS n_distinct_bytes,
  md5(text)                                   AS payload_md5
FROM documents
"""


def multimodal_features_ann(query_doc_id: int, k: int, n_features: int = 16) -> str:
    """Oracle for the media pipeline: byte-histogram features → cosine top-k."""
    feat = (
        f"[len(list_filter([unicode(text[i]) for i in range(1, length(text) + 1)], "
        f"c -> c % {n_features} = k)) / length(text) for k in range(0, {n_features})]"
    )
    cos = _COS.format(a="e.f", b="q.f").replace("range(1, 65)", f"range(1, {n_features + 1})")
    return f"""
WITH feats AS (
  SELECT doc_id AS vec_id, {feat} AS f FROM documents
),
q AS (SELECT f FROM feats WHERE vec_id = {query_doc_id})
SELECT e.vec_id, {cos} AS cosine
FROM feats e, q
WHERE e.vec_id != {query_doc_id}
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def ann_ivf_topk(
    query_vec_id: int, k: int, n_centroids: int = 16, n_probe: int = 4
) -> str:
    """SQL twin of similarity.ann_ivf_topk: same deterministic centroids
    (n smallest vec_ids, cell = rank), same argmax assignment (cosine desc,
    first centroid wins ties), same n_probe routing."""
    cos_ec = _COS.format(a="e.embedding", b="c.cvec")
    cos_qc = _COS.format(a="q.embedding", b="c.cvec")
    cos_eq = _COS.format(a="e.embedding", b="q.embedding")
    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, embedding AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {n_centroids})
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cidx FROM cents c, q ORDER BY {cos_qc} DESC, cidx ASC LIMIT {n_probe}
),
assigned AS (
  SELECT vec_id, embedding, cidx FROM (
    SELECT e.vec_id, e.embedding, c.cidx,
      row_number() OVER (
        PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cidx ASC
      ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
)
SELECT e.vec_id, {cos_eq} AS cosine
FROM assigned e, q
WHERE e.cidx IN (SELECT cidx FROM probe) AND e.vec_id != {query_vec_id}
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def ivf_occupancy(n_centroids: int = 16) -> str:
    """SQL twin of similarity.index_occupancy_stats over the standard
    IVF index (same deterministic centroids + argmax assignment CTE as
    the ann_ivf oracle): per-cell count, corpus share, and skew ratio
    (n_vecs · n_cells / total — 1.0 balanced), EMPTY cells included as
    zero rows. Integer counts; the two ratios are single BIGINT→DOUBLE
    divisions, IEEE-identical across engines."""
    cos_ec = _COS.format(a="e.embedding", b="c.cvec")
    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, embedding AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {n_centroids})
),
assigned AS (
  SELECT vec_id, cidx FROM (
    SELECT e.vec_id, c.cidx,
      row_number() OVER (
        PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cidx ASC
      ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
counts AS (
  SELECT ac.cell, COALESCE(n.n_vecs, 0) AS n_vecs
  FROM (SELECT cidx AS cell FROM cents) ac
  LEFT JOIN (
    SELECT cidx AS cell, count(*) AS n_vecs FROM assigned GROUP BY cidx
  ) n USING (cell)
),
tot AS (SELECT sum(n_vecs) AS total, count(*) AS ncells FROM counts)
SELECT CAST(cell AS INTEGER) AS cell,
  CAST(n_vecs AS BIGINT) AS n_vecs,
  n_vecs / total AS share,
  n_vecs * ncells / total AS skew_ratio
FROM counts, tot
"""


def _kmeans_assigned_ctes(
    n_centroids: int, iterations: int, dim: int, round_digits: int
) -> list[str]:
    """The unrolled fixed-iteration Lloyd's loop as CTE text — cents0
    (deterministic seeding: n smallest vec_ids, cell = rank), per
    iteration an assign → gather → rounded-mean cents trio, then the
    final ``assigned (vec_id, embedding, cidx)`` table against
    ``cents{iterations}``. Shared by ann_ivf_kmeans_topk and
    semantic_dedup so the two queries pin ONE refinement contract.

    Engine parity (mirrors `similarity.KMEANS_ROUND_DIGITS` /
    `KMEANS_SUM_SCALE`): per-cell per-dim sums run over round(x·2^30)
    BIGINTs — exact and summation-order-free on BOTH engines, so the
    mean each engine rounds to the grid is computed from bit-identical
    inputs (ADVICE r6 closed). Assignment argmax is cosine DESC, first
    centroid wins ties — the Spark builder's near-tie fallback
    recomputes with the same sequential folds this SQL uses. Empty cells
    keep the previous centroid (LEFT JOIN + CASE)."""
    cos_ec = _COS.format(a="e.embedding", b="c.cvec")
    ctes = [
        f"""cents0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {n_centroids})
)"""
    ]
    for it in range(1, iterations + 1):
        prev = f"cents{it - 1}"
        ctes.append(
            f"""assign{it} AS (
  SELECT vec_id, embedding, cidx FROM (
    SELECT e.vec_id, e.embedding, c.cidx,
      row_number() OVER (
        PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cidx ASC
      ) AS rn
    FROM embeddings e CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""gather{it} AS (
  SELECT cidx, count(*) AS n, list(embedding ORDER BY vec_id) AS vecs
  FROM assign{it} GROUP BY cidx
)"""
        )
        ctes.append(
            f"""cents{it} AS (
  SELECT s.cidx,
    CASE WHEN g.n IS NULL THEN s.cvec
         ELSE list_transform(range(1, {dim + 1}), d ->
                round(list_sum(list_transform(g.vecs,
                        v -> CAST(round(CAST(v[d] AS DOUBLE) * {KMEANS_SUM_SCALE}) AS BIGINT)))
                      / (g.n * {KMEANS_SUM_SCALE}),
                      {round_digits}))
    END AS cvec
  FROM {prev} s LEFT JOIN gather{it} g USING (cidx)
)"""
        )
    last = f"cents{iterations}"
    ctes.append(
        f"""assigned AS (
  SELECT vec_id, embedding, cidx FROM (
    SELECT e.vec_id, e.embedding, c.cidx,
      row_number() OVER (
        PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cidx ASC
      ) AS rn
    FROM embeddings e CROSS JOIN {last} c
  ) WHERE rn = 1
)"""
    )
    return ctes


def ann_ivf_kmeans_topk(
    query_vec_id: int,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 2,
    dim: int = 64,
    round_digits: int = 6,
) -> str:
    """SQL twin of similarity.kmeans_refine_centroids + ann_ivf_topk: the
    fixed-iteration Lloyd's loop unrolled into CTE pairs (assign → mean;
    the shared _kmeans_assigned_ctes fragment — parity contract there),
    then the standard IVF probe against the refined centroids."""
    cos_qc = _COS.format(a="q.embedding", b="c.cvec")
    cos_eq = _COS.format(a="e.embedding", b="q.embedding")
    last = f"cents{iterations}"
    ctes = _kmeans_assigned_ctes(n_centroids, iterations, dim, round_digits)
    ctes.append(f"q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id})")
    ctes.append(
        f"""probe AS (
  SELECT cidx FROM {last} c, q ORDER BY {cos_qc} DESC, cidx ASC LIMIT {n_probe}
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT e.vec_id, {cos_eq} AS cosine
FROM assigned e, q
WHERE e.cidx IN (SELECT cidx FROM probe) AND e.vec_id != {query_vec_id}
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""
    )


def semantic_dedup(
    n_centroids: int = 16,
    iterations: int = 2,
    threshold: float = COSINE_THRESHOLD,
    dim: int = 64,
    round_digits: int = 6,
) -> str:
    """SQL twin of dedup.semantic_dedup (SemDeDup, Abbas et al. 2023):
    the SAME unrolled Lloyd's k-means as ann_ivf_kmeans_topk (shared
    _kmeans_assigned_ctes fragment), then within-cell cosine pairs and
    the keep-first representative rule — is_kept = false iff a LOWER-id
    same-cell neighbor has cosine ≥ threshold. The pair cosine is the
    same sequential fold the in-window dedup_embedding_cosine pins."""
    cos_ab = _COS.format(a="a.embedding", b="b.embedding")
    ctes = _kmeans_assigned_ctes(n_centroids, iterations, dim, round_digits)
    ctes.append(
        f"""pairs AS (
  SELECT b.vec_id AS vec_b
  FROM assigned a JOIN assigned b
    ON a.cidx = b.cidx AND a.vec_id < b.vec_id
  WHERE {cos_ab} >= {threshold}
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT e.vec_id,
  CAST(e.cidx AS INTEGER) AS cell,
  e.vec_id NOT IN (SELECT vec_b FROM pairs) AS is_kept
FROM assigned e
"""
    )


def cosine_q8_topk(query_vec_id: int, k: int, levels: int = 127) -> str:
    """SQL twin of similarity.cosine_q8_topk: identical symmetric int8
    quantization (scale = max |x|, q = floor(x·127/scale + 0.5) — floor of
    +0.5 is round-half-up on both engines, unlike round()) and identical
    q·scale/127 dequantized cosine folds."""
    return f"""
WITH widened AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scaled AS (
  SELECT vec_id, v,
    list_max(list_transform(v, x -> abs(x))) AS scale
  FROM widened
),
quant AS (
  SELECT vec_id, scale,
    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
      ELSE CAST(floor(x * {float(levels)} / scale + 0.5) AS INTEGER) END) AS q
  FROM scaled
),
dequant AS (
  SELECT vec_id,
    list_transform(q, e -> e * scale / {float(levels)}) AS dq
  FROM quant
),
qv AS (SELECT dq FROM dequant WHERE vec_id = {query_vec_id})
SELECT e.vec_id, {_COS.format(a="e.dq", b="qv.dq")} AS cosine
FROM dequant e, qv
WHERE e.vec_id != {query_vec_id}
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def cosine_topk(query_vec_id: int, k: int) -> str:
    cos = _COS.format(a="e.embedding", b="q.embedding")
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id})
SELECT e.vec_id, {cos} AS cosine
FROM embeddings e, q
WHERE e.vec_id != {query_vec_id}
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def ann_lsh_topk(query_vec_id: int, k: int, probe_hamming: int = 1) -> str:
    planes = hyperplanes(N_PLANES, dim=64)
    cos = _COS.format(a="e.embedding", b="q.embedding")
    return f"""
WITH q AS (
  SELECT embedding, {_bucket_expr("embedding", planes)} AS bucket
  FROM embeddings WHERE vec_id = {query_vec_id}
),
bucketed AS (
  SELECT vec_id, embedding, {_bucket_expr("embedding", planes)} AS bucket
  FROM embeddings WHERE vec_id != {query_vec_id}
)
SELECT e.vec_id, {cos} AS cosine
FROM bucketed e, q
WHERE bit_count(xor(CAST(e.bucket AS BIGINT), CAST(q.bucket AS BIGINT))) <= {probe_hamming}
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def clean_corpus(min_quality: float = 0.5, min_tokens: int = 10) -> str:
    """SQL twin of pipeline.clean_corpus: quality pass ∩ exact-keeper ∩
    not-a-dropped-near-dup — same set algebra over the same oracle-checked
    stage formulas."""
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_stats()}) s
  WHERE s.quality_score >= {min_quality} AND s.ws_tokens >= {min_tokens}
),
ex AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, {_h60("text")} AS ch FROM documents)
  GROUP BY ch
),
fams AS ({minhash_duplicate_families()}),
dropped AS (SELECT doc_id FROM fams WHERE doc_id != family_rep)
SELECT q.doc_id FROM q
JOIN ex USING (doc_id)
ANTI JOIN dropped USING (doc_id)
"""


def minhash_duplicate_families(threshold: float = JACCARD_THRESHOLD) -> str:
    """SQL twin of dedup.minhash_duplicate_families: the verified MinHash
    near-dup pairs resolved into connected components by a recursive CTE
    (walk(id, lbl) holds every (vertex, reachable-vertex) pair of the
    symmetric pair graph; min over reachable = family representative —
    the same fixpoint the Spark min-label propagation converges to)."""
    return f"""
WITH RECURSIVE vp AS (
  SELECT doc_a, doc_b FROM ({minhash_near_duplicates(threshold)}) t
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION
  SELECT doc_b AS a, doc_a AS b FROM vp
),
walk(id, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id
),
lab AS (SELECT id AS doc_id, min(lbl) AS family_rep FROM walk GROUP BY id)
SELECT doc_id, family_rep,
  CAST(count(*) OVER (PARTITION BY family_rep) AS INTEGER) AS family_size
FROM lab
"""


def family_safe_split(
    test_pct: int = 10, threshold: float = JACCARD_THRESHOLD
) -> str:
    """SQL twin of pipeline.family_safe_split: every document buckets on
    its near-dup family REPRESENTATIVE (singletons on their own doc_id) —
    the same recursive-CTE family fixpoint as the dedup_families oracle
    composed with the train_test_split h60-bucket formula over the
    representative key, so a family can never straddle the split."""
    key = "COALESCE(f.family_rep, d.doc_id)"
    bucket = f"({_h60(key + '::VARCHAR')}) % 100"
    return f"""
WITH RECURSIVE vp AS (
  SELECT doc_a, doc_b FROM ({minhash_near_duplicates(threshold)}) t
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION
  SELECT doc_b AS a, doc_a AS b FROM vp
),
walk(id, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id
),
f AS (SELECT id AS doc_id, min(lbl) AS family_rep FROM walk GROUP BY id)
SELECT d.doc_id,
  {key} AS split_key,
  CAST({bucket} AS INTEGER) AS split_bucket,
  CASE WHEN {bucket} < {test_pct} THEN 'test' ELSE 'train' END AS split
FROM documents d LEFT JOIN f USING (doc_id)
"""


def dedup_graph_stats(threshold: float = JACCARD_THRESHOLD) -> str:
    """SQL twin of dedup.dedup_graph_stats: degree = count of symmetric
    pair-graph edges per vertex (pairs are distinct and doc_a < doc_b, so
    the symmetric UNION introduces no duplicate edges and the count is
    the true degree), families via the same recursive-CTE fixpoint as the
    dedup_families oracle. All-integer columns."""
    return f"""
WITH RECURSIVE vp AS (
  SELECT doc_a, doc_b FROM ({minhash_near_duplicates(threshold)}) t
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION
  SELECT doc_b AS a, doc_a AS b FROM vp
),
walk(id, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id
),
lab AS (SELECT id AS doc_id, min(lbl) AS family_rep FROM walk GROUP BY id),
fam AS (
  SELECT doc_id, family_rep,
    CAST(count(*) OVER (PARTITION BY family_rep) AS INTEGER) AS family_size
  FROM lab
),
deg AS (
  SELECT a AS doc_id, CAST(count(*) AS INTEGER) AS degree
  FROM edges GROUP BY a
)
SELECT f.doc_id, d.degree, f.family_rep, f.family_size
FROM fam f JOIN deg d USING (doc_id)
"""


def dsir_select(
    target_source: str,
    n_buckets: int = 1024,
    keep_fraction: float = 0.25,
    scale: int = 1 << 30,
) -> str:
    """SQL twin of pipeline.dsir_select with the target sample expressed
    as a source slice of the same table (the driver wiring). Parity:
    h60-bucketed bigrams (w1 || ' ' || w2 — concat_ws on the Spark side,
    equal on non-null tokens), exact BIGINT count products, ONE double
    division per bucket floored into fixed-point (floor, not round),
    order-free BIGINT sums, final divisions in the Spark side's order;
    selection rank = (dsir_score DESC, doc_id ASC) over hash-identical
    doubles, cut at ceil(keep_fraction · n_scored) on both engines."""
    pair = "w1 || ' ' || w2"
    b_expr = f"({_h60(pair)}) % {n_buckets}"
    return f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKENS.format(x="lower(text)")} AS w FROM documents
),
big AS (
  SELECT doc_id, source, w[i] AS w1, w[i + 1] AS w2
  FROM (
    SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
    FROM toks WHERE len(w) >= 2
  )
),
rawb AS (SELECT doc_id, {b_expr} AS b FROM big),
tgtb AS (SELECT {b_expr} AS b FROM big WHERE source = '{target_source}'),
cr AS (SELECT b, COUNT(*) AS c_r FROM rawb GROUP BY b),
ct AS (SELECT b, COUNT(*) AS c_t FROM tgtb GROUP BY b),
nr AS (SELECT COUNT(*) AS n_r FROM rawb),
nt AS (SELECT COUNT(*) AS n_t FROM tgtb),
ratio AS (
  SELECT cr.b,
    CAST(floor(
      ((CAST(COALESCE(ct.c_t, 0) + 1 AS DOUBLE)
        * CAST(nr.n_r + {n_buckets} AS DOUBLE))
       / (CAST(cr.c_r + 1 AS DOUBLE)
          * CAST(nt.n_t + {n_buckets} AS DOUBLE))) * {scale}
    ) AS BIGINT) AS q
  FROM cr LEFT JOIN ct USING (b) CROSS JOIN nr CROSS JOIN nt
),
scores AS (
  SELECT r.doc_id,
    CAST(COUNT(*) AS INTEGER) AS n_grams,
    CAST(SUM(q) AS BIGINT) AS sum_ratio_q,
    (CAST(SUM(q) AS DOUBLE) / COUNT(*)) / {float(scale)} AS dsir_score
  FROM rawb r JOIN ratio USING (b)
  GROUP BY r.doc_id
)
SELECT doc_id, n_grams, sum_ratio_q, dsir_score,
  row_number() OVER (ORDER BY dsir_score DESC, doc_id ASC)
    <= ceil({keep_fraction} * count(*) OVER ()) AS selected
FROM scores
"""


def decontaminate(test_pct: int = 10) -> str:
    """SQL twin of pipeline.decontaminate: train docs sharing any word-
    3-gram 28-bit hash with the test split (same md5 bucket split, same
    shingle formula as the minhash oracles)."""
    bucket = f"({_h60('doc_id::VARCHAR')}) % 100"
    return f"""
WITH {_word_shingle_shset_cte().strip()},
split AS (SELECT doc_id, ({bucket}) < {test_pct} AS is_test FROM documents),
g AS (
  SELECT s.doc_id, split.is_test, unnest(s.shingles) AS gram
  FROM shset s JOIN split USING (doc_id)
),
test_grams AS (SELECT DISTINCT gram FROM g WHERE is_test),
dirty AS (
  SELECT DISTINCT doc_id FROM g
  WHERE NOT is_test AND gram IN (SELECT gram FROM test_grams)
)
SELECT t.doc_id,
  CAST(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
    AS contaminated
FROM (SELECT doc_id FROM split WHERE NOT is_test) t
LEFT JOIN dirty d USING (doc_id)
"""


def source_mix_weights(group_col: str = "source") -> str:
    """SQL twin of text.source_mix_weights (sqrt(n_docs/max) — division
    and sqrt are both correctly rounded, so the double is bit-identical)."""
    return f"""
WITH per_source AS (
  SELECT {group_col},
    COUNT(*) AS n_docs,
    SUM(len({_TOKENS.format(x="text")})) AS n_tokens
  FROM documents GROUP BY {group_col}
)
SELECT {group_col},
  CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  sqrt(n_docs / (max(n_docs) OVER ())) AS weight
FROM per_source
"""


def ngram_topk_per_lang(n: int = 2, k: int = 5) -> str:
    """SQL twin of text.ngram_topk_per_lang (non-distinct word n-grams per
    the shared shingle convention; count desc, gram asc total order)."""
    return f"""
WITH toks AS (
  SELECT lang, {_TOKENS.format(x="text")} AS w FROM documents
  WHERE text IS NOT NULL
),
g AS (SELECT lang, unnest({_shingles("w", n)}) AS gram FROM toks),
counts AS (SELECT lang, gram, COUNT(*) AS gram_count FROM g GROUP BY lang, gram)
SELECT lang, gram, CAST(gram_count AS BIGINT) AS gram_count, gram_rank
FROM (
  SELECT lang, gram, gram_count,
    CAST(row_number() OVER (
      PARTITION BY lang ORDER BY gram_count DESC, gram ASC
    ) AS INTEGER) AS gram_rank
  FROM counts
)
WHERE gram_rank <= {k}
"""


def tfidf_top_terms(k: int = 3) -> str:
    """SQL twin of text.tfidf_top_terms (linear idf: tf * (N/df) — one
    correctly-rounded division then multiplication, no transcendentals)."""
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(x="lower(text)")} AS w FROM documents
),
tok AS (SELECT doc_id, unnest(w) AS token FROM toks),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (
  SELECT token, COUNT(*) AS df_docs
  FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df_docs,
    tf.tf * (n.n_docs / dfreq.df_docs) AS score
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df_docs, score, term_rank
FROM (
  SELECT doc_id, token,
    CAST(tf AS INTEGER) AS tf,
    CAST(df_docs AS INTEGER) AS df_docs,
    score,
    CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, token ASC
    ) AS INTEGER) AS term_rank
  FROM scored
)
WHERE term_rank <= {k}
"""


def normalize_text() -> str:
    """SQL twin of text.normalize_text: nfc_normalize (pinned equal to
    Python unicodedata NFC) then the same fixed-order regexp_replace
    chain with EXPLICIT character classes (never \\s — Python re's \\s is
    Unicode-wide, RE2's is not; an implicit class here would diverge on
    exotic whitespace), then the same NULL-safe change flag and char
    delta. Known oracle-engine limit: DuckDB's nfc_normalize truncates
    at \\x00 in some paths (utf8proc C-string behavior), so NUL-bearing
    text can't be oracle-checked — the kernel's (correct) NUL handling
    is pinned Python-side instead (tests/test_beyond.py); sf parquet
    text contains no NULs."""
    clean = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "nfc_normalize(text),"
        " '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),"
        " '[ \\t]+', ' ', 'g'),"
        " '\\n{3,}', chr(10) || chr(10), 'g'),"
        " '^[ \\t\\n\\r]+|[ \\t\\n\\r]+$', '', 'g')"
    )
    return f"""
WITH base AS (SELECT doc_id, text, {clean} AS clean_text FROM documents)
SELECT doc_id, clean_text,
  (text IS DISTINCT FROM clean_text) AS changed,
  CAST(len(text) - len(clean_text) AS INTEGER) AS delta_chars
FROM base
"""


def lm_bigram_score(scale: int = 1_000_000_000) -> str:
    """SQL twin of text.lm_bigram_score (self-trained corpus LM): Laplace
    bigram probability p = (c2+1)/(c1+V) as one correctly-rounded integer
    division, floored into fixed-point (floor, not round — round-half
    ties differ between engines), summed as BIGINT (order-free — the
    integer-cents rule), then the two final divisions in the same order
    as the Spark side ((sum/n)/scale). No transcendentals (the tfidf
    rule): mean-prob ranks like mean-log-prob for filtering."""
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(x="lower(text)")} AS w FROM documents
),
big AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w))) AS i
    FROM toks WHERE len(w) >= 2
  )
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
v AS (
  SELECT COUNT(DISTINCT t) AS v FROM (
    SELECT w1 AS t FROM big UNION ALL SELECT w2 AS t FROM big
  )
),
scored AS (
  SELECT b.doc_id,
    CAST(floor(
      ((COALESCE(c2.c2, 0) + 1) / (COALESCE(c1.c1, 0) + v.v)) * {scale}
    ) AS BIGINT) AS q
  FROM big b
  LEFT JOIN c2 USING (w1, w2)
  LEFT JOIN c1 USING (w1)
  CROSS JOIN v
)
SELECT doc_id,
  CAST(COUNT(*) AS INTEGER) AS n_bigrams,
  CAST(SUM(q) AS BIGINT) AS sum_prob_q9,
  (CAST(SUM(q) AS DOUBLE) / COUNT(*)) / {float(scale)} AS avg_prob
FROM scored GROUP BY doc_id
"""


def lm_bigram_score_by_lang(scale: int = 1_000_000_000) -> str:
    """SQL twin of text.lm_bigram_score_by_lang — the :func:`lm_bigram_score`
    formula with every count table keyed by ``lang`` (CCNet's one-model-
    per-language design, Wenzek et al. 2020): c2 per (lang, w1, w2), c1
    per (lang, w1), V per lang, and the vocab join INNER on lang so
    documents of an unmodeled language drop on both engines (NULL lang
    never equals NULL under either engine's join — same drop). The
    per-language formula is NOT spanned by the global twin (a document's
    smoothing denominator is its OWN language's vocabulary), so this row
    sits in-window."""
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {_TOKENS.format(x="lower(text)")} AS w FROM documents
),
big AS (
  SELECT doc_id, lang, w[i] AS w1, w[i + 1] AS w2
  FROM (
    SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i
    FROM toks WHERE len(w) >= 2
  )
),
c2 AS (
  SELECT lang, w1, w2, COUNT(*) AS c2 FROM big GROUP BY lang, w1, w2
),
c1 AS (SELECT lang, w1, COUNT(*) AS c1 FROM big GROUP BY lang, w1),
v AS (
  SELECT lang, COUNT(DISTINCT t) AS v FROM (
    SELECT lang, w1 AS t FROM big UNION ALL SELECT lang, w2 AS t FROM big
  ) GROUP BY lang
),
scored AS (
  SELECT b.doc_id, b.lang,
    CAST(floor(
      ((COALESCE(c2.c2, 0) + 1) / (COALESCE(c1.c1, 0) + v.v)) * {scale}
    ) AS BIGINT) AS q
  FROM big b
  LEFT JOIN c2 USING (lang, w1, w2)
  LEFT JOIN c1 USING (lang, w1)
  JOIN v USING (lang)
)
SELECT doc_id, lang,
  CAST(COUNT(*) AS INTEGER) AS n_bigrams,
  CAST(SUM(q) AS BIGINT) AS sum_prob_q9,
  (CAST(SUM(q) AS DOUBLE) / COUNT(*)) / {float(scale)} AS avg_prob
FROM scored GROUP BY doc_id, lang
"""


def length_percentiles() -> str:
    """SQL twin of text.length_percentiles (percentile_disc semantics:
    element at rank ceil(p*n) of the (n_tokens, doc_id) sort)."""
    pick = "MAX(CASE WHEN rn = CEIL({p} * n) THEN n_tokens END)"
    return f"""
WITH base AS (
  SELECT doc_id, lang, len({_TOKENS.format(x="text")}) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
ranked AS (
  SELECT lang, n_tokens,
    row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY lang) AS n
  FROM base
)
SELECT lang,
  CAST(MAX(n) AS BIGINT) AS n_docs,
  CAST({pick.format(p=0.5)} AS INTEGER) AS p50_tokens,
  CAST({pick.format(p=0.9)} AS INTEGER) AS p90_tokens,
  CAST({pick.format(p=0.99)} AS INTEGER) AS p99_tokens
FROM ranked GROUP BY lang
"""


def length_percentiles_bpe() -> str:
    """SQL twin of text.length_percentiles_bpe: the length_percentiles
    percentile_disc frame verbatim over the shared BPE-encode CTE
    block's per-doc piece sums (bpe_token_stats' counts) — a
    composition-spanned tail row, like pack_sequences_bpe. Token-less
    docs drop via the inner join (the bpe_token_stats convention)."""
    pick = "MAX(CASE WHEN rn = CEIL({p} * n) THEN n_tokens END)"
    return f"""
WITH RECURSIVE {_bpe_ctes()},
doc_bpe AS (
  SELECT doc_id, SUM(c.n) AS n_tokens FROM toks JOIN counts c USING (t)
  GROUP BY doc_id
),
base AS (
  SELECT d.doc_id, d.lang, b.n_tokens
  FROM documents d JOIN doc_bpe b USING (doc_id)
),
ranked AS (
  SELECT lang, n_tokens,
    row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY lang) AS n
  FROM base
)
SELECT lang,
  CAST(MAX(n) AS BIGINT) AS n_docs,
  CAST({pick.format(p=0.5)} AS INTEGER) AS p50_bpe_tokens,
  CAST({pick.format(p=0.9)} AS INTEGER) AS p90_bpe_tokens,
  CAST({pick.format(p=0.99)} AS INTEGER) AS p99_bpe_tokens
FROM ranked GROUP BY lang
"""


def dup_span_stats(width: int = 8) -> str:
    """SQL twin of dedup.dup_span_stats (60-bit md5 window hashes; a
    window instance is duplicated iff its hash occurs in >= 2 distinct
    docs)."""
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(x="text")} AS w FROM documents
  WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, {_h60("s")} AS h
  FROM (SELECT doc_id, unnest({_shingles("w", width)}) AS s FROM toks)
),
cross_doc AS (
  SELECT h FROM (
    SELECT h, COUNT(*) AS nd FROM (SELECT DISTINCT doc_id, h FROM g) GROUP BY h
  ) WHERE nd >= 2
),
per AS (
  SELECT g.doc_id,
    COUNT(*) AS n_windows,
    COALESCE(SUM(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END), 0) AS dup_windows
  FROM g LEFT JOIN cross_doc c ON g.h = c.h
  GROUP BY g.doc_id
)
SELECT doc_id,
  CAST(n_windows AS INTEGER) AS n_windows,
  CAST(dup_windows AS INTEGER) AS dup_windows,
  dup_windows / n_windows AS dup_frac
FROM per
"""


def remove_dup_spans(width: int = 8) -> str:
    """SQL twin of dedup.remove_dup_spans: the stats oracle's window/
    cross-doc machinery plus min-doc ownership, positional coverage
    (clamped to the token count, so the <width whole-text window covers
    everything), and an ordered token rebuild. Engine-parity notes:
    DuckDB list slices are end-inclusive (w[i:i+width-1] = width words),
    array_to_string of an empty slice is NULL → COALESCE '', list(...
    ORDER BY pos) makes the rebuild order explicit."""
    w1 = width - 1
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(x="text")} AS w FROM documents
  WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, u['i'] AS i, {_h60("u['s']")} AS h
  FROM (
    SELECT doc_id,
      unnest([{{'i': i - 1,
                's': COALESCE(array_to_string(w[i:i+{w1}], ' '), '')}}
              for i in range(1, greatest(len(w) - {w1}, 1) + 1)]) AS u
    FROM toks
  )
),
own AS (
  SELECT h, min(doc_id) AS owner
  FROM (SELECT DISTINCT doc_id, h FROM g)
  GROUP BY h HAVING count(*) >= 2
),
cov AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT g.doc_id,
      unnest(range(g.i,
                   CASE WHEN t.n >= {width}
                        THEN least(g.i + {width}, t.n)
                        ELSE t.n END)) AS pos
    FROM g
    JOIN own ON g.h = own.h AND g.doc_id != own.owner
    JOIN (SELECT doc_id, len(w) AS n FROM toks) t ON g.doc_id = t.doc_id
  )
),
tok AS (
  SELECT doc_id, u['pos'] AS pos, u['word'] AS word
  FROM (
    SELECT doc_id,
      unnest([{{'pos': i - 1, 'word': w[i]}} for i in range(1, len(w) + 1)]) AS u
    FROM toks
  )
),
kept AS (
  SELECT t.doc_id, t.pos, t.word FROM tok t
  ANTI JOIN cov ON t.doc_id = cov.doc_id AND t.pos = cov.pos
),
agg AS (
  SELECT doc_id,
    array_to_string(list(word ORDER BY pos), ' ') AS cleaned_text,
    count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(a.cleaned_text, '') AS cleaned_text,
  CAST(len(d.w) AS INTEGER) AS n_tokens,
  CAST(len(d.w) - COALESCE(a.kept_n, 0) AS INTEGER) AS removed_tokens
FROM toks d LEFT JOIN agg a USING (doc_id)
"""


def gopher_rules() -> str:
    """SQL twin of text.gopher_rules: identical whitespace tokenization
    (_TOKENS), identical string/regex formulas (RE2-safe subset — no
    lookarounds, line anchors spelled (?:\\A|\\n)/(?:\\n|\\z) and
    whitespace as an explicit class because Java's (?m)^/$/\\s and RE2's
    disagree around \\r, \\x0B, and Unicode line separators), all-integer
    evidence and cross-multiplied ratio rules so no float ever crosses
    the hash. CRLF parity pinned in tests/test_beyond.py against a
    crafted in-memory documents table on BOTH engines."""
    from flink_clickstream_processor_msk_spark.operators.text import (
        GOPHER_MAX_WORDS,
        GOPHER_MIN_WORDS,
        LANG_PROFILES,
    )

    stop_list = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return rf"""
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
t AS (
  SELECT doc_id, text, {_TOKENS.format(x="text")} AS w FROM d
),
ev AS (
  SELECT doc_id,
    CAST(len(w) AS INTEGER) AS n_words,
    CAST(length(regexp_replace(text, '[ \t\n\r\f]', '', 'g')) AS INTEGER)
      AS n_word_chars,
    CAST(length(text) - length(replace(text, '#', '')) AS INTEGER)
      AS n_hash,
    CAST((length(text) - length(replace(text, '...', ''))) // 3
      AS INTEGER) AS n_ellipsis,
    CAST(len(regexp_split_to_array(text, '\n')) AS INTEGER) AS n_lines,
    CAST(len(regexp_extract_all(text, '(?:\A|\n)[ \t]*[-*•]')) AS INTEGER)
      AS n_bullet_lines,
    CAST(len(regexp_extract_all(text, '\.\.\.(?:\n|\z)')) AS INTEGER)
      AS n_ellipsis_lines,
    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
      AS INTEGER) AS n_alpha_words,
    CAST(len(list_distinct(list_filter(
      list_transform(w, x -> lower(x)), x -> x IN ({stop_list}))))
      AS INTEGER) AS n_stop_distinct
  FROM t
)
SELECT *,
  (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
   AND 3*n_words <= n_word_chars AND n_word_chars <= 10*n_words
   AND 10*(n_hash + n_ellipsis) < n_words
   AND 10*n_bullet_lines < 9*n_lines
   AND 10*n_ellipsis_lines < 3*n_lines
   AND 5*n_alpha_words >= 4*n_words
   AND n_stop_distinct >= 2) AS passes_gopher
FROM ev
"""


def resample_corpus(group_col: str = "lang") -> str:
    """SQL twin of text.resample_corpus (salted md5 draw vs weight*2^20 —
    exact int->double promotion, correctly rounded multiply)."""
    return f"""
WITH w AS ({source_mix_weights(group_col)})
SELECT d.doc_id, d.{group_col}, w.weight
FROM documents d JOIN w USING ({group_col})
WHERE (({_h60("d.doc_id::VARCHAR || ':resample'")}) % {1 << 20})
      < w.weight * {float(1 << 20)}
"""


def _pq_coding_ctes(
    query_vec_id: int,
    m: int,
    k_cb: int,
    dim: int,
    iterations: int = 0,
    round_digits: int = 6,
) -> str:
    """The PQ coding pipeline as a reusable CTE fragment — base (doubled
    vectors), sub-codebooks, per-subspace argmin assignment, the query
    LUT, and ordered-fold ADC scores. THE one place the PQ/ADC SQL
    contract lives; ann_pq_topk, ann_ivfpq_topk, and ann_pq_kmeans_topk
    all compose it, so a formula change cannot desync the oracles (mirror
    of the Spark side's shared _adc_lut/_adc_score).

    ``iterations`` > 0 unrolls that many Lloyd's refinement passes over
    the seed sub-codebooks (assign → per-(subspace, code) slice means
    rounded to the ``round_digits`` grid, empty codes keep their
    centroid) — the SQL twin of similarity.pq_refine_codebooks, same
    engine-parity contract as ann_ivf_kmeans_topk's unrolled loop."""
    d0 = dim // m
    d2_ec = (
        f"list_sum(list_transform(range(1, {d0 + 1}), "
        f"i -> (e.v[cb.s*{d0} + i] - cb.cvec[i]) * (e.v[cb.s*{d0} + i] - cb.cvec[i])))"
    )
    d2_qc = (
        f"list_sum(list_transform(range(1, {d0 + 1}), "
        f"i -> (pqq.v[cb.s*{d0} + i] - cb.cvec[i]) * (pqq.v[cb.s*{d0} + i] - cb.cvec[i])))"
    )
    refine = []
    for it in range(1, iterations + 1):
        prev = f"cb{it - 1}"
        refine.append(
            f"""pq_ref_assign{it} AS (
  SELECT vec_id, s, cidx FROM (
    SELECT e.vec_id, cb.s, cb.cidx,
      row_number() OVER (
        PARTITION BY e.vec_id, cb.s ORDER BY {d2_ec} ASC, cb.cidx ASC
      ) AS rn
    FROM base e CROSS JOIN {prev} cb
  ) WHERE rn = 1
),
pq_gather{it} AS (
  SELECT a.s, a.cidx, count(*) AS n, list(e.v ORDER BY e.vec_id) AS vecs
  FROM pq_ref_assign{it} a JOIN base e USING (vec_id)
  GROUP BY a.s, a.cidx
),
cb{it} AS (
  SELECT p.s, p.cidx,
    CASE WHEN g.n IS NULL THEN p.cvec
         ELSE list_transform(range(1, {d0 + 1}), d ->
                round(list_sum(list_transform(g.vecs,
                        v -> CAST(round(v[p.s*{d0} + d] * {KMEANS_SUM_SCALE}) AS BIGINT)))
                      / (g.n * {KMEANS_SUM_SCALE}),
                      {round_digits}))
    END AS cvec
  FROM {prev} p LEFT JOIN pq_gather{it} g ON p.s = g.s AND p.cidx = g.cidx
)"""
        )
    refine_sql = (",\n" + ",\n".join(refine)) if refine else ""
    return f"""base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
subs AS (SELECT unnest(range(0, {m})) AS s),
cb0 AS (
  SELECT subs.s AS s,
    row_number() OVER (PARTITION BY subs.s ORDER BY b.vec_id) - 1 AS cidx,
    b.v[subs.s*{d0} + 1 : subs.s*{d0} + {d0}] AS cvec
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT {k_cb}) b
  CROSS JOIN subs
){refine_sql},
cb AS (SELECT s, cidx, cvec FROM cb{iterations}),
pq_assign AS (
  SELECT vec_id, s, cidx FROM (
    SELECT e.vec_id, cb.s, cb.cidx,
      row_number() OVER (
        PARTITION BY e.vec_id, cb.s ORDER BY {d2_ec} ASC, cb.cidx ASC
      ) AS rn
    FROM base e CROSS JOIN cb
  ) WHERE rn = 1
),
pqq AS (SELECT v FROM base WHERE vec_id = {query_vec_id}),
lut AS (SELECT cb.s, cb.cidx, {d2_qc} AS pd FROM cb, pqq),
pq_scored AS (
  SELECT a.vec_id, list_sum(list(l.pd ORDER BY a.s)) AS adc_dist
  FROM pq_assign a JOIN lut l ON a.s = l.s AND a.cidx = l.cidx
  GROUP BY a.vec_id
)"""


def ann_pq_topk(
    query_vec_id: int, k: int, m: int = 8, k_cb: int = 16, dim: int = 64
) -> str:
    """SQL twin of similarity.ann_pq_topk: same deterministic sub-codebooks
    (subspace slices of the k_cb smallest vec_ids), same argmin-squared-L2
    assignment (d2 asc, first centroid wins ties — the Spark builder's
    near-tie fallback recomputes with these sequential folds), same ADC
    scoring (per-subspace LUT partials summed in ascending-subspace order
    via an ordered list fold, matching Spark's left-to-right add chain)."""
    return f"""
WITH {_pq_coding_ctes(query_vec_id, m, k_cb, dim)}
SELECT vec_id, adc_dist FROM pq_scored
WHERE vec_id != {query_vec_id}
ORDER BY adc_dist ASC, vec_id ASC
LIMIT {k}
"""


def ann_pq_kmeans_topk(
    query_vec_id: int,
    k: int,
    m: int = 8,
    k_cb: int = 16,
    dim: int = 64,
    iterations: int = 2,
    round_digits: int = 6,
) -> str:
    """SQL twin of similarity.pq_refine_codebooks + ann_pq_topk: the
    fixed-iteration per-subspace Lloyd's loop unrolled into CTEs (the
    `iterations` knob of the shared _pq_coding_ctes fragment), then the
    standard ADC scoring against the refined sub-codebooks — the PQ
    analog of ann_ivf_kmeans_topk, same rounded-mean parity contract."""
    return f"""
WITH {_pq_coding_ctes(query_vec_id, m, k_cb, dim, iterations, round_digits)}
SELECT vec_id, adc_dist FROM pq_scored
WHERE vec_id != {query_vec_id}
ORDER BY adc_dist ASC, vec_id ASC
LIMIT {k}
"""


def ann_ivfpq_topk(
    query_vec_id: int,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_cb: int = 16,
    dim: int = 64,
) -> str:
    """SQL twin of similarity.ann_ivfpq_topk: the ann_ivf_topk routing
    CTEs (cosine argmax assignment, n_probe nearest cells) composed with
    the shared _pq_coding_ctes fragment — candidates are the probed
    cells' vectors, ranked by the same ordered-fold ADC distance."""
    cos_ec = _COS.format(a="e.embedding", b="c.cvec")
    cos_qc = _COS.format(a="iq.embedding", b="c.cvec")
    return f"""
WITH ivf_cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, embedding AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {n_centroids})
),
iq AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cidx FROM ivf_cents c, iq ORDER BY {cos_qc} DESC, cidx ASC LIMIT {n_probe}
),
cell_of AS (
  SELECT vec_id, cidx FROM (
    SELECT e.vec_id, c.cidx,
      row_number() OVER (
        PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cidx ASC
      ) AS rn
    FROM embeddings e CROSS JOIN ivf_cents c
  ) WHERE rn = 1
),
{_pq_coding_ctes(query_vec_id, m, k_cb, dim)}
SELECT sc.vec_id, sc.adc_dist
FROM pq_scored sc
JOIN cell_of co ON sc.vec_id = co.vec_id
WHERE co.cidx IN (SELECT cidx FROM probe) AND sc.vec_id != {query_vec_id}
ORDER BY sc.adc_dist ASC, sc.vec_id ASC
LIMIT {k}
"""


def pricing_summary(cutoff: str = "1998-09-02") -> str:
    """SQL twin of relational.pricing_summary (integer-cents sums — exact
    and summation-order-free on both engines; rescaling divisions share
    the Spark expression shape)."""
    return f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus,
    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c,
    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
    CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{cutoff}'
),
g AS (
  SELECT l_returnflag, l_linestatus,
    SUM(qty_c) AS qc,
    SUM(ep_c) AS bc,
    SUM(ep_c * (100 - disc_pct)) AS dc,
    SUM(ep_c * (100 - disc_pct) * (100 + tax_pct)) AS cc,
    SUM(disc_pct) AS sdisc,
    COUNT(*) AS n
  FROM c GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
  qc / 100.0 AS sum_qty,
  bc / 100.0 AS sum_base_price,
  dc / 10000.0 AS sum_disc_price,
  cc / 1000000.0 AS sum_charge,
  (qc / 100.0) / n AS avg_qty,
  (bc / 100.0) / n AS avg_price,
  (sdisc / 100.0) / n AS avg_disc,
  CAST(n AS BIGINT) AS count_order
FROM g
ORDER BY l_returnflag, l_linestatus
"""


def shipping_priority(
    segment: str = "BUILDING", date: str = "1998-01-01", k: int = 10
) -> str:
    """SQL twin of relational.shipping_priority (same integer-cents
    revenue, same deterministic top-k cut)."""
    return f"""
SELECT o.o_orderkey AS l_orderkey,
  SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = '{segment}'
  AND o.o_orderdate < TIMESTAMP '{date}'
  AND l.l_shipdate > TIMESTAMP '{date}'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {k}
"""


def regional_supplier_volume(
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> str:
    """SQL twin of relational.regional_supplier_volume (integer-cents
    revenue; same locality join condition)."""
    return f"""
SELECT n.n_name,
  SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM region r
JOIN nation n ON r.r_regionkey = n.n_regionkey
JOIN supplier s ON n.n_nationkey = s.s_nationkey
JOIN customer c ON c.c_nationkey = s.s_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_suppkey = s.s_suppkey
WHERE r.r_name = '{region_name}'
  AND o.o_orderdate >= TIMESTAMP '{date_from}'
  AND o.o_orderdate < TIMESTAMP '{date_to}'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name ASC
"""


def type_share_revenue(
    p_type: str = "ECONOMY",
    date_from: str = "1996-03-01",
    date_to: str = "1996-04-01",
) -> str:
    """SQL twin of relational.type_share_revenue (one division then *100.0
    over two exact integer sums)."""
    rev = (
        "CAST(round(l.l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l.l_discount * 100) AS BIGINT))"
    )
    return f"""
WITH g AS (
  SELECT
    SUM(CASE WHEN p.p_type = '{p_type}' THEN {rev} ELSE 0 END) AS tr,
    SUM({rev}) AS ar
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{date_from}'
    AND l.l_shipdate < TIMESTAMP '{date_to}'
)
SELECT (tr / ar) * 100.0 AS type_revenue_pct,
  tr / 10000.0 AS type_revenue,
  ar / 10000.0 AS total_revenue
FROM g
"""


def pricing_rollup(cutoff: str = "1998-09-02") -> str:
    """SQL twin of relational.pricing_rollup (DuckDB ROLLUP emits the same
    subtotal rows; GROUPING() uses the same first-arg-is-MSB bitmask as
    Spark's grouping_id; integer-cents sums as in pricing_summary)."""
    return f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus,
    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c,
    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{cutoff}'
)
SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
  l_returnflag, l_linestatus,
  SUM(qty_c) / 100.0 AS sum_qty,
  SUM(ep_c * (100 - disc_pct)) / 10000.0 AS sum_disc_price,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM c
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def pricing_cube(cutoff: str = "1998-09-02") -> str:
    """SQL twin of relational.pricing_cube (DuckDB CUBE emits the same
    4-set lattice; GROUPING() uses the same first-arg-is-MSB bitmask as
    Spark's grouping_id; integer-cents sums as in pricing_summary)."""
    return f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus,
    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c,
    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{cutoff}'
)
SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
  l_returnflag, l_linestatus,
  SUM(qty_c) / 100.0 AS sum_qty,
  SUM(ep_c * (100 - disc_pct)) / 10000.0 AS sum_disc_price,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM c
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def no_return_customers() -> str:
    """SQL twin of relational.no_return_customers (EXISTS / NOT EXISTS ≡
    the Spark plan's LeftSemi / LeftAnti joins — integer counts only)."""
    return """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (
    SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
GROUP BY n.n_name
ORDER BY n_customers DESC, n.n_name ASC
"""


def nation_trade_roles(min_supplier_acctbal: float = 5000.0) -> str:
    """SQL twin of relational.nation_trade_roles (INTERSECT / EXCEPT have
    identical distinct-set semantics to Spark's intersect / subtract)."""
    return f"""
WITH cn AS (SELECT c_nationkey AS nationkey FROM customer),
sn AS (
  SELECT s_nationkey AS nationkey FROM supplier
  WHERE s_acctbal >= {min_supplier_acctbal}
),
roles AS (
  SELECT nationkey, 'both' AS role
  FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
  UNION ALL
  SELECT nationkey, 'customer_only' AS role
  FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
  UNION ALL
  SELECT nationkey, 'supplier_only' AS role
  FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
)
SELECT n.n_name, r.role
FROM roles r JOIN nation n ON r.nationkey = n.n_nationkey
"""


def chunk_documents(chunk_tokens: int = 64, stride: int = 48) -> str:
    """SQL twin of text.chunk_documents (same chunk-count formula —
    float division then ceil, both correctly rounded — and the same
    ''.join/md5 per chunk)."""
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(x="text")} AS w FROM documents
  WHERE text IS NOT NULL
),
counted AS (
  SELECT doc_id, w, len(w) AS n,
    CASE WHEN len(w) <= {chunk_tokens} THEN 1
         ELSE 1 + CAST(ceil((len(w) - {chunk_tokens}) / {float(stride)}) AS INTEGER)
    END AS k
  FROM toks
),
idx AS (
  SELECT doc_id, w, CAST(unnest(range(0, k)) AS INTEGER) * {stride} AS chunk_start
  FROM counted
)
SELECT doc_id,
  chunk_start,
  CAST(len(w[chunk_start + 1 : chunk_start + {chunk_tokens}]) AS INTEGER) AS chunk_len,
  {_h60(f"COALESCE(array_to_string(w[chunk_start + 1 : chunk_start + {chunk_tokens}], ' '), '')")} AS chunk_hash
FROM idx
"""


def profile_documents() -> str:
    """SQL twin of text.profile_table over the documents table (integer
    counts only — nothing to drift)."""
    from flink_clickstream_processor_msk_spark.operators.text import (
        DOCUMENTS_PROFILE_COLUMNS,
    )

    branches = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, COUNT({c}) AS n_nonnull,"
        f" COUNT(DISTINCT {c}) AS n_distinct FROM documents"
        for c in DOCUMENTS_PROFILE_COLUMNS
    )
    return branches


def decontaminate_semantic(test_pct: int = 10, threshold: float = COSINE_THRESHOLD) -> str:
    """SQL twin of pipeline.decontaminate_semantic: the embeddings table
    split by the same md5 bucket formula as train_test_split (vec_id in
    place of doc_id), every train x test cosine evaluated with the exact
    sequential fold (_COS — the dedup_embedding_cosine contract), hits
    counted as integers so no matmul-order double ever reaches the hash."""
    cos = _COS.format(a="t.embedding", b="e.embedding")
    bucket = f"({_h60('vec_id::VARCHAR')}) % 100"
    hit = f"CASE WHEN {cos} >= {threshold!r} THEN 1 ELSE 0 END"
    return f"""
WITH split AS (
  SELECT vec_id, embedding, ({bucket}) AS b FROM embeddings
)
SELECT t.vec_id,
  CAST(COALESCE(SUM({hit}), 0) AS BIGINT) AS n_test_hits,
  COALESCE(SUM({hit}), 0) > 0 AS contaminated
FROM (SELECT * FROM split WHERE b >= {test_pct}) t
LEFT JOIN (SELECT * FROM split WHERE b < {test_pct}) e ON TRUE
GROUP BY t.vec_id
"""
