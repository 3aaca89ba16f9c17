"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword/n-gram heuristic), quality scoring (length / punct /
digit / stopword counts), token counting (whitespace + BPE-ish regex), and
document fingerprinting (md5 + 64-bit rolling FNV). All embarrassingly
parallel ``map_batches`` stages — vectorized pandas/numpy kernels, no
Python-per-row loops in the counting paths.

The reference logs per-document char/paragraph/row counts during extraction
(reference: utils.py:62,119,145-151,179-195) but never aggregates them;
these operators generalize that bookkeeping into first-class columns.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

__all__ = [
    "canonicalize_url",
    "add_canonical_url",
    "add_token_counts",
    "add_quality_counts",
    "add_fingerprints",
    "winnow_fingerprints",
    "WinnowBatch",
    "LangIdBatch",
    "HashClassifierBatch",
    "STOPWORDS",
]

# BPE-ish word/piece splitter: words, numbers, or single non-space symbols.
BPE_ISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

# ASCII punctuation class — kept expressible in ANSI SQL for oracle parity.
_PUNCT_RE = r"[!-/:-@\[-`{-~]"
_DIGIT_RE = r"[0-9]"


def add_token_counts(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Whitespace token count + BPE-ish piece count."""
    s = batch[col]
    batch["n_tokens"] = s.str.count(r"\S+").astype("int64")
    batch["n_pieces"] = s.str.count(BPE_ISH_RE).astype("int64")
    return batch


def add_quality_counts(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Integer quality signals (ratios derivable downstream; integers keep
    the DuckDB oracle float-exact)."""
    s = batch[col]
    batch["n_chars_q"] = s.str.len().astype("int64")
    batch["n_tokens"] = s.str.count(r"\S+").astype("int64")
    batch["n_digits"] = s.str.count(_DIGIT_RE).astype("int64")
    batch["n_punct"] = s.str.count(_PUNCT_RE).astype("int64")
    return batch


def _fnv1a_64_fast(data: bytes) -> int:
    """64-bit FNV-1a rolling hash."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def add_fingerprints(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """md5 hex digest (oracle-parity: DuckDB ``md5()``) + FNV-1a 64."""
    texts = batch[col].tolist()
    batch["fp"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    batch["fp_fnv"] = np.array(
        [_fnv1a_64_fast(t.encode("utf-8")) for t in texts], dtype=np.uint64
    ).astype("int64")  # two's-complement view keeps parquet/duckdb happy
    return batch


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) — the
# rolling-hash document fingerprint used by plagiarism/near-dup systems:
# guarantees any shared substring of length >= w + k - 1 yields at least
# one shared selected fingerprint.


def winnow_fingerprints(text: str, k: int = 5, w: int = 4) -> np.ndarray:
    """Selected k-gram hashes by winnowing: in each window of ``w``
    consecutive char-k-gram hashes keep the minimum (rightmost on ties),
    deduplicated by (hash, position) selection; returns the sorted unique
    selected hashes (uint64->int64 bit view). Fully vectorized:
    byte-matrix polynomial rolling hash + sliding-window argmin."""
    data = text.encode("utf-8")
    n = len(data) - k + 1
    if n <= 0:
        h = np.frombuffer(
            hashlib.blake2b(data, digest_size=8).digest(), dtype=np.uint64
        )
        return h.view(np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    # polynomial rolling hash over each k-byte window, vectorized as a sum
    # of shifted byte columns (k small): h[i] = sum_j b[i+j] * P^(k-1-j).
    # Coefficients come from Python-int arithmetic masked to 64 bits —
    # numpy SCALAR uint64 multiplies warn on wrap (array ops don't).
    P = 1099511628211
    coeffs = [1] * k
    for j in range(k - 2, -1, -1):
        coeffs[j] = (coeffs[j + 1] * P) & 0xFFFFFFFFFFFFFFFF
    hashes = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        hashes = hashes + buf[j : j + n].astype(np.uint64) * np.uint64(coeffs[j])
    # avalanche so adjacent windows decorrelate
    from .neardup import _mix64

    hashes = _mix64(hashes)
    if n <= w:
        # fewer grams than one window: keep the single rightmost minimum
        idx = n - 1 - int(np.argmin(hashes[::-1]))
        return hashes[idx : idx + 1].copy().view(np.int64)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost minimum per window: argmin over the reversed axis
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(len(win)) + (w - 1 - rev_arg)
    return np.unique(hashes[pos]).view(np.int64)


class WinnowBatch:
    """map_batches stage: per-doc winnowing fingerprint set + an md5
    digest over the sorted selected hashes (a stable whole-set identity
    for exact overlap joins)."""

    def __init__(self, k: int = 5, w: int = 4, col: str = "text"):
        self.k = k
        self.w = w
        self.col = col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = [
            winnow_fingerprints(t, self.k, self.w) for t in batch[self.col]
        ]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").values,
                "n_fingerprints": pd.Series(
                    [len(f) for f in fps], dtype="int64"
                ),
                "winnow_md5": [
                    hashlib.md5(np.ascontiguousarray(f).tobytes()).hexdigest()
                    for f in fps
                ],
            }
        )


# ---------------------------------------------------------------------------
# Language ID — stateful stage (stopword tables built once per actor).

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it for on with as are was be at by this "
        "have from or an but not they which one all we can her has there".split()
    ),
    "pt": frozenset(
        "o a de que e do da em um para é com não uma os no se na por mais as "
        "dos como mas foi ao ele das tem à seu sua ou ser quando muito".split()
    ),
    "es": frozenset(
        "el la de que y a en un ser se no haber por con su para como estar "
        "tener le lo lo todo pero más hacer o poder decir este ir otro".split()
    ),
    "fr": frozenset(
        "le de un être et à il avoir ne je son que se qui ce dans en du elle "
        "au pour pas sur faire plus dire me on mon lui nous comme mais".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird".split()
    ),
}

_WORD_RE = re.compile(r"[a-zà-ÿ]+")


class LangIdBatch:
    """Actor-pool language-ID stage: stopword-hit scoring per language.

    State (lookup tables, compiled regex) built once per actor in
    ``__init__`` — the warm-stage pattern the reference reserves for its LLM
    daemon (reference: supervisord.conf:27-36).
    """

    def __init__(self, langs: tuple[str, ...] = ("en", "pt", "es", "fr", "de")):
        self.langs = langs
        self.tables = [STOPWORDS[lang] for lang in langs]
        self.word_re = _WORD_RE

    def predict_one(self, text: str) -> str:
        words = self.word_re.findall(text.lower())
        if not words:
            return "und"
        best_lang, best_hits = "und", 0
        for lang, table in zip(self.langs, self.tables):
            hits = sum(1 for w in words if w in table)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = [self.predict_one(t) for t in batch["text"]]
        return batch


# ---------------------------------------------------------------------------
# Feature-hashed linear classifier scoring — the fastText-style quality /
# domain scorer shape (Joulin et al., arXiv:1607.01759 with the hashing
# trick of Weinberger et al., ICML'09): every token hashes to an integer
# weight, the document score is the weight sum. Integer weights keep the
# sum order-independent, so Ray and the DuckDB oracle agree exactly.

_HC_MOD = 2001
_HC_BIAS = 1000


def _hash_weight(word: str) -> int:
    """weight(word) = (first-32-bits-of-md5 mod 2001) - 1000, in [-1000, 1000]."""
    return int(hashlib.md5(word.encode("utf-8")).hexdigest()[:8], 16) % _HC_MOD - _HC_BIAS


class HashClassifierBatch:
    """Actor-pool model-scoring stage: per-doc score = sum of hashed token
    weights (multiplicity counts), label = score > 0.

    The weight table is a per-actor memo filled on demand — the warm-model
    pattern (a real classifier would load its matrix here in ``__init__``;
    reference analogue: the resident LLM daemon, supervisord.conf:27-36).
    Per batch only UNIQUE new words pay an md5; scoring is a vectorized
    segment sum over the factorized token stream."""

    def __init__(self, col: str = "text", id_col: str = "doc_id"):
        self.col = col
        self.id_col = id_col
        self.weights: dict[str, int] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [t.split() for t in batch[self.col].values]
        flat = [w for ws in toks_per_doc for w in ws]
        if flat:
            codes, uniq = pd.factorize(np.array(flat, dtype=object))
            memo = self.weights
            uw = np.fromiter(
                (
                    memo[w] if w in memo else memo.setdefault(w, _hash_weight(w))
                    for w in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            wflat = uw[codes]
        else:
            wflat = np.empty(0, dtype=np.int64)
        lens = np.fromiter(
            (len(ws) for ws in toks_per_doc), dtype=np.int64, count=len(toks_per_doc)
        )
        ends = np.cumsum(lens)
        starts = ends - lens
        csum = np.concatenate([[0], np.cumsum(wflat)])
        scores = csum[ends] - csum[starts]
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].astype("int64").values,
                "n_tokens": lens,
                "score": scores,
                "label": scores > 0,
            }
        )


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169): select raw
# documents whose hashed-n-gram feature profile looks like a target corpus.
# Bucketed unigram features (the paper's hashing trick at small B); the
# per-bucket importance weight is a scaled INTEGER surrogate for the paper's
# log probability ratio so per-doc sums stay order-independent and the
# DuckDB oracle matches bit-for-bit.

_DSIR_BUCKETS = 256
_DSIR_SCALE = 1_000_000


def _dsir_bucket(word: str) -> int:
    """bucket(word) = first-32-bits-of-md5 mod 256 (mirrored in SQL as
    CAST('0x' || substr(md5(word),1,8) AS BIGINT) % 256)."""
    return int(hashlib.md5(word.encode("utf-8")).hexdigest()[:8], 16) % _DSIR_BUCKETS


def dsir_weights(raw_n: "np.ndarray", tgt_n: "np.ndarray") -> "np.ndarray":
    """Per-bucket integer importance weight from bucket token counts.

    wgt_b = ((t_b+1) * SCALE * (R+B)) // ((r_b+1) * (T+B)) - SCALE — the
    add-one-smoothed target/raw probability ratio, floor-scaled to int.
    Computed in PYTHON ints (the cross product (t+1)*SCALE*(R+B) overflows
    int64 on a ~1e9-token corpus; DuckDB mirrors with HUGEINT). The target
    is a SUBSET of raw (t_b <= r_b), so the ratio — hence every weight —
    is bounded by ~R/T regardless of corpus size, and per-doc int64 score
    sums cannot overflow for any realistic document length."""
    B = _DSIR_BUCKETS
    R = int(raw_n.sum())
    T = int(tgt_n.sum())
    out = np.empty(B, dtype=np.int64)
    for b in range(B):
        t = int(tgt_n[b])
        r = int(raw_n[b])
        out[b] = ((t + 1) * _DSIR_SCALE * (R + B)) // ((r + 1) * (T + B)) - _DSIR_SCALE
    return out


class DsirScoreBatch:
    """Actor-pool scoring stage for DSIR pass 2: per-doc score = sum of the
    per-bucket importance weights of its tokens (multiplicity counts). The
    256-entry weight table ships once per actor in the constructor; the
    word->bucket memo fills per actor on demand (only UNIQUE new words pay
    an md5), scoring is the same vectorized segment sum as
    HashClassifierBatch."""

    def __init__(self, wgt: "np.ndarray", col: str = "text", id_col: str = "doc_id"):
        self.wgt = np.asarray(wgt, dtype=np.int64)
        self.col = col
        self.id_col = id_col
        self.buckets: dict[str, int] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [t.split() for t in batch[self.col].values]
        flat = [w for ws in toks_per_doc for w in ws]
        if flat:
            codes, uniq = pd.factorize(np.array(flat, dtype=object))
            memo = self.buckets
            ub = np.fromiter(
                (
                    memo[w] if w in memo else memo.setdefault(w, _dsir_bucket(w))
                    for w in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            wflat = self.wgt[ub][codes]
        else:
            wflat = np.empty(0, dtype=np.int64)
        lens = np.fromiter(
            (len(ws) for ws in toks_per_doc), dtype=np.int64, count=len(toks_per_doc)
        )
        ends = np.cumsum(lens)
        starts = ends - lens
        csum = np.concatenate([[0], np.cumsum(wflat)])
        scores = csum[ends] - csum[starts]
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].astype("int64").values,
                "n_tokens": lens,
                "score": scores,
            }
        )


def dsir_bucket_counts_batch(
    batch: pd.DataFrame, col: str = "text", tgt_col: str = "lang", tgt_val: str = "en"
) -> pd.DataFrame:
    """DSIR pass-1 combiner partial: (bucket, raw_n, tgt_n) token counts for
    one batch — at most 256 rows out regardless of batch size. One flat
    factorize over the whole batch (each unique word pays ONE md5), then
    two bincounts; the target counts reuse the same flat bucket stream
    masked by the per-doc target flag."""
    toks_per_doc = [t.split() for t in batch[col].values]
    flat = [w for ws in toks_per_doc for w in ws]
    if not flat:
        return pd.DataFrame(
            {
                "bucket": pd.Series(dtype="int64"),
                "raw_n": pd.Series(dtype="int64"),
                "tgt_n": pd.Series(dtype="int64"),
            }
        )
    codes, uniq = pd.factorize(np.array(flat, dtype=object))
    ub = np.fromiter(
        (_dsir_bucket(w) for w in uniq), dtype=np.int64, count=len(uniq)
    )
    bflat = ub[codes]
    lens = np.fromiter(
        (len(ws) for ws in toks_per_doc), dtype=np.int64, count=len(toks_per_doc)
    )
    is_tgt = np.repeat((batch[tgt_col] == tgt_val).to_numpy(), lens)
    raw = np.bincount(bflat, minlength=_DSIR_BUCKETS)
    tgt = np.bincount(bflat[is_tgt], minlength=_DSIR_BUCKETS)
    nz = np.nonzero(raw)[0]
    return pd.DataFrame(
        {
            "bucket": nz.astype(np.int64),
            "raw_n": raw[nz].astype(np.int64),
            "tgt_n": tgt[nz].astype(np.int64),
        }
    )


# ---------------------------------------------------------------------------
# URL canonicalization — the dedup key normalization every web pipeline
# runs before url-level dedup (recrawl winners, link-graph node identity).

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url: str) -> str:
    """Canonical form: strip the fragment, lowercase scheme and host, drop
    the scheme's default port, collapse duplicate path slashes. Path CASE
    and query string are preserved (case-significant per RFC 3986; a
    trailing-slash fold is deliberately NOT applied — /a and /a/ can be
    different resources). Deliberately regex-light so the DuckDB oracle
    replicates it exactly."""
    url = url.split("#", 1)[0]
    sep = url.find("://")
    if sep == -1:
        return url
    scheme = url[:sep].lower()
    rest = url[sep + 3 :]
    slash = rest.find("/")
    if slash == -1:
        authority, path = rest, ""
    else:
        authority, path = rest[:slash], rest[slash:]
    # userinfo (user:pass@) is case-significant — lowercase host[:port] only
    at = authority.rfind("@")
    userinfo, hostport = (
        (authority[: at + 1], authority[at + 1 :]) if at != -1 else ("", authority)
    )
    authority = userinfo + hostport.lower()
    dp = _DEFAULT_PORTS.get(scheme)
    if dp and authority.endswith(dp):
        authority = authority[: -len(dp)]
    # collapse duplicate slashes in the PATH only — a query string may
    # legitimately embed '//' (redirect URLs etc.)
    q = path.find("?")
    if q == -1:
        p, query = path, ""
    else:
        p, query = path[:q], path[q:]
    while "//" in p:
        p = p.replace("//", "/")
    return f"{scheme}://{authority}{p}{query}"


def add_canonical_url(
    batch: pd.DataFrame, col: str = "url", out: str = "canonical_url"
) -> pd.DataFrame:
    res = batch.copy()
    res[out] = [canonicalize_url(u) for u in batch[col]]
    return res
