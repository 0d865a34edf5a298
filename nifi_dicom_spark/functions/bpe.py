"""Byte-pair encoding: a REAL subword tokenizer for corpus token accounting.

The text family's ``word_tokens`` gives BPE-ish *pre-tokenization* (word /
number / punctuation runs); this module adds the actual BPE layer on top —
the Sennrich et al. 2016 merge-learning algorithm and the GPT-2-style
greedy rank-ordered encoder — so token budgets (shard packing, mixture
plans, chunking) can be denominated in real subword tokens instead of
whitespace words.

Scale shape (the part that matters at 100 TB):

* TRAINING never touches the corpus row-by-row. BPE's merge loop only
  needs the PRE-TOKEN FREQUENCY dictionary — a vocab-sized relation, not a
  corpus-sized one. ``train_bpe`` computes word frequencies distributed
  (explode → map-side-combined groupBy — the same one-exchange shape as
  ``unigram_logprob``), caps the dictionary at the ``max_words`` most
  frequent pre-tokens (deterministic order: count desc, word asc), and
  collects ONLY that capped dictionary to the driver (config-bounded
  collect, the IVF-centroid pattern: the driver holds 50k (word, count)
  pairs, never documents). Truncation drops only hapax-tail words, which
  by Zipf contribute O(tail mass) pair counts — the merge list is stable
  under the cap long before 50k on natural text.
* The merge LOOP is the standard incremental-update trainer: pair counts
  maintained as a delta on each merge (never recounted from the word
  dictionary), so a merge costs O(words containing the pair), not O(V).
* ENCODING is distributed and vectorized: the merge ranks broadcast
  (a few-hundred-KB dict), and an Arrow-batched pandas UDF encodes each
  document with a per-executor word→tokens cache — web text repeats words
  heavily, so the cache turns per-word BPE from O(doc tokens) merges into
  a dict hit.

Determinism: ties in the merge loop break lexicographically on the pair,
the sample cap orders (count desc, word asc), and the encoder is a pure
function of (text, merges) — the same corpus always yields the same
tokenizer, so replays and cross-engine checks are exact. No randomness
anywhere.

Verification: ``tests/test_bpe.py`` pins the trainer against an
independent from-scratch reference that RECOUNTS pair frequencies from the
word dictionary on every merge (O(V·M), no incremental bookkeeping to
share bugs with), the encoder against a plain repeated-string-replace
reference, the concatenation invariant (tokens rejoin to the pre-token),
and partitioning-invariance of the trained merges. The ``bpe_tokens``
driver query is rows-only: the merge loop is iterative and not
SQL-expressible (the declared non-oracle class, like the streaming ops).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from nifi_dicom_spark.functions.text import word_tokens

# MUST stay in lockstep with text.word_tokens (the Spark-side pre-tokenizer):
# the trainer counts words with the Spark expression, the encoder re-splits
# driver/executor-side with this Python regex — a drift between them would
# tokenize training and encoding over different alphabets.
_PRETOKEN_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")


# --- trainer -----------------------------------------------------------------


def _pair_counts(words: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for syms, freq in words.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += freq
    return pc


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge all non-overlapping occurrences of ``pair``, left to right."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_from_freqs(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, count) dictionary.

    The incremental-update trainer: picking the best pair is a scan of the
    pair-count table; applying a merge updates ONLY the words containing
    the pair (tracked via an inverted pair→words index) and adjusts pair
    counts by the delta of each rewritten word — never a full recount.
    Ties break on the lexicographically smallest pair; the loop stops
    early when the best count drops below ``min_count``.
    """
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_freqs:
        syms = tuple(w)
        if len(syms) >= 2:
            words[syms] = words.get(syms, 0) + c
    pc = _pair_counts(words)
    where: dict[tuple[str, str], set] = {}
    for syms in words:
        for p in zip(syms, syms[1:]):
            where.setdefault(p, set()).add(syms)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_count:
            break
        merges.append(best)
        for syms in list(where.get(best, ())):
            freq = words.pop(syms, None)
            if freq is None:
                continue
            new = _merge_word(syms, best)
            # retire the old word's pair contributions, add the new one's
            for p in zip(syms, syms[1:]):
                pc[p] -= freq
                if pc[p] <= 0:
                    del pc[p]
                s = where.get(p)
                if s is not None:
                    s.discard(syms)
                    if not s:
                        del where[p]
            if len(new) >= 2:
                words[new] = words.get(new, 0) + freq
                for p in zip(new, new[1:]):
                    pc[p] = pc.get(p, 0) + freq
                    where.setdefault(p, set()).add(new)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 500,
    max_words: int = 50_000,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge learning (see module
    docstring for why the collect is vocab-capped, not corpus-sized)."""
    freqs = (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)  # config-bounded driver collect (Zipf tail cut)
        .collect()
    )
    return train_bpe_from_freqs([(r["w"], r["c"]) for r in freqs], n_merges, min_count)


# --- encoder -----------------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-ordered BPE encode of one pre-token (GPT-2 shape):
    repeatedly merge every non-overlapping occurrence of the present pair
    with the lowest merge rank."""
    syms = tuple(word)
    while len(syms) >= 2:
        best = None
        best_rank = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        syms = _merge_word(syms, best)
    return list(syms)


def encode_text(text: str, ranks: dict[tuple[str, str], int], cache: dict) -> list[str]:
    out: list[str] = []
    for w in _PRETOKEN_RE.findall(text or ""):
        toks = cache.get(w)
        if toks is None:
            toks = encode_word(w, ranks)
            cache[w] = toks
        out.extend(toks)
    return out


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — the document's BPE token stream.

    The merges list rides the UDF closure (broadcast once per executor by
    Spark's task serialization — a few hundred KB); each Arrow batch
    shares a word→tokens cache, so repeated words cost a dict hit. Pure
    projection: zero shuffle, embarrassingly parallel.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(lambda t: encode_text(t, ranks, cache))

    return df.withColumn(out_col, _enc(F.col(text_col)))
