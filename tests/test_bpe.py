"""BPE tokenizer: trainer vs an independent recount-every-merge reference,
encoder vs a plain string-replace reference, determinism + invariants."""

from __future__ import annotations

from collections import Counter

import numpy as np

from nifi_dicom_spark.functions.bpe import (
    bpe_encode,
    encode_text,
    encode_word,
    train_bpe,
    train_bpe_from_freqs,
)


# --- independent references (deliberately naive: no shared bookkeeping) ------


def _ref_train(word_freqs, n_merges, min_count=2):
    """O(V·M) reference: recount ALL pair frequencies from the word dict on
    every iteration; apply merges by rebuilding each word symbol list."""
    words = {}
    for w, c in word_freqs:
        if len(w) >= 2:
            words[tuple(w)] = words.get(tuple(w), 0) + c
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, freq in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < min_count:
            break
        pair = best[0]
        merges.append(pair)
        new_words = {}
        for syms, freq in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            if len(t) >= 2:
                new_words[t] = new_words.get(t, 0) + freq
        words = new_words
    return merges


def _ref_encode(word, merges):
    """Apply merges in rank order via repeated full passes (rank order is
    equivalent to lowest-rank-first greedy: once rank r is processed no
    earlier rank can reappear, because merging r only creates symbols that
    did not exist when earlier ranks were exhausted -- pinned here)."""
    syms = list(word)
    for a, b in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [a + b]
            else:
                i += 1
    return syms


def _rand_freqs(seed, n_words=60):
    rng = np.random.default_rng(seed)
    alpha = "abcdef"
    out = {}
    for _ in range(n_words):
        w = "".join(rng.choice(list(alpha), size=rng.integers(1, 9)))
        out[w] = out.get(w, 0) + int(rng.integers(1, 40))
    return sorted(out.items())


def test_trainer_matches_recount_reference():
    for seed in (1, 7, 42, 1234, 9999):
        freqs = _rand_freqs(seed)
        got = train_bpe_from_freqs(freqs, n_merges=40)
        ref = _ref_train(freqs, n_merges=40)
        assert got == ref, f"seed {seed}: {got[:5]} vs {ref[:5]}"


def test_trainer_classic_example_and_tiebreak():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_from_freqs(freqs, n_merges=3)
    # (e,s) and (s,t) both count 9 -> lexicographic tiebreak picks (e,s);
    # then (es,t)=9; then (l,o)=7 beats (o,w)=7 lexicographically
    assert merges == [("e", "s"), ("es", "t"), ("l", "o")]


def test_trainer_min_count_stops_early():
    freqs = [("ab", 1), ("cd", 1)]
    assert train_bpe_from_freqs(freqs, n_merges=10, min_count=2) == []
    assert train_bpe_from_freqs(freqs, n_merges=10, min_count=1) != []


def test_encoder_matches_rank_order_reference():
    for seed in (3, 11, 77):
        freqs = _rand_freqs(seed)
        merges = train_bpe_from_freqs(freqs, n_merges=30)
        ranks = {p: i for i, p in enumerate(merges)}
        rng = np.random.default_rng(seed + 1)
        for _ in range(200):
            w = "".join(rng.choice(list("abcdef"), size=rng.integers(1, 12)))
            got = encode_word(w, ranks)
            assert got == _ref_encode(w, merges), w
            assert "".join(got) == w  # concatenation invariant


def test_encode_text_cache_is_transparent():
    merges = train_bpe_from_freqs([("aab", 10), ("aac", 8)], n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    text = "aab aac aab! aab aac"
    with_cache = encode_text(text, ranks, cache={})
    no_cache = []
    import re

    for w in re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]", text):
        no_cache.extend(encode_word(w, ranks))
    assert with_cache == no_cache


def test_train_bpe_distributed_matches_serial_and_partitioning(spark):
    rows = []
    rng = np.random.default_rng(5)
    vocab = ["spark", "shuffle", "join", "agg", "scan", "filter", "row", "col"]
    for i in range(300):
        rows.append((i, " ".join(rng.choice(vocab, size=rng.integers(3, 15)))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = train_bpe(df, "text", n_merges=25, max_words=1000)
    m8 = train_bpe(df.repartition(8), "text", n_merges=25, max_words=1000)
    assert m1 == m8  # partitioning-invariant
    # serial replay: same pre-tokenizer, same counts, same merges
    freq = Counter()
    for _, t in rows:
        for w in t.split():
            freq[w] += 1
    ref = train_bpe_from_freqs(sorted(freq.items()), n_merges=25)
    assert m1 == ref


def test_bpe_encode_dataframe_roundtrip(spark):
    rows = [(0, "lowest lower low"), (1, "newest widest"), (2, ""), (3, "low!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe_from_freqs(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], n_merges=3
    )
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, "text", merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, text in rows:
        assert out[doc_id] == encode_text(text, ranks, cache={}), doc_id
    assert out[2] == []
    # '!' is its own pre-token and survives unmergeable
    assert out[3] == ["lo", "w", "!"]
