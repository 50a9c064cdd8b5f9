"""Byte-pair-encoding tokenizer: deterministic sample-trained merges, applied
as an Arrow-batched pandas UDF.

Upgrades the regex "BPE-ish" token ESTIMATE (operators/textstats.py:42) to a
real learned subword tokenizer (Sennrich, Haddow, Birch: "Neural Machine
Translation of Rare Words with Subword Units", ACL'16) — the token count a
training-data pipeline actually budgets by.

Scale shape mirrors similarity.fit_ivf_centroids: train once on a driver-side
sample (BPE training is corpus-statistics estimation — a 10^4-doc sample of a
10^12-doc corpus gives the same top merges), ship the merge ranks to
executors inside the UDF closure (a few KB), apply vectorized per batch with
a per-batch word memo (web text is Zipfian, so the memo hit-rate is high).

Determinism: merge selection ties break on the lexicographically smallest
pair, sampling is seed-pinned — same corpus + seed => identical vocab on
every run/executor.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import IntegerType

# word pre-tokenization: MUST stay in parity with kernels.tokenize
# ([a-z0-9]+ on lowercased text) so BPE counts and shingle tokens agree on
# what a "word" is
WORD_RE = re.compile(r"[a-z0-9]+")

END = "</w>"  # end-of-word sentinel symbol


def train_bpe(texts: list, n_merges: int = 200, min_pair_count: int = 2) -> list:
    """Learn up to n_merges merge rules from texts (classic BPE on word
    frequencies).  Returns the ordered merge list [(left, right), ...]."""
    wf: Counter = Counter()
    for t in texts:
        wf.update(WORD_RE.findall((t or "").lower()))
    vocab: dict = {tuple(w) + (END,): c for w, c in wf.items()}
    merges: list = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair (standard BPE leaves ties unspecified; we pin them)
        best_pair, best_count = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_count < min_pair_count:
            break
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab: dict = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Apply merges (lowest rank first) to one word; returns subword pieces."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def fit_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_size: int = 2000,
    seed: int = 7,
) -> list:
    """Train merges on a seed-pinned driver sample of the corpus.

    The sample is a seed-keyed hash-ordered top-N (TakeOrderedAndProject):
    one pass over the corpus, no full count() job, and deterministic across
    runs AND partition layouts — so "same corpus + seed => identical vocab"
    holds cluster-to-cluster, not just within a run (sample(frac).limit(n)
    was layout-dependent)."""
    sample = (
        docs.select(text_col)
        .orderBy(F.xxhash64(F.lit(seed), text_col))
        .limit(sample_size)
    ).toPandas()
    return train_bpe(list(sample[text_col]), n_merges=n_merges)


def make_bpe_count_udf(merges: list):
    """pandas UDF: learned-BPE token count per text.  The merge ranks ride
    the closure (KBs); a per-batch word memo exploits Zipfian repetition."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(IntegerType())
    def bpe_count(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in texts:
            total = 0
            for w in WORD_RE.findall((t or "").lower()):
                c = memo.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    memo[w] = c
                total += c
            out.append(total)
        return pd.Series(out, dtype="int32")

    return bpe_count


def with_bpe_token_counts(
    df: DataFrame, merges: list, text_col: str = "text"
) -> DataFrame:
    """Add n_tokens_bpe_learned from a trained merge list."""
    udf = make_bpe_count_udf(merges)
    return df.withColumn("n_tokens_bpe_learned", udf(F.col(text_col)))
