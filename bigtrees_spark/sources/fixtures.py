"""Deterministic synthetic web_pages corpus with planted duplicate structure.

Shape per BASELINE.json input_hint:
    web_pages(url string, warc_ts timestamp, html binary, text string, lang string)

Planted structure (FIXTURES.md T1), all derived from one numpy
default_rng(seed) so tests / oracle / bench regenerate identical data:
  * exact-dup groups (~10% of docs, sizes 2-5): identical text, distinct urls
    (reference analog: identical file hashes -> one DupeSet,
    /root/reference/lib/System/Directory/BigTrees/DupeMap.hs:98-99)
  * near-dup groups (~15%): base + 1-4 mutants at token mutation rates
    {1%,3%,5%} (substitute/insert/delete)
  * substring dups (~3%): a >=512-byte verbatim excerpt of another doc inside
    otherwise-unique text — below the MinHash threshold by construction
  * hot-template skew site (~10%): pages sharing ~80% boilerplate tokens
    (forces hot LSH buckets; gates the salting tests)
  * uniques (rest) + edge rows (empty, whitespace-only, non-ASCII, 1-token)

Ground truth (exact/near/substring group memberships) is returned alongside so
the oracle can build the expected pair set without re-deriving the plant.

The second snapshot (T2: Add/Rm/Edit/Mv) is derived from the first for
diff/incremental tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)
VOCAB_SIZE = 5000
N_SITES = 20


def _vocab() -> list[str]:
    # deterministic pseudo-words: 'w' + base36ish id, 3-10 chars
    return [f"w{np.base_repr(i * 2654435761 % (36**6), 36).lower()}" for i in range(VOCAB_SIZE)]


@dataclass
class Corpus:
    pages: pd.DataFrame               # url, warc_ts, html, text, lang
    groups: pd.DataFrame              # url, group_id, kind (exact|near|substring)
    # ground-truth pair kinds are derivable from `groups`


def _mk_html(text: str, site: int, title: str) -> bytes:
    boiler = f"site{site} navigation links about contact terms privacy"
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<header><h1>Site {site}</h1><nav>{boiler}</nav></header>"
        f"<main><p>{text}</p></main>"
        f"<footer>copyright site{site}</footer></body></html>"
    ).encode("utf-8")


def _url(site: int, doc_id: int) -> str:
    return f"https://site{site}.example/s{doc_id % 7}/doc{doc_id:08d}"


def _mutate(tokens: list[str], rate: float, rng: np.random.Generator, vocab: list[str]) -> list[str]:
    out: list[str] = []
    for t in tokens:
        r = rng.random()
        if r < rate / 3:
            continue  # delete
        if r < 2 * rate / 3:
            out.append(vocab[int(rng.integers(0, VOCAB_SIZE))])  # substitute
        else:
            out.append(t)
            if r < rate:
                out.append(vocab[int(rng.integers(0, VOCAB_SIZE))])  # insert after
    return out


def generate_corpus(n_docs: int = 500, seed: int = 42) -> Corpus:
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    langs = np.array(["en", "de", "und"])

    rows: list[dict] = []
    grows: list[dict] = []
    doc_id = 0
    texts_by_id: dict[int, str] = {}

    def add_doc(text: str, site: int, group: str | None, kind: str | None) -> int:
        nonlocal doc_id
        # text column holds the extraction-canonical form (whitespace collapsed)
        # so extract_text(html) == text byte-for-byte — the input_hint invariant
        text = " ".join(text.split())
        u = _url(site, doc_id)
        lang = langs[int(rng.choice(3, p=[0.90, 0.08, 0.02]))]
        rows.append(
            {
                "url": u,
                "warc_ts": BASE_TS + timedelta(minutes=doc_id),
                "html": _mk_html(text, site, f"doc {doc_id}"),
                "text": text,
                "lang": str(lang),
            }
        )
        if group is not None:
            grows.append({"url": u, "group_id": group, "kind": kind})
        texts_by_id[doc_id] = text
        doc_id += 1
        return doc_id - 1

    def rand_text(lo: int = 50, hi: int = 800) -> list[str]:
        n = int(rng.integers(lo, hi))
        return [vocab[i] for i in rng.integers(0, VOCAB_SIZE, size=n)]

    n_exact = max(1, int(n_docs * 0.10))
    n_near = max(1, int(n_docs * 0.15))
    n_sub = max(1, int(n_docs * 0.03))
    n_skew = max(1, int(n_docs * 0.10))

    # --- exact-dup groups ---
    made = 0
    g = 0
    while made < n_exact:
        size = int(rng.integers(2, 6))
        text = " ".join(rand_text())
        gid = f"exact{g}"
        for _ in range(size):
            add_doc(text, int(rng.integers(0, N_SITES)), gid, "exact")
            made += 1
        g += 1

    # --- near-dup groups ---
    made = 0
    g = 0
    rates = [0.01, 0.03, 0.05]
    while made < n_near:
        base = rand_text(200, 800)  # long enough that mutations keep J >= 0.5
        gid = f"near{g}"
        add_doc(" ".join(base), int(rng.integers(0, N_SITES)), gid, "near")
        made += 1
        for _ in range(int(rng.integers(1, 5))):
            rate = rates[int(rng.integers(0, 3))]
            add_doc(" ".join(_mutate(base, rate, rng, vocab)), int(rng.integers(0, N_SITES)), gid, "near")
            made += 1
        g += 1

    # --- substring dups (excerpt >= 512 bytes, host mostly unique) ---
    for g in range(n_sub // 2 + 1):
        src = rand_text(300, 600)
        gid = f"sub{g}"
        add_doc(" ".join(src), int(rng.integers(0, N_SITES)), gid, "substring")
        # excerpt of ~120 tokens (~>=700 bytes) embedded mid-host
        start = int(rng.integers(0, max(1, len(src) - 130)))
        excerpt = src[start : start + 120]
        host = rand_text(400, 700)
        cut = int(rng.integers(0, len(host)))
        add_doc(" ".join(host[:cut] + excerpt + host[cut:]), int(rng.integers(0, N_SITES)), gid, "substring")

    # --- hot-template skew site ---
    boiler = rand_text(400, 500)  # shared boilerplate ~80%
    for _ in range(n_skew):
        uniq = rand_text(80, 120)
        pos = int(rng.integers(0, len(boiler)))
        add_doc(" ".join(boiler[:pos] + uniq + boiler[pos:]), N_SITES - 1, None, None)

    # --- edge rows ---
    add_doc("", 0, None, None)
    add_doc("   ", 0, None, None)
    add_doc("tok", 0, None, None)
    add_doc("füßchen straße übermütig " * 3, 0, None, None)
    add_doc("漢字テキスト 中文文本 " * 5, 0, None, None)

    # --- uniques (fill to n_docs) ---
    while doc_id < n_docs:
        add_doc(" ".join(rand_text()), int(rng.integers(0, N_SITES)), None, None)

    pages = pd.DataFrame(rows)
    groups = pd.DataFrame(grows, columns=["url", "group_id", "kind"])
    return Corpus(pages=pages, groups=groups)


def derive_snapshot_v2(corpus: Corpus, seed: int = 43) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Second snapshot for diff tests: 2% Rm, 2% Add, 2% Edit, 1% Mv
    (FIXTURES.md T2; reference Delta semantics
    /root/reference/lib/System/Directory/BigTrees/Delta.hs:37-101).

    Returns (pages_v2, expected_deltas(kind, url, url_new)).
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    pages = corpus.pages.copy().reset_index(drop=True)
    n = len(pages)
    idx = rng.permutation(n)
    k = max(1, n // 50)
    rm_i, add_i, edit_i, mv_i = idx[:k], idx[k : 2 * k], idx[2 * k : 3 * k], idx[3 * k : 3 * k + max(1, n // 100)]

    deltas = []
    keep = np.ones(n, dtype=bool)
    for i in rm_i:
        keep[i] = False
        deltas.append({"kind": "Rm", "url": pages.at[i, "url"], "url_new": None})
    for i in edit_i:
        toks = pages.at[i, "text"].split()
        toks = toks + [vocab[int(rng.integers(0, VOCAB_SIZE))] for _ in range(5)]
        new_text = " ".join(toks)
        pages.at[i, "text"] = new_text
        pages.at[i, "html"] = _mk_html(new_text, 0, "edited")
        # a re-crawl that changed content carries a new capture timestamp —
        # the mod-time bump the reference's incremental re-hash keys on
        # (README.md:49); (url, warc_ts) is the content-version identity
        pages.at[i, "warc_ts"] = pages.at[i, "warc_ts"] + timedelta(days=30)
        deltas.append({"kind": "Edit", "url": pages.at[i, "url"], "url_new": None})
    for i in mv_i:
        old = pages.at[i, "url"]
        new = old + "-moved"
        pages.at[i, "url"] = new
        deltas.append({"kind": "Mv", "url": old, "url_new": new})

    new_rows = []
    for j, _ in enumerate(add_i):
        toks = [vocab[int(t)] for t in rng.integers(0, VOCAB_SIZE, size=int(rng.integers(50, 400)))]
        text = " ".join(toks)
        u = f"https://site0.example/new/doc-added-{j:06d}"
        new_rows.append(
            {
                "url": u,
                "warc_ts": BASE_TS + timedelta(days=30, minutes=j),
                "html": _mk_html(text, 0, f"added {j}"),
                "text": text,
                "lang": "en",
            }
        )
        deltas.append({"kind": "Add", "url": u, "url_new": None})

    pages_v2 = pd.concat([pages[keep], pd.DataFrame(new_rows)], ignore_index=True)
    return pages_v2, pd.DataFrame(deltas)


def corpus_to_spark(spark, pages: pd.DataFrame):
    """pandas -> Spark DataFrame with the exact input_hint schema."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
        ]
    )
    return spark.createDataFrame(pages, schema=schema)


def write_parquet(pages: pd.DataFrame, path: str, n_buckets: int = 16) -> None:
    """Write the corpus as parquet partitioned by a stable url-hash bucket —
    the partition key the digest tree and resume logic operate on."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import zlib

    df = pages.copy()
    df["bucket"] = df["url"].map(lambda u: zlib.crc32(u.encode()) % n_buckets).astype("int32")
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_to_dataset(table, root_path=path, partition_cols=["bucket"])
