"""Single-node brute-force oracle — the "reference implementation" the recall
gate compares against (SURVEY.md §5, BASELINE.json: dup-pair recall >= 0.99 at
the same shingle/signature config).

Ground-truth definitions:
  * exact dup pair: identical text (same sha256) — reference semantics
    (identical hashes -> one DupeSet, /root/reference/lib/.../DupeMap.hs:98-99)
  * near-dup pair: EXACT shingle-set Jaccard >= cfg.jaccard_threshold, computed
    brute-force with the SAME kernels (bigtrees_spark.functions.kernels) the
    pipeline uses — "same config" by construction
  * cluster: connected component over the pair set; cluster_id = min(url)

The Jaccard pass uses an exact inverted index (shingle -> postings) instead of
a blind O(n^2) loop: any pair with intersection > 0 appears in some postings
list, so the result is still exact.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd

from bigtrees_spark.config import DEFAULT_CONFIG, FingerprintConfig
from bigtrees_spark.functions import kernels


def sha256_hex(text: str) -> str:
    return hashlib.sha256((text or "").encode("utf-8")).hexdigest()


def shingle_sets(pages: pd.DataFrame, cfg: FingerprintConfig = DEFAULT_CONFIG) -> dict[str, frozenset[int]]:
    return {
        r.url: frozenset(kernels.shingle_hashes(kernels.tokenize(r.text or ""), cfg.shingle_k).tolist())
        for r in pages.itertuples()
    }


def exact_pairs(pages: pd.DataFrame) -> set[tuple[str, str]]:
    """All unordered url pairs with byte-identical text."""
    by_hash: dict[str, list[str]] = defaultdict(list)
    for r in pages.itertuples():
        by_hash[sha256_hex(r.text)].append(r.url)
    out: set[tuple[str, str]] = set()
    for urls in by_hash.values():
        urls = sorted(urls)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                out.add((urls[i], urls[j]))
    return out


def near_pairs(
    pages: pd.DataFrame, cfg: FingerprintConfig = DEFAULT_CONFIG
) -> set[tuple[str, str]]:
    """All unordered url pairs with exact shingle Jaccard >= threshold
    (includes exact dups, whose Jaccard is 1.0; two empty-shingle docs count
    as J=1.0, matching the pipeline's verification rule)."""
    sets = shingle_sets(pages, cfg)
    urls = sorted(sets)
    postings: dict[int, list[str]] = defaultdict(list)
    for u in urls:
        for s in sets[u]:
            postings[s].append(u)
    cand: set[tuple[str, str]] = set()
    for plist in postings.values():
        if len(plist) < 2:
            continue
        for i in range(len(plist)):
            for j in range(i + 1, len(plist)):
                a, b = plist[i], plist[j]
                cand.add((a, b) if a < b else (b, a))
    # empty-shingle docs never enter postings; they pair with each other
    empties = sorted(u for u in urls if not sets[u])
    for i in range(len(empties)):
        for j in range(i + 1, len(empties)):
            cand.add((empties[i], empties[j]))
    out: set[tuple[str, str]] = set()
    for a, b in cand:
        sa, sb = sets[a], sets[b]
        if not sa and not sb:
            out.add((a, b))
            continue
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and inter / union >= cfg.jaccard_threshold:
            out.add((a, b))
    return out


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def clusters_from_pairs(pairs: set[tuple[str, str]], all_urls: list[str] | None = None) -> pd.DataFrame:
    """Connected components over the pair set; cluster_id = min url in the
    component (the deterministic canonical label, SURVEY.md §7)."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    members: dict[str, list[str]] = defaultdict(list)
    nodes = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
    for u in sorted(nodes):
        members[uf.find(u)].append(u)
    rows = []
    for comp in members.values():
        cid = min(comp)
        for u in comp:
            rows.append({"url": u, "cluster_id": cid})
    if all_urls is not None:
        clustered = {r["url"] for r in rows}
        for u in all_urls:
            if u not in clustered:
                rows.append({"url": u, "cluster_id": u})
    return pd.DataFrame(rows, columns=["url", "cluster_id"]).sort_values("url").reset_index(drop=True)


def recall(found: set[tuple[str, str]], truth: set[tuple[str, str]]) -> float:
    if not truth:
        return 1.0
    return len(found & truth) / len(truth)
