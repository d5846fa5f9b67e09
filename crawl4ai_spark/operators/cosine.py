"""CosineStrategy extraction — reference extraction_strategy.py:118-474.

Reference pipeline, per page:
  1. split text into chunks (``html.split(DEL)``, :399-404);
  2. optional semantic pre-filter against a query embedding
     (``filter_documents_embeddings`` :225-280): keep chunks with
     cosine >= sim_threshold in original order; if fewer than at_least_k
     survive (at_least_k=20, halved to len//2 when the page has fewer
     chunks), back-fill the best rejected chunks by similarity rank; always
     truncate to at_least_k — quirks preserved verbatim;
  3. hierarchical clustering of chunk embeddings: ward linkage over cosine
     pdist, flat clusters at cophenetic distance <= max_dist
     (``hierarchical_clustering`` :336-359);
  4. group chunks by cluster label retaining order, drop clusters whose
     joined text has fewer than word_count_threshold words (:361-384);
  5. emit {index, content} sorted by label (:421-426).  The reuters tag
     classifier (:428-437) is model-bound: out of scope, tags omitted.

The reference embeds with a sentence-transformer; here the embedding is a
PLUGGABLE COLUMN (tests use functions/embed.py's deterministic hash
embedding), so the operator is model-free.

Clustering recipe — the shared spec the oracle twin (oracle/expected.py)
re-implements independently (scipy is absent from this environment, so
ward + fcluster are implemented directly):

  1. A = float64 embeddings in chunk order; U[i] = A[i] / max(|A[i]|, 1e-30)
  2. D2[i,j] = (1 - (U @ U.T)[i,j])**2        (squared cosine distances)
  3. agglomerative ward via Lance-Williams on squared distances:
       D2(k, i∪j) = ((n_i+n_k)·D2[k,i] + (n_j+n_k)·D2[k,j] − n_k·D2[i,j])
                    / (n_i + n_j + n_k)
     merge the argmin pair, ties broken by (lower first-leaf of i, lower
     first-leaf of j); merge height = sqrt(max(D2*, 0))
  4. flat clusters = maximal dendrogram subtrees whose internal max merge
     height <= max_dist (scipy fcluster criterion='distance' semantics)
  5. labels numbered 1..k by first-leaf (original chunk index) order

Spark shape: ``groupBy(page).applyInPandas`` — pages are independent and
per-page chunk counts are small (10^1-10^3), so the O(n^2) distance matrix
is bounded per task and parallelism comes from the page dimension.  At
100 TB this is embarrassingly parallel: no shuffle beyond the one
hash-partition on page key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def ward_merge_tree(d2: np.ndarray) -> list[tuple[list[int], list[int], float]]:
    """All n-1 ward merges over a squared-distance matrix.  Returns
    (members_left, members_right, subtree_max_height) per merge, where the
    members lists hold original leaf indices."""
    n = d2.shape[0]
    d2 = d2.copy()
    np.fill_diagonal(d2, np.inf)
    alive = np.ones(n, dtype=bool)
    sizes = np.ones(n, dtype=np.float64)
    first = np.arange(n)  # first (lowest) leaf per cluster — the tie-break
    members: list[list[int]] = [[i] for i in range(n)]
    maxh = np.zeros(n)
    merges: list[tuple[list[int], list[int], float]] = []
    for _ in range(n - 1):
        idx = np.flatnonzero(alive)
        sub = d2[np.ix_(idx, idx)]
        m = sub.min()
        ti, tj = np.nonzero(sub == m)
        # ties: lowest (first-leaf of a, first-leaf of b), a < b by leaf
        best = None
        for a, b in zip(idx[ti], idx[tj]):
            if a >= b:
                continue
            k = (min(first[a], first[b]), max(first[a], first[b]), a, b)
            if best is None or k < best[0]:
                best = (k, a, b)
        _, i, j = best
        if first[j] < first[i]:
            i, j = j, i
        # Lance-Williams ward update of cluster i (absorbing j) vs alive k
        ks = idx[(idx != i) & (idx != j)]
        if ks.size:
            ni, nj, nk = sizes[i], sizes[j], sizes[ks]
            d2[i, ks] = (
                (ni + nk) * d2[i, ks] + (nj + nk) * d2[j, ks] - nk * d2[i, j]
            ) / (ni + nj + nk)
            d2[ks, i] = d2[i, ks]
        height = float(np.sqrt(max(m, 0.0)))
        new_maxh = max(maxh[i], maxh[j], height)
        merges.append((members[i], members[j], new_maxh))
        members[i] = members[i] + members[j]
        sizes[i] += sizes[j]
        maxh[i] = new_maxh
        first[i] = min(first[i], first[j])
        alive[j] = False
    return merges


def ward_labels(emb: np.ndarray, max_dist: float) -> np.ndarray:
    """Flat cluster labels (1..k, numbered by first-leaf order) for the
    shared clustering recipe in the module docstring."""
    n = emb.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n == 1:
        return np.ones(1, dtype=np.int64)
    a = emb.astype(np.float64)
    norms = np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-30)
    u = a / norms
    d2 = (1.0 - u @ u.T) ** 2
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # a subtree's internal merges all have height <= its max height, so
    # unioning exactly the merges with subtree-max <= t yields the maximal
    # subtrees the distance criterion cuts out
    for left, right, h in ward_merge_tree(d2):
        if h <= max_dist:
            parent[find(right[0])] = find(left[0])
    roots: dict[int, int] = {}
    labels = np.zeros(n, dtype=np.int64)
    for leaf in range(n):
        r = find(leaf)
        if r not in roots:
            roots[r] = len(roots) + 1
        labels[leaf] = roots[r]
    return labels


def semantic_keep_indices(sims: np.ndarray, sim_threshold: float,
                          at_least_k: int = 20) -> list[int]:
    """filter_documents_embeddings (:225-280) index logic, quirks intact:
    thresholded chunks in original order, back-filled by similarity rank,
    truncated to at_least_k (halved when the page has < at_least_k
    chunks)."""
    n = len(sims)
    if n < at_least_k:
        at_least_k = n // 2
    kept = [i for i in range(n) if sims[i] >= sim_threshold]
    if len(kept) < at_least_k:
        rest = sorted(
            (i for i in range(n) if sims[i] < sim_threshold),
            key=lambda i: -sims[i],
        )
        kept.extend(rest[: at_least_k - len(kept)])
    return kept[:at_least_k]


def cluster_page(chunks: list[str], emb: np.ndarray,
                 query_vec: np.ndarray | None, sim_threshold: float,
                 word_count_threshold: int, max_dist: float,
                 at_least_k: int = 20) -> list[tuple[int, str]]:
    """One page through steps 2-5; returns (cluster_index, content)."""
    if query_vec is not None and len(chunks):
        a = emb.astype(np.float64)
        u = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-30)
        q = query_vec.astype(np.float64)
        q = q / max(np.linalg.norm(q), 1e-30)
        keep = semantic_keep_indices(u @ q, sim_threshold, at_least_k)
        chunks = [chunks[i] for i in keep]
        emb = emb[keep]
    if not chunks:
        return []
    labels = ward_labels(emb, max_dist)
    clusters: dict[int, list[str]] = {}
    for text, label in zip(chunks, labels):
        clusters.setdefault(int(label), []).append(text)
    out = []
    for label in sorted(clusters):
        content = " ".join(clusters[label])
        if len(content.split()) >= word_count_threshold:
            out.append((label, content))
    return out


def cosine_extract_stage(df: DataFrame, page_col: str = "page_url",
                         order_col: str = "chunk_idx",
                         text_col: str = "chunk",
                         emb_col: str = "embedding",
                         query_vec=None, sim_threshold: float = 0.3,
                         word_count_threshold: int = 10,
                         max_dist: float = 0.2,
                         at_least_k: int = 20) -> DataFrame:
    """CosineStrategy over a chunk table with a pluggable embedding column.
    Output: (page_col, cluster_idx, content)."""
    q = None if query_vec is None else np.asarray(query_vec, dtype=np.float64)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        chunks = ["" if t is None else t for t in pdf[text_col]]
        emb = (
            np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            if len(pdf) else np.zeros((0, 1))
        )
        rows = [
            {page_col: pdf[page_col].iloc[0], "cluster_idx": label,
             "content": content}
            for label, content in cluster_page(
                chunks, emb, q, sim_threshold, word_count_threshold,
                max_dist, at_least_k,
            )
        ]
        return pd.DataFrame(
            rows, columns=[page_col, "cluster_idx", "content"]
        )

    ptype = dict(df.dtypes)[page_col]
    return df.groupBy(page_col).applyInPandas(
        run, f"{page_col} {ptype}, cluster_idx int, content string"
    )
