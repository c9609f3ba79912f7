"""M7 — per-block GHAC parity annex (SURVEY §2.9 G8-G9, §7.2 M7).

The reference's clustering core (``name_disambiguation.py:61-108``,
OpenAlex mode ``:579-687``) is, per block:

  sim(i,j) = sigmoid(e_i . e_j) masked to combined-graph edges
  distance = -sim
  AgglomerativeClustering(linkage='average', affinity='precomputed', k)
  k given by ground truth (standard mode, ``:1229-1233``) or searched
  over [max(2, CC(sim>0.9)), CC(sim>0)] maximizing Louvain modularity
  (``:597-687``).

This module reproduces that *inside one Spark task per block* via a
cogrouped ``applyInPandas`` (pubs x scored-pairs cogroup): the primary
path of the engine remains threshold + distributed connected
components (operators.clustering); GHAC is the parity/fallback path
for blocks where exact reference-cluster behavior at fixed k is
demanded. sklearn/scipy are not in this container, so average-linkage
HAC and Newman modularity are implemented directly in NumPy
(Lance-Williams update; published formulas — no reference code).

Scale stance: dense per-block matrices are the reference's own
single-machine ceiling (``GCN.py:109-116`` OOMs at ~10^4 pubs); here
they are allowed ONLY under ``max_block_for_dense`` — bigger blocks
emit no HAC labels and the caller falls back to the distributed CC
clusters. At 10^12 rows this keeps the dense path bounded to the long
tail of small blocks while mega-blocks stay on the linear-memory path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..config import DEFAULT_CONFIG, PipelineConfig

GHAC_SCHEMA = T.StructType(
    [
        T.StructField("block_key", T.StringType()),
        T.StructField("pub_id", T.StringType()),
        T.StructField("hac_cluster", T.IntegerType()),
        T.StructField("k_used", T.IntegerType()),
        T.StructField("method", T.StringType()),
    ]
)


def _average_linkage(dist: np.ndarray, k: int) -> np.ndarray:
    """Average-linkage agglomerative clustering on a precomputed
    distance matrix, stopping at k clusters (Lance-Williams average
    update). Returns int labels 0..k-1. O(n^3) worst case — callers
    cap n via max_block_for_dense."""
    n = dist.shape[0]
    if k <= 0:
        k = 1  # guard: k<=0 would deactivate every cluster and return
        # uninitialized labels (np.empty garbage)
    if k >= n:
        return np.arange(n)
    d = dist.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    sizes = np.ones(n)
    active = np.ones(n, dtype=bool)
    # members[i] = list of original points in cluster i
    members: list[list[int]] = [[i] for i in range(n)]
    for _ in range(n - k):
        masked = np.where(active[:, None] & active[None, :], d, np.inf)
        a, b = np.unravel_index(np.argmin(masked), masked.shape)
        if a > b:
            a, b = b, a
        # average-linkage update into a; deactivate b
        na, nb = sizes[a], sizes[b]
        new_row = (na * d[a, :] + nb * d[b, :]) / (na + nb)
        d[a, :] = new_row
        d[:, a] = new_row
        d[a, a] = np.inf
        d[b, :] = np.inf
        d[:, b] = np.inf
        sizes[a] = na + nb
        active[b] = False
        members[a].extend(members[b])
        members[b] = []
    labels = np.empty(n, dtype=np.int64)
    lbl = 0
    for i in range(n):
        if active[i]:
            for p in members[i]:
                labels[p] = lbl
            lbl += 1
    return labels


def _modularity(adj: np.ndarray, labels: np.ndarray) -> float:
    """Newman modularity Q = (1/2m) sum_ij [A_ij - k_i k_j / 2m]
    delta(c_i, c_j) on a weighted undirected graph."""
    two_m = adj.sum()
    if two_m == 0:
        return 0.0
    deg = adj.sum(axis=1)
    q = 0.0
    for c in np.unique(labels):
        idx = labels == c
        q += adj[np.ix_(idx, idx)].sum() / two_m
        q -= (deg[idx].sum() / two_m) ** 2
    return float(q)


def _components(adj_bool: np.ndarray) -> int:
    """Number of connected components of a boolean adjacency (BFS)."""
    n = adj_bool.shape[0]
    seen = np.zeros(n, dtype=bool)
    n_comp = 0
    for s in range(n):
        if seen[s]:
            continue
        n_comp += 1
        frontier = np.zeros(n, dtype=bool)
        frontier[s] = True
        seen[s] = True
        while frontier.any():
            nxt = (adj_bool[frontier].any(axis=0)) & ~seen
            seen |= nxt
            frontier = nxt
    return n_comp


def _ghac_block(
    pubs_pdf: pd.DataFrame,
    pairs_pdf: pd.DataFrame,
    k: int | None,
    tau: float,
    max_n: int,
    use_combined_modularity: bool = False,
    sem_alpha: float = 0.0,
    sem_floor: float = 0.5,
    weak_gammas: tuple = (1.0,),
    select_margin: float = 0.005,
) -> pd.DataFrame:
    block = (
        pubs_pdf["block_key"].iloc[0]
        if len(pubs_pdf)
        else pairs_pdf["block_key"].iloc[0]
    )
    ids = sorted(pubs_pdf["pub_id"].tolist())
    n = len(ids)
    if n == 0:
        return pd.DataFrame(columns=[f.name for f in GHAC_SCHEMA.fields])
    if n == 1 or n > max_n:
        method = "singleton" if n == 1 else "too-large-fallback"
        return pd.DataFrame(
            {
                "block_key": block,
                "pub_id": ids,
                "hac_cluster": (
                    np.zeros(n, dtype=np.int32) if n == 1 else np.full(n, -1, np.int32)
                ),
                "k_used": np.int32(1 if n == 1 else -1),
                "method": method,
            }
        )
    pos = {p: i for i, p in enumerate(ids)}
    sim = np.zeros((n, n))
    for ia, ib, s in zip(
        pairs_pdf["id_a"], pairs_pdf["id_b"], pairs_pdf["score"]
    ):
        a, b = pos.get(ia), pos.get(ib)
        if a is None or b is None:
            continue
        sim[a, b] = sim[b, a] = float(s)
    # G9 parity option: the reference scores candidate partitions with
    # modularity of the COMBINED raw-weight graph G (Louvain's Q over
    # summed relation weights, name_disambiguation.py:649-659), not of
    # the sigmoid similarity graph. When the cogroup carries the raw
    # combined weight, build that adjacency for the k-search argmax.
    mod_adj = sim
    if use_combined_modularity and "w_combined" in pairs_pdf.columns:
        mod_adj = np.zeros((n, n))
        for ia, ib, w in zip(
            pairs_pdf["id_a"], pairs_pdf["id_b"], pairs_pdf["w_combined"]
        ):
            a, b = pos.get(ia), pos.get(ib)
            if a is None or b is None:
                continue
            mod_adj[a, b] = mod_adj[b, a] = float(w)

    # Semantic channel (operators.semantic): dense in-block cosine of
    # per-pub doc vectors, added at weight sem_alpha where the cosine
    # clears sem_floor. Dense n x n is fine HERE — this code path is
    # already bounded by max_block_for_dense. k-search bounds below
    # deliberately use the STRUCTURAL sim only: the dense channel
    # would collapse CC(sim > 0) to one component and degenerate the
    # search range.
    sim_struct = sim
    semm = None
    if sem_alpha > 0 and "vec" in pubs_pdf.columns:
        vec_by_id = dict(zip(pubs_pdf["pub_id"], pubs_pdf["vec"]))
        rows = [vec_by_id.get(p) for p in ids]
        dims = [len(v) for v in rows if v is not None and len(v)]
        if dims:
            M = np.zeros((n, dims[0]))
            for i, v in enumerate(rows):
                if v is not None and len(v) == dims[0]:
                    M[i] = v
            norms = np.linalg.norm(M, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            Mn = M / norms
            C = Mn @ Mn.T
            np.fill_diagonal(C, 0.0)
            semm = np.where(C >= sem_floor, C, 0.0)

    # Weak-evidence matrix (coauthorless pairs — scoring.match_flags'
    # is_weak). The VARIANT MENU runs the linkage under several weak
    # downweights x {semantic on/off} and keeps the partition capturing
    # the largest strong-evidence (coauthor-backed) similarity mass
    # within clusters — an unsupervised per-block model selection.
    # Measured (REFERENCE_EVAL_GHAC.md round 4): archived-100 macro F1
    # 0.8683 -> 0.8766, ZERO blocks regressing > 0.02. A variant must
    # beat the default's capture by > select_margin to be chosen
    # (hysteresis: equal-capture blocks keep round-3 behavior).
    weakm = np.zeros((n, n), dtype=bool)
    if "is_weak" in pairs_pdf.columns:
        for ia, ib, w in zip(
            pairs_pdf["id_a"], pairs_pdf["id_b"], pairs_pdf["is_weak"]
        ):
            a, b = pos.get(ia), pos.get(ib)
            if a is None or b is None or not w:
                continue
            weakm[a, b] = weakm[b, a] = True
    # the menu exists only where weak evidence exists: blocks whose
    # pairs are all coauthor-backed keep the single default variant
    # (selection never second-guesses the semantic channel there —
    # measured equivalent on the real corpus, and it keeps the
    # operator contract simple: doc_vecs=ON means semantics apply).
    if weakm.any():
        variants: list[tuple[float, float]] = [
            (g, sem_alpha) for g in tuple(weak_gammas)
        ]
        if sem_alpha > 0 and semm is not None:
            variants += [(1.0, 0.0), (0.45, 0.0)]
        variants = list(dict.fromkeys(variants))
    else:
        variants = [(1.0, sem_alpha)]
    strongm = np.where(weakm, 0.0, sim_struct)
    strong_total = strongm.sum()

    def labels_for(sim_v, kk):
        return _average_linkage(-sim_v, kk)

    best = None  # (capture, labels, k_used)
    default_capture = None
    for g, a in variants:
        sim_v = np.where(weakm, sim_struct * g, sim_struct)
        if a > 0 and semm is not None:
            sim_v = sim_v + a * semm
        if k is None:
            # reference k-search (name_disambiguation.py:597-687):
            # bounds from CC of the (sim > tau) and (sim > 0) graphs;
            # argmax modularity over HAC labelings.
            k_lo = max(2, _components(sim_struct > tau))
            k_hi = max(k_lo, _components(sim_struct > 0))
            best_q, labels, k_used = -np.inf, None, k_lo
            for kk in range(k_lo, k_hi + 1):
                lab = labels_for(sim_v, kk)
                q = _modularity(mod_adj, lab)
                if q > best_q:
                    best_q, labels, k_used = q, lab, kk
        else:
            k_used = min(k, n)
            labels = labels_for(sim_v, k_used)
        if strong_total > 0:
            same = labels[:, None] == labels[None, :]
            capture = strongm[same].sum() / strong_total
        else:
            capture = 0.0
        if default_capture is None:
            default_capture = capture
            best = (capture, labels, k_used)
        elif capture > max(best[0], default_capture + select_margin):
            best = (capture, labels, k_used)
    _, labels, k_used = best
    method = "modularity-search" if k is None else "fixed-k"

    return pd.DataFrame(
        {
            "block_key": block,
            "pub_id": ids,
            "hac_cluster": labels.astype(np.int32),
            "k_used": np.int32(k_used),
            "method": method,
        }
    )


def ghac_clusters(
    pubs: DataFrame,
    scored: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    k_from_labels: bool = True,
    score_col: str = "score",
    max_block_for_dense: int = 400,
    preclust_tau: float | None = None,
    modularity_graph: str = "sim",
    doc_vecs: DataFrame | None = None,
) -> DataFrame:
    """Per-block GHAC labels via cogrouped applyInPandas.

    ``doc_vecs`` (operators.semantic.document_vectors output) switches
    on the semantic channel: per-block dense doc-vector cosines are
    added to the sim matrix at ``config.semantic_alpha`` (cosines
    below ``config.semantic_cos_floor`` dropped). Measured on the
    reference's labeled AMiner corpus (REFERENCE_EVAL_GHAC.md):
    archived-100 macro F1 0.8528 -> 0.8705.

    k_from_labels=True mirrors the reference's standard mode (k =
    count of distinct truth labels per block, ``:1229``); False mirrors
    OpenAlex mode (modularity k-search). Blocks larger than
    ``max_block_for_dense`` return hac_cluster = -1 (caller keeps the
    distributed CC assignment for them — counted, never silent).

    ``preclust_tau`` is the k-search lower-bound edge threshold: the
    reference zeroes sim <= 0.9 before counting components
    (``name_disambiguation.py:86,599``) because its sims are
    sigmoid(dot) of learned embeds clustered near 1. This engine's
    fused scores live on a different scale, so the default (None) is a
    DELIBERATE adaptation: config.match_threshold — the calibrated
    match bar on the fused scale. Pass 0.9 explicitly for literal
    reference-constant behavior on sigmoid-scaled inputs.
    """
    tau = config.match_threshold if preclust_tau is None else preclust_tau
    max_n = max_block_for_dense

    if k_from_labels and "label" in pubs.columns:
        kdim = pubs.groupBy("block_key").agg(
            F.countDistinct("label").alias("_k")
        )
        p = pubs.join(kdim, "block_key").select(
            "block_key", "pub_id", F.col("_k").cast("int").alias("_k")
        )
    else:
        p = pubs.select(
            "block_key", "pub_id", F.lit(None).cast("int").alias("_k")
        )
    sem_alpha = 0.0
    if doc_vecs is not None and config.semantic_alpha > 0:
        sem_alpha = config.semantic_alpha
        p = p.join(
            doc_vecs.select("block_key", "pub_id", "vec"),
            ["block_key", "pub_id"],
            "left",
        )
    use_combined = modularity_graph == "combined"
    cols = ["block_key", "id_a", "id_b", F.col(score_col).alias("score")]
    if "is_weak" in scored.columns:
        cols.append("is_weak")
    if use_combined and {
        "w_coauthor", "w_title", "w_venue"
    } <= set(scored.columns):
        # the reference's combined G sums the raw relation weights
        # (name_disambiguation.py:978-988); org is excluded for parity
        # (the reference never wires it)
        cols.append(
            (
                F.col("w_coauthor") + F.col("w_title") + F.col("w_venue")
            ).alias("w_combined")
        )
    s = scored.select(*cols)

    def fn(pubs_pdf: pd.DataFrame, pairs_pdf: pd.DataFrame) -> pd.DataFrame:
        k = None
        if len(pubs_pdf) and pubs_pdf["_k"].notna().any():
            k = int(pubs_pdf["_k"].dropna().iloc[0])
        if k is not None and k <= 0:
            # all-NULL label column -> countDistinct == 0: no usable
            # truth, fall back to the k-search path instead of feeding
            # k=0 into the linkage (which would emit garbage labels).
            k = None
        return _ghac_block(
            pubs_pdf, pairs_pdf, k, tau, max_n, use_combined,
            sem_alpha=sem_alpha, sem_floor=config.semantic_cos_floor,
            weak_gammas=tuple(config.ghac_weak_gammas),
            select_margin=config.ghac_select_margin,
        )

    return (
        p.groupBy("block_key")
        .cogroup(s.groupBy("block_key"))
        .applyInPandas(fn, GHAC_SCHEMA)
    )
