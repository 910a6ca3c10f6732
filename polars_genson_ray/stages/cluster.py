"""Distributed spherical k-means over an embedding column.

The corpus-organization primitive behind semantic dedup, topic balancing
and curriculum bucketing in training-data pipelines (SemDeDup-style: embed
→ cluster → prune/balance within clusters).

Scale shape:

* **fit is sample-based by default** (the IVF/FAISS/MiniBatch convention:
  quantizer training is always on a bounded sample): a seeded Bernoulli
  sample of ≤ ``fit_sample`` rows is drawn once, canonically ordered, and
  Lloyd's iterations run on it driver-side — fit memory and compute are
  O(fit_sample × dim) regardless of corpus size.  Pinning the full
  projected embedding column instead (the round-3 design) is a named
  scale-killer: at 10^10 rows × 768-d float32 the projection alone is
  ~30 TB, exceeding any cluster's aggregate object store;
* ``fit_sample=None`` opts into the exact full-corpus fit: each Lloyd
  iteration is ONE fresh streaming pass over the dataset (per-batch
  vectorized assignment reduced to ≤ k partial rows per batch; the driver
  merge handles O(k × num_blocks) tiny rows).  Nothing is pinned — the
  scan is re-planned per iteration, trading repeated reads for zero
  resident footprint;
* final assignment is a broadcast map (centroids ``ray.put`` once) — no
  shuffle anywhere in fit or assign.

Determinism: seeded init; partial sums are float64, so cross-run block
ordering can flip a point sitting exactly on a Voronoi boundary —
irrelevant for separated clusters, noted for exact-replay consumers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .similarity import _embedding_matrix, _normalize, sample_embedding_rows


def _kmeanspp_init(sample: np.ndarray, k: int, seed: int,
                   *, canonical: bool = False) -> np.ndarray:
    """k-means++ seeding on the (normalized, canonically ordered) sample.

    The sample is lexsorted first: ``take_all()`` block order is not
    deterministic across runs, and the init must not depend on it.
    kmeans++ (farthest-point-biased) seeding also avoids the
    two-seeds-in-one-blob local optimum plain random init falls into.
    ``canonical=True`` asserts the caller already normalized + lexsorted
    (the sampled-fit path canonicalizes once for init AND Lloyd's).
    """
    if canonical:
        x = sample
    else:
        x = _normalize(sample)
        x = x[np.lexsort(x.T)]
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    centroids = [x[int(rng.integers(len(x)))]]
    d = np.maximum(1.0 - x @ centroids[0], 0.0)
    for _ in range(k - 1):
        total = d.sum()
        if total <= 0:
            idx = int(rng.integers(len(x)))
        else:
            idx = int(rng.choice(len(x), p=d / total))
        c = x[idx]
        centroids.append(c)
        d = np.minimum(d, np.maximum(1.0 - x @ c, 0.0))
    return np.asarray(centroids)


class _AssignPartial:
    """Per-batch partial: (cluster, n, vsum) — ≤ k rows per batch."""

    def __init__(self, centroids_ref, column: str):
        self.centroids_ref = centroids_ref
        self.column = column
        self._c = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._c is None:
            c = self.centroids_ref
            self._c = ray.get(c) if isinstance(c, ray.ObjectRef) else c
        emb = _embedding_matrix(batch[self.column])
        if emb.size == 0:
            return pa.table({
                "cluster": pa.array([], type=pa.int32()),
                "n": pa.array([], type=pa.int64()),
                "vsum": pa.array([], type=pa.list_(pa.float64())),
            })
        x = _normalize(emb)
        assign = np.argmax(x @ self._c.T, axis=1)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        uniq, starts = np.unique(sorted_assign, return_index=True)
        sums = np.add.reduceat(x[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(assign)))
        return pa.table({
            "cluster": pa.array(uniq.astype(np.int32)),
            "n": pa.array(counts.astype(np.int64)),
            "vsum": pa.array(list(sums)),
        })


def kmeans_fit(
    ds,
    *,
    column: str = "embedding",
    k: int = 8,
    iters: int = 10,
    tol: float = 1e-4,
    seed: int = 5,
    init_sample: int = 2048,
    fit_sample: int | None = 65536,
    approx_rows: int | None = None,
    batch_size: int = 4096,
) -> np.ndarray:
    """Fit k spherical centroids (unit-norm, cosine assignment).

    Returns the (k, dim) float64 centroid matrix.  ``iters`` bounds the
    Lloyd passes; the loop stops early when the max centroid shift
    (1 - cos(old, new)) drops below ``tol`` — past 1e-4 cosine shift the
    assignment changes affect only boundary points (a dedup/curation
    quantizer doesn't need the final 1e-6 wobble; pass a tighter ``tol``
    when it does).

    ``fit_sample`` (default 65536) bounds fit memory: Lloyd's runs
    driver-side on a seeded, canonically-ordered sample of at most that
    many rows — O(fit_sample × dim), independent of corpus size, and
    k-means quality is sample-stable (the quantizer-training convention).
    Datasets smaller than the bound are fitted in full either way.

    Every sampling draw in this function requires ``approx_rows`` (it
    sets the Bernoulli rate; without it ``sample_embedding_rows`` falls
    back to the positional head of the dataset — a badly biased quantizer
    on position-clustered corpora). When the caller omits it, the row
    count is derived once via ``ds.count()`` — a metadata lookup on plain
    reads, at worst one streaming pass on mapped datasets, and strictly
    cheaper than the biased alternative or ``iters`` extra scans.
    ``fit_sample=None`` requests the exact full-corpus fit: one fresh
    streaming scan per Lloyd iteration (per-batch ≤ k partial rows),
    nothing pinned or materialized.
    """
    if approx_rows is None:
        approx_rows = ds.count()
    if fit_sample is not None:
        n_fit = max(int(fit_sample), init_sample)
        sample = sample_embedding_rows(ds, column=column, n=n_fit,
                                       approx_rows=approx_rows, seed=seed)
        x = _normalize(sample)
        # canonical order ONCE for init and Lloyd's: take_all() block
        # arrival order must not leak into the (order-sensitive) float64
        # partial sums
        x = x[np.lexsort(x.T)]
        centroids = _kmeanspp_init(x, k, seed=seed, canonical=True)
        for _ in range(iters):
            assign = np.argmax(x @ centroids.T, axis=1)
            order = np.argsort(assign, kind="stable")
            sa = assign[order]
            uniq, starts = np.unique(sa, return_index=True)
            sums = np.add.reduceat(x[order], starts, axis=0)
            counts = np.diff(np.append(starts, len(sa)))
            new = centroids.copy()
            new[uniq] = _normalize(sums / counts[:, None])
            shift = 1.0 - np.einsum("ij,ij->i", new, centroids)
            centroids = new
            if float(shift.max()) < tol:
                break
        return centroids

    proj = ds.select_columns([column])
    sample = sample_embedding_rows(proj, column=column, n=init_sample,
                                   approx_rows=approx_rows, seed=seed)
    centroids = _kmeanspp_init(sample, k, seed=seed)

    for _ in range(iters):
        ref = ray.put(centroids)
        partials = proj.map_batches(
            _AssignPartial(ref, column),
            batch_format="pyarrow",
            batch_size=batch_size,
        ).take_all()
        dim = centroids.shape[1]
        sums = np.zeros((len(centroids), dim))
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in partials:
            c = int(r["cluster"])
            sums[c] += np.asarray(r["vsum"], dtype=np.float64)
            counts[c] += int(r["n"])
        new = centroids.copy()
        nonzero = counts > 0
        new[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
        shift = 1.0 - np.einsum("ij,ij->i", new, centroids)
        centroids = new
        if float(shift.max()) < tol:
            break
    return centroids


class _AssignFinal:
    def __init__(self, centroids_ref, id_column: str, column: str):
        self.centroids_ref = centroids_ref
        self.id_column = id_column
        self.column = column
        self._c = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._c is None:
            c = self.centroids_ref
            self._c = ray.get(c) if isinstance(c, ray.ObjectRef) else c
        emb = _embedding_matrix(batch[self.column])
        if emb.size == 0:
            return pa.table({
                self.id_column: batch.column(self.id_column),
                "cluster": pa.array([], type=pa.int32()),
                "cosine": pa.array([], type=pa.float64()),
            })
        sims = _normalize(emb) @ self._c.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(assign)), assign]
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "cluster": pa.array(assign.astype(np.int32)),
            "cosine": pa.array(best),
        })


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    *,
    id_column: str = "vec_id",
    column: str = "embedding",
    batch_size: int = 4096,
):
    """Broadcast-assign every row to its nearest centroid.

    Returns a Dataset of (id, cluster, cosine) — the id→cluster map a
    downstream per-cluster prune/balance stage groups on.
    """
    ref = ray.put(np.asarray(centroids, dtype=np.float64))
    return ds.select_columns([id_column, column]).map_batches(
        _AssignFinal(ref, id_column, column),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def semantic_dedup(
    ds,
    *,
    id_column: str = "vec_id",
    column: str = "embedding",
    k: int = 10,
    threshold: float = 0.95,
    approx_rows: int | None = None,
    iters: int = 10,
    seed: int = 5,
    fit_sample: int | None = 65536,
):
    """SemDeDup (Abbas et al. 2023 shape): k-means the embedding space,
    then inside each cluster greedily drop every point whose cosine to an
    already-kept point exceeds ``threshold``.

    Keep order is deterministic: members sorted by (cosine-to-centroid
    DESC, id ASC), so the most central member of a duplicate group
    survives and reruns reproduce the same survivor set.

    Scale shape: the only payload-bearing exchange is the groupby on
    ``cluster`` — exactly the shuffle SemDeDup requires (pairwise sim is
    only computed within a cluster).  Choose ``k`` so corpus/k fits a
    worker (the same knob the paper scales).  The greedy verify inside a
    cluster is O(n_members × n_kept) vectorized rows — bounded by
    cluster size, not corpus size.

    Returns a Dataset of (id, cluster, keep, max_kept_cosine).
    """
    import pandas as pd

    centroids = kmeans_fit(
        ds, column=column, k=k, iters=iters, seed=seed,
        approx_rows=approx_rows, fit_sample=fit_sample,
    )
    ref = ray.put(centroids)

    class AssignCarry:
        """Tag (id, embedding) rows with cluster + centroid cosine."""

        def __init__(self):
            self._c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._c is None:
                self._c = ray.get(ref)
            emb = _embedding_matrix(batch[column])
            if emb.size == 0:
                t = batch.select([id_column, column])
                t = t.append_column("cluster", pa.array([], type=pa.int32()))
                return t.append_column("ccos", pa.array([], type=pa.float64()))
            sims = _normalize(emb) @ self._c.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(assign)), assign]
            t = batch.select([id_column, column])
            t = t.append_column("cluster", pa.array(assign.astype(np.int32)))
            return t.append_column("ccos", pa.array(best))

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ccos", id_column],
                            ascending=[False, True]).reset_index(drop=True)
        emb = _normalize(np.asarray(
            [np.asarray(v, dtype=np.float64) for v in df[column]]
        ))
        n = len(df)
        keep = np.zeros(n, dtype=bool)
        max_cos = np.zeros(n)
        kept_idx: list[int] = []
        for i in range(n):
            if kept_idx:
                sims = emb[kept_idx] @ emb[i]
                m = float(sims.max())
            else:
                m = 0.0
            max_cos[i] = m
            if m < threshold:
                keep[i] = True
                kept_idx.append(i)
        return pd.DataFrame({
            id_column: df[id_column],
            "cluster": df["cluster"],
            "keep": keep,
            "max_kept_cosine": max_cos,
        })

    assigned = ds.select_columns([id_column, column]).map_batches(
        AssignCarry(), batch_format="pyarrow"
    )
    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pandas"
    )
