"""Exact set-similarity self-join (prefix-filter / AllPairs family).

Unlike the MinHash path in :mod:`.dedup` (probabilistic candidates,
signature-estimated Jaccard), this operator is EXACT: it finds every pair
of documents whose word-n-gram Jaccard similarity meets ``threshold`` —
no false negatives, verified true Jaccard on every emitted pair. The
price is carrying each doc's full shingle-hash set through the verify
phase, so it suits moderate thresholds (≥0.5) where the prefix filter
prunes hard; below that, MinHash+LSH with a verify pass is the right tool.

Algorithm (Bayardo et al. "Scaling Up All Pairs Similarity Search" /
Chaudhuri et al. SSJoin — public literature; also the MapReduce layout of
Vernica et al. 2010):

  1. tokenize:   per batch, each doc → sorted unique uint64 hashes of its
                 word n-gram shingles (one narrow (id, blob) dataset).
  2. prefix:     a pair with Jaccard ≥ t must share a shingle within each
                 doc's PREFIX of length ``n - ceil(t*n) + 1`` under any
                 fixed global total order of the shingle universe (we use
                 the hash value itself — uniform, so prefixes spread
                 evenly). Emit only (prefix_shingle, id) rows — ids, never
                 payload, cross this exchange.
  3. candidates: bucket the shingle hash (bucket count scaled to data /
                 cluster, as everywhere else), groupby bucket, vectorized
                 within-bucket pair generation for rows sharing the exact
                 shingle; dedup pairs with the size-adaptive exchange
                 shared with MinHash (:func:`.dedup.dedup_pair_dataset`).
  4. verify:     attach each side's shingle blob to the pair and compute
                 true Jaccard (sorted-array intersection). Small token
                 tables broadcast via ``ray.put`` (one object-store copy,
                 shared-memory reads per task); large ones attach via two
                 ``Dataset.join`` passes keyed by id — pairs are the
                 *reduced* output, so both joins are narrow.

Scale notes: step 2's row count is ``(1-t)·|shingles|`` per doc; step 3
groups are per-distinct-shingle (bounded by doc frequency of that
shingle — the classic hot key here is a stopword n-gram, which the
prefix filter already biases against since hot shingles are no more
likely to be prefix members under hash order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _derive_num_buckets, dedup_pair_dataset
from .sketches import hash_strings, re2_words


# Horner multiplier combining consecutive word hashes into a gram hash:
# g[i] = mix(((wh[i]·M) + wh[i+1])·M + wh[i+2] ...) — words hash once,
# grams never materialize as strings (3× shorter hash inputs, no joins)
_GRAM_M = np.uint64(0x100000001B3)


def _gram_hashes_flat(wh: np.ndarray, n: int) -> np.ndarray:
    """Gram hashes of every n-window over a flat word-hash array (windows
    straddling document boundaries are discarded by the caller's gather)."""
    W = len(wh) - n + 1
    if W <= 0:
        return np.zeros(0, dtype=np.uint64)
    acc = np.zeros(W, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            np.multiply(acc, _GRAM_M, out=acc)
            np.add(acc, wh[j : j + W], out=acc)
    from .sketches import hash64

    return hash64(acc)


def word_ngram_hashes(text: str | None, n: int = 3) -> np.ndarray:
    """Sorted unique uint64 hashes of lowercased word n-grams. Docs with
    fewer than ``n`` words have no shingles (empty array) and never join —
    mirrors the SQL formulation ``WHERE len(words) >= n``."""
    words = re2_words(text)
    if len(words) < n:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(_gram_hashes_flat(hash_strings(words), n))


class ShingleTokens:
    """map_batches: (id, text) → (id, shingles: binary blob of the sorted
    unique uint64 shingle hashes, n_shingles)."""

    def __init__(self, column: str, id_column: str, ngram_words: int = 3):
        self.column = column
        self.id_column = id_column
        self.n = ngram_words

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.column].to_pylist()
        n = self.n
        word_lists = [re2_words(t) for t in texts]
        counts = np.fromiter(
            (len(w) for w in word_lists), count=len(word_lists), dtype=np.int64
        )
        all_words = [w for ws in word_lists for w in ws]
        # ONE string-hash pass for the whole batch, then vectorized Horner
        # gram combination over the flat array; per-doc slices gathered by
        # boundary-aware indexing (same shape as MinHasher.signatures) —
        # bit-identical to word_ngram_hashes per row
        wh = hash_strings(all_words)
        flat = _gram_hashes_flat(wh, n)
        starts = np.concatenate(([0], np.cumsum(counts)))
        vcounts = np.maximum(counts - n + 1, 0)
        blobs = []
        for i, vc in enumerate(vcounts.tolist()):
            if vc == 0:
                blobs.append(b"")
                continue
            s = starts[i]
            blobs.append(np.unique(flat[s : s + vc]).tobytes())
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "shingles": pa.array(blobs, pa.binary()),
                "n_shingles": pa.array(
                    [len(b) // 8 for b in blobs], pa.int32()
                ),
            }
        )


def _prefix_len(n: int, threshold: float) -> int:
    # prefix-filter bound: sharing NO prefix element implies the overlap is
    # at most n - p < ceil(t*n) <= |A∩B| required by J >= t — contradiction
    return n - int(np.ceil(threshold * n)) + 1


class PrefixExplode:
    """map_batches: token rows → (shingle: int64, id) rows for each doc's
    prefix shingles only.

    ``hot_ref``: broadcast sorted array of high-document-frequency shingle
    hashes (boilerplate n-grams). The global total order becomes
    (is_hot, hash) — hot shingles sort LAST, so they only enter a prefix
    when a doc has almost nothing else. Without this, one boilerplate
    sentence shared by the corpus lands its shingles in ~(1-t) of all
    prefixes and the candidate groups go quadratic (the frequency-ordered
    prefix of Bayardo et al. exists precisely for this). ANY consistent
    total order preserves exactness, so the hot set only needs to be the
    same for every doc in the run — it is estimated from a sample."""

    def __init__(self, id_column: str, threshold: float, hot_ref=None):
        self.id_column = id_column
        self.threshold = threshold
        self.hot_ref = hot_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        hot = None
        if self.hot_ref is not None:
            hot = ray.get(self.hot_ref)  # shared-memory read per task
            if len(hot) == 0:
                hot = None
        ids = batch[self.id_column]
        blobs = batch["shingles"].to_pylist()
        counts = batch["n_shingles"].to_numpy()
        out_sh: list[np.ndarray] = []
        rep_idx: list[int] = []
        for i, (blob, n) in enumerate(zip(blobs, counts.tolist())):
            if n == 0:
                continue
            p = _prefix_len(n, self.threshold)
            # blob is sorted ascending by hash; with a hot set the order
            # becomes (is_hot, hash): stable-partition non-hot first
            arr = np.frombuffer(blob, dtype=np.uint64)
            if hot is not None:
                pos = np.searchsorted(hot, arr)
                pos[pos >= len(hot)] = len(hot) - 1
                is_hot = hot[pos] == arr
                if is_hot.any():
                    arr = np.concatenate([arr[~is_hot], arr[is_hot]])
            out_sh.append(arr[:p])
            rep_idx.extend([i] * p)
        if not out_sh:
            return pa.table(
                {
                    "shingle": pa.array([], pa.int64()),
                    self.id_column: pa.array([], ids.type),
                }
            )
        sh = np.concatenate(out_sh).astype(np.int64)
        return pa.table(
            {
                "shingle": pa.array(sh, pa.int64()),
                self.id_column: ids.take(pa.array(rep_idx, pa.int32())),
            }
        )


def _pair_jaccard(blob_a: bytes, blob_b: bytes) -> float:
    a = np.frombuffer(blob_a, dtype=np.uint64)
    b = np.frombuffer(blob_b, dtype=np.uint64)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def set_similarity_join(
    ds,
    column: str,
    id_column: str,
    *,
    threshold: float = 0.8,
    ngram_words: int = 3,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
    broadcast_limit: int = 500_000,
    batch_size: int = 4096,
    hot_sample: int = 2048,
    hot_doc_frac: float = 0.05,
):
    """All pairs (id_a < id_b) with exact word-``ngram_words``-gram Jaccard
    ≥ ``threshold``. Returns a Dataset of (id_a, id_b, jaccard).

    ``broadcast_limit``: token-table row bound under which the verify phase
    broadcasts the (id → shingle blob) map via ``ray.put``; above it the
    blobs attach with two ``Dataset.join`` passes instead (see module
    docstring).

    ``hot_sample``/``hot_doc_frac``: shingles appearing in more than
    ``hot_doc_frac`` of ``hot_sample`` sampled docs are treated as
    boilerplate and ordered last in every prefix (see
    :class:`PrefixExplode`) — a perf guard only; exactness never depends
    on the estimate.
    """
    import pandas as pd

    import ray

    if num_buckets is None:
        num_buckets = _derive_num_buckets(approx_rows)

    tokens = ds.select_columns([id_column, column]).map_batches(
        ShingleTokens(column, id_column, ngram_words),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    # tokens feed both the candidate and verify phases — materialize once
    # (narrow: id + hash blob, never the text)
    tokens = tokens.materialize()

    # estimate boilerplate shingles from a sample (doc frequency — blobs
    # hold unique shingles per doc) and broadcast the hot set
    hot = np.zeros(0, dtype=np.uint64)
    if hot_sample > 0:
        # scattered sample, not .limit() (head-of-dataset = first input
        # files — a corpus whose boilerplate starts past the head would
        # get an empty hot set and quadratic candidate groups, the exact
        # pathology this guard exists for)
        if approx_rows and approx_rows > hot_sample:
            frac = min(1.0, (hot_sample * 2) / approx_rows)
            sampled = tokens.random_sample(frac, seed=13).take_all()
            if len(sampled) > hot_sample:
                sampled = sampled[:hot_sample]
        else:
            sampled = tokens.limit(hot_sample).take_all()
        if sampled:
            cat = np.concatenate(
                [np.frombuffer(r["shingles"], dtype=np.uint64) for r in sampled]
            ) if any(len(r["shingles"]) for r in sampled) else np.zeros(
                0, dtype=np.uint64
            )
            if len(cat):
                vals, cnts = np.unique(cat, return_counts=True)
                hot = vals[cnts > hot_doc_frac * len(sampled)]
    hot_ref = ray.put(np.sort(hot))

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bucket = pc.cast(
            pc.bit_wise_and(batch["shingle"], num_buckets - 1), pa.int32()
        )
        return batch.append_column("__bucket", bucket)

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # rows sharing the exact shingle value are candidates; same ragged
        # all-pairs shape as dedup.minhash_lsh_pairs.emit_pairs
        empty = pd.DataFrame({"id_a": [], "id_b": []})
        g = group[group.duplicated("shingle", keep=False)]
        if g.empty:
            return empty
        g = g.sort_values(["shingle", id_column], kind="mergesort")
        ids = g[id_column].to_numpy()
        sh = g["shingle"].to_numpy()
        boundary = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
        counts = np.diff(np.concatenate((boundary, [len(g)])))
        pair_i, pair_j = [], []
        for s, k in zip(boundary.tolist(), counts.tolist()):
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            pair_i.append(ii + s)
            pair_j.append(jj + s)
        if not pair_i:
            return empty
        I = np.concatenate(pair_i)
        J = np.concatenate(pair_j)
        keep = ids[I] != ids[J]
        return pd.DataFrame({"id_a": ids[I[keep]], "id_b": ids[J[keep]]})

    # coarse batches into the candidate exchange: the bucket groupby is an
    # AllToAll sort whose cost at this row width is block-count-bound
    candidates = dedup_pair_dataset(
        tokens.map_batches(PrefixExplode(id_column, threshold, hot_ref),
                           batch_format="pyarrow", batch_size=8192)
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("__bucket")
        .map_groups(emit_pairs, batch_format="pandas"),
        value_columns=[],
    )

    n_tokens = tokens.count()
    if n_tokens <= broadcast_limit:
        blob_map = {
            r[id_column]: r["shingles"] for r in tokens.take_all()
        }
        blob_ref = ray.put(blob_map)

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {"id_a": [], "id_b": [],
                     "jaccard": pd.Series([], dtype=float)}
                )
            blobs = ray.get(blob_ref)  # shared-memory read per task
            jac = np.fromiter(
                (_pair_jaccard(blobs[a], blobs[b])
                 for a, b in zip(df["id_a"], df["id_b"])),
                count=len(df), dtype=np.float64,
            )
            out = df.assign(jaccard=jac)
            return out[out["jaccard"] >= threshold]

        return candidates.map_batches(verify, batch_format="pandas")

    # large token tables: repartition-join the blobs onto the pair rows
    # (pairs are the reduced output — both joins are narrow)
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    nparts = max(4, cpus // 2)
    side_a = candidates.join(
        tokens.select_columns([id_column, "shingles"]),
        join_type="inner", num_partitions=nparts,
        on=("id_a",), right_on=(id_column,),
    ).rename_columns({"shingles": "blob_a"})
    both = side_a.join(
        tokens.select_columns([id_column, "shingles"]),
        join_type="inner", num_partitions=nparts,
        on=("id_b",), right_on=(id_column,),
    ).rename_columns({"shingles": "blob_b"})

    def verify_joined(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "jaccard": pd.Series([], dtype=float)}
            )
        jac = np.fromiter(
            (_pair_jaccard(a, b) for a, b in zip(df["blob_a"], df["blob_b"])),
            count=len(df), dtype=np.float64,
        )
        out = df.assign(jaccard=jac)
        return out.loc[out["jaccard"] >= threshold, ["id_a", "id_b", "jaccard"]]

    return both.map_batches(verify_joined, batch_format="pandas")
