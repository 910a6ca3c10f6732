"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Patterns (ray_guide "Aggregation at scale"):
  exact      — content hash per batch (vectorized) → hash-partitioned
               groupby → keep the min-id row per group
  minhash    — shingle → minhash signature per row (numpy) → explode to
               (band_id, band_hash, id) rows → groupby bands → candidate
               groups → pairwise signature-estimated Jaccard
  simhash    — 64-bit simhash per row; equal-prefix buckets group near-dups
  embedding  — random-hyperplane LSH buckets + exact cosine verify

Each stage emits only ids/hashes/signatures across shuffles — never the
original payload — so the wide steps stay narrow at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketches import hash64


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of character k-shingles of lowercased text."""
    t = " ".join(text.lower().split()) if text else ""
    if len(t) < k:
        t = t.ljust(k, "_")
    data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    # rolling windows → dot with byte weights → mix
    windows = np.lib.stride_tricks.sliding_window_view(data, min(k, len(data)))
    weights = (np.uint64(31) ** np.arange(windows.shape[1], dtype=np.uint64))
    with np.errstate(over="ignore"):
        raw = (windows.astype(np.uint64) * weights).sum(axis=1)
    return np.unique(hash64(raw))


class MinHasher:
    """Per-batch minhash signatures: ``num_perm`` permutations via the
    (a*x+b) mod p universal-hash family, vectorized over shingles."""

    def __init__(
        self,
        column: str = "text",
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        seed: int = 7,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.column = column
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.a = rng.integers(1, 2**61 - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 2**61 - 1, size=num_perm, dtype=np.uint64)
        self.p = np.uint64(2**61 - 1)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hashes → min along shingles
            vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % self.p
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch[self.column].to_pylist()]
        arr = pa.array([s.astype(np.int64).tolist() for s in sigs], pa.list_(pa.int64()))
        return batch.append_column("minhash", arr)


class BandExploder:
    """Explode signatures into (band_id, band_hash, id, minhash) rows for
    the LSH groupby. Band hashes are computed vectorized over the whole
    batch: (n, bands, rows_per_band) → mix → (n, bands)."""

    def __init__(self, id_column: str, bands: int = 16, rows_per_band: int = 4):
        self.id_column = id_column
        self.bands = bands
        self.rows_per_band = rows_per_band

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column]
        sigs = batch["minhash"].to_pylist()
        n = len(sigs)
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    self.id_column: pa.array([], ids.type),
                    "minhash": pa.array([], pa.list_(pa.int64())),
                }
            )
        sig_mat = np.asarray(sigs, dtype=np.uint64).reshape(
            n, self.bands, self.rows_per_band
        )
        with np.errstate(over="ignore"):
            band_offsets = np.arange(self.bands, dtype=np.uint64)[None, :, None]
            mixed = hash64((sig_mat + band_offsets).reshape(-1)).reshape(
                n, self.bands, self.rows_per_band
            )
            band_hash = (
                mixed.sum(axis=2, dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF)
            ).astype(np.int64)
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)
        # each source row repeats `bands` times
        idx = np.repeat(np.arange(n), self.bands)
        # signatures travel as fixed-width binary — a list<int64> column
        # multiplied sort-shuffle payload and serialization cost
        sig_blobs = [sig_mat[i].tobytes() for i in range(n)]
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_hash": pa.array(band_hash.reshape(-1), pa.int64()),
                self.id_column: ids.take(pa.array(idx)),
                "minhash": pa.array([sig_blobs[i] for i in idx], pa.binary()),
            }
        )


def minhash_lsh_pairs(ds, column: str, id_column: str, *, num_perm=64, bands=16,
                      min_jaccard: float = 0.5, batch_size: int = 4096,
                      num_buckets: int = 128):
    """Near-duplicate candidate pairs with signature-estimated Jaccard.

    Returns a Dataset of (id_a, id_b, est_jaccard), id_a < id_b, deduped.

    Shuffle keys are coarse buckets of the band hash (and of the pair key
    for the final dedup) — one Ray group per bucket, with the exact
    per-(band, band_hash) candidate grouping done vectorized inside the
    bucket, so per-group task overhead stays O(num_buckets).
    """
    import pandas as pd

    hasher = MinHasher(column=column, num_perm=num_perm, bands=bands)
    sigs = ds.select_columns([id_column, column]).map_batches(
        hasher, batch_format="pyarrow", batch_size=batch_size
    ).select_columns([id_column, "minhash"])
    exploded = sigs.map_batches(
        BandExploder(id_column, bands, num_perm // bands),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bucket = pc.cast(
            pc.bit_wise_and(batch["band_hash"], num_buckets - 1), pa.int32()
        )
        return batch.append_column("__bucket", bucket)

    _triu_cache: dict = {}

    def _triu(k: int):
        got = _triu_cache.get(k)
        if got is None:
            got = _triu_cache[k] = np.triu_indices(k, 1)
        return got

    def emit_pairs(bucket_group: pd.DataFrame) -> pd.DataFrame:
        # One vectorized pass per bucket (per-group pandas iteration cost
        # ~370 µs × 10^4 groups): keep only rows whose band hash repeats,
        # sort once, build ragged all-pairs index arrays per group, compare
        # every candidate pair's signatures in chunked numpy.
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "est_jaccard": pd.Series([], dtype=float)}
        )
        g = bucket_group[
            bucket_group.duplicated(["band_id", "band_hash"], keep=False)
        ]
        if g.empty:
            return empty
        g = g.sort_values(["band_id", "band_hash", id_column], kind="mergesort")
        ids = g[id_column].to_numpy()
        bh = g["band_hash"].to_numpy()
        bi = g["band_id"].to_numpy()
        boundary = np.flatnonzero(
            np.concatenate(([True], (bh[1:] != bh[:-1]) | (bi[1:] != bi[:-1])))
        )
        counts = np.diff(np.concatenate((boundary, [len(g)])))
        pair_i, pair_j = [], []
        for s, k in zip(boundary.tolist(), counts.tolist()):
            if k < 2:
                continue
            ii, jj = _triu(k)
            pair_i.append(ii + s)
            pair_j.append(jj + s)
        if not pair_i:
            return empty
        I = np.concatenate(pair_i)
        J = np.concatenate(pair_j)
        sig = np.frombuffer(b"".join(g["minhash"]), dtype=np.uint64).reshape(
            len(g), -1
        )
        ests = np.empty(len(I), dtype=np.float64)
        chunk = 65536  # bound the gathered operand allocation
        for s in range(0, len(I), chunk):
            e = min(len(I), s + chunk)
            ests[s:e] = (sig[I[s:e]] == sig[J[s:e]]).mean(axis=1)
        keep = (ests >= min_jaccard) & (ids[I] != ids[J])
        return pd.DataFrame(
            {
                "id_a": ids[I[keep]],
                "id_b": ids[J[keep]],
                "est_jaccard": ests[keep],
            }
        )

    pairs = (
        exploded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(emit_pairs, batch_format="pandas")
    )

    # a pair can surface from several bands (different buckets) — dedup in
    # ONE coalesced task: surviving pairs are near-duplicate *violations*,
    # a vanishing fraction of the input (a second key-partitioned shuffle
    # here measured 2-3 s of pure overhead; for workloads where pairs are
    # NOT rare, bucket the pair key and groupby instead)
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        out = df.sort_values(["id_a", "id_b"]).drop_duplicates(["id_a", "id_b"])
        return out[["id_a", "id_b", "est_jaccard"]]

    return pairs.repartition(1).map_batches(
        dedup_pairs, batch_format="pandas", batch_size=None
    )


class SimHasher:
    """64-bit SimHash over word hashes; ``simhash_bucket`` = top-``prefix``
    bits for bucketed near-dup grouping."""

    def __init__(self, column: str = "text", prefix_bits: int = 16):
        self.column = column
        self.prefix_bits = prefix_bits

    def simhash(self, text: str) -> int:
        from .sketches import hash_strings

        words = text.lower().split() if text else []
        if not words:
            return 0
        # NB: deterministic hashing (not builtin hash(): PYTHONHASHSEED varies
        # per Ray worker process)
        hs = hash_strings(words)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (bits * 2 - 1).sum(axis=0)
        out = np.uint64(0)
        for i in range(64):
            if v[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out & np.uint64(0x7FFFFFFFFFFFFFFF))

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self.simhash(t) for t in batch[self.column].to_pylist()]
        out = batch.append_column("simhash", pa.array(vals, pa.int64()))
        bucket = [v >> (63 - self.prefix_bits) for v in vals]
        return out.append_column("simhash_bucket", pa.array(bucket, pa.int64()))


def exact_dedup(ds, column: str, id_column: str, *, batch_size: int = 8192,
                num_buckets: int = 128):
    """Exact dedup: keep the minimum-id row per distinct column value.

    The shuffle key is ``content_hash % num_buckets`` — NOT the raw hash:
    grouping by the full hash makes one (Ray) group per distinct value,
    and per-group task overhead dominates (measured 5ms/group). Bucketing
    keeps the shuffle coarse; the exact per-value dedup happens vectorized
    inside each bucket. Equivalent SQL: SELECT min(id), value GROUP BY value.
    """
    import pandas as pd
    import zlib

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [
            zlib.crc32((t or "").encode("utf-8")) % num_buckets
            for t in batch[column].to_pylist()
        ]
        return batch.append_column("__bucket", pa.array(buckets, pa.int32()))

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(id_column).drop_duplicates(subset=[column], keep="first")
        return out[[id_column, column]]

    return (
        ds.select_columns([id_column, column])
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__bucket")
        .map_groups(keep_min, batch_format="pandas")
    )


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (verification kernel for candidates)."""
    sa, sb = set(_shingle_hashes(a, k).tolist()), set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))
