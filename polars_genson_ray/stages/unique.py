"""Exact uniqueness checking via sharded hash-index actors.

``Dataset.groupby(id)`` is the textbook exact-duplicate check, but it is a
full sort shuffle of every id — and its cost is a *constant* floor that
crushes scaling efficiency when the rest of the pipeline speeds up. A
duplicate check only needs set membership, not ordering, so this module
implements it as the one pattern the Dataset API genuinely can't express
(SURVEY.md §2.7 "shared mutable index"): K ``UniqueIndexShard`` actors each
own a hash shard of the id space; a ``map_batches`` router hashes each
batch's ids (vectorized), splits them by ``hash % K``, and asks each shard
which hashes were already seen. Work is O(rows), streams with the pipeline,
and scales with the shard count — no all-to-all barrier.

Semantics: the *second and later* occurrences of an id are reported (the
first observation registers it). Within-batch repeats are detected locally
before the RPC. Ray task retries would re-observe a batch and turn first
occurrences into false duplicates, so each observe call carries a token
derived from the (retry-stable) Ray TaskID plus the batch's ordinal within
the task; shards memoize responses per token, making observation
idempotent under retries. The memo is a bounded FIFO window (a retry
replays promptly; round 1 kept every token forever — O(rows observed)
actor heap).

Memory story at 10^12 ids: the shard state is a compact open-addressing
uint64 table (8 B/slot, ≤60% load → ~13 B/entry vs ~70 B for a Python int
set), sharded over K actors across the cluster. Beyond what cluster RAM
holds (~10^12 × 13 B / K per shard), exact global dedup cannot live in
memory at all, so each shard IMPLEMENTS the spill path (LSM shape): when
the live table reaches ``resident_limit`` entries it is flushed as a
sorted ``.npy`` run under ``spill_dir``; membership is answered by
vectorized ``searchsorted`` over the memory-mapped runs plus the live
table, and new keys are only ever inserted when absent from every run, so
runs stay pairwise disjoint by construction. Runs are compacted when
their count exceeds ``MAX_RUNS`` (bounding the per-lookup run fan-out)
via a bounded-memory k-way merge over the memmaps — resident memory is
``k × COMPACT_CHUNK`` keys regardless of run size. Spill is off by
default (``resident_limit=None``) — the in-RAM table alone is optimal
for the 10^8-10^9 ids per shard a node's heap holds.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

import ray

from .sketches import hash64, hash_strings


class UInt64Set:
    """Compact open-addressing set of non-zero uint64 keys (zero tracked by
    flag). Keys are pre-mixed 64-bit hashes, so the slot index is just the
    low bits; linear probing resolved in vectorized rounds — no per-key
    Python loop.
    """

    __slots__ = ("_table", "_mask", "_n", "_has_zero")

    def __init__(self, initial_pow2: int = 13):
        self._table = np.zeros(1 << initial_pow2, dtype=np.uint64)
        self._mask = np.uint64((1 << initial_pow2) - 1)
        self._n = 0
        self._has_zero = False

    def __len__(self) -> int:
        return self._n + (1 if self._has_zero else 0)

    def _grow(self, need: int) -> None:
        cap = len(self._table)
        while need > 0.6 * cap:
            cap *= 2
        if cap == len(self._table):
            return
        old = self._table[self._table != np.uint64(0)]
        self._table = np.zeros(cap, dtype=np.uint64)
        self._mask = np.uint64(cap - 1)
        self._n = 0
        self.add_many(old)  # all distinct, presence mask discarded

    def add_many(self, keys: np.ndarray) -> np.ndarray:
        """Insert ``keys``; returns a boolean mask of which were already
        present. Equal keys within one call: the first occurrence inserts
        and reports new, later ones report present (sequential-loop
        semantics)."""
        keys = keys.astype(np.uint64, copy=False)
        out = np.zeros(len(keys), dtype=bool)
        if len(keys) == 0:
            return out
        zeros = keys == np.uint64(0)
        if zeros.any():
            z_idx = np.flatnonzero(zeros)
            out[z_idx] = True
            if not self._has_zero:
                out[z_idx[0]] = False
                self._has_zero = True
        pending = np.flatnonzero(~zeros)
        if len(pending) == 0:
            return out
        self._grow(self._n + len(pending))
        table = self._table
        int_mask = int(self._mask)
        # multiply-shift mix for the HOME slot: shard routing consumes the
        # low bits (hash % num_shards), so masking raw keys would start
        # every key in a power-of-two shard on the same slot residue class
        # (severe probe clustering); the mix decorrelates slot from shard
        idx = (
            ((keys[pending] * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(17))
            & self._mask
        ).astype(np.int64)
        while len(pending):
            vals = table[idx]
            k = keys[pending]
            hit = vals == k
            out[pending[hit]] = True
            empty = vals == np.uint64(0)
            done = hit.copy()
            # occupied by a different key → advance to the next slot;
            # empty-slot losers stay put and re-check (the winner's key may
            # equal theirs next round)
            advance = ~hit & ~empty
            e_pos = np.flatnonzero(empty)
            if len(e_pos):
                slots = idx[e_pos]
                _, first = np.unique(slots, return_index=True)
                winners = e_pos[first]
                table[idx[winners]] = k[winners]
                self._n += len(winners)
                done[winners] = True
            keep = ~done
            pending = pending[keep]
            idx = (idx[keep] + advance[keep].astype(np.int64)) & int_mask
        return out

    def nbytes(self) -> int:
        return self._table.nbytes

    def keys(self) -> np.ndarray:
        """All stored keys, sorted ascending (zero included if present)."""
        occupied = self._table[self._table != np.uint64(0)]
        if self._has_zero:
            occupied = np.concatenate([[np.uint64(0)], occupied])
        return np.sort(occupied)


@ray.remote(num_cpus=0)
class UniqueIndexShard:
    """Owns one shard of the id-hash space. ``observe`` registers hashes and
    returns a boolean mask of which were already present (callers — the
    validation worker, DupRouter — map the mask back to ids themselves, so
    the shard holds only fixed-width hashes, never id strings).

    With ``resident_limit`` set, the live table spills to sorted runs under
    ``spill_dir`` (see module docstring) — same observe API, bounded heap.
    """

    # Retry-window tokens kept (FIFO eviction). This is the ONLY retry-
    # idempotence mechanism: a replayed task whose tokens were evicted
    # would re-register its hashes and falsely flag them as duplicates,
    # so the window must exceed the live token churn between a task's
    # first attempt and its rescheduled retry (churn ≈ in-flight tasks ×
    # batches/task). 32k tokens ≈ 20 MB/shard worst-case — cheap armor.
    MEMO_LIMIT = 32768
    MAX_RUNS = 8  # compact when exceeded: bounds per-lookup run fan-out

    def __init__(self, spill_dir: str | None = None,
                 resident_limit: int | None = None,
                 compact_chunk: int | None = None,
                 memo_limit: int | None = None):
        if memo_limit is not None:
            self.MEMO_LIMIT = memo_limit  # instance override (tests)
        self._seen = UInt64Set()
        self._memo: OrderedDict[str, list[bool]] = OrderedDict()
        self._spill_dir = spill_dir
        self._resident_limit = resident_limit
        self._runs: list[np.ndarray] = []  # sorted uint64 memmaps, disjoint
        self._run_no = 0
        if compact_chunk is not None:
            self.COMPACT_CHUNK = compact_chunk  # instance override (tests)
        if resident_limit is not None and spill_dir is None:
            raise ValueError("resident_limit requires spill_dir")
        if spill_dir is not None:
            import glob
            import os

            os.makedirs(spill_dir, exist_ok=True)
            # a fresh shard owns its directory: stale run files from a
            # crashed prior run are unreachable (_runs starts empty) and
            # only the low-numbered names would be overwritten — remove
            # them all so orphaned multi-TB spill never accumulates
            for stale in glob.glob(os.path.join(spill_dir, "run_*.npy")):
                try:
                    os.remove(stale)
                except OSError:
                    pass

    # -- spill machinery -------------------------------------------------
    def _in_runs(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership over the spilled sorted runs (binary
        search per run; runs are memory-mapped so only touched pages load)."""
        mask = np.zeros(len(hashes), dtype=bool)
        for run in self._runs:
            pos = np.searchsorted(run, hashes)
            inb = pos < len(run)
            if inb.any():
                idx = np.flatnonzero(inb)
                mask[idx] |= np.asarray(run[pos[idx]]) == hashes[idx]
        return mask

    def _maybe_spill(self) -> None:
        if self._resident_limit is None or len(self._seen) < self._resident_limit:
            return
        import os

        run = self._seen.keys()
        path = os.path.join(self._spill_dir, f"run_{self._run_no:06d}.npy")
        np.save(path, run)
        self._run_no += 1
        self._runs.append(np.load(path, mmap_mode="r"))
        self._seen = UInt64Set()
        if len(self._runs) > self.MAX_RUNS:
            self._compact_runs()

    COMPACT_CHUNK = 1 << 18  # ≈2 MB of keys per run per merge round

    def _compact_runs(self) -> None:
        """Bounded-memory k-way merge of the sorted runs into one run.
        Runs are pairwise disjoint, so this is a pure merge (no dedup).
        Each round picks a global boundary (the smallest chunk-ahead key
        across runs), gathers every run's keys below it (searchsorted
        slices off the memmaps), sorts that bounded chunk, and appends to
        the output memmap — resident memory ≤ k × COMPACT_CHUNK keys, not
        the total run size."""
        import os

        import numpy.lib.format as npf

        total = sum(len(r) for r in self._runs)
        path = os.path.join(self._spill_dir, f"run_{self._run_no:06d}.npy")
        self._run_no += 1
        out = npf.open_memmap(path, mode="w+", dtype=np.uint64, shape=(total,))
        cursors = [0] * len(self._runs)
        pos = 0
        while pos < total:
            bound = None
            for r, c in zip(self._runs, cursors):
                if c < len(r):
                    ahead = r[min(len(r) - 1, c + self.COMPACT_CHUNK)]
                    bound = ahead if bound is None else min(bound, ahead)
            parts = []
            for i, r in enumerate(self._runs):
                c = cursors[i]
                if c >= len(r):
                    continue
                e = int(np.searchsorted(r, bound, side="right"))
                if e > c:
                    parts.append(np.asarray(r[c:e]))
                    cursors[i] = e
            merged = np.sort(np.concatenate(parts))
            out[pos : pos + len(merged)] = merged
            pos += len(merged)
        out.flush()
        old = [r.filename for r in self._runs]
        del out
        self._runs = [np.load(path, mmap_mode="r")]
        for f in old:
            try:
                os.unlink(f)
            except OSError:
                pass

    def _register(self, hashes: np.ndarray) -> np.ndarray:
        """Present-mask across runs + live table; inserts unseen keys into
        the live table (never keys already in a run → runs stay disjoint)."""
        hashes = hashes.astype(np.uint64, copy=False)
        if not self._runs:
            out = self._seen.add_many(hashes)
            self._maybe_spill()
            return out
        out = self._in_runs(hashes)
        new_idx = np.flatnonzero(~out)
        if len(new_idx):
            out[new_idx] = self._seen.add_many(hashes[new_idx])
            self._maybe_spill()
        return out

    def observe(self, token: str, hashes: np.ndarray) -> list[bool]:
        memo = self._memo.get(token)
        if memo is not None:
            return memo
        out = self._register(hashes).tolist()
        self._memo[token] = out
        while len(self._memo) > self.MEMO_LIMIT:
            self._memo.popitem(last=False)
        return out

    def seed(self, hashes: np.ndarray) -> int:
        """Register hashes without duplicate reporting (resume: ids of
        already-validated fragments, replayed from checkpoint records)."""
        self._register(hashes)
        return self.size()

    def size(self) -> int:
        return len(self._seen) + sum(len(r) for r in self._runs)

    def num_runs(self) -> int:
        return len(self._runs)

    def memo_size(self) -> int:
        return len(self._memo)


def create_index(num_shards: int, *, spill_dir: str | None = None,
                 resident_limit: int | None = None) -> list:
    """K index-shard actors. ``spill_dir``/``resident_limit`` enable the
    LSM spill path (each shard gets its own subdirectory)."""
    import os

    # SPREAD: distribute shards across nodes so the per-node resident
    # budget (validation._derive_dup_resident_limit divides by shards
    # PER NODE) holds — default packing could co-locate every shard on
    # one node and OOM it before any spill valve opened
    return [
        UniqueIndexShard.options(scheduling_strategy="SPREAD").remote(
            spill_dir=None if spill_dir is None
            else os.path.join(spill_dir, f"shard_{i:03d}"),
            resident_limit=resident_limit,
        )
        for i in range(num_shards)
    ]


# reserved hash for null ids: they must neither crash the integer path
# nor alias a real id like str(None) == "None" would; all nulls conflate
# to one group (a null id is invalid, so "duplicate" is the safe report)
_NULL_ID_HASH = hash_strings(["\x00__null_id__"])[0]


def _id_hashes(ids) -> np.ndarray:
    n = len(ids)
    null_mask = np.fromiter((v is None for v in ids), dtype=bool, count=n)
    any_null = bool(null_mask.any())
    first_real = next((v for v in ids if v is not None), None)
    if n and isinstance(first_real, (int, np.integer)):
        vals = [0 if v is None else v for v in ids] if any_null else ids
        h = hash64(np.asarray(vals, dtype=np.uint64))
    else:
        h = hash_strings(["" if v is None else str(v) for v in ids])
    if any_null:
        h = h.copy()
        h[null_mask] = _NULL_ID_HASH
    return h


def route_observe(actors, token_base: str, ids: list) -> list:
    """Route one chunk's ids through the uniqueness-index shards (the ONE
    copy of the routing algorithm — the validation worker and DupRouter
    both call it): within-chunk repeats are duplicates outright; first
    occurrences fan out to their hash shard under the deterministic token
    ``{token_base}:{shard}`` so task retries replay memoized answers.
    Returns the duplicate ids observed in this chunk."""
    if not ids:
        return []
    hashes = _id_hashes(ids)
    _, first_idx = np.unique(hashes, return_index=True)
    first_mask = np.zeros(len(hashes), dtype=bool)
    first_mask[first_idx] = True
    dups = [ids[j] for j in np.flatnonzero(~first_mask)]
    if not actors:
        return dups
    uniq_idx = np.flatnonzero(first_mask)
    uniq_hashes = hashes[uniq_idx]
    shard_of = (uniq_hashes % np.uint64(len(actors))).astype(np.int64)
    refs, positions = [], []
    for s, actor in enumerate(actors):
        pos = np.flatnonzero(shard_of == s)
        if len(pos) == 0:
            continue
        refs.append(
            actor.observe.remote(f"{token_base}:{s}", uniq_hashes[pos])
        )
        positions.append(pos)
    for pos, mask in zip(positions, ray.get(refs)):
        for j, already in zip(uniq_idx[pos].tolist(), mask):
            if already:
                dups.append(ids[j])
    return dups


class DupRouter:
    """``map_batches`` callable: routes a batch's ids through the shard
    actors and emits one row per duplicate occurrence."""

    def __init__(self, actors, column: str):
        self.actors = actors
        self.column = column
        self._batch_no = 0  # resets per task; batches replay in order on retry

    def __call__(self, batch):
        import pyarrow as pa

        # token identity = (task id, batch ordinal): a Ray task retry keeps
        # its TaskID and replays batches in order, so retried observes are
        # memoized; two distinct batches never share a token even when
        # their id content is identical (which a content hash would merge,
        # silently missing real cross-batch duplicates)
        task_id = ray.get_runtime_context().get_task_id() or "driver"
        self._batch_no += 1
        token_base = f"{task_id}:{self._batch_no}"

        ids = batch[self.column].to_pylist()
        dup_ids = route_observe(self.actors, token_base, ids)
        return pa.table({"image_id": pa.array([str(i) for i in dup_ids], pa.string())})


def find_duplicate_ids(ds, column: str, *, num_shards: int = 8,
                       spill_dir: str | None = None,
                       resident_limit: int | None = None) -> list:
    """Exact duplicate ids of ``column`` via the sharded index. Returns the
    sorted unique list of ids that occur more than once."""
    actors = create_index(
        num_shards, spill_dir=spill_dir, resident_limit=resident_limit
    )
    try:
        rows = ds.map_batches(
            DupRouter(actors, column), batch_format="pyarrow"
        ).take_all()
        return sorted({r["image_id"] for r in rows})
    finally:
        for a in actors:
            ray.kill(a)
