"""Host-side batch assembly: epoch shuffling, CIR curriculum negatives,
candidate pools.

Reproducibility is stateless: every epoch's shuffle and every example's
negative draw derive from ``np.random.default_rng([seed, epoch, ...])`` —
the TPU-native replacement for DistributedSampler.set_epoch + unseeded
``random`` in dataset __getitem__ (reference
polyvore_complementary_item_retrieval_dataset.py:50-67, SURVEY.md 7
"RNG/curriculum reproducibility").

Curriculum negative sampling (reference :38,101-109): 'easy' draws negatives
from the same *semantic_category* as the positive, 'hard' from the same
*category_id*; k=10; pools with fewer than k candidates yield padded
negatives flagged in ``neg_mask``.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict, defaultdict
from typing import Dict, Iterator, Optional

import numpy as np

from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.splits import CPSplit, FITBSplit, OutfitSplit


def _epoch_rng(seed: int, epoch: int, *extra: int) -> np.random.Generator:
    return np.random.default_rng([seed, epoch, *extra])


def cp_epoch_order(n: int, *, seed: int, epoch: int) -> np.ndarray:
    """The stateless per-epoch shuffle, shared by the host batch generator
    and the trainer's device-gather path so both see identical batches
    (design invariant: epoch shuffles come from ``default_rng([seed,
    epoch])``)."""
    return _epoch_rng(seed, epoch).permutation(n)


def cp_train_batches(
    split: CPSplit,
    *,
    batch_size: int,
    accum_steps: int,
    epoch: int,
    seed: int,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields {'item_idx': (A,B,L), 'mask': (A,B,L), 'label': (A,B)}.

    One yield = one optimizer step (A microbatches). Trailing examples that
    don't fill a full A*B super-batch are dropped (per-epoch reshuffle means
    nothing is starved)."""
    n = len(split)
    order = cp_epoch_order(n, seed=seed, epoch=epoch)
    super_b = batch_size * accum_steps
    for start in range(0, n - super_b + 1, super_b):
        sel = order[start : start + super_b]
        yield {
            "item_idx": split.item_rows[sel].reshape(
                accum_steps, batch_size, -1
            ),
            "mask": split.mask[sel].reshape(accum_steps, batch_size, -1),
            "label": split.labels[sel].reshape(accum_steps, batch_size),
        }


def eval_batches(
    arrays: Dict[str, np.ndarray],
    *,
    batch_size: int,
) -> Iterator[Dict[str, np.ndarray]]:
    """Fixed-shape eval batching: the last batch wraps around and carries a
    'valid' mask so metrics ignore duplicates (XLA-friendly static shapes)."""
    n = len(next(iter(arrays.values())))
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        sel = np.arange(start, end)
        valid = np.ones(len(sel), dtype=bool)
        if len(sel) < batch_size:
            fill = np.zeros(batch_size - len(sel), dtype=np.int64)
            sel = np.concatenate([sel, fill])
            valid = np.concatenate(
                [valid, np.zeros(batch_size - len(valid), dtype=bool)]
            )
        out = {k: v[sel] for k, v in arrays.items()}
        out["valid"] = valid
        yield out


# ---------------------------------------------------------------- CIR -----


class NegativeSampler:
    """Per-key negative pools over catalog rows."""

    def __init__(self, catalog: Catalog, mode: str):
        if mode not in ("easy", "hard"):
            raise ValueError(f"negative sample mode {mode!r}")
        key_col = (
            catalog.semantic_category if mode == "easy" else catalog.category_id
        )
        pools = defaultdict(list)
        for row, key in enumerate(key_col):
            pools[int(key)].append(row)
        self.pools = {k: np.asarray(v, dtype=np.int32) for k, v in pools.items()}
        self.key_col = key_col
        self.mode = mode

    def sample(
        self, pos_row: int, k: int, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray]:
        """k negatives sharing the positive's key, excluding the positive.
        Returns (rows (k,), mask (k,) True=pad)."""
        pool = self.pools[int(self.key_col[pos_row])]
        # Exclusion by rejection: draw k+slack then filter (pool >> k usually).
        n_avail = len(pool) - 1
        rows = np.full(k, 0, dtype=np.int32)
        mask = np.ones(k, dtype=bool)
        if n_avail <= 0:
            return rows, mask
        if n_avail <= k:
            got = pool[pool != pos_row]
        else:
            got = rng.choice(pool, size=min(k + 4, len(pool)), replace=False)
            got = got[got != pos_row][:k]
            while len(got) < k:  # rare: resample on collision-heavy draws
                extra = rng.choice(pool, size=k, replace=False)
                got = np.concatenate([got, extra[extra != pos_row]])[:k]
        rows[: len(got)] = got
        mask[: len(got)] = False
        return rows, mask


def sample_negatives_batch(
    sampler: "NegativeSampler",
    pos_rows: np.ndarray,
    *,
    k: int,
    seed: int,
    epoch: int,
    impl: str = "auto",
) -> tuple[np.ndarray, np.ndarray]:
    """Negatives for a batch of fixed positives — the CIR eval-loss path
    (reference valid_epoch resamples per query every epoch,
    complementary_item_retrieval_trainer.py:122-170). O(batch), no per-query
    Python loop: one C call ('native') or grouped Gumbel-top-k numpy
    ('numpy'). Both deterministic in (seed, epoch), independent streams.

    Returns (neg_rows (n, k) int32, neg_mask (n, k) bool True=pad)."""
    pos_rows = np.asarray(pos_rows, dtype=np.int32)
    if impl == "auto":
        from outfitx_tpu import native

        impl = "native" if native.available() else "numpy"
    if impl == "native":
        from outfitx_tpu.native import NegativeBatchSampler

        cache = getattr(sampler, "_native_batch", None)
        if cache is None:
            cache = sampler._native_batch = {}
        nb = cache.get((k, seed))
        if nb is None:
            _, dense = np.unique(sampler.key_col, return_inverse=True)
            nb = NegativeBatchSampler(dense.astype(np.int32), k=k, seed=seed)
            cache[(k, seed)] = nb
        return nb.sample(pos_rows, epoch)

    n = len(pos_rows)
    rng = _epoch_rng(seed, epoch, 9)
    neg = np.zeros((n, k), dtype=np.int32)
    negm = np.ones((n, k), dtype=bool)
    keys = np.asarray(sampler.key_col)[pos_rows]
    for key in np.unique(keys):
        rows = np.flatnonzero(keys == key)
        pool = sampler.pools[int(key)]
        m = len(pool)
        if m - 1 <= 0:
            continue
        if m - 1 <= k:  # whole pool minus the positive (tiny pools)
            for j in rows:
                got = pool[pool != pos_rows[j]][:k]
                neg[j, : len(got)] = got
                negm[j, : len(got)] = False
            continue
        # Gumbel-top-k without replacement; the positive's slot is pushed
        # to +inf so it can never be drawn. Chunked to bound peak memory.
        chunk = max(1, 4_000_000 // m)
        for s in range(0, len(rows), chunk):
            rr = rows[s : s + chunk]
            z = rng.random((len(rr), m))
            z[pool[None, :] == pos_rows[rr][:, None]] = np.inf
            pick = np.argpartition(z, k, axis=1)[:, :k]
            neg[rr] = pool[pick]
            negm[rr] = False
    return neg, negm


def cir_train_batches(
    split: OutfitSplit,
    catalog: Catalog,
    *,
    batch_size: int,
    accum_steps: int,
    epoch: int,
    seed: int,
    n_negatives: int = 10,
    sample_mode: str = "easy",
    max_len: int = 16,
    sampler: Optional[NegativeSampler] = None,
    impl: str = "auto",
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields CIR train super-batches (see steps.make_cir_train_step).

    Per example: pick a positive among eligible members, the partial outfit is
    the remaining items (shuffled), negatives share the positive's category
    key (reference __getitem__: :50-67). Pass a prebuilt ``sampler`` to avoid
    rebuilding pools every epoch.

    impl: 'native' (C++ assembler, outfitx_tpu.native), 'python', or 'auto'
    (native when the compiled library is available). Both are deterministic
    given (seed, epoch), with independent RNG streams."""
    if impl == "auto":
        from outfitx_tpu import native

        impl = "native" if native.available() else "python"
    if impl == "native":
        yield from _cir_train_batches_native(
            split, catalog,
            batch_size=batch_size, accum_steps=accum_steps, epoch=epoch,
            seed=seed, n_negatives=n_negatives, sample_mode=sample_mode,
            max_len=max_len,
        )
        return
    if sampler is None:
        sampler = NegativeSampler(catalog, sample_mode)
    n = len(split)
    rng = _epoch_rng(seed, epoch, 1)
    order = rng.permutation(n)
    super_b = batch_size * accum_steps
    for start in range(0, n - super_b + 1, super_b):
        sel = order[start : start + super_b]
        b = len(sel)
        item_idx = np.full((b, max_len), catalog.pad_row, dtype=np.int32)
        mask = np.ones((b, max_len), dtype=bool)
        pos_idx = np.zeros(b, dtype=np.int32)
        neg_idx = np.zeros((b, n_negatives), dtype=np.int32)
        neg_mask = np.ones((b, n_negatives), dtype=bool)
        for j, i in enumerate(sel):
            length = int(split.lengths[i])
            members = split.item_rows[i, :length].copy()
            elig = np.flatnonzero(split.pos_eligible[i, :length])
            p = int(rng.choice(elig))
            pos_row = int(members[p])
            partial = np.delete(members, p)
            rng.shuffle(partial)
            partial = partial[: max_len]
            item_idx[j, : len(partial)] = partial
            mask[j, : len(partial)] = False
            pos_idx[j] = pos_row
            neg_idx[j], neg_mask[j] = sampler.sample(pos_row, n_negatives, rng)
        yield {
            "item_idx": item_idx.reshape(accum_steps, batch_size, max_len),
            "mask": mask.reshape(accum_steps, batch_size, max_len),
            "pos_idx": pos_idx.reshape(accum_steps, batch_size),
            "neg_idx": neg_idx.reshape(accum_steps, batch_size, n_negatives),
            "neg_mask": neg_mask.reshape(accum_steps, batch_size, n_negatives),
        }


# Bounded LRU: assemblers hold CSR copies of the split (~tens of MB at
# production scale), and a long-lived process (chained trainers, tests)
# touches many (split, catalog) pairs — unbounded growth otherwise.
_NATIVE_ASSEMBLERS: OrderedDict = OrderedDict()
_NATIVE_ASSEMBLERS_MAX = 4


def _cir_train_batches_native(
    split: OutfitSplit,
    catalog: Catalog,
    *,
    batch_size: int,
    accum_steps: int,
    epoch: int,
    seed: int,
    n_negatives: int,
    sample_mode: str,
    max_len: int,
) -> Iterator[Dict[str, np.ndarray]]:
    from outfitx_tpu.native import CIRAssembler

    # Cache entries hold STRONG refs to (split, catalog) and re-check
    # identity: a bare id()-key would alias after garbage collection
    # recycles an address, silently serving an assembler built from
    # different data.
    cache_key = (id(split), id(catalog), sample_mode, n_negatives, seed)
    cached = _NATIVE_ASSEMBLERS.get(cache_key)
    assembler = None
    if cached is not None:
        if cached[0] is split and cached[1] is catalog:
            assembler = cached[2]
            _NATIVE_ASSEMBLERS.move_to_end(cache_key)
        else:
            # id() aliased after GC recycled the address — the original
            # (split, catalog) pair is dead by definition; evict.
            del _NATIVE_ASSEMBLERS[cache_key]
    if assembler is None:
        key_col = (
            catalog.semantic_category
            if sample_mode == "easy"
            else catalog.category_id
        )
        # remap keys to a dense 0..K-1 range for the CSR pools
        uniq, dense = np.unique(key_col, return_inverse=True)
        assembler = CIRAssembler(
            split.item_rows[:, :max_len],
            split.lengths,
            split.pos_eligible[:, :max_len],
            dense.astype(np.int32),
            pad_row=catalog.pad_row,
            k=n_negatives,
            seed=seed,
        )
        _NATIVE_ASSEMBLERS[cache_key] = (split, catalog, assembler)
        while len(_NATIVE_ASSEMBLERS) > _NATIVE_ASSEMBLERS_MAX:
            _NATIVE_ASSEMBLERS.popitem(last=False)
    n = len(split)
    order = _epoch_rng(seed, epoch, 1).permutation(n)
    super_b = batch_size * accum_steps
    for start in range(0, n - super_b + 1, super_b):
        sel = order[start : start + super_b]
        out = assembler.assemble(sel, epoch)
        yield {
            "item_idx": out["item_idx"].reshape(accum_steps, batch_size, -1),
            "mask": out["mask"].reshape(accum_steps, batch_size, -1),
            "pos_idx": out["pos_idx"].reshape(accum_steps, batch_size),
            "neg_idx": out["neg_idx"].reshape(
                accum_steps, batch_size, n_negatives
            ),
            "neg_mask": out["neg_mask"].reshape(
                accum_steps, batch_size, n_negatives
            ),
        }


def cir_eval_queries(
    split: OutfitSplit,
    catalog: Catalog,
    *,
    seed: int,
    max_len: int = 16,
    impl: str = "auto",
) -> Dict[str, np.ndarray]:
    """Deterministic eval queries: one query per outfit with a fixed
    (seeded) positive choice. Returns columnar arrays with the positive's
    category_id for pool routing. 'native' runs the one-pass C assembler;
    'python' the numpy loop (independent deterministic RNG streams)."""
    n = len(split)
    if impl == "auto":
        from outfitx_tpu import native

        impl = (
            "native"
            if native.available() and n > 0 and max_len <= 64
            else "python"
        )
    if impl == "native":
        import ctypes

        from outfitx_tpu import native

        lib = native.load()
        item_rows = np.ascontiguousarray(
            split.item_rows[:, :max_len], dtype=np.int32
        )
        lengths = np.ascontiguousarray(split.lengths, dtype=np.int32)
        pos_eligible = np.ascontiguousarray(
            split.pos_eligible[:, :max_len].astype(np.uint8)
        )
        item_idx = np.empty((n, max_len), dtype=np.int32)
        mask_u8 = np.empty((n, max_len), dtype=np.uint8)
        pos_idx = np.empty(n, dtype=np.int32)
        lib.cir_eval_assemble(
            native._p(item_rows, ctypes.c_int32),
            native._p(lengths, ctypes.c_int32),
            native._p(pos_eligible, ctypes.c_uint8),
            ctypes.c_int64(n),
            ctypes.c_int32(max_len),
            ctypes.c_int32(catalog.pad_row),
            ctypes.c_uint64(seed),
            native._p(item_idx, ctypes.c_int32),
            native._p(mask_u8, ctypes.c_uint8),
            native._p(pos_idx, ctypes.c_int32),
        )
        mask = mask_u8.astype(bool)
    else:
        rng = _epoch_rng(seed, 0, 2)
        item_idx = np.full((n, max_len), catalog.pad_row, dtype=np.int32)
        mask = np.ones((n, max_len), dtype=bool)
        pos_idx = np.zeros(n, dtype=np.int32)
        for i in range(n):
            length = int(split.lengths[i])
            members = split.item_rows[i, :length].copy()
            elig = np.flatnonzero(split.pos_eligible[i, :length])
            p = int(rng.choice(elig))
            pos_idx[i] = members[p]
            partial = np.delete(members, p)
            item_idx[i, : len(partial)] = partial
            mask[i, : len(partial)] = False
    pos_category = catalog.category_id[pos_idx].astype(np.int32)
    return {
        "item_idx": item_idx,
        "mask": mask,
        "pos_idx": pos_idx,
        "pos_category": pos_category,
    }


@dataclasses.dataclass
class CandidatePools:
    """Per-category fixed-size candidate pools for retrieval eval
    (reference __build_candidate_pool, :111-153): pool = split items of the
    category + random catalog fill, truncated/shuffled to ``pool_size``."""

    pools: Dict[int, np.ndarray]  # category_id -> (pool_size,) catalog rows
    pool_size: int

    @classmethod
    def build(
        cls,
        catalog: Catalog,
        split: OutfitSplit,
        *,
        pool_size: int = 3000,
        threshold: int = 3000,
        seed: int = 0,
    ) -> "CandidatePools":
        from outfitx_tpu.data.splits import large_categories

        rng = _epoch_rng(seed, 0, 3)
        large = large_categories(catalog, threshold)
        split_rows = set()
        for i in range(len(split)):
            split_rows.update(
                int(r) for r in split.item_rows[i, : split.lengths[i]]
            )
        by_cat_all = defaultdict(list)
        by_cat_split = defaultdict(list)
        for row in range(catalog.n_items):
            cid = int(catalog.category_id[row])
            if cid in large:
                by_cat_all[cid].append(row)
                if row in split_rows:
                    by_cat_split[cid].append(row)
        pools = {}
        for cid in large:
            used = by_cat_split[cid]
            replenish = np.asarray(
                list(set(by_cat_all[cid]) - set(used)), dtype=np.int32
            )
            rng.shuffle(replenish)
            total = np.concatenate(
                [
                    np.asarray(used, dtype=np.int32),
                    replenish[: max(0, pool_size - len(used))],
                ]
            )[:pool_size]
            rng.shuffle(total)
            if len(total) < pool_size:  # small catalogs (tests): cyclic pad
                total = np.resize(total, pool_size)
            pools[cid] = total
        return cls(pools=pools, pool_size=pool_size)
