"""Native (C++) host-side data-path components, loaded via ctypes.

The shared library builds on first use with g++ (cached next to the source);
everything degrades gracefully to the pure-Python paths when no compiler is
available, so the framework never hard-depends on native code.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

_SRC = pathlib.Path(__file__).parent / "sampling.cpp"
_LIB = pathlib.Path(__file__).parent / "_sampling.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", str(_LIB), str(_SRC),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The sampling library, or None when native code is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    lib = ctypes.CDLL(str(_LIB))
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cir_assemble.restype = None
    lib.cir_assemble.argtypes = [
        i32p, i32p, u8p, ctypes.c_int64, ctypes.c_int32,
        i64p, ctypes.c_int64,
        i32p, i32p, i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64, ctypes.c_uint64,
        i32p, u8p, i32p, i32p, u8p,
    ]
    lib.cir_eval_assemble.restype = None
    lib.cir_eval_assemble.argtypes = [
        i32p, i32p, u8p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_uint64,
        i32p, u8p, i32p,
    ]
    lib.negatives_assemble.restype = None
    lib.negatives_assemble.argtypes = [
        i32p, ctypes.c_int64,
        i32p, i32p, i32p,
        ctypes.c_int32, ctypes.c_uint64, ctypes.c_uint64,
        i32p, u8p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _p(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def _csr_pools(key_of_row: np.ndarray):
    """CSR grouping of catalog rows by sampling key."""
    key_of_row = np.ascontiguousarray(key_of_row, dtype=np.int32)
    n_keys = int(key_of_row.max()) + 1 if len(key_of_row) else 1
    order = np.argsort(key_of_row, kind="stable").astype(np.int32)
    counts = np.bincount(key_of_row, minlength=n_keys)
    offsets = np.zeros(n_keys + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return key_of_row, offsets, order


class NegativeBatchSampler:
    """Batched k-distinct same-key negative sampling for fixed positives
    (the CIR eval-loss path). One C call per epoch instead of a per-query
    Python loop."""

    def __init__(self, key_of_row: np.ndarray, *, k: int, seed: int):
        self.lib = load()
        if self.lib is None:
            raise RuntimeError("native sampling library unavailable")
        self.key_of_row, self.pool_offsets, self.pool_rows = _csr_pools(
            key_of_row
        )
        self.k = k
        self.seed = seed

    def sample(self, pos_rows: np.ndarray, epoch: int):
        pos_rows = np.ascontiguousarray(pos_rows, dtype=np.int32)
        n = len(pos_rows)
        out_neg = np.empty((n, self.k), dtype=np.int32)
        out_negm = np.empty((n, self.k), dtype=np.uint8)
        self.lib.negatives_assemble(
            _p(pos_rows, ctypes.c_int32),
            ctypes.c_int64(n),
            _p(self.key_of_row, ctypes.c_int32),
            _p(self.pool_offsets, ctypes.c_int32),
            _p(self.pool_rows, ctypes.c_int32),
            ctypes.c_int32(self.k),
            ctypes.c_uint64(self.seed),
            ctypes.c_uint64(epoch),
            _p(out_neg, ctypes.c_int32),
            _p(out_negm, ctypes.c_uint8),
        )
        return out_neg, out_negm.astype(bool)


class CIRAssembler:
    """Prebuilt CSR pools + split views for native CIR batch assembly."""

    def __init__(
        self,
        item_rows: np.ndarray,  # (n, L) int32
        lengths: np.ndarray,  # (n,) int32
        pos_eligible: np.ndarray,  # (n, L) bool
        key_of_row: np.ndarray,  # (N,) int32 sampling key per catalog row
        *,
        pad_row: int,
        k: int,
        seed: int,
    ):
        self.lib = load()
        if self.lib is None:
            raise RuntimeError("native sampling library unavailable")
        self.item_rows = np.ascontiguousarray(item_rows, dtype=np.int32)
        self.lengths = np.ascontiguousarray(lengths, dtype=np.int32)
        self.pos_eligible = np.ascontiguousarray(
            pos_eligible.astype(np.uint8)
        )
        self.n, self.L = self.item_rows.shape
        if self.L > 64:
            raise ValueError("native assembler supports outfits up to L=64")
        # CSR pools grouped by key
        self.key_of_row, self.pool_offsets, self.pool_rows = _csr_pools(
            key_of_row
        )
        self.pad_row = pad_row
        self.k = k
        self.seed = seed

    def assemble(self, sel: np.ndarray, epoch: int):
        sel = np.ascontiguousarray(sel, dtype=np.int64)
        b = len(sel)
        out_item = np.empty((b, self.L), dtype=np.int32)
        out_mask = np.empty((b, self.L), dtype=np.uint8)
        out_pos = np.empty((b,), dtype=np.int32)
        out_neg = np.empty((b, self.k), dtype=np.int32)
        out_negm = np.empty((b, self.k), dtype=np.uint8)
        self.lib.cir_assemble(
            _p(self.item_rows, ctypes.c_int32),
            _p(self.lengths, ctypes.c_int32),
            _p(self.pos_eligible, ctypes.c_uint8),
            ctypes.c_int64(self.n),
            ctypes.c_int32(self.L),
            _p(sel, ctypes.c_int64),
            ctypes.c_int64(b),
            _p(self.key_of_row, ctypes.c_int32),
            _p(self.pool_offsets, ctypes.c_int32),
            _p(self.pool_rows, ctypes.c_int32),
            ctypes.c_int32(self.k),
            ctypes.c_int32(self.pad_row),
            ctypes.c_uint64(self.seed),
            ctypes.c_uint64(epoch),
            _p(out_item, ctypes.c_int32),
            _p(out_mask, ctypes.c_uint8),
            _p(out_pos, ctypes.c_int32),
            _p(out_neg, ctypes.c_int32),
            _p(out_negm, ctypes.c_uint8),
        )
        return {
            "item_idx": out_item,
            "mask": out_mask.astype(bool),
            "pos_idx": out_pos,
            "neg_idx": out_neg,
            "neg_mask": out_negm.astype(bool),
        }
