"""Native (C++) CIR batch assembler: correctness invariants vs the Python
path, determinism, and a host-throughput comparison."""

import time

import numpy as np
import pytest

from outfitx_tpu import native
from outfitx_tpu.data.sampler import cir_train_batches
from outfitx_tpu.data.synthetic import make_synthetic

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def synth():
    return make_synthetic(n_items=800, d_embed=16, n_outfits=512, seed=21)


def _batches(synth, impl, epoch=0, k=5):
    return list(
        cir_train_batches(
            synth.cir_train,
            synth.catalog,
            batch_size=64,
            accum_steps=2,
            epoch=epoch,
            seed=7,
            n_negatives=k,
            sample_mode="easy",
            max_len=8,
            impl=impl,
        )
    )


class TestNativeAssembler:
    def test_invariants_match_python_semantics(self, synth):
        cat = synth.catalog
        for batch in _batches(synth, "native"):
            item_idx = batch["item_idx"].reshape(-1, 8)
            mask = batch["mask"].reshape(-1, 8)
            pos = batch["pos_idx"].ravel()
            neg = batch["neg_idx"].reshape(-1, 5)
            negm = batch["neg_mask"].reshape(-1, 5)
            # padded slots hold the PAD row; real slots are real items
            assert (item_idx[mask] == cat.pad_row).all()
            assert (item_idx[~mask] < cat.n_items).all()
            # the positive never appears in its own partial outfit
            for r in range(len(pos)):
                real = item_idx[r][~mask[r]]
                assert pos[r] not in real
            # negatives share the positive's semantic category, exclude it,
            # and are distinct
            for r in range(len(pos)):
                valid = neg[r][~negm[r]]
                assert pos[r] not in valid
                assert len(set(valid.tolist())) == len(valid)
                assert (
                    cat.semantic_category[valid]
                    == cat.semantic_category[pos[r]]
                ).all()

    def test_deterministic_and_epoch_varying(self, synth):
        a = _batches(synth, "native", epoch=3)
        b = _batches(synth, "native", epoch=3)
        c = _batches(synth, "native", epoch=4)
        for x, y in zip(a, b):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k])
        assert any(
            not np.array_equal(x["pos_idx"], z["pos_idx"])
            for x, z in zip(a, c)
        )

    def test_throughput_beats_python(self, synth):
        # warm both paths (builds pools / the .so)
        _batches(synth, "native")
        _batches(synth, "python")
        t0 = time.perf_counter()
        for _ in range(5):
            _batches(synth, "native")
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            _batches(synth, "python")
        t_python = time.perf_counter() - t0
        # host assembly is the CIR input bottleneck; native must win clearly
        assert t_native < t_python / 2, (t_native, t_python)
