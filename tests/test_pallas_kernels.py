"""Pallas kernel equality vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pixo_tpu.ops.pallas_kernels import filter_bank_pallas
from pixo_tpu.ops.png_filters import _candidates, _signed_abs_scores


class TestFilterBankPallas:
    @pytest.mark.parametrize("bpp", [1, 3, 4])
    @pytest.mark.parametrize("shape", [(16, 64), (23, 129), (7, 12)])
    def test_matches_xla_path(self, rng, bpp, shape):
        h, rb = shape
        rows = rng.integers(0, 256, (h, rb), dtype=np.uint8)
        x = jnp.asarray(rows.astype(np.int32))
        up = jnp.concatenate([jnp.zeros((1, rb), jnp.int32), x[:-1]], axis=0)
        cands_p, scores_p = filter_bank_pallas(x, up, bpp=bpp, interpret=True)

        cands_x = _candidates(jnp.asarray(rows), bpp)
        scores_x = _signed_abs_scores(cands_x)
        np.testing.assert_array_equal(np.asarray(cands_p), np.asarray(cands_x))
        np.testing.assert_array_equal(np.asarray(scores_p), np.asarray(scores_x))


class TestDctPallas:
    """Interpret-mode checks for the Pallas DCT/IDCT tiers.

    The int32 IDCT is bit-exact everywhere.  The f32 DCT is bit-exact
    only on the Mosaic/TPU path (tests/test_tpu_onchip.py asserts that);
    interpret mode jit-compiles the kernel body on XLA:CPU, which
    FMA-contracts (ops/dct.py exactness note), so CI asserts closeness
    and exact layout/semantics via the integer kernel."""

    def test_idct_int_bit_exact(self, rng):
        from pixo_tpu.ops.jpeg_decode import idct8x8_int_np
        from pixo_tpu.ops.pallas_kernels import idct8x8_int_pallas

        for shape in [(1, 8, 8), (513, 8, 8), (3, 4, 8, 8)]:
            co = rng.integers(-2048, 2048, shape).astype(np.int32)
            got = np.asarray(idct8x8_int_pallas(jnp.asarray(co), interpret=True))
            np.testing.assert_array_equal(got, idct8x8_int_np(co))

    def test_dct_aan_close(self, rng):
        from pixo_tpu.ops.dct import dct8x8_aan_np
        from pixo_tpu.ops.pallas_kernels import dct8x8_aan_pallas

        blocks = rng.uniform(-128, 127, (777, 8, 8)).astype(np.float32)
        got = np.asarray(dct8x8_aan_pallas(jnp.asarray(blocks), interpret=True))
        ref = dct8x8_aan_np(blocks)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_empty_batch(self):
        from pixo_tpu.ops.pallas_kernels import dct8x8_aan_pallas

        out = np.asarray(
            dct8x8_aan_pallas(jnp.zeros((0, 8, 8), jnp.float32), interpret=True)
        )
        assert out.shape == (0, 8, 8)
