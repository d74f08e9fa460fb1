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
