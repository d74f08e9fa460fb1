"""Filter-math parity tests transliterated from the reference's inline
suite (src/png/filter.rs:683+): exact filtered-byte and score values."""

import numpy as np

import jax.numpy as jnp

from pixo_tpu.ops.png_filters import (
    FILTER_AVERAGE,
    FILTER_NONE,
    FILTER_PAETH,
    FILTER_SUB,
    FILTER_UP,
    _bigram_scores,
    candidates_np,
    filter_image,
    scores_np,
)


def one_row_cands(row, prev, bpp):
    rows = np.stack([prev, row]).astype(np.uint8)
    return candidates_np(rows, bpp)[:, 1, :]


class TestFilterMath:
    def test_filter_sub_bpp3(self):
        row = np.array([10, 20, 30, 40, 50, 60], np.uint8)
        c = candidates_np(row[None], 3)[FILTER_SUB, 0]
        assert c.tolist() == [10, 20, 30, 30, 30, 30]

    def test_filter_up(self):
        c = one_row_cands(
            np.array([50, 60, 70], np.uint8), np.array([10, 20, 30], np.uint8), 1
        )
        assert c[FILTER_UP].tolist() == [40, 40, 40]

    def test_filter_average(self):
        c = one_row_cands(
            np.array([100, 100, 100], np.uint8), np.array([50, 50, 50], np.uint8), 1
        )
        assert c[FILTER_AVERAGE].tolist() == [(100 - 25) & 0xFF, 25, 25]

    def test_filter_paeth_first_byte(self):
        c = one_row_cands(
            np.array([100, 100, 100], np.uint8), np.array([50, 50, 50], np.uint8), 1
        )
        assert c[FILTER_PAETH][0] == (100 - 50) & 0xFF

    def test_score_all_zeros(self):
        rows = np.zeros((1, 100), np.uint8)
        s = scores_np(candidates_np(rows, 1))
        assert s[0, FILTER_NONE] == 0

    def test_score_high_values(self):
        rows = np.full((1, 10), 0x80, np.uint8)
        s = scores_np(candidates_np(rows, 1))
        assert s[0, FILTER_NONE] == 128 * 10

    def test_score_mixed(self):
        # |1 as i8| + |0xFF as i8| + |2| + |0xFE as i8| = 1+1+2+2 = 6
        rows = np.array([[1, 0xFF, 2, 0xFE]], np.uint8)
        s = scores_np(candidates_np(rows, 1))
        assert s[0, FILTER_NONE] == 6

    def test_bigrams_all_same(self):
        rows = np.full((1, 100), 42, np.uint8)
        cands = jnp.asarray(candidates_np(rows, 1))
        b = np.asarray(_bigram_scores(cands))
        assert b[0, FILTER_NONE] == 1

    def test_bigrams_all_unique(self):
        rows = np.arange(10, dtype=np.uint8)[None]
        cands = jnp.asarray(candidates_np(rows, 1))
        b = np.asarray(_bigram_scores(cands))
        assert b[0, FILTER_NONE] == 9

    def test_bigrams_repeating_pattern(self):
        rows = np.array([[1, 2, 1, 2, 1, 2, 1, 2]], np.uint8)
        cands = jnp.asarray(candidates_np(rows, 1))
        b = np.asarray(_bigram_scores(cands))
        assert b[0, FILTER_NONE] == 2

    def test_adaptive_fast_picks_among_sub_up_paeth(self):
        rows = np.array(
            [[10, 20, 30, 40, 50, 60], [70, 80, 90, 100, 110, 120]], np.uint8
        )
        _, ids = filter_image(
            jnp.asarray(rows), bpp=3, strategy="adaptive_fast",
            small_image=False, sticky_fast=True,
        )
        for fid in np.asarray(ids).tolist():
            assert fid in (FILTER_SUB, FILTER_UP, FILTER_PAETH)

    def test_none_strategy_passthrough(self):
        rows = np.array([[100, 150, 200, 50, 100, 150]], np.uint8)
        filtered, ids = filter_image(
            jnp.asarray(rows), bpp=3, strategy="none",
            small_image=False, sticky_fast=False,
        )
        assert np.asarray(ids)[0] == FILTER_NONE
        np.testing.assert_array_equal(np.asarray(filtered)[0], rows[0])


class TestNativeHostTier:
    """The C++ host filter tier (native png_filter_apply) must be
    bit-identical to the device filter bank for every strategy — the same
    contract as the reference's scalar/SIMD tier equality suite."""

    def _cases(self):
        import itertools

        rng = np.random.default_rng(42)
        shapes = [(1, 4, 1), (3, 7, 1), (16, 16, 3), (33, 20, 4), (40, 65, 2)]
        for (h, w, bpp) in shapes:
            smooth = rng.integers(0, 8, (h, w * bpp), np.uint8).cumsum(
                axis=1, dtype=np.uint32).astype(np.uint8)
            noisy = rng.integers(0, 256, (h, w * bpp), np.uint8)
            for rows in (smooth, noisy):
                yield h, w, bpp, rows

    def test_native_matches_device_all_strategies(self):
        import pytest

        from pixo_tpu.native import native_available
        from pixo_tpu.options import FilterStrategy
        from pixo_tpu.ops.png_filters import _native_filter_rows, filter_image

        if not native_available():
            pytest.skip("native tier unavailable")
        for h, w, bpp, rows in self._cases():
            small = w * h <= 4096
            sticky = h <= 32
            for strat in FilterStrategy:
                native = _native_filter_rows(rows, bpp, strat, small, sticky)
                assert native is not None
                filtered, ids = filter_image(
                    jnp.asarray(rows), bpp=bpp, strategy=strat.value,
                    small_image=small, sticky_fast=sticky,
                )
                assert np.array_equal(
                    native[:, 0].astype(np.int32), np.asarray(ids)
                ), (h, w, bpp, strat)
                assert np.array_equal(native[:, 1:], np.asarray(filtered)), (
                    h, w, bpp, strat,
                )
