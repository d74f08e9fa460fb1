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
