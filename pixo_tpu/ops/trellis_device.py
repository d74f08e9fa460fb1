"""Batched device trellis quantization (SURVEY §2.4 mapping).

The reference's trellis (``src/jpeg/trellis.rs:22-160``) is a per-block
Viterbi DP: <=5 candidates per coefficient, <=8 surviving states, zero-run
tracking with ZRL/EOB rate estimates. Per-block independence makes it a
natural batch kernel: this module runs the 63-step DP as a ``lax.scan``
over the zigzag axis with the whole block batch in flight, keeping the
state set as fixed-shape [B, 8] tensors (invalid slots carry +inf cost).

Exactness contract: identical int16 output to the host implementations
(``jpeg/trellis.py`` mirror and the C++ path) including tie-breaking.
The host DP's dynamic state list is reproduced with masked dedup: a
combo survives for its (value, run) key iff no same-key combo has
strictly lower cost (ties: lower generation order), and its sort
position is the key's *first-occurrence* order — matching the host's
insert-then-stable-sort semantics. Float work is f32 in the host's exact
operation order; round-half-away uses an exact correction so f32
`floor(x+0.5)` rounding can never flip a boundary case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_STATES = 8
NCAND = 5
_COMBOS = MAX_STATES * NCAND


def _rate_lut() -> np.ndarray:
    """f32 LUT over rs = (run<<4)|category of the host's f64 rate estimate
    (``_est_ac_rate``): huffman-length estimate + category bits."""
    table = {
        0x00: 4.0, 0x01: 2.0, 0x02: 2.5, 0x03: 3.0, 0x04: 4.0,
        0x11: 3.0, 0x12: 4.0, 0x21: 4.0, 0xF0: 10.0,
    }
    lut = np.empty(256, np.float32)
    for rs in range(256):
        hufflen = table.get(rs, 3.0 + (rs >> 4) * 0.5 + (rs & 0x0F) * 0.3)
        lut[rs] = np.float32(hufflen + float(rs & 0x0F))
    return lut


_RATE_LUT = _rate_lut()


def _round_half_away_exact(x):
    """Exact round-half-away-from-zero of f32 values.

    floor(|x| + 0.5) computed in f32 can cross an integer boundary the
    f64 host computation does not; the two comparisons below re-derive
    the exact bucket (m - 0.5 <= |x| < m + 0.5) with exact f32 compares.
    """
    ax = jnp.abs(x)
    m = jnp.floor(ax + jnp.float32(0.5))
    m = jnp.where(ax >= m + jnp.float32(0.5), m + 1, m)
    m = jnp.where(ax < m - jnp.float32(0.5), m - 1, m)
    return jnp.where(x < 0, -m, m)


def _step(carry, xs, lam):
    """One zigzag position for the whole batch.

    Key collapse (same insight as the C++ candidate-major merge): the
    candidate VALUES depend only on the coefficient, not the state, so
    every nonzero candidate v dedups to one (v, run=0) entry whose cost
    is the min over the 8 parent states — an [B, 8, 4] reduction — and
    the zero candidate yields <=8 children deduped by their run value
    (an [B, 8, 8] mask). That is <=12 sort entries per step instead of
    the naive 40-combo dedup. Host insertion order is preserved: the
    host iterates states (pi) outer, candidates (slot 0..4) inner, so a
    nonzero key's first occurrence is order=slot (state 0 is always
    valid and its fl/rd/ce/ext slots apply to every state), and a zero
    key (0, nr)'s first occurrence is 5*min(valid pi with that nr).
    """
    cost, run = carry  # [B, 8] f32 / i32
    coef, q = xs  # [B]
    b = cost.shape[0]

    fq = coef / q  # f32
    fl = jnp.floor(fq)
    rd = _round_half_away_exact(fq)
    ce = jnp.ceil(fq)
    ext = jnp.where(fq >= 0, ce + 1, fl - 1)

    # nonzero candidate slots in host insertion order: [fl, rd, ce, ext]
    nz = jnp.stack([fl, rd, ce, ext], axis=-1)  # [B, 4] f32
    nzvalid = jnp.stack(
        [
            fl != 0,
            (rd != 0) & (rd != fl),
            (ce != 0) & (ce != fl) & (ce != rd),
            jnp.abs(fq) > 1.5,
        ],
        axis=-1,
    )  # [B, 4]
    nz_i = nz.astype(jnp.int32)

    # host f32 op order per combo: f32((pcost + rate) + lambda * dist)
    recon = nz * q[:, None]
    d = coef[:, None] - recon
    dist_nz = d * d  # [B, 4]
    # rate = LUT[(run<<4)|cat] via two one-hot contractions (a gather here
    # serializes on TPU: measured 145 -> 26 ms for the whole 63-step scan).
    # Each product has exactly one nonzero term, so the f32 sums are exact.
    av = jnp.abs(nz_i)
    pow2 = jnp.asarray([1 << k for k in range(16)], jnp.int32)
    # cat == c  <=>  2^(c-1) <= |v| < 2^c  (c>=1);  cat == 0  <=>  v == 0
    lo = jnp.concatenate([jnp.zeros(1, jnp.int32), pow2[:15]])
    onehot_cat = (
        (av[..., None] >= lo) & (av[..., None] < pow2)
    ).astype(jnp.float32)  # [B, 4, 16]
    onehot_run = (
        run[..., None] == jnp.arange(16, dtype=jnp.int32)
    ).astype(jnp.float32)  # [B, 8, 16]
    lut2 = jnp.asarray(_RATE_LUT.reshape(16, 16))  # [run, cat]
    tmp = jnp.einsum(
        "bsr,rc->bsc", onehot_run, lut2, preferred_element_type=jnp.float32
    )
    # [B,8,1,16] * [B,1,4,16] summed over cat: plain vector ops beat a
    # batched tiny matmul here
    rate = jnp.sum(tmp[:, :, None, :] * onehot_cat[:, None, :, :], axis=-1)
    svalid = jnp.isfinite(cost)
    full = (cost[:, :, None] + rate) + lam * dist_nz[:, None, :]  # [B, 8, 4]
    full = jnp.where(svalid[:, :, None], full, jnp.inf)
    par_nz = jnp.argmin(full, axis=1).astype(jnp.int32)  # ties -> lowest pi
    cost_nz = jnp.min(full, axis=1)
    cost_nz = jnp.where(nzvalid, cost_nz, jnp.inf)
    order_nz = jnp.broadcast_to(
        jnp.arange(1, NCAND, dtype=jnp.int32), (b, NCAND - 1)
    )

    # zero children: one per state, dedup by resulting run
    nr = run + 1
    wrap = nr >= 16
    zrate = jnp.where(wrap, jnp.float32(10.0), jnp.float32(0.0))
    znr = jnp.where(wrap, 0, nr)  # [B, 8]
    dist0 = coef * coef  # [B]
    zcost = (cost + zrate) + lam * dist0[:, None]  # inf stays inf
    zorder = jnp.broadcast_to(
        jnp.arange(MAX_STATES, dtype=jnp.int32) * NCAND, (b, MAX_STATES)
    )
    same = svalid[:, None, :] & (znr[:, :, None] == znr[:, None, :])
    zc_j = jnp.broadcast_to(zcost[:, None, :], same.shape)
    zo_j = jnp.broadcast_to(zorder[:, None, :], same.shape)
    better = same & (
        (zc_j < zcost[:, :, None])
        | ((zc_j == zcost[:, :, None]) & (zo_j < zorder[:, :, None]))
    )
    zwin = ~jnp.any(better, axis=2)
    zfirst = jnp.min(
        jnp.where(same, zo_j, _COMBOS), axis=2
    ).astype(jnp.int32)
    zc = jnp.where(zwin, zcost, jnp.inf)

    # merge <=12 entries, stable sort by (cost, first-occurrence order)
    costs = jnp.concatenate([zc, cost_nz], axis=1)
    orders = jnp.concatenate([zfirst, order_nz], axis=1)
    runs = jnp.concatenate([znr, jnp.zeros_like(par_nz)], axis=1)
    vals = jnp.concatenate([jnp.zeros_like(znr), nz_i], axis=1)
    pars = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(MAX_STATES, dtype=jnp.int32), (b, MAX_STATES)), par_nz],
        axis=1,
    )
    s_cost, _so, s_run, s_val, s_par = jax.lax.sort(
        (costs, orders, runs, vals, pars), num_keys=2
    )
    return (s_cost[:, :MAX_STATES], s_run[:, :MAX_STATES]), (
        s_par[:, :MAX_STATES],
        s_val[:, :MAX_STATES],
    )


@functools.partial(jax.jit, static_argnames=())
def trellis_quantize_batch_device(dct_zz, q_zz, lam=jnp.float32(1.0)):
    """[B, 64] f32 zigzag DCT + [B, 64] f32 zigzag quant -> [B, 64] int16.

    One fused dispatch runs the 63-step Viterbi DP for every block in the
    batch; backtracking is a reverse scan over the recorded (parent,
    value) history.
    """
    b = dct_zz.shape[0]
    dct_zz = dct_zz.astype(jnp.float32)
    q_zz = q_zz.astype(jnp.float32)
    lam = jnp.float32(lam)

    dc = _round_half_away_exact(dct_zz[:, 0] / q_zz[:, 0]).astype(jnp.int16)

    cost0 = jnp.full((b, MAX_STATES), jnp.inf, jnp.float32).at[:, 0].set(0.0)
    run0 = jnp.zeros((b, MAX_STATES), jnp.int32)

    xs = (dct_zz[:, 1:].T, q_zz[:, 1:].T)  # [63, B]
    (fcost, frun), (parents, values) = jax.lax.scan(
        functools.partial(_step, lam=lam), (cost0, run0), xs
    )
    # parents/values: [63, B, 8]

    finals = fcost + jnp.where(frun > 0, jnp.float32(4.0), jnp.float32(0.0))
    best = jnp.argmin(finals, axis=1).astype(jnp.int32)  # ties -> lowest idx

    def bt(idx, hist):
        par, val = hist  # [B, 8]
        v = jnp.take_along_axis(val, idx[:, None], axis=1)[:, 0]
        nidx = jnp.take_along_axis(par, idx[:, None], axis=1)[:, 0]
        return nidx, v

    _, path = jax.lax.scan(bt, best, (parents, values), reverse=True)
    # path: [63, B] in zigzag order 1..63
    out = jnp.concatenate(
        [dc[:, None], path.T.astype(jnp.int16)], axis=1
    )
    return out
