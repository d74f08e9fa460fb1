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


def _category(av):
    """bit_length of |v| for 0 <= |v| < 2^16, as int32."""
    thresholds = jnp.asarray([1 << k for k in range(16)], av.dtype)
    return jnp.sum(av[..., None] >= thresholds, axis=-1).astype(jnp.int32)


def _step(carry, xs, lam):
    cost, run = carry  # [B, 8] f32 / i32
    coef, q = xs  # [B]

    fq = coef / q  # f32
    fl = jnp.floor(fq)
    rd = _round_half_away_exact(fq)
    ce = jnp.ceil(fq)
    ext = jnp.where(fq >= 0, ce + 1, fl - 1)

    # candidate slots in host insertion order: [0, fl, rd, ce, ext]
    cands = jnp.stack(
        [jnp.zeros_like(fl), fl, rd, ce, ext], axis=-1
    )  # [B, 5] f32
    cvalid = jnp.stack(
        [
            jnp.ones_like(fl, bool),
            fl != 0,
            (rd != 0) & (rd != fl),
            (ce != 0) & (ce != fl) & (ce != rd),
            jnp.abs(fq) > 1.5,
        ],
        axis=-1,
    )  # [B, 5]

    cand_i = cands.astype(jnp.int32)
    recon = cands * q[:, None]  # f32 [B, 5]
    d = coef[:, None] - recon
    dist = d * d

    # transitions: [B, 8, 5]
    prun = run[:, :, None]
    is_zero = cand_i[:, None, :] == 0
    nr = prun + 1
    wrap = nr >= 16
    zrate = jnp.where(wrap, jnp.float32(10.0), jnp.float32(0.0))
    zrun = jnp.where(wrap, 0, nr)
    cat = _category(jnp.abs(cand_i))  # [B, 5]
    rs = (prun << 4) | cat[:, None, :]
    nzrate = jnp.asarray(_RATE_LUT)[rs]
    rate = jnp.where(is_zero, zrate, nzrate)
    nrun = jnp.where(is_zero, zrun, 0)
    # host order: f32((pcost + rate) + lambda * distortion)
    tcost = (cost[:, :, None] + rate) + lam * dist[:, None, :]

    svalid = jnp.isfinite(cost)  # valid state slots
    valid = svalid[:, :, None] & cvalid[:, None, :]

    b = cost.shape[0]
    tcost = jnp.where(valid, tcost, jnp.inf).reshape(b, _COMBOS)
    nrun = jnp.broadcast_to(nrun, (b, MAX_STATES, NCAND)).reshape(b, _COMBOS)
    value = jnp.broadcast_to(
        cand_i[:, None, :], (b, MAX_STATES, NCAND)
    ).reshape(b, _COMBOS)
    parent = jnp.broadcast_to(
        jnp.arange(MAX_STATES, dtype=jnp.int32)[None, :, None],
        (b, MAX_STATES, NCAND),
    ).reshape(b, _COMBOS)
    order = jnp.arange(_COMBOS, dtype=jnp.int32)[None, :]
    validf = valid.reshape(b, _COMBOS)

    # dedup by (value, run): runs < 16 so value*16 + run is collision-free;
    # invalid combos get unique sentinel keys so they can never capture a
    # real key's first-occurrence slot.
    key = jnp.where(validf, value * 16 + nrun, 0x7F000000 + order)

    same = key[:, :, None] == key[:, None, :]  # [B, C, C]
    cost_j = jnp.broadcast_to(tcost[:, None, :], same.shape)
    order_j = jnp.broadcast_to(order[:, None, :], same.shape)
    better = same & (
        (cost_j < tcost[:, :, None])
        | ((cost_j == tcost[:, :, None]) & (order_j < order[:, :, None]))
    )
    winner = ~jnp.any(better, axis=2)  # argmin (ties -> lowest order) per key
    first_order = jnp.min(
        jnp.where(same, order_j, _COMBOS), axis=2
    ).astype(jnp.int32)

    sort_cost = jnp.where(winner, tcost, jnp.inf)
    s_cost, s_order, s_run, s_val, s_par = jax.lax.sort(
        (sort_cost, first_order, nrun, value, parent), num_keys=2
    )
    new_cost = s_cost[:, :MAX_STATES]
    new_run = s_run[:, :MAX_STATES]
    return (new_cost, new_run), (
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
