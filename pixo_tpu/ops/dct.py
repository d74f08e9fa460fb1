"""Batched 8x8 forward/inverse DCT.

Forward path reproduces the reference's float AAN algorithm
(pixo ``src/jpeg/dct.rs:588-700``: rows then columns, 5 multiplies and
29 adds per 1D pass, post-scale S[k]) with the *same f32 operation order*,
so quantized coefficients are bit-identical to the reference encoder's.

TPU-first design: instead of an 8-wide scalar butterfly per block, the
butterfly runs as elementwise VPU ops over the whole batch at once — each
AAN temporary is a [N, 8]-shaped lane-slice across all N blocks. XLA fuses
the ~70 elementwise ops into a handful of kernels; there is no MXU matmul
on the exact path because matmul accumulation order would change the f32
rounding (SURVEY §7 "hard parts" #2).

A fast matmul path (``dct8x8_matmul``) is provided for throughput-over-
exactness use (quality-equivalent, not bit-identical).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

FRAC_1_SQRT_2 = np.float32(0.70710678118654752440)

A1 = np.float32(FRAC_1_SQRT_2)
A2 = np.float32(0.5411961)
A3 = np.float32(FRAC_1_SQRT_2)
A4 = np.float32(1.3065629)
A5 = np.float32(0.38268343)

S = np.array(
    [0.3535534, 0.2548978, 0.2705981, 0.3006724,
     0.3535534, 0.4499881, 0.6532815, 1.2814578],
    dtype=np.float32,
)


# f32 exactness note (round 3): the TPU backend compiles this butterfly
# with NO fused-multiply-add contraction — jit output is bit-identical to
# the scalar semantics (verified on the v5e against the NumPy mirror).
# XLA:CPU's LLVM backend, however, contracts mul+add pairs inside large
# fusions (measured: ~46% of DCT values drift by half an ULP at 512x512,
# flipping ~1 in 800k round-half-away quantization ties).  HLO
# optimization barriers do NOT survive the CPU pipeline, so the CPU
# backend cannot be made exact from jax; the host NumPy/native tiers are
# the exact path there (the CLI pins PIXO_TPU_COEFFS=host for this
# reason).  --xla_backend_optimization_level=0 also restores exactness,
# at a global compile-quality cost.
def _aan_1d(cols):
    """One AAN 1D DCT pass over a list of eight [N]-shaped f32 arrays.

    Exact operation order of the reference's ``aan_dct_1d``.
    """
    d0, d1, d2, d3, d4, d5, d6, d7 = cols

    tmp0 = d0 + d7
    tmp7 = d0 - d7
    tmp1 = d1 + d6
    tmp6 = d1 - d6
    tmp2 = d2 + d5
    tmp5 = d2 - d5
    tmp3 = d3 + d4
    tmp4 = d3 - d4

    tmp10 = tmp0 + tmp3
    tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 - tmp2

    o0 = tmp10 + tmp11
    o4 = tmp10 - tmp11

    z1 = (tmp12 + tmp13) * A1
    o2 = tmp13 + z1
    o6 = tmp13 - z1

    t10 = tmp4 + tmp5
    t11 = tmp5 + tmp6
    t12 = tmp6 + tmp7

    z5 = (t10 - t12) * A5
    z2 = t10 * A2 + z5
    z4 = t12 * A4 + z5
    z3 = t11 * A3

    z11 = tmp7 + z3
    z13 = tmp7 - z3

    o5 = z13 + z2
    o3 = z13 - z2
    o1 = z11 + z4
    o7 = z11 - z4

    out = [o0, o1, o2, o3, o4, o5, o6, o7]
    return [out[i] * S[i] for i in range(8)]


def dct8x8_aan(blocks):
    """Forward 2D DCT over [..., 8, 8] f32 blocks, exact AAN semantics.

    Rows pass first, then columns (matching ``dct_2d``,
    ``src/jpeg/dct.rs:614-640``). Vectorized over all leading dims.
    """
    x = blocks.astype(jnp.float32)
    # Rows pass: 1D DCT along the last axis. Slice out the 8 lanes.
    cols = [x[..., i] for i in range(8)]
    rows_done = _aan_1d(cols)
    t = jnp.stack(rows_done, axis=-1)  # [..., 8(row), 8(col)]
    # Columns pass: 1D DCT along the row axis.
    cols = [t[..., i, :] for i in range(8)]
    cols_done = _aan_1d(cols)
    return jnp.stack(cols_done, axis=-2)


def dct8x8_aan_np(blocks: np.ndarray) -> np.ndarray:
    """NumPy mirror of ``dct8x8_aan`` (f32), for kernel-equality tests."""
    x = blocks.astype(np.float32)

    def aan_np(cols):
        d0, d1, d2, d3, d4, d5, d6, d7 = cols
        tmp0 = d0 + d7
        tmp7 = d0 - d7
        tmp1 = d1 + d6
        tmp6 = d1 - d6
        tmp2 = d2 + d5
        tmp5 = d2 - d5
        tmp3 = d3 + d4
        tmp4 = d3 - d4
        tmp10 = tmp0 + tmp3
        tmp13 = tmp0 - tmp3
        tmp11 = tmp1 + tmp2
        tmp12 = tmp1 - tmp2
        o0 = tmp10 + tmp11
        o4 = tmp10 - tmp11
        z1 = (tmp12 + tmp13) * A1
        o2 = tmp13 + z1
        o6 = tmp13 - z1
        t10 = tmp4 + tmp5
        t11 = tmp5 + tmp6
        t12 = tmp6 + tmp7
        z5 = (t10 - t12) * A5
        z2 = t10 * A2 + z5
        z4 = t12 * A4 + z5
        z3 = t11 * A3
        z11 = tmp7 + z3
        z13 = tmp7 - z3
        o5 = z13 + z2
        o3 = z13 - z2
        o1 = z11 + z4
        o7 = z11 - z4
        out = [o0, o1, o2, o3, o4, o5, o6, o7]
        return [(out[i] * S[i]).astype(np.float32) for i in range(8)]

    cols = [x[..., i] for i in range(8)]
    t = np.stack(aan_np(cols), axis=-1).astype(np.float32)
    cols = [t[..., i, :] for i in range(8)]
    return np.stack(aan_np(cols), axis=-2).astype(np.float32)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (f32) for the fast matmul path."""
    m = np.zeros((8, 8), dtype=np.float64)
    for k in range(8):
        ck = math.sqrt(0.25) if k else math.sqrt(0.125)
        for n in range(8):
            m[k, n] = ck * math.cos((2 * n + 1) * k * math.pi / 16.0)
    return m.astype(np.float32)


DCT_MATRIX = _dct_matrix()


def dct8x8_matmul(blocks):
    """Fast 2D DCT via two MXU matmuls: D @ X @ D^T over [..., 8, 8]."""
    d = jnp.asarray(DCT_MATRIX)
    x = blocks.astype(jnp.float32)
    t = jnp.einsum("kn,...nm->...km", d, x, preferred_element_type=jnp.float32)
    return jnp.einsum("...km,lm->...kl", t, d, preferred_element_type=jnp.float32)


def idct8x8(blocks):
    """Inverse 2D DCT via matmuls (decode path; quality-exactness via f32).

    Mirrors the decode contract of the reference's jidctint-based decoder at
    the pixel level after rounding; exact-int parity is handled in the
    decoder module where required.
    """
    d = jnp.asarray(DCT_MATRIX)
    x = blocks.astype(jnp.float32)
    # x = D^T X D for the orthonormal DCT matrix D (X = D x D^T forward)
    t = jnp.einsum("kn,...km->...nm", d, x, preferred_element_type=jnp.float32)
    return jnp.einsum("...nm,ml->...nl", t, d, preferred_element_type=jnp.float32)
