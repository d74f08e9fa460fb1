"""Trellis quantization — Python mirror of the native implementation.

Behavioral parity with pixo ``src/jpeg/trellis.rs``: Viterbi R-D
optimization per block with <=5 candidates/coefficient, <=8 states,
zero-run tracking, ZRL(10 bits)/EOB(4 bits) rate estimates, lambda=1.0
default, full path backtracking; DC uses plain round-half-away.

Works in zigzag order throughout (the device emits zigzag DCT streams).
The C++ path (``native.native_trellis_quantize``) is the production
implementation; this mirror is the fallback and the test oracle.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np

MAX_STATES = 8


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _est_ac_huffman_length(rs: int) -> float:
    table = {
        0x00: 4.0, 0x01: 2.0, 0x02: 2.5, 0x03: 3.0, 0x04: 4.0,
        0x11: 3.0, 0x12: 4.0, 0x21: 4.0, 0xF0: 10.0,
    }
    if rs in table:
        return table[rs]
    return 3.0 + (rs >> 4) * 0.5 + (rs & 0x0F) * 0.3


def _est_ac_rate(value: int, zero_run: int) -> float:
    cat = _category(value)
    return _est_ac_huffman_length((zero_run << 4) | cat) + float(cat)


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def trellis_quantize_block(
    dct_zz: Sequence[float], q_zz: Sequence[float], lambda_: float = 1.0
) -> np.ndarray:
    """One zigzag-ordered block of f32 DCT -> int16 quantized (zigzag)."""
    out = np.zeros(64, np.int16)
    out[0] = _round_half_away(np.float32(dct_zz[0]) / np.float32(q_zz[0]))

    # state: (cost, zero_run, parent, value)
    cur: List[tuple] = [(0.0, 0, 0, 0)]
    all_states: List[List[tuple]] = [cur]

    for zz in range(1, 64):
        coef = np.float32(dct_zz[zz])
        q = np.float32(q_zz[zz])
        fq = np.float32(coef / q)

        cands = [0]
        fl = int(math.floor(fq))
        rd = _round_half_away(float(fq))
        ce = int(math.ceil(fq))
        for v in (fl, rd, ce):
            if v != 0 and v not in cands:
                cands.append(v)
        if abs(float(fq)) > 1.5:
            ext = ce + 1 if fq >= 0 else fl - 1
            if ext not in cands:
                cands.append(ext)

        nxt: List[tuple] = []
        index = {}
        for pi, (pcost, prun, _pp, _pv) in enumerate(cur):
            for cand in cands:
                recon = np.float32(np.float32(cand) * q)
                d = np.float32(coef - recon)
                distortion = np.float32(d * d)
                if cand == 0:
                    nr = prun + 1
                    if nr >= 16:
                        rate, new_run = 10.0, 0
                    else:
                        rate, new_run = 0.0, nr
                else:
                    rate, new_run = _est_ac_rate(cand, prun), 0
                cost = float(
                    np.float32(
                        np.float32(pcost)
                        + np.float32(rate)
                        + np.float32(lambda_) * distortion
                    )
                )
                key = (cand, new_run)
                if key in index:
                    si = index[key]
                    if cost < nxt[si][0]:
                        nxt[si] = (cost, new_run, pi, cand)
                else:
                    index[key] = len(nxt)
                    nxt.append((cost, new_run, pi, cand))

        nxt.sort(key=lambda s: s[0])  # stable; parity with sort_by
        nxt = nxt[:MAX_STATES]
        all_states.append(nxt)
        cur = nxt
        if not cur:
            break

    finals = [c + (4.0 if zr > 0 else 0.0) for (c, zr, _, _) in cur]
    path = [0] * 63
    if cur:
        best = min(range(len(cur)), key=lambda i: (finals[i], i))
        state_idx = best
        for zz in range(63, 0, -1):
            states = all_states[zz] if zz < len(all_states) else []
            if state_idx < len(states):
                path[zz - 1] = states[state_idx][3]
                state_idx = states[state_idx][2]
    out[1:] = path
    return out


def trellis_quantize(
    dct_zz: np.ndarray,
    pattern: Sequence[int],
    lum_q_zz: np.ndarray,
    chrom_q_zz: np.ndarray,
    lambda_: float = 1.0,
    prefer_native: bool = True,
    mode: str = None,
) -> np.ndarray:
    """[nblocks, 64] zigzag f32 DCT -> [nblocks, 64] int16 quantized.

    ``mode`` (or ``PIXO_TPU_TRELLIS``): "host" (default; native C++ with
    Python-mirror fallback) or "device" (batched 63-step Viterbi scan on
    the accelerator, ``ops/trellis_device.py`` — bit-identical output).
    Host stays the default here because the dev tunnel's d2h link makes
    the [B, 64] int16 fetch the bottleneck; on real PCIe/ICI hosts the
    device path removes trellis from the host critical path entirely.
    """
    import os

    mode = mode or os.environ.get("PIXO_TPU_TRELLIS", "host")
    if mode == "device":
        from ..ops.trellis_device import trellis_quantize_batch_device

        nb = dct_zz.shape[0]
        bpm = len(pattern)
        pat = np.asarray(pattern, np.int32)
        sel = np.tile(pat, nb // bpm + 1)[:nb] != 0
        q = np.where(
            sel[:, None], np.asarray(chrom_q_zz)[None, :],
            np.asarray(lum_q_zz)[None, :],
        ).astype(np.float32)
        out = trellis_quantize_batch_device(
            np.ascontiguousarray(dct_zz, np.float32), q, np.float32(lambda_)
        )
        return np.asarray(out).astype(np.int16)
    if prefer_native:
        from ..native import native_trellis_quantize

        out = native_trellis_quantize(dct_zz, pattern, lum_q_zz, chrom_q_zz, lambda_)
        if out is not None:
            return out
    bpm = len(pattern)
    out = np.empty((dct_zz.shape[0], 64), np.int16)
    for blk in range(dct_zz.shape[0]):
        q = lum_q_zz if pattern[blk % bpm] == 0 else chrom_q_zz
        out[blk] = trellis_quantize_block(dct_zz[blk], q, lambda_)
    return out
