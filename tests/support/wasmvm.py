"""Minimal pure-Python WebAssembly (MVP + sign-ext + bulk-memory) interpreter.

Built to execute the reference's prebuilt scalar encoder module
(``/root/reference/web/src/lib/pixo-wasm/pixo_bg.wasm``, wasm-bindgen
output of ``src/wasm.rs:78-201``) as a byte-identity oracle for the
parity tests — see ``tests/support/pixo_oracle.py``.  Scope is exactly
what that module needs: no threads, no SIMD, no reference types beyond a
single funcref table, one linear memory.

Speed is a non-goal (oracle outputs are cached as golden files); the
design optimizes for auditability: a flat pre-decoded instruction list
per function with structured branches resolved to jump targets, executed
by a closure-per-opcode dispatch loop.

f32 semantics: operands are stored as Python floats already rounded to
f32; each f32 arithmetic op computes in f64 and rounds to f32.  For
+,-,*,/ and sqrt on f32 operands this is exactly IEEE-correct (f64 has
>= 2*24+2 mantissa bits, so double rounding is innocuous).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF

_f32_pack = struct.Struct("<f")
_f64_pack = struct.Struct("<d")


def _f32(x: float) -> float:
    """Round a Python float (f64) to f32 precision."""
    return _f32_pack.unpack(_f32_pack.pack(x))[0]


def _s32(x: int) -> int:
    return x - 0x100000000 if x & 0x80000000 else x


def _s64(x: int) -> int:
    return x - 0x10000000000000000 if x & 0x8000000000000000 else x


class Trap(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# Binary reader
# ---------------------------------------------------------------------------


class Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def u8(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def bytes(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def u32(self) -> int:  # LEB128 unsigned
        result = 0
        shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7

    def s32(self) -> int:  # LEB128 signed (33-bit for block types handled apart)
        return self._sleb(32)

    def s64(self) -> int:
        return self._sleb(64)

    def _sleb(self, bits: int) -> int:
        result = 0
        shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            result |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                if shift < bits + 7 and b & 0x40:
                    result |= -(1 << shift)
                return result

    def f32(self) -> float:
        v = _f32_pack.unpack_from(self.data, self.pos)[0]
        self.pos += 4
        return v

    def f64(self) -> float:
        v = _f64_pack.unpack_from(self.data, self.pos)[0]
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        return self.bytes(n).decode("utf-8")


# ---------------------------------------------------------------------------
# Module structures
# ---------------------------------------------------------------------------


@dataclass
class FuncType:
    params: tuple
    results: tuple


@dataclass
class Func:
    type_idx: int
    locals: list = field(default_factory=list)  # expanded valtypes
    body: bytes = b""
    code: list = None  # decoded flat instruction list
    name: str = ""


@dataclass
class Global:
    valtype: int
    mutable: bool
    init: object


class Module:
    def __init__(self, data: bytes):
        self.types: list[FuncType] = []
        self.funcs: list[Func] = []
        self.imports: list[tuple] = []  # (module, name, kind, desc)
        self.n_imported_funcs = 0
        self.exports: dict[str, tuple] = {}
        self.table: list = []
        self.mem_limits = (0, None)
        self.globals: list[Global] = []
        self.data_segments: list[tuple] = []  # (offset_expr, bytes)
        self.elem_segments: list[tuple] = []
        self.start: int | None = None
        self._parse(data)

    def _parse(self, data: bytes):
        r = Reader(data)
        assert r.bytes(4) == b"\x00asm", "not a wasm module"
        assert r.u32() == 1 or True  # version (u32 little-endian, read raw)
        r.pos = 8
        while r.pos < len(data):
            sec_id = r.u8()
            size = r.u32()
            end = r.pos + size
            if sec_id == 1:  # type
                for _ in range(r.u32()):
                    assert r.u8() == 0x60
                    params = tuple(r.u8() for _ in range(r.u32()))
                    results = tuple(r.u8() for _ in range(r.u32()))
                    self.types.append(FuncType(params, results))
            elif sec_id == 2:  # import
                for _ in range(r.u32()):
                    mod, nm = r.name(), r.name()
                    kind = r.u8()
                    if kind == 0:
                        ti = r.u32()
                        self.imports.append((mod, nm, "func", ti))
                        self.funcs.append(Func(ti, name=f"{mod}.{nm}"))
                        self.n_imported_funcs += 1
                    elif kind == 1:
                        r.u8()  # reftype
                        flags = r.u8()
                        r.u32()
                        if flags & 1:
                            r.u32()
                        self.imports.append((mod, nm, "table", None))
                    elif kind == 2:
                        flags = r.u8()
                        mn = r.u32()
                        mx = r.u32() if flags & 1 else None
                        self.imports.append((mod, nm, "mem", (mn, mx)))
                    elif kind == 3:
                        vt = r.u8()
                        mut = r.u8()
                        self.imports.append((mod, nm, "global", (vt, mut)))
            elif sec_id == 3:  # function
                for _ in range(r.u32()):
                    self.funcs.append(Func(r.u32()))
            elif sec_id == 4:  # table
                for _ in range(r.u32()):
                    r.u8()  # reftype
                    flags = r.u8()
                    mn = r.u32()
                    if flags & 1:
                        r.u32()
                    self.table = [None] * mn
            elif sec_id == 5:  # memory
                for _ in range(r.u32()):
                    flags = r.u8()
                    mn = r.u32()
                    mx = r.u32() if flags & 1 else None
                    self.mem_limits = (mn, mx)
            elif sec_id == 6:  # global
                for _ in range(r.u32()):
                    vt = r.u8()
                    mut = r.u8()
                    init = self._const_expr(r)
                    self.globals.append(Global(vt, bool(mut), init))
            elif sec_id == 7:  # export
                for _ in range(r.u32()):
                    nm = r.name()
                    kind = r.u8()
                    idx = r.u32()
                    self.exports[nm] = (kind, idx)
            elif sec_id == 8:  # start
                self.start = r.u32()
            elif sec_id == 9:  # elem
                for _ in range(r.u32()):
                    flags = r.u32()
                    assert flags == 0, f"elem segment flags {flags} unsupported"
                    off = self._const_expr(r)
                    idxs = [r.u32() for _ in range(r.u32())]
                    self.elem_segments.append((off, idxs))
            elif sec_id == 10:  # code
                n = r.u32()
                body_funcs = self.funcs[self.n_imported_funcs :]
                assert n == len(body_funcs)
                for f in body_funcs:
                    sz = r.u32()
                    bend = r.pos + sz
                    for _ in range(r.u32()):
                        cnt = r.u32()
                        vt = r.u8()
                        f.locals.extend([vt] * cnt)
                    f.body = bytes(r.bytes(bend - r.pos))
            elif sec_id == 11:  # data
                for _ in range(r.u32()):
                    flags = r.u32()
                    if flags == 0:
                        off = self._const_expr(r)
                        seg = r.bytes(r.u32())
                        self.data_segments.append((off, seg))
                    elif flags == 1:  # passive
                        seg = r.bytes(r.u32())
                        self.data_segments.append((None, seg))
                    else:
                        raise Trap(f"data segment flags {flags} unsupported")
            else:  # custom/unknown: skip
                r.pos = end
            r.pos = end

    @staticmethod
    def _const_expr(r: Reader):
        op = r.u8()
        if op == 0x41:
            v = r.s32() & MASK32
        elif op == 0x42:
            v = r.s64() & MASK64
        elif op == 0x43:
            v = r.f32()
        elif op == 0x44:
            v = r.f64()
        elif op == 0x23:
            v = ("global", r.u32())
        else:
            raise Trap(f"unsupported const expr opcode {op:#x}")
        assert r.u8() == 0x0B
        return v


# ---------------------------------------------------------------------------
# Instruction decoding (raw pass: opcode + immediates)
# ---------------------------------------------------------------------------

# immediate format per opcode
_IMM_NONE = 0
_IMM_BLOCKTYPE = 1
_IMM_LABEL = 2
_IMM_LABELTABLE = 3
_IMM_FUNC = 4
_IMM_CALLIND = 5
_IMM_LOCAL = 6
_IMM_GLOBAL = 7
_IMM_MEMARG = 8
_IMM_I32 = 9
_IMM_I64 = 10
_IMM_F32 = 11
_IMM_F64 = 12
_IMM_MEMIDX = 13
_IMM_FC = 14  # 0xFC-prefixed

_IMM_FMT = {}
for _op in (0x02, 0x03, 0x04):
    _IMM_FMT[_op] = _IMM_BLOCKTYPE
for _op in (0x0C, 0x0D):
    _IMM_FMT[_op] = _IMM_LABEL
_IMM_FMT[0x0E] = _IMM_LABELTABLE
_IMM_FMT[0x10] = _IMM_FUNC
_IMM_FMT[0x11] = _IMM_CALLIND
for _op in (0x20, 0x21, 0x22):
    _IMM_FMT[_op] = _IMM_LOCAL
for _op in (0x23, 0x24):
    _IMM_FMT[_op] = _IMM_GLOBAL
for _op in range(0x28, 0x3F):
    _IMM_FMT[_op] = _IMM_MEMARG
for _op in (0x3F, 0x40):
    _IMM_FMT[_op] = _IMM_MEMIDX
_IMM_FMT[0x41] = _IMM_I32
_IMM_FMT[0x42] = _IMM_I64
_IMM_FMT[0x43] = _IMM_F32
_IMM_FMT[0x44] = _IMM_F64
_IMM_FMT[0xFC] = _IMM_FC


def decode_raw(body: bytes):
    """Decode a function body into [(pos, opcode, imm), ...] (imm raw)."""
    r = Reader(body)
    out = []
    n = len(body)
    while r.pos < n:
        pos = r.pos
        op = r.u8()
        fmt = _IMM_FMT.get(op, _IMM_NONE)
        imm = None
        if fmt == _IMM_BLOCKTYPE:
            b = r.data[r.pos]
            if b == 0x40 or b in (0x7F, 0x7E, 0x7D, 0x7C):
                r.pos += 1
                imm = b
            else:
                imm = ("type", r.s32())
        elif fmt == _IMM_LABEL:
            imm = r.u32()
        elif fmt == _IMM_LABELTABLE:
            tbl = [r.u32() for _ in range(r.u32())]
            imm = (tbl, r.u32())
        elif fmt == _IMM_FUNC:
            imm = r.u32()
        elif fmt == _IMM_CALLIND:
            imm = (r.u32(), r.u32())  # type idx, table idx
        elif fmt in (_IMM_LOCAL, _IMM_GLOBAL):
            imm = r.u32()
        elif fmt == _IMM_MEMARG:
            imm = (r.u32(), r.u32())  # align, offset
        elif fmt == _IMM_MEMIDX:
            imm = r.u32()
        elif fmt == _IMM_I32:
            imm = r.s32() & MASK32
        elif fmt == _IMM_I64:
            imm = r.s64() & MASK64
        elif fmt == _IMM_F32:
            imm = r.f32()
        elif fmt == _IMM_F64:
            imm = r.f64()
        elif fmt == _IMM_FC:
            sub = r.u32()
            if sub in (10, 11):  # memory.copy / memory.fill
                if sub == 10:
                    imm = (sub, r.u8(), r.u8())
                else:
                    imm = (sub, r.u8())
            elif sub == 8:  # memory.init
                imm = (sub, r.u32(), r.u8())
            elif sub == 9:  # data.drop
                imm = (sub, r.u32())
            elif sub <= 7:  # saturating truncations
                imm = (sub,)
            else:
                raise Trap(f"unsupported 0xFC subop {sub}")
            op = 0xFC00 | sub
        out.append((pos, op, imm))
    return out


def opcode_census(path: str):
    from collections import Counter

    with open(path, "rb") as f:
        mod = Module(f.read())
    c = Counter()
    for fn in mod.funcs[mod.n_imported_funcs :]:
        for _, op, _ in decode_raw(fn.body):
            c[op] += 1
    return mod, c


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

_PAGE = 65536
_pk_i32 = struct.Struct("<I")
_pk_i32s = struct.Struct("<i")
_pk_i64 = struct.Struct("<Q")
_pk_i16 = struct.Struct("<H")
_pk_i16s = struct.Struct("<h")
_NAN32 = _f32(float("nan"))


def _idiv_trunc(a: int, b: int) -> int:
    q = a // b
    if a % b != 0 and (a < 0) != (b < 0):
        q += 1
    return q


def _fmin(a: float, b: float) -> float:
    if a != a or b != b:
        return float("nan")
    if a == b:
        return a if math.copysign(1.0, a) < 0 else b
    return a if a < b else b


def _fmax(a: float, b: float) -> float:
    if a != a or b != b:
        return float("nan")
    if a == b:
        return a if math.copysign(1.0, a) > 0 else b
    return a if a > b else b


def _fnearest(x: float) -> float:
    if x != x or math.isinf(x) or x == 0.0:
        return x
    if abs(x) >= 2**52:
        return x
    r = float(round(x))  # Python round() is round-half-to-even
    if r == 0.0:
        return math.copysign(0.0, x)
    return r


def _fceil(x: float) -> float:
    if x != x or math.isinf(x) or x == 0.0:
        return x
    r = float(math.ceil(x))
    return math.copysign(0.0, x) if r == 0.0 else r


def _ffloor(x: float) -> float:
    if x != x or math.isinf(x) or x == 0.0:
        return x
    r = float(math.floor(x))
    return math.copysign(0.0, x) if r == 0.0 else r


def _ftrunc(x: float) -> float:
    if x != x or math.isinf(x) or x == 0.0:
        return x
    r = float(math.trunc(x))
    return math.copysign(0.0, x) if r == 0.0 else r


def _trunc_checked(x: float, lo: int, hi: int) -> int:
    if x != x:
        raise Trap("invalid conversion to integer: NaN")
    t = math.trunc(x) if not math.isinf(x) else (lo - 1 if x < 0 else hi + 1)
    if t < lo or t > hi:
        raise Trap(f"integer overflow in trunc: {x}")
    return t


def _trunc_sat(x: float, lo: int, hi: int) -> int:
    if x != x:
        return 0
    if math.isinf(x):
        return lo if x < 0 else hi
    t = math.trunc(x)
    return lo if t < lo else hi if t > hi else t


_LOCAL_DEFAULT = {0x7F: 0, 0x7E: 0, 0x7D: 0.0, 0x7C: 0.0, 0x70: None, 0x6F: None}


class Instance:
    """An instantiated module.  ``host_funcs`` maps (module, name) ->
    python callable taking unsigned int args and returning a list."""

    def __init__(self, module: Module, host_funcs=None):
        self.module = module
        self.types = module.types
        host_funcs = host_funcs or {}
        mn, _mx = module.mem_limits
        self.mem = bytearray(mn * _PAGE)
        self.globals = []
        for g in module.globals:
            v = g.init
            if isinstance(v, tuple) and v[0] == "global":
                v = self.globals[v[1]]
            self.globals.append(v)
        for off, seg in module.data_segments:
            if off is None:
                continue  # passive
            o = self.globals[off[1]] if isinstance(off, tuple) else off
            self.mem[o : o + len(seg)] = seg
        self.table = list(module.table)
        for off, idxs in module.elem_segments:
            o = self.globals[off[1]] if isinstance(off, tuple) else off
            for k, fi in enumerate(idxs):
                self.table[o + k] = fi
        # host functions for imported func slots
        self.host = {}
        for i, f in enumerate(module.funcs[: module.n_imported_funcs]):
            mod_nm = tuple(f.name.split(".", 1))
            if mod_nm not in host_funcs:
                raise Trap(f"missing host import {f.name}")
            self.host[i] = host_funcs[mod_nm]
        self._compiled = [None] * len(module.funcs)
        if module.start is not None:
            self.invoke(module.start, [])

    # -- public API --------------------------------------------------------

    def call(self, export: str, *args):
        kind, idx = self.module.exports[export]
        assert kind == 0, f"{export} is not a function export"
        res = self.invoke(idx, list(args))
        if not res:
            return None
        return res[0] if len(res) == 1 else res

    def mem_read(self, ptr: int, n: int) -> bytes:
        return bytes(self.mem[ptr : ptr + n])

    def mem_write(self, ptr: int, data: bytes) -> None:
        self.mem[ptr : ptr + len(data)] = data

    def read_i32(self, addr: int) -> int:
        return _pk_i32s.unpack_from(self.mem, addr)[0]

    # -- execution core ----------------------------------------------------

    def invoke(self, fidx: int, args: list):
        if fidx in self.host:
            return self.host[fidx](*args)
        f = self.module.funcs[fidx]
        code = self._compiled[fidx]
        if code is None:
            code = self._compile(f)
            self._compiled[fidx] = code
        ft = self.types[f.type_idx]
        loc = args + [_LOCAL_DEFAULT[v] for v in f.locals]
        st = []
        n = len(code)
        nres = len(ft.results)
        ctrl = [(0, n, nres, False)]
        ip = 0
        while ip < n:
            ip = code[ip](st, loc, ctrl)
        return st[-nres:] if nres else []

    # -- compiler: raw instructions -> list of closures --------------------

    def _compile(self, f: Func):
        raw = decode_raw(f.body)
        npos = len(raw)
        # structure pass: match block/loop/if with else/end
        end_of = {}
        else_of = {}
        stk = []
        for i, (_, op, _imm) in enumerate(raw):
            if op in (0x02, 0x03, 0x04):
                stk.append(i)
            elif op == 0x05:
                else_of[stk[-1]] = i
            elif op == 0x0B:
                if stk:  # function-body end has no opener
                    end_of[stk.pop()] = i
        mem = self.mem
        glob = self.globals
        types = self.types
        table = self.table
        code = [None] * npos

        def block_arity(bt):
            if bt == 0x40:
                return 0
            if isinstance(bt, tuple):
                ft = types[bt[1]]
                if ft.params:
                    raise Trap("block params unsupported (multi-value)")
                return len(ft.results)
            return 1

        def mk_br(n_):
            def h(st, loc, ctrl):
                height, target, arity, _ = ctrl[-1 - n_]
                if arity:
                    vals = st[-arity:]
                    del st[height:]
                    st += vals
                else:
                    del st[height:]
                del ctrl[len(ctrl) - n_ - 1 :]
                return target

            return h

        for i, (_, op, imm) in enumerate(raw):
            nxt = i + 1
            if op == 0x02:  # block
                e = end_of[i]
                ar = block_arity(imm)
                tgt = e + 1

                def h(st, loc, ctrl, _t=tgt, _a=ar, _n=nxt):
                    ctrl.append((len(st), _t, _a, False))
                    return _n

            elif op == 0x03:  # loop

                def h(st, loc, ctrl, _i=i, _n=nxt):
                    ctrl.append((len(st), _i, 0, True))
                    return _n

            elif op == 0x04:  # if
                e = end_of[i]
                el = else_of.get(i)
                ar = block_arity(imm)
                tgt = e + 1
                false_ip = (el + 1) if el is not None else e

                def h(st, loc, ctrl, _t=tgt, _a=ar, _n=nxt, _f=false_ip):
                    c = st.pop()
                    ctrl.append((len(st), _t, _a, False))
                    return _n if c else _f

            elif op == 0x05:  # else (end of then-branch): jump to end
                # find my if's end: else_of inverse
                my_if = next(k for k, v in else_of.items() if v == i)
                e = end_of[my_if]

                def h(st, loc, ctrl, _e=e):
                    return _e

            elif op == 0x0B:  # end

                def h(st, loc, ctrl, _n=nxt):
                    ctrl.pop()
                    return _n

            elif op == 0x00:  # unreachable

                def h(st, loc, ctrl):
                    raise Trap("unreachable executed")

            elif op == 0x01:  # nop

                def h(st, loc, ctrl, _n=nxt):
                    return _n

            elif op == 0x0C:  # br
                h = mk_br(imm)
            elif op == 0x0D:  # br_if
                br = mk_br(imm)

                def h(st, loc, ctrl, _br=br, _n=nxt):
                    return _br(st, loc, ctrl) if st.pop() else _n

            elif op == 0x0E:  # br_table
                tbl, dflt = imm
                brs = [mk_br(t) for t in tbl]
                brd = mk_br(dflt)

                def h(st, loc, ctrl, _brs=brs, _brd=brd):
                    k = st.pop()
                    return (_brs[k] if k < len(_brs) else _brd)(st, loc, ctrl)

            elif op == 0x0F:  # return

                def h(st, loc, ctrl, _n=npos):
                    return _n

            elif op == 0x10:  # call
                callee = self.module.funcs[imm]
                ct = types[callee.type_idx]
                na, nr = len(ct.params), len(ct.results)

                def h(st, loc, ctrl, _fi=imm, _na=na, _n=nxt):
                    if _na:
                        args = st[-_na:]
                        del st[-_na:]
                    else:
                        args = []
                    st += self.invoke(_fi, args)
                    return _n

            elif op == 0x11:  # call_indirect
                ti = imm[0]
                ct = types[ti]
                na = len(ct.params)

                def h(st, loc, ctrl, _na=na, _ti=ti, _n=nxt):
                    k = st.pop()
                    fi = table[k]
                    if fi is None:
                        raise Trap("call_indirect to null entry")
                    if _na:
                        args = st[-_na:]
                        del st[-_na:]
                    else:
                        args = []
                    st += self.invoke(fi, args)
                    return _n

            elif op == 0x1A:  # drop

                def h(st, loc, ctrl, _n=nxt):
                    st.pop()
                    return _n

            elif op == 0x1B:  # select

                def h(st, loc, ctrl, _n=nxt):
                    c = st.pop()
                    b = st.pop()
                    a = st.pop()
                    st.append(a if c else b)
                    return _n

            elif op == 0x20:  # local.get

                def h(st, loc, ctrl, _k=imm, _n=nxt):
                    st.append(loc[_k])
                    return _n

            elif op == 0x21:  # local.set

                def h(st, loc, ctrl, _k=imm, _n=nxt):
                    loc[_k] = st.pop()
                    return _n

            elif op == 0x22:  # local.tee

                def h(st, loc, ctrl, _k=imm, _n=nxt):
                    loc[_k] = st[-1]
                    return _n

            elif op == 0x23:  # global.get

                def h(st, loc, ctrl, _k=imm, _n=nxt):
                    st.append(glob[_k])
                    return _n

            elif op == 0x24:  # global.set

                def h(st, loc, ctrl, _k=imm, _n=nxt):
                    glob[_k] = st.pop()
                    return _n

            elif 0x28 <= op <= 0x35:  # loads
                off = imm[1]
                if op == 0x28:  # i32.load

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_pk_i32.unpack_from):
                        st.append(_u(mem, st.pop() + _o)[0])
                        return _n

                elif op == 0x29:  # i64.load

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_pk_i64.unpack_from):
                        st.append(_u(mem, st.pop() + _o)[0])
                        return _n

                elif op == 0x2A:  # f32.load

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_f32_pack.unpack_from):
                        st.append(_u(mem, st.pop() + _o)[0])
                        return _n

                elif op == 0x2B:  # f64.load

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_f64_pack.unpack_from):
                        st.append(_u(mem, st.pop() + _o)[0])
                        return _n

                elif op == 0x2C:  # i32.load8_s

                    def h(st, loc, ctrl, _o=off, _n=nxt):
                        v = mem[st.pop() + _o]
                        st.append(v | 0xFFFFFF00 if v & 0x80 else v)
                        return _n

                elif op == 0x2D:  # i32.load8_u

                    def h(st, loc, ctrl, _o=off, _n=nxt):
                        st.append(mem[st.pop() + _o])
                        return _n

                elif op == 0x2E:  # i32.load16_s

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_pk_i16.unpack_from):
                        v = _u(mem, st.pop() + _o)[0]
                        st.append(v | 0xFFFF0000 if v & 0x8000 else v)
                        return _n

                elif op == 0x2F:  # i32.load16_u

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_pk_i16.unpack_from):
                        st.append(_u(mem, st.pop() + _o)[0])
                        return _n

                elif op == 0x30:  # i64.load8_s

                    def h(st, loc, ctrl, _o=off, _n=nxt):
                        v = mem[st.pop() + _o]
                        st.append(v | 0xFFFFFFFFFFFFFF00 if v & 0x80 else v)
                        return _n

                elif op == 0x31:  # i64.load8_u

                    def h(st, loc, ctrl, _o=off, _n=nxt):
                        st.append(mem[st.pop() + _o])
                        return _n

                elif op == 0x32:  # i64.load16_s

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_pk_i16.unpack_from):
                        v = _u(mem, st.pop() + _o)[0]
                        st.append(v | 0xFFFFFFFFFFFF0000 if v & 0x8000 else v)
                        return _n

                elif op == 0x33:  # i64.load16_u

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_pk_i16.unpack_from):
                        st.append(_u(mem, st.pop() + _o)[0])
                        return _n

                elif op == 0x34:  # i64.load32_s

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_pk_i32.unpack_from):
                        v = _u(mem, st.pop() + _o)[0]
                        st.append(v | 0xFFFFFFFF00000000 if v & 0x80000000 else v)
                        return _n

                else:  # 0x35 i64.load32_u

                    def h(st, loc, ctrl, _o=off, _n=nxt, _u=_pk_i32.unpack_from):
                        st.append(_u(mem, st.pop() + _o)[0])
                        return _n

            elif 0x36 <= op <= 0x3E:  # stores
                off = imm[1]
                if op == 0x36:  # i32.store

                    def h(st, loc, ctrl, _o=off, _n=nxt, _p=_pk_i32.pack_into):
                        v = st.pop()
                        _p(mem, st.pop() + _o, v)
                        return _n

                elif op == 0x37:  # i64.store

                    def h(st, loc, ctrl, _o=off, _n=nxt, _p=_pk_i64.pack_into):
                        v = st.pop()
                        _p(mem, st.pop() + _o, v)
                        return _n

                elif op == 0x38:  # f32.store

                    def h(st, loc, ctrl, _o=off, _n=nxt, _p=_f32_pack.pack_into):
                        v = st.pop()
                        _p(mem, st.pop() + _o, v)
                        return _n

                elif op == 0x39:  # f64.store

                    def h(st, loc, ctrl, _o=off, _n=nxt, _p=_f64_pack.pack_into):
                        v = st.pop()
                        _p(mem, st.pop() + _o, v)
                        return _n

                elif op == 0x3A:  # i32.store8

                    def h(st, loc, ctrl, _o=off, _n=nxt):
                        v = st.pop()
                        mem[st.pop() + _o] = v & 0xFF
                        return _n

                elif op == 0x3B:  # i32.store16

                    def h(st, loc, ctrl, _o=off, _n=nxt, _p=_pk_i16.pack_into):
                        v = st.pop()
                        _p(mem, st.pop() + _o, v & 0xFFFF)
                        return _n

                elif op == 0x3C:  # i64.store8

                    def h(st, loc, ctrl, _o=off, _n=nxt):
                        v = st.pop()
                        mem[st.pop() + _o] = v & 0xFF
                        return _n

                elif op == 0x3D:  # i64.store16

                    def h(st, loc, ctrl, _o=off, _n=nxt, _p=_pk_i16.pack_into):
                        v = st.pop()
                        _p(mem, st.pop() + _o, v & 0xFFFF)
                        return _n

                else:  # 0x3E i64.store32

                    def h(st, loc, ctrl, _o=off, _n=nxt, _p=_pk_i32.pack_into):
                        v = st.pop()
                        _p(mem, st.pop() + _o, v & MASK32)
                        return _n

            elif op == 0x3F:  # memory.size

                def h(st, loc, ctrl, _n=nxt):
                    st.append(len(mem) // _PAGE)
                    return _n

            elif op == 0x40:  # memory.grow

                def h(st, loc, ctrl, _n=nxt):
                    d = st.pop()
                    old = len(mem) // _PAGE
                    mem.extend(bytes(d * _PAGE))
                    st.append(old)
                    return _n

            elif op in (0x41, 0x42, 0x43, 0x44):  # const

                def h(st, loc, ctrl, _v=imm, _n=nxt):
                    st.append(_v)
                    return _n

            else:
                h = self._compile_numeric(op, nxt)
            code[i] = h
        return code

    def _compile_numeric(self, op, nxt):
        mem = self.mem
        entry = _NUM_OPS.get(op)
        if entry is not None:
            kind, f = entry
            if kind == 2:

                def h(st, loc, ctrl, _n=nxt, _f=f):
                    b = st.pop()
                    st[-1] = _f(st[-1], b)
                    return _n

            else:

                def h(st, loc, ctrl, _n=nxt, _f=f):
                    st[-1] = _f(st[-1])
                    return _n

            return h
        if op == 0xFC0A:  # memory.copy

            def h(st, loc, ctrl, _n=nxt):
                n_ = st.pop()
                s = st.pop()
                d = st.pop()
                mem[d : d + n_] = mem[s : s + n_]
                return _n

            return h
        if op == 0xFC0B:  # memory.fill

            def h(st, loc, ctrl, _n=nxt):
                n_ = st.pop()
                v = st.pop() & 0xFF
                d = st.pop()
                mem[d : d + n_] = bytes([v]) * n_
                return _n

            return h
        raise Trap(f"unimplemented opcode {op:#x}")


def _mk_num_ops():
    """(kind, fn) per numeric opcode; kind 1=unary, 2=binary.  Built once."""

    def bin32(fn):
        return (2, fn)

    def un(fn):
        return (1, fn)

    U32, U64 = MASK32, MASK64
    s32, s64 = _s32, _s64
    f32 = _f32

    table = {
            # --- i32 compare ---
            0x45: un(lambda a: 1 if a == 0 else 0),
            0x46: bin32(lambda a, b: 1 if a == b else 0),
            0x47: bin32(lambda a, b: 1 if a != b else 0),
            0x48: bin32(lambda a, b: 1 if s32(a) < s32(b) else 0),
            0x49: bin32(lambda a, b: 1 if a < b else 0),
            0x4A: bin32(lambda a, b: 1 if s32(a) > s32(b) else 0),
            0x4B: bin32(lambda a, b: 1 if a > b else 0),
            0x4C: bin32(lambda a, b: 1 if s32(a) <= s32(b) else 0),
            0x4D: bin32(lambda a, b: 1 if a <= b else 0),
            0x4E: bin32(lambda a, b: 1 if s32(a) >= s32(b) else 0),
            0x4F: bin32(lambda a, b: 1 if a >= b else 0),
            # --- i64 compare ---
            0x50: un(lambda a: 1 if a == 0 else 0),
            0x51: bin32(lambda a, b: 1 if a == b else 0),
            0x52: bin32(lambda a, b: 1 if a != b else 0),
            0x53: bin32(lambda a, b: 1 if s64(a) < s64(b) else 0),
            0x54: bin32(lambda a, b: 1 if a < b else 0),
            0x55: bin32(lambda a, b: 1 if s64(a) > s64(b) else 0),
            0x56: bin32(lambda a, b: 1 if a > b else 0),
            0x57: bin32(lambda a, b: 1 if s64(a) <= s64(b) else 0),
            0x58: bin32(lambda a, b: 1 if a <= b else 0),
            0x59: bin32(lambda a, b: 1 if s64(a) >= s64(b) else 0),
            0x5A: bin32(lambda a, b: 1 if a >= b else 0),
            # --- f32/f64 compare (NaN-safe: Python comparisons already false) ---
            0x5B: bin32(lambda a, b: 1 if a == b else 0),
            0x5C: bin32(lambda a, b: 1 if a != b else 0),  # NaN: a!=a -> True == wasm ne
            0x5D: bin32(lambda a, b: 1 if a < b else 0),
            0x5E: bin32(lambda a, b: 1 if a > b else 0),
            0x5F: bin32(lambda a, b: 1 if a <= b else 0),
            0x60: bin32(lambda a, b: 1 if a >= b else 0),
            0x61: bin32(lambda a, b: 1 if a == b else 0),
            0x62: bin32(lambda a, b: 1 if a != b else 0),
            0x63: bin32(lambda a, b: 1 if a < b else 0),
            0x64: bin32(lambda a, b: 1 if a > b else 0),
            0x65: bin32(lambda a, b: 1 if a <= b else 0),
            0x66: bin32(lambda a, b: 1 if a >= b else 0),
            # --- i32 arith ---
            0x67: un(lambda a: 32 - a.bit_length()),
            0x68: un(lambda a: 32 if a == 0 else (a & -a).bit_length() - 1),
            0x69: un(lambda a: a.bit_count()),
            0x6A: bin32(lambda a, b: (a + b) & U32),
            0x6B: bin32(lambda a, b: (a - b) & U32),
            0x6C: bin32(lambda a, b: (a * b) & U32),
            0x6D: bin32(lambda a, b: _idiv_trunc(s32(a), s32(b)) & U32),
            0x6E: bin32(lambda a, b: (a // b) & U32),
            0x6F: bin32(
                lambda a, b: (s32(a) - s32(b) * _idiv_trunc(s32(a), s32(b))) & U32
            ),
            0x70: bin32(lambda a, b: (a % b) & U32),
            0x71: bin32(lambda a, b: a & b),
            0x72: bin32(lambda a, b: a | b),
            0x73: bin32(lambda a, b: a ^ b),
            0x74: bin32(lambda a, b: (a << (b & 31)) & U32),
            0x75: bin32(lambda a, b: (s32(a) >> (b & 31)) & U32),
            0x76: bin32(lambda a, b: a >> (b & 31)),
            0x77: bin32(
                lambda a, b: ((a << (b & 31)) | (a >> (32 - (b & 31)))) & U32
                if b & 31
                else a
            ),
            0x78: bin32(
                lambda a, b: ((a >> (b & 31)) | (a << (32 - (b & 31)))) & U32
                if b & 31
                else a
            ),
            # --- i64 arith ---
            0x79: un(lambda a: 64 - a.bit_length()),
            0x7A: un(lambda a: 64 if a == 0 else (a & -a).bit_length() - 1),
            0x7B: un(lambda a: a.bit_count()),
            0x7C: bin32(lambda a, b: (a + b) & U64),
            0x7D: bin32(lambda a, b: (a - b) & U64),
            0x7E: bin32(lambda a, b: (a * b) & U64),
            0x7F: bin32(lambda a, b: _idiv_trunc(s64(a), s64(b)) & U64),
            0x80: bin32(lambda a, b: (a // b) & U64),
            0x81: bin32(
                lambda a, b: (s64(a) - s64(b) * _idiv_trunc(s64(a), s64(b))) & U64
            ),
            0x82: bin32(lambda a, b: (a % b) & U64),
            0x83: bin32(lambda a, b: a & b),
            0x84: bin32(lambda a, b: a | b),
            0x85: bin32(lambda a, b: a ^ b),
            0x86: bin32(lambda a, b: (a << (b & 63)) & U64),
            0x87: bin32(lambda a, b: (s64(a) >> (b & 63)) & U64),
            0x88: bin32(lambda a, b: a >> (b & 63)),
            0x89: bin32(
                lambda a, b: ((a << (b & 63)) | (a >> (64 - (b & 63)))) & U64
                if b & 63
                else a
            ),
            0x8A: bin32(
                lambda a, b: ((a >> (b & 63)) | (a << (64 - (b & 63)))) & U64
                if b & 63
                else a
            ),
            # --- f32 ---
            0x8B: un(lambda a: abs(a)),
            0x8C: un(lambda a: -a),
            0x8D: un(_fceil),
            0x8E: un(_ffloor),
            0x8F: un(_ftrunc),
            0x90: un(_fnearest),
            0x91: un(lambda a: f32(math.sqrt(a)) if a >= 0 else _NAN32),
            0x92: bin32(lambda a, b: f32(a + b)),
            0x93: bin32(lambda a, b: f32(a - b)),
            0x94: bin32(lambda a, b: f32(a * b)),
            0x95: bin32(lambda a, b: f32(a / b) if b != 0 else _f32_divzero(a, b)),
            0x96: bin32(_fmin),
            0x97: bin32(_fmax),
            0x98: bin32(lambda a, b: math.copysign(a, b)),
            # --- f64 ---
            0x99: un(lambda a: abs(a)),
            0x9A: un(lambda a: -a),
            0x9B: un(_fceil),
            0x9C: un(_ffloor),
            0x9D: un(_ftrunc),
            0x9E: un(_fnearest),
            0x9F: un(lambda a: math.sqrt(a) if a >= 0 else float("nan")),
            0xA0: bin32(lambda a, b: a + b),
            0xA1: bin32(lambda a, b: a - b),
            0xA2: bin32(lambda a, b: a * b),
            0xA3: bin32(lambda a, b: a / b if b != 0 else _f64_divzero(a, b)),
            0xA4: bin32(_fmin),
            0xA5: bin32(_fmax),
            0xA6: bin32(lambda a, b: math.copysign(a, b)),
            # --- conversions ---
            0xA7: un(lambda a: a & U32),
            0xA8: un(lambda a: _trunc_checked(a, -(2**31), 2**31 - 1) & U32),
            0xA9: un(lambda a: _trunc_checked(a, 0, 2**32 - 1)),
            0xAA: un(lambda a: _trunc_checked(a, -(2**31), 2**31 - 1) & U32),
            0xAB: un(lambda a: _trunc_checked(a, 0, 2**32 - 1)),
            0xAC: un(lambda a: s32(a) & U64),
            0xAD: un(lambda a: a),
            0xAE: un(lambda a: _trunc_checked(a, -(2**63), 2**63 - 1) & U64),
            0xAF: un(lambda a: _trunc_checked(a, 0, 2**64 - 1)),
            0xB0: un(lambda a: _trunc_checked(a, -(2**63), 2**63 - 1) & U64),
            0xB1: un(lambda a: _trunc_checked(a, 0, 2**64 - 1)),
            0xB2: un(lambda a: f32(float(s32(a)))),
            0xB3: un(lambda a: f32(float(a))),
            0xB4: un(lambda a: f32(float(s64(a)))),
            0xB5: un(lambda a: f32(float(a))),
            0xB6: un(f32),
            0xB7: un(lambda a: float(s32(a))),
            0xB8: un(lambda a: float(a)),
            0xB9: un(lambda a: float(s64(a))),
            0xBA: un(lambda a: float(a)),
            0xBB: un(lambda a: a),
            0xBC: un(lambda a: _pk_i32.unpack(_f32_pack.pack(a))[0]),
            0xBD: un(lambda a: _pk_i64.unpack(_f64_pack.pack(a))[0]),
            0xBE: un(lambda a: _f32_pack.unpack(_pk_i32.pack(a))[0]),
            0xBF: un(lambda a: _f64_pack.unpack(_pk_i64.pack(a))[0]),
            # --- sign extension ---
            0xC0: un(lambda a: (a | 0xFFFFFF00 if a & 0x80 else a & 0xFF) & U32),
            0xC1: un(lambda a: (a | 0xFFFF0000 if a & 0x8000 else a & 0xFFFF) & U32),
            0xC2: un(
                lambda a: ((a & 0xFF) | (U64 ^ 0xFF) if a & 0x80 else a & 0xFF)
            ),
            0xC3: un(
                lambda a: (
                    (a & 0xFFFF) | (U64 ^ 0xFFFF) if a & 0x8000 else a & 0xFFFF
                )
            ),
            0xC4: un(
                lambda a: (
                    (a & U32) | (U64 ^ U32) if a & 0x80000000 else a & U32
                )
            ),
            # --- saturating truncations (0xFC00-07) ---
            0xFC00: un(lambda a: _trunc_sat(a, -(2**31), 2**31 - 1) & U32),
            0xFC01: un(lambda a: _trunc_sat(a, 0, 2**32 - 1)),
            0xFC02: un(lambda a: _trunc_sat(a, -(2**31), 2**31 - 1) & U32),
            0xFC03: un(lambda a: _trunc_sat(a, 0, 2**32 - 1)),
            0xFC04: un(lambda a: _trunc_sat(a, -(2**63), 2**63 - 1) & U64),
            0xFC05: un(lambda a: _trunc_sat(a, 0, 2**64 - 1)),
            0xFC06: un(lambda a: _trunc_sat(a, -(2**63), 2**63 - 1) & U64),
            0xFC07: un(lambda a: _trunc_sat(a, 0, 2**64 - 1)),
        }
    return table


_NUM_OPS = _mk_num_ops()


def _f32_divzero(a, b):
    if a != a or b != b:
        return float("nan")
    if a == 0.0:
        return float("nan")
    return math.copysign(float("inf"), a) * math.copysign(1.0, b)


def _f64_divzero(a, b):
    return _f32_divzero(a, b)


def instantiate(path: str, host_funcs=None) -> Instance:
    with open(path, "rb") as f:
        return Instance(Module(f.read()), host_funcs)
