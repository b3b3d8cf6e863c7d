"""PCG32 utilities: deterministic seeded RNG + the grid Rng hash.

Re-derivation of the vendored pcg32 (reference
/root/reference/dependencies/pcg32/pcg32.h:33-165) and rng_hash
(common_device.h:663-677). JAX has no uint64 without global x64 mode, so
64-bit arithmetic is emulated with four 16-bit limbs held in uint32 lanes -
exact mod-2^64 semantics, fully vectorized.

PCG32 semantics:
  seed(initstate, initseq): state=0; inc=(initseq<<1)|1; next(); state+=
    initstate; next()
  next_uint: old=state; state=old*MULT+inc;
    xorshifted=u32(((old>>18)^old)>>27); rot=old>>59; ror32(xorshifted, rot)
  advance(delta): binary-exponentiation affine composition
    state = MULT^delta * state + (MULT^delta-1)/(MULT-1)*inc  (pcg32.h:145-166)

rng_hash(pos, seed=1337): delta = XOR_i (u64(pos_i) << (i*(64//D)));
  pcg32(seed).advance(delta).next_uint()  (common_device.h:663-677)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PCG32_MULT = 0x5851F42D4C957F2D
_M64 = (1 << 64) - 1


# -- host-side (python int) reference ---------------------------------------


def _host_next(state, inc):
    new_state = (state * PCG32_MULT + inc) & _M64
    xorshifted = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
    rot = state >> 59
    out = ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF
    return new_state, out


def host_pcg32_init(initstate: int, initseq: int = 1):
    """(state, inc) after pcg32::seed (pcg32.h:53-59)."""
    inc = ((initseq << 1) | 1) & _M64
    state = 0
    state, _ = _host_next(state, inc)
    state = (state + initstate) & _M64
    state, _ = _host_next(state, inc)
    return state, inc


def host_rng_hash(pos, n_dims: int, seed: int = 1337) -> int:
    """Scalar python-int oracle of rng_hash (common_device.h:663-677)."""
    nbits = 64 // n_dims
    delta = 0
    for i in range(n_dims):
        delta ^= (int(pos[i]) << (i * nbits)) & _M64
    state, inc = host_pcg32_init(seed)
    # advance
    cur_mult, cur_plus = PCG32_MULT, inc
    acc_mult, acc_plus = 1, 0
    while delta > 0:
        if delta & 1:
            acc_mult = (acc_mult * cur_mult) & _M64
            acc_plus = (acc_plus * cur_mult + cur_plus) & _M64
        cur_plus = ((cur_mult + 1) * cur_plus) & _M64
        cur_mult = (cur_mult * cur_mult) & _M64
        delta >>= 1
    state = (acc_mult * state + acc_plus) & _M64
    _, out = _host_next(state, inc)
    return out


# -- 16-bit-limb u64 arithmetic on uint32 lanes ------------------------------

_MASK16 = jnp.uint32(0xFFFF)


def _limbs_const(v: int):
    return tuple(np.uint32((v >> (16 * k)) & 0xFFFF) for k in range(4))


def _mul64(a, b):
    """Exact mod-2^64 product of 16-bit-limb values. Each 16x16 partial
    product is < 2^32 (exact in uint32); lo/hi halves are accumulated
    separately so column sums stay well below 2^32."""
    zeros = jnp.zeros_like(a[0])
    col_lo = [zeros, zeros, zeros, zeros]
    col_hi = [zeros, zeros, zeros, zeros]
    for i in range(4):
        for j in range(4 - i):
            p = a[i] * b[j]
            col_lo[i + j] = col_lo[i + j] + (p & _MASK16)
            col_hi[i + j] = col_hi[i + j] + (p >> 16)
    out = []
    carry = zeros
    for k in range(4):
        s = col_lo[k] + carry
        if k > 0:
            s = s + col_hi[k - 1]
        out.append(s & _MASK16)
        carry = s >> 16
    return tuple(out)


def _add64(a, b):
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(4):
        s = a[k] + b[k] + carry
        out.append(s & _MASK16)
        carry = s >> 16
    return tuple(out)


def _where64(cond, a, b):
    return tuple(jnp.where(cond, x, y) for x, y in zip(a, b))


def _broadcast_const(c, like):
    return tuple(jnp.full_like(like, limb) for limb in c)


@functools.lru_cache(maxsize=None)
def _advance_tables(seed: int):
    """Per-bit (cur_mult, cur_plus) constants of pcg32::advance for a fixed
    seeded generator - they do not depend on delta (pcg32.h:151-164)."""
    state, inc = host_pcg32_init(seed)
    cur_mult, cur_plus = PCG32_MULT, inc
    mults, pluses = [], []
    for _ in range(64):
        mults.append(cur_mult)
        pluses.append(cur_plus)
        cur_plus = ((cur_mult + 1) * cur_plus) & _M64
        cur_mult = (cur_mult * cur_mult) & _M64
    return state, inc, tuple(mults), tuple(pluses)


def rng_hash(cells, n_dims: int, seed: int = 1337):
    """Vectorized rng_hash: cells uint32 [..., D] -> uint32 [...].

    Matches common_device.h:663-677 bit-exactly (validated against the
    python-int oracle above).
    """
    nbits = 64 // n_dims
    base = cells[..., 0]
    zeros = jnp.zeros_like(base)

    # delta = XOR of pos_i << (i*nbits), as 16-bit limbs
    delta = [zeros, zeros, zeros, zeros]
    for i in range(n_dims):
        v = cells[..., i]
        shift = i * nbits
        # place the 32-bit value v at bit offset `shift` within 64 bits
        for k in range(4):
            lo_bit = 16 * k
            # bits of v landing in limb k: v >> (lo_bit - shift) when
            # shift <= lo_bit else v << (shift - lo_bit)
            rel = lo_bit - shift
            if rel >= 32 or rel <= -32:
                continue
            if rel >= 0:
                part = (v >> rel) & _MASK16
            else:
                part = (v << (-rel)) & _MASK16
            delta[k] = delta[k] ^ part
    delta = tuple(delta)

    state0, inc, mults, pluses = _advance_tables(seed)

    # per-bit advance constants as [64, 4] limb tables; the 64 iterations run
    # as a lax.fori_loop (python unrolling makes the jaxpr explode)
    mult_tbl = jnp.asarray(
        np.stack([np.asarray(_limbs_const(m), np.uint32) for m in mults]),
    )
    plus_tbl = jnp.asarray(
        np.stack([np.asarray(_limbs_const(p), np.uint32) for p in pluses]),
    )
    delta_stack = jnp.stack(delta)  # [4, ...]

    def body(bit, carry):
        acc_mult, acc_plus = carry
        limb = bit // 16
        off = (bit % 16).astype(jnp.uint32)
        cond = ((delta_stack[limb] >> off) & 1).astype(bool)
        cm = mult_tbl[bit]
        cp = plus_tbl[bit]
        cmb = tuple(jnp.full_like(base, 0) | cm[k] for k in range(4))
        cpb = tuple(jnp.full_like(base, 0) | cp[k] for k in range(4))
        new_mult = _mul64(acc_mult, cmb)
        new_plus = _add64(_mul64(acc_plus, cmb), cpb)
        return (
            _where64(cond, new_mult, acc_mult),
            _where64(cond, new_plus, acc_plus),
        )

    acc_mult = _broadcast_const(_limbs_const(1), base)
    acc_plus = _broadcast_const(_limbs_const(0), base)
    acc_mult, acc_plus = jax.lax.fori_loop(
        0, 64, body, (acc_mult, acc_plus)
    )

    state = _add64(
        _mul64(acc_mult, _broadcast_const(_limbs_const(state0), base)),
        acc_plus,
    )

    def extract16(limbs, shift):
        """Bits [shift, shift+16) of the 64-bit limb value (uint32)."""
        out = jnp.zeros_like(base)
        for k in range(4):
            rel = 16 * k - shift
            if rel >= 16 or rel <= -16:
                continue
            if rel >= 0:
                out = out | (limbs[k] << rel)
            else:
                out = out | (limbs[k] >> (-rel))
        return out & _MASK16

    # next_uint on the advanced state (pcg32.h:62-68): the output uses the
    # pre-LCG-step state, which IS `state` here.
    # y = old ^ (old >> 18); xorshifted = u32(y >> 27); rot = old >> 59
    y = tuple(state[k] ^ extract16(state, 16 * k + 18) for k in range(4))
    xorshifted = extract16(y, 27) | (extract16(y, 43) << 16)
    rot = extract16(state, 59)  # 5 bits
    out = (xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))
    out = jnp.where(rot == 0, xorshifted, out)
    return out.astype(jnp.uint32)
