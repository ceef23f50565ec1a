"""Double-float ("df64") compensated arithmetic for fp32-only TPUs.

TPU MXU/VPU have no native fp64 (SURVEY.md §7 hard-part #4). The reference's
1e-10 residual tolerances are unreachable in plain fp32 (eps ≈ 1.2e-7). The
classical fix — Dekker/Knuth error-free transformations — represents a value
as an unevaluated sum ``hi + lo`` of two fp32 values (≈49 bits of mantissa,
unit roundoff ~4e-15), enough for 1e-10…1e-12 residual targets.

Used by the mixed-precision iterative-refinement path
(``linear.iterative`` ``refine_steps``): the Krylov solve runs in fast fp32;
the outer residual ``r = b − A·x`` is evaluated in df64, so the refinement
converges to df64 accuracy while all hot-loop work stays fp32.

All functions are jittable and shard_map-compatible (elementwise + the same
reductions as the fp32 path).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DF(NamedTuple):
    """Unevaluated sum hi + lo, |lo| ≤ ulp(hi)/2."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def df(x) -> DF:
    x = jnp.asarray(x, dtype=jnp.float32)
    return DF(x, jnp.zeros_like(x))


def from_f64(x) -> DF:
    """Split float64 HOST values into an (hi, lo) float32 pair. The split is
    done in numpy — inside jit (x64 disabled) a float64 intermediate would be
    silently truncated."""
    import numpy as np

    x64 = np.asarray(x, dtype=np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def to_f64(a: DF):
    """Recombine on HOST at float64 (numpy — see from_f64)."""
    import numpy as np

    return np.asarray(a.hi, dtype=np.float64) + np.asarray(a.lo, dtype=np.float64)


def two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Knuth exact addition: a + b = s + e."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    """Dekker split of fp32 into two 12-bit halves (2^12 + 1)."""
    c = jnp.float32(4097.0) * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dekker exact product: a·b = p + e."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(a: DF, b: DF) -> DF:
    s, e = two_sum(a.hi, b.hi)
    e = e + a.lo + b.lo
    hi, lo = two_sum(s, e)
    return DF(hi, lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, DF(-b.hi, -b.lo))


def mul(a: DF, b: DF) -> DF:
    p, e = two_prod(a.hi, b.hi)
    e = e + a.hi * b.lo + a.lo * b.hi
    hi, lo = two_sum(p, e)
    return DF(hi, lo)


def mul_f32(a: DF, b: jnp.ndarray) -> DF:
    p, e = two_prod(a.hi, b)
    e = e + a.lo * b
    hi, lo = two_sum(p, e)
    return DF(hi, lo)


def dot(x: DF, y: DF) -> DF:
    """Compensated dot product: Σ xᵢ·yᵢ in df64 (Ogita–Rump–Oishi style)."""
    prods = mul(x, y)
    total_hi = jnp.sum(prods.hi)
    err = jnp.sum(prods.lo) + _sum_error(prods.hi)
    shi, slo = two_sum(total_hi, err)
    return DF(shi, slo)


def _sum_error(v: jnp.ndarray) -> jnp.ndarray:
    """Error of jnp.sum(v) in fp32, recovered with a two-pass compensation:
    e = Σ (v_i − partial contributions). A cheap, effective estimate: compute
    the sum in segments, take two_sum errors per segment."""
    n = v.shape[0]
    seg = 256
    pad = (-n) % seg
    vp = jnp.concatenate([v, jnp.zeros(pad, v.dtype)]) if pad else v
    m = vp.shape[0] // seg
    vs = vp.reshape(m, seg)

    # exact per-segment sums via a two_sum chain over the segment axis,
    # vectorized across segments
    def lane(k, carry):
        s, c = carry
        t, e = two_sum(s, vs[:, k])
        return (t, c + e)

    s_seg, c_seg = jax.lax.fori_loop(
        0, seg, lane, (jnp.zeros(m, v.dtype), jnp.zeros(m, v.dtype)))

    # combine segments sequentially with two_sum
    def seg_comb(carry, inputs):
        s, c = carry
        sv, cv = inputs
        t, e = two_sum(s, sv)
        return (t, c + e + cv), None

    (s, c), _ = jax.lax.scan(seg_comb, (jnp.float32(0.0), jnp.float32(0.0)),
                             (s_seg, c_seg))
    # error of the plain sum: subtract the two close f32 heads FIRST (exact
    # by Sterbenz), then add the compensation — (s + c) − plain would absorb
    # c into s's ulp and lose it
    return (s - jnp.sum(v)) + c


def axpy(alpha: DF, x: DF, y: DF) -> DF:
    return add(mul(DF(jnp.broadcast_to(alpha.hi, x.hi.shape),
                      jnp.broadcast_to(alpha.lo, x.hi.shape)), x), y)


def ell_matvec_df(vals_hi, cols, x: DF, vals_lo=None) -> DF:
    """ELL SpMV in df64: A times df64 x. ``vals_lo`` carries the fp32
    VALUE-representation error of A (lo = A_f64 − fp32(A_f64)): without it
    the residual floor is eps32·‖A‖·‖x‖ — exactly where fp32-inexact
    matrices (elasticity) stalled the refined solve at ~6e-5 relative
    (Poisson's integer stencils are fp32-exact, which is why the
    structured path reached 2.5e-12 without this)."""
    gx_hi = x.hi[cols]
    gx_lo = x.lo[cols]
    p, e = two_prod(vals_hi, gx_hi)
    e = e + vals_hi * gx_lo
    if vals_lo is not None:
        e = e + vals_lo * (gx_hi + gx_lo)
    # row-sum with compensation
    hi = jnp.sum(p, axis=1)
    err = jnp.sum(e, axis=1) + _rowsum_error(p)
    shi, slo = two_sum(hi, err)
    return DF(shi, slo)


def _rowsum_error(p: jnp.ndarray) -> jnp.ndarray:
    """Error of jnp.sum(p, axis=1) via sequential two_sum over the width
    (width is small — the ELL padding width)."""
    W = p.shape[1]

    def body(k, carry):
        s, c = carry
        t, e = two_sum(s, p[:, k])
        return (t, c + e)

    s, c = jax.lax.fori_loop(0, W, body,
                             (jnp.zeros(p.shape[0], p.dtype),
                              jnp.zeros(p.shape[0], p.dtype)))
    # subtract close heads first (see _sum_error)
    return (s - jnp.sum(p, axis=1)) + c


def dia_matvec_df(vals_hi, offsets, x: DF, vals_lo=None) -> DF:
    """DIA SpMV in df64 (vals fp32 diag-major (K, n), x df64).
    ``vals_lo``: fp32 value-representation correction (see ell_matvec_df)."""
    n = vals_hi.shape[1]
    L = max(0, -min(offsets))
    R = max(0, max(offsets))
    xh = jnp.pad(x.hi, (L, R))
    xl = jnp.pad(x.lo, (L, R))
    acc = DF(jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))
    for k, off in enumerate(offsets):
        sh = jax.lax.slice_in_dim(xh, L + off, L + off + n)
        sl = jax.lax.slice_in_dim(xl, L + off, L + off + n)
        p, e = two_prod(vals_hi[k], sh)
        e = e + vals_hi[k] * sl
        if vals_lo is not None:
            e = e + vals_lo[k] * (sh + sl)
        acc = add(acc, DF(p, e))
    return acc
