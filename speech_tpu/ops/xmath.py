"""Accurate elementwise math for the TPU f32 pipeline.

TPU lowers ``jnp.log`` on float32 to a fast hardware approximation whose
absolute error reaches ~1.06e-4 (measured on v5e over [1e-6, 1e6]; CPU libm
is ~1e-8).  Since every computer in this package emits *log* features, that
approximation — not the MXU matmuls, which land at ~6e-9 — was the entire
accuracy gap between the f32 device path and the float64 reference
(north-star clause: <= 1e-5 max abs error).

``log32`` is a faithful software log: exact exponent/mantissa split via
integer bit ops, then ``log(m) = 2*atanh((m-1)/(m+1))`` by a short odd
polynomial on ``m`` in ``[sqrt(1/2), sqrt(2))``.  Worst-case error is a few
f32 ulps of the result (~1e-6 absolute for feature-scale outputs, measured
4e-7 over the same range), at a cost of ~a dozen VPU ops per element —
noise next to the DFT matmuls, so it is the default f32 log everywhere in
this package.  Valid for positive *normal* floats; the log floor applied
before every log keeps inputs in that range (subnormal floors degrade
gracefully toward the hardware log's error).
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["log32", "xlog"]

# fdlibm-style split of ln 2: the high part has 11 trailing zero mantissa
# bits, so exponent * _LN2_HI is exact for any f32 exponent
_LN2_HI = np.float32(6.9313812256e-01)
_LN2_LO = np.float32(9.0580006145e-06)
_SQRT2 = np.float32(1.4142135624)
# atanh series: log(m) = 2s * (1 + t/3 + t^2/5 + t^3/7 + t^4/9), t = s^2;
# with |s| <= 0.1716 the dropped t^5/11 term is < 7e-10
_C3 = np.float32(1 / 3)
_C5 = np.float32(1 / 5)
_C7 = np.float32(1 / 7)
_C9 = np.float32(1 / 9)


@jax.custom_jvp
def log32(x):
    """Natural log of positive normal float32 values to ~2 ulp.

    Differentiable: the bit-level exponent/mantissa split below blocks
    autodiff (``bitcast_convert_type`` has no gradient), so the exact
    derivative ``1/x`` is attached as a custom JVP — without it every
    gradient flowing through an f32 feature log (trainable frontends,
    PCEN) is silently zero.
    """
    x = jnp.asarray(x, jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = (bits >> 23) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & np.int32(0x007FFFFF)) | np.int32(0x3F800000), jnp.float32
    )
    # keep the reduced mantissa in [sqrt(1/2), sqrt(2)) so |log m| is small
    # and the halving below is exact
    high = m > _SQRT2
    m = jnp.where(high, m * np.float32(0.5), m)
    e = (e + high.astype(jnp.int32)).astype(jnp.float32)
    s = (m - np.float32(1.0)) / (m + np.float32(1.0))
    t = s * s
    two_s = s + s
    poly = _C3 + t * (_C5 + t * (_C7 + t * _C9))
    log_m = two_s + two_s * t * poly
    return e * _LN2_HI + (log_m + e * _LN2_LO)


@log32.defjvp
def _log32_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    x = jnp.asarray(x, jnp.float32)
    return log32(x), jnp.asarray(dx, jnp.float32) / x


def xlog(x):
    """``log`` at the dtype's full accuracy: ``log32`` for float32 inputs
    (dodging the TPU hardware approximation), ``jnp.log`` otherwise."""
    if jnp.asarray(x).dtype == jnp.float32:
        return log32(x)
    return jnp.log(x)
