"""Model-FLOPs-utilization accounting (VERDICT r3 weak #3).

xRT alone is untethered: the flagship is *latency-bound* on its 20
sequential GRU steps per chunk (docs/BENCHMARKS.md per-chunk bench), so
a large xRT can coexist with single-digit MFU. Dividing analytic
forward FLOPs by measured device time and the chip's peak tells you
whether remaining headroom is recoverable (batched serving) or
structural (serial dependency chain) — and whether further kernel work
is justified at all.

FLOPs come from XLA's own HLO cost analysis of the LOWERED (pre-
optimization) program — client-side, no device or remote compile
needed, and counts exactly the matmul/conv FLOPs the MXU would run.
Fusion/rematerialization change timing, not the analytic count.
"""

from __future__ import annotations

import jax

__all__ = ["forward_flops", "mfu", "V5E_PEAK_FLOPS"]

# TPU v5e (the bench chip): 197 TFLOP/s bf16 / 394 TOP/s int8 per chip
# (public spec; the scaling-book roofline numbers). f32 runs through
# the same MXU at half rate.
V5E_PEAK_FLOPS = {
    "bfloat16": 197e12,
    "float32": 98.5e12,
    "int8": 394e12,
}


def forward_flops(fn, *args) -> float | None:
    """Analytic FLOPs of one call of ``fn(*args)`` via HLO cost analysis.

    Tries the lowered (unoptimized) module first — pure client-side —
    then the compiled executable's analysis, then a CPU-backend
    lowering (the count is backend-independent and the CPU client is
    always local, unlike the relay-backed TPU). Returns None when none
    are available (caller should report mfu as null rather than
    fabricate)."""
    def attempt(make_ca):
        try:
            ca = make_ca()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f = float(ca.get("flops", 0.0))
            return f if f > 0 else None
        except Exception:
            return None

    try:
        lowered = jax.jit(fn).lower(*args)
    except Exception:
        lowered = None
    if lowered is not None:
        f = attempt(lowered.cost_analysis) or \
            attempt(lambda: lowered.compile().cost_analysis())
        if f:
            return f
    return attempt(lambda: jax.jit(fn, backend="cpu").lower(*args)
                   .cost_analysis())


def mfu(flops: float | None, seconds: float,
        dtype: str = "bfloat16") -> float | None:
    """Fraction of the chip's peak the measured run achieved."""
    if not flops or seconds <= 0:
        return None
    peak = V5E_PEAK_FLOPS.get(str(dtype), V5E_PEAK_FLOPS["bfloat16"])
    return flops / seconds / peak
