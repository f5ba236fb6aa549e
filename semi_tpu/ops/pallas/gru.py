"""Pallas TPU kernel: fused multi-layer GRU chunk step.

The CRN bottleneck runs a 2-layer GRU over each 21-frame chunk
(reference: CRN_ELU.py:364-365). As separate XLA ops, every timestep is
a dispatch with the recurrent weights re-streamed from HBM. This kernel
keeps all recurrent weights and the hidden states resident in VMEM and
loops the whole chunk inside one kernel: layer-1's input projections
are precomputed outside (one large MXU matmul over all frames); inside,
each step does the small recurrent matmuls and gate math for every
layer back-to-back.

VMEM budget at the flagship config (H=512, 2 layers): 3 recurrent/input
weight matrices of [512, 1536] plus activations ≈ 10 MB — fits a v5e
core's ~16 MB.

Batch is expected small (streaming, B=1-8); B rides the sublane dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gru2_chunk", "gru2_chunk_reference"]


def _gru_gates(gi, gh, h):
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _kernel(gi1_ref, whh1_ref, bhh1_ref, wih2_ref, bih2_ref, whh2_ref,
            bhh2_ref, h0_ref, y_ref, hout_ref, h1_s, h2_s):
    t_steps = gi1_ref.shape[0]
    h1_s[:] = h0_ref[0]
    h2_s[:] = h0_ref[1]

    def step(t, _):
        h1 = h1_s[:]
        h2 = h2_s[:]
        gi1 = gi1_ref[t]  # [B, 3H]
        gh1 = jnp.dot(h1, whh1_ref[:], preferred_element_type=jnp.float32) \
            + bhh1_ref[:]
        h1n = _gru_gates(gi1, gh1, h1)

        gi2 = jnp.dot(h1n, wih2_ref[:], preferred_element_type=jnp.float32) \
            + bih2_ref[:]
        gh2 = jnp.dot(h2, whh2_ref[:], preferred_element_type=jnp.float32) \
            + bhh2_ref[:]
        h2n = _gru_gates(gi2, gh2, h2)

        h1_s[:] = h1n
        h2_s[:] = h2n
        y_ref[t] = h2n
        return 0

    jax.lax.fori_loop(0, t_steps, step, 0)
    hout_ref[0] = h1_s[:]
    hout_ref[1] = h2_s[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru2_chunk(gi1, whh1, bhh1, wih2, bih2, whh2, bhh2, h0,
               interpret: bool = False):
    """Fused 2-layer GRU over one chunk.

    Args:
        gi1:  [T, B, 3H] layer-1 input projections (x @ w_ih1^T + b_ih1).
        whh1: [H, 3H] layer-1 recurrent weights (transposed torch layout).
        wih2: [H, 3H] layer-2 input weights (transposed).
        whh2: [H, 3H] layer-2 recurrent weights (transposed).
        h0:   [2, B, H] initial hidden states.
    Returns:
        (y [T, B, H] layer-2 outputs, h [2, B, H]).
    """
    t, b, h3 = gi1.shape
    h = h3 // 3
    return pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t, b, h), gi1.dtype),
            jax.ShapeDtypeStruct((2, b, h), gi1.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((b, h), gi1.dtype),
            pltpu.VMEM((b, h), gi1.dtype),
        ],
        interpret=interpret,
    )(gi1, whh1, bhh1, wih2, bih2, whh2, bhh2, h0)


def gru2_chunk_reference(gi1, whh1, bhh1, wih2, bih2, whh2, bhh2, h0):
    """Pure-jnp reference of the same computation (for parity tests)."""
    def step(carry, gi1_t):
        h1, h2 = carry
        h1n = _gru_gates(gi1_t, h1 @ whh1 + bhh1, h1)
        h2n = _gru_gates(h1n @ wih2 + bih2, h2 @ whh2 + bhh2, h2)
        return (h1n, h2n), h2n

    (h1, h2), ys = jax.lax.scan(step, (h0[0], h0[1]), gi1)
    return ys, jnp.stack([h1, h2])
