"""Pallas TPU kernels for the hot sequential op: the GRU time scan.

The CBHG's bidirectional GRU is the only serial computation in the model
(SURVEY.md §2.2: replaces tf.nn.dynamic_rnn / cuDNN RNN). The lax.scan
version already hoists the input projections into one big MXU matmul; this
kernel additionally keeps the hidden state resident in VMEM across the
whole sequence (TPU grid steps execute sequentially, scratch persists), so
each step is just two small MXU matmuls + VPU gates with no HLO loop
overhead or HBM round-trip for the carry.

Layout: time-major [T, B, .] so each grid step's block is one time slice.
Correctness is pinned against the lax.scan path (tests/test_pallas.py, in
interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(gx_ref, cx_ref, wg_ref, wc_ref, y_ref, h_ref):
    t = pl.program_id(0)
    H = cx_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    ru = jax.nn.sigmoid(
        gx_ref[0] + jnp.dot(h, wg_ref[:], preferred_element_type=jnp.float32))
    r, u = ru[:, :H], ru[:, H:]
    c = jnp.tanh(
        cx_ref[0] + jnp.dot(r * h, wc_ref[:], preferred_element_type=jnp.float32))
    h2 = u * h + (1.0 - u) * c
    h_ref[:] = h2
    y_ref[0] = h2


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_scan_pallas(gx, cx, Wg_h, Wc_h, *, interpret: bool = False):
    """Time-major GRU scan: gx [T,B,2H] (input gate pre-activations incl.
    bias), cx [T,B,H], recurrent kernels Wg_h [H,2H], Wc_h [H,H] -> ys [T,B,H]."""
    T, B, H2 = gx.shape
    H = H2 // 2
    return pl.pallas_call(
        _gru_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H2), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H2), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(gx, cx, Wg_h, Wc_h)


def gru_dir_apply_pallas(params, x, *, interpret: bool = False):
    """Drop-in replacement for nn.modules._gru_dir_apply using the Pallas scan."""
    B, T, C = x.shape
    H = params["candidate_kernel"].shape[1]
    Wg_x, Wg_h = params["gates_kernel"][:C], params["gates_kernel"][C:]
    Wc_x, Wc_h = params["candidate_kernel"][:C], params["candidate_kernel"][C:]
    gx = (x @ Wg_x + params["gates_bias"]).transpose(1, 0, 2)
    cx = (x @ Wc_x + params["candidate_bias"]).transpose(1, 0, 2)
    ys = gru_scan_pallas(gx, cx, Wg_h, Wc_h, interpret=interpret)
    return ys.transpose(1, 0, 2)


def use_pallas_gru(interpret: bool = False):
    """Globally switch nn.modules to the Pallas GRU scan (call once, before
    tracing). Returns a function restoring the lax.scan implementation."""
    from ..nn import modules as M

    orig = M._gru_dir_apply

    def patched(params, x, unroll: int = 1):
        # unroll is a lax.scan knob; the Pallas grid kernel has no analog
        return gru_dir_apply_pallas(params, x, interpret=interpret)

    M._gru_dir_apply = patched

    def restore():
        M._gru_dir_apply = orig

    return restore
