"""Embedding lookup and Bahdanau attention GRU decoder.

Completes the module-library surface of the reference's modules.py: `embed`
(:10-36, zero-padded row 0) and `attention_decoder` (:246-272, Bahdanau
additive attention wrapping a GRU — dead code in the reference's models but
part of its public module API, so provided here as working TPU-native
implementations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .modules import glorot_uniform, gru_dir_init


def embed_init(key, vocab_size: int, num_units: int, zero_pad: bool = True):
    table = 0.01 * jax.random.truncated_normal(key, -2.0, 2.0, (vocab_size, num_units))
    return {"lookup_table": table, "zero_pad": zero_pad}


def embed_apply(params, ids):
    table = params["lookup_table"]
    if params.get("zero_pad", True):
        table = jnp.concatenate([jnp.zeros_like(table[:1]), table[1:]], axis=0)
    return table[ids]


def attention_decoder_init(key, in_dim: int, memory_dim: int, num_units: int):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        # Bahdanau score: v^T tanh(W_q q + W_m m)
        "query_kernel": glorot_uniform(k1, (num_units, num_units), num_units, num_units),
        "memory_kernel": glorot_uniform(k2, (memory_dim, num_units), memory_dim, num_units),
        "attention_v": glorot_uniform(k3, (num_units,), num_units, 1),
        # context+input projection into the cell, then GRU over it
        "gru": gru_dir_init(k4, in_dim + memory_dim, num_units),
        "out_kernel": glorot_uniform(k5, (num_units + memory_dim, num_units),
                                     num_units + memory_dim, num_units),
        "out_bias": jnp.zeros((num_units,)),
    }


def attention_decoder_apply(params, inputs, memory):
    """inputs [B, T', C'], memory [B, T, M] -> (outputs [B, T', H],
    alignments [B, T', T]).

    Per step: score memory against the GRU state (additive attention),
    attend, feed [input, context] to the GRU, project [state, context].
    """
    B, Tm, M = memory.shape
    H = params["query_kernel"].shape[0]
    keys = memory @ params["memory_kernel"]  # [B, T, H]
    p = params["gru"]
    C = inputs.shape[2] + M
    Wg_x, Wg_h = p["gates_kernel"][:C], p["gates_kernel"][C:]
    Wc_x, Wc_h = p["candidate_kernel"][:C], p["candidate_kernel"][C:]

    def step(h, x_t):
        q = h @ params["query_kernel"]                       # [B, H]
        e = jnp.tanh(keys + q[:, None, :]) @ params["attention_v"]  # [B, T]
        a = jax.nn.softmax(e, axis=1)
        ctx = jnp.einsum("bt,btm->bm", a, memory)
        xi = jnp.concatenate([x_t, ctx], axis=1)
        ru = jax.nn.sigmoid(xi @ Wg_x + h @ Wg_h + p["gates_bias"])
        r, u = ru[:, :H], ru[:, H:]
        c = jnp.tanh(xi @ Wc_x + (r * h) @ Wc_h + p["candidate_bias"])
        h2 = u * h + (1.0 - u) * c
        out = jnp.concatenate([h2, ctx], axis=1) @ params["out_kernel"] + params["out_bias"]
        return h2, (out, a)

    h0 = jnp.zeros((B, H), inputs.dtype) + 0.0 * inputs[:, 0, :1]
    _, (outs, aligns) = jax.lax.scan(step, h0, inputs.transpose(1, 0, 2))
    return outs.transpose(1, 0, 2), aligns.transpose(1, 0, 2)
