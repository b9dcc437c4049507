"""NN module library: Tacotron-style prenet / conv banks / highway / GRU / CBHG.

Re-derivation of the reference's modules.py (TF-1.x graph ops) as pure
functions over explicit param/state pytrees, with TF-matching semantics so
the shipped enc_*_ckpt weights import exactly:

- conv1d: TF 'same' padding (left (k-1)//2, right k//2), no bias
  (modules.py:104-140 passes use_bias=False).
- conv1d_banks: K parallel convs of widths 1..K. The reference never forwards
  the model's embed_size into conv1d_banks (modules.py:328 calls it without
  embed_size), so every bank has 256//2 = 128 filters regardless of the model
  width — confirmed by enc_14_ckpt kernels [k, 40, 128]. TPU-first: all K
  convs are fused into ONE width-K conv whose kernel packs each bank kernel
  at the offset that reproduces its own 'same' alignment — one big implicit
  GEMM on the MXU instead of K small convs.
- bn: tf.contrib.layers.batch_norm(fused=True) semantics: eps=1e-3,
  moving-stat decay 0.999, normalization over (batch, time) per channel
  (modules.py:39-102).
- gru: tf.contrib.rnn.GRUCell semantics (modules.py:196-204):
    r,u = sigmoid([x,h] @ Wg + bg)   (gate order [r, u], bias init 1.0)
    c   = tanh([x, r*h] @ Wc + bc)
    h'  = u*h + (1-u)*c
  as a lax.scan over time with the input projections hoisted out of the scan
  into one large batched matmul (MXU) so the serial step only carries the
  h-recurrence.
- highwaynet: H*T + x*(1-T), transform-gate bias init -1.0 (modules.py:297-319).
- prenet: dense(E) relu dropout, dense(E/2) relu dropout (modules.py:274-295).
- CBHG: banks -> maxpool(2,1,'same') -> 2 conv projections w/ BN -> residual
  -> highway stack -> bidirectional GRU (modules.py:323-356).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
BN_MOMENTUM = 0.999


# ------------------------------------------------------------ initializers ---

def glorot_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def dense_init(key, in_dim, out_dim, bias_init: float = 0.0):
    return {
        "kernel": glorot_uniform(key, (in_dim, out_dim), in_dim, out_dim),
        "bias": jnp.full((out_dim,), bias_init, dtype=jnp.float32),
    }


def dense(params, x):
    return x @ params["kernel"] + params["bias"]


# ------------------------------------------------------------------ conv1d ---

def conv1d_init(key, width, in_dim, out_dim):
    fan_in = width * in_dim
    fan_out = width * out_dim
    return {"kernel": glorot_uniform(key, (width, in_dim, out_dim), fan_in, fan_out)}


def conv1d(params, x, *, padding: str = "SAME"):
    """[B, T, C_in] -> [B, T, C_out]; TF 'same' (asymmetric for even widths)."""
    k = params["kernel"].shape[0]
    if padding.upper() == "SAME":
        pad = [((k - 1) // 2, k // 2)]
    elif padding.upper() == "CAUSAL":
        pad = [((k - 1), 0)]
    else:
        pad = [(0, 0)]
    return jax.lax.conv_general_dilated(
        x, params["kernel"], window_strides=(1,), padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


# --------------------------------------------------------------------- bn ---

def bn_init(dim):
    params = {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    return params, state


def bn_apply(params, state, x, train: bool, momentum: float | None = None):
    """BatchNorm over all axes but the last. Returns (y, new_state).

    ``momentum`` overrides the moving-stat decay (default BN_MOMENTUM =
    0.999, tf.contrib.layers.batch_norm); momentum=0.0 makes ``new_state``
    the batch's TRUE statistics — the hook train/bn_recal.py uses. An
    explicit argument, not a module-global override: a global mutated at
    trace time is invisible action-at-a-distance for any concurrent trace.
    """
    m = BN_MOMENTUM if momentum is None else momentum
    if train:
        axes = tuple(range(x.ndim - 1))
        # moments in f32 even under bf16 compute: batch variance over ~1e4
        # elements loses mantissa in bf16, and the moving stats live in the
        # f32 model_state pytree (identity when x is already f32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        new_state = {
            "mean": m * state["mean"] + (1.0 - m) * mean,
            "var": m * state["var"] + (1.0 - m) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var.astype(x.dtype) + jnp.asarray(BN_EPS, x.dtype))
    y = (x - mean.astype(x.dtype)) * (inv * params["gamma"]) + params["beta"]
    return y, new_state


# ---------------------------------------------------------------- dropout ---

def dropout(key, x, rate: float, train: bool):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ----------------------------------------------------------------- prenet ---

def prenet_init(key, in_dim, embed_size):
    k1, k2 = jax.random.split(key)
    return {
        "dense1": dense_init(k1, in_dim, embed_size),
        "dense2": dense_init(k2, embed_size, embed_size // 2),
    }


def prenet_apply(params, x, *, dropout_rate, train, rng=None):
    if train:
        r1, r2 = jax.random.split(rng)
    h = jax.nn.relu(dense(params["dense1"], x))
    h = dropout(r1, h, dropout_rate, train) if train else h
    h = jax.nn.relu(dense(params["dense2"], h))
    h = dropout(r2, h, dropout_rate, train) if train else h
    return h


# ----------------------------------------------------------------- highway ---

def highway_init(key, dim):
    k1, k2 = jax.random.split(key)
    return {
        "dense1": dense_init(k1, dim, dim),
        "dense2": dense_init(k2, dim, dim, bias_init=-1.0),
    }


def highway_apply(params, x):
    H = jax.nn.relu(dense(params["dense1"], x))
    T = jax.nn.sigmoid(dense(params["dense2"], x))
    return H * T + x * (1.0 - T)


# ------------------------------------------------------------- conv banks ---

BANK_EMBED = 256  # the reference's un-forwarded conv1d_banks default (modules.py:144)


def conv1d_banks_init(key, K, in_dim, bank_channels: int = BANK_EMBED // 2):
    keys = jax.random.split(key, K)
    kernels = [conv1d_init(keys[k - 1], k, in_dim, bank_channels)["kernel"] for k in range(1, K + 1)]
    bn_params, bn_state = bn_init(K * bank_channels)
    return {"kernels": kernels, "bn": bn_params}, {"bn": bn_state}


def pack_bank_kernels(kernels, K: int):
    """Pack per-width bank kernels into one width-K kernel.

    A width-k 'same' conv embedded in a width-K 'same' conv must sit at
    offset (K-1)//2 - (k-1)//2 so both index x[t + i - (k-1)//2] identically;
    out-of-band taps are zero, matching the zero padding both convs see.
    """
    parts = []
    for kern in kernels:
        k = kern.shape[0]
        off = (K - 1) // 2 - (k - 1) // 2
        parts.append(jnp.pad(kern, ((off, K - k - off), (0, 0), (0, 0))))
    return jnp.concatenate(parts, axis=2)  # [K, in, K*bank_channels]


def conv1d_banks_apply(params, state, x, *, train, bn_momentum=None):
    K = len(params["kernels"])
    big = pack_bank_kernels(params["kernels"], K)
    out = conv1d({"kernel": big}, x)  # one fused MXU conv for all K banks
    out, bn_state = bn_apply(params["bn"], state["bn"], out, train,
                             momentum=bn_momentum)
    return jax.nn.relu(out), {"bn": bn_state}


# -------------------------------------------------------------------- gru ---

def gru_dir_init(key, in_dim, units):
    k1, k2 = jax.random.split(key)
    return {
        "gates_kernel": glorot_uniform(k1, (in_dim + units, 2 * units), in_dim + units, 2 * units),
        "gates_bias": jnp.ones((2 * units,)),  # TF GRUCell gate bias init 1.0
        "candidate_kernel": glorot_uniform(k2, (in_dim + units, units), in_dim + units, units),
        "candidate_bias": jnp.zeros((units,)),
    }


def _gru_dir_apply(params, x, unroll: int = 1):
    """[B, T, C] -> [B, T, H] forward scan with hoisted input projections.

    ``unroll`` replicates the scan body k times per iteration (bit-identical
    math): sequential scan iterations carry a fixed per-iteration cost that
    dominates CBHG wall time on dispatch/loop-overhead-bound runtimes, and
    unrolling divides that overhead by k (tools/gru_scan_probe.py). Set via
    CBHGConfig.scan_unroll — an explicit config field, not an env var, so
    the compiled program is determined by the config alone."""
    B, T, C = x.shape
    H = params["candidate_kernel"].shape[1]
    Wg_x, Wg_h = params["gates_kernel"][:C], params["gates_kernel"][C:]
    Wc_x, Wc_h = params["candidate_kernel"][:C], params["candidate_kernel"][C:]

    # all-timestep input projections: two large MXU matmuls outside the scan
    gx = x @ Wg_x + params["gates_bias"]        # [B, T, 2H]
    cx = x @ Wc_x + params["candidate_bias"]    # [B, T, H]

    def step(h, inputs):
        gx_t, cx_t = inputs
        ru = jax.nn.sigmoid(gx_t + h @ Wg_h)
        r, u = ru[:, :H], ru[:, H:]
        c = jnp.tanh(cx_t + (r * h) @ Wc_h)
        h2 = u * h + (1.0 - u) * c
        return h2, h2

    # derive h0 from x so its type (incl. shard_map varying-axes) matches the
    # carry produced inside the scan
    h0 = jnp.zeros((B, H), dtype=x.dtype) + 0.0 * x[:, 0, :1]
    _, ys = jax.lax.scan(step, h0, (gx.transpose(1, 0, 2), cx.transpose(1, 0, 2)),
                         unroll=unroll)
    return ys.transpose(1, 0, 2)


def gru_init(key, in_dim, units, bidirectional: bool = True):
    if not bidirectional:
        return {"fw": gru_dir_init(key, in_dim, units)}
    kf, kb = jax.random.split(key)
    return {"fw": gru_dir_init(kf, in_dim, units), "bw": gru_dir_init(kb, in_dim, units)}


def gru_apply(params, x, unroll: int = 1):
    """Uni/bidirectional GRU; bidirectional concatenates [fw, bw] on channels
    (tf.nn.bidirectional_dynamic_rnn + concat, modules.py:200-201)."""
    fw = _gru_dir_apply(params["fw"], x, unroll)
    if "bw" not in params:
        return fw
    bw = _gru_dir_apply(params["bw"], x[:, ::-1, :], unroll)[:, ::-1, :]
    return jnp.concatenate([fw, bw], axis=2)


def gru_apply_fused(params, x, unroll: int = 1):
    """Bidirectional GRU with both directions in ONE scan: T sequential steps
    instead of 2T, halving the scan-latency floor that dominates the train
    step once the MXU work runs in bf16 (docs/DESIGN.md roofline).

    Form: the two directions' hidden states are concatenated on the feature
    axis (h [B, 2H]) and the recurrent weights are packed BLOCK-DIAGONALLY
    ([2H, 4H] / [2H, 2H]), so the scan body is one plain h @ W matmul — the
    same op shape XLA already compiles well for the unfused scan. (An earlier
    direction-stacked einsum form compiled pathologically on the v5e
    toolchain, >9 min; the block-diagonal matmul wastes half its FLOPs on
    structural zeros but these matmuls are latency-bound, not FLOP-bound.)
    Gate math/order identical to _gru_dir_apply (TF [r, u], h' = u*h +
    (1-u)*c, modules.py:168-243).
    """
    if "bw" not in params:
        return _gru_dir_apply(params["fw"], x, unroll)
    fw, bw = params["fw"], params["bw"]
    B, T, C = x.shape
    H = fw["candidate_kernel"].shape[1]
    dt = x.dtype
    xr = x[:, ::-1, :]

    def io_proj(p, xx):
        gx = xx @ p["gates_kernel"][:C] + p["gates_bias"]
        cx = xx @ p["candidate_kernel"][:C] + p["candidate_bias"]
        return gx, cx

    gx_f, cx_f = io_proj(fw, x)       # [B, T, 2H] / [B, T, H]
    gx_b, cx_b = io_proj(bw, xr)
    gx = jnp.concatenate([gx_f, gx_b], -1).transpose(1, 0, 2)  # [T, B, 4H]
    cx = jnp.concatenate([cx_f, cx_b], -1).transpose(1, 0, 2)  # [T, B, 2H]

    def blockdiag(a, b):
        za = jnp.zeros_like(a)
        zb = jnp.zeros_like(b)
        return jnp.concatenate([jnp.concatenate([a, za], 1),
                                jnp.concatenate([zb, b], 1)], 0)

    Wg = blockdiag(fw["gates_kernel"][C:], bw["gates_kernel"][C:])          # [2H, 4H]
    Wc = blockdiag(fw["candidate_kernel"][C:], bw["candidate_kernel"][C:])  # [2H, 2H]

    def step(h, inputs):                    # h [B, 2H] = [fw | bw]
        gx_t, cx_t = inputs
        ru = jax.nn.sigmoid(gx_t + h @ Wg)  # [B, 4H] = [fw r,u | bw r,u]
        r = jnp.concatenate([ru[:, :H], ru[:, 2 * H:3 * H]], -1)
        u = jnp.concatenate([ru[:, H:2 * H], ru[:, 3 * H:]], -1)
        c = jnp.tanh(cx_t + (r * h) @ Wc)
        h2 = u * h + (1.0 - u) * c
        return h2, h2

    # derive h0 from x so its type (incl. shard_map varying-axes) matches
    # the carry produced inside the scan — without this the fused form fails
    # under shard_map with 'varying manual axes do not match', unlike
    # _gru_dir_apply which has always carried the derivation
    h0 = jnp.zeros((B, 2 * H), dtype=dt) + 0.0 * x[:, 0, :1]
    _, ys = jax.lax.scan(step, h0, (gx, cx),
                         unroll=unroll)                   # [T, B, 2H]
    fw_out = ys[:, :, :H].transpose(1, 0, 2)
    bw_out = ys[:, :, H:].transpose(1, 0, 2)[:, ::-1, :]
    return jnp.concatenate([fw_out, bw_out], axis=2)


# -------------------------------------------------------------------- lstm ---

def lstm_dir_init(key, in_dim, units, forget_bias: float = 1.0):
    """tf.contrib.rnn.LSTMCell layout: one kernel [(in+H), 4H], gate order
    i, j(cell candidate), f, o; forget_bias added inside the cell."""
    k1 = key
    return {
        "kernel": glorot_uniform(k1, (in_dim + units, 4 * units), in_dim + units, 4 * units),
        "bias": jnp.zeros((4 * units,)),
        "forget_bias": forget_bias,
    }


def _lstm_dir_apply(params, x, unroll: int = 1):
    B, T, C = x.shape
    H = params["kernel"].shape[1] // 4
    Wx, Wh = params["kernel"][:C], params["kernel"][C:]
    xb = x @ Wx + params["bias"]

    def step(carry, xt):
        c, h = carry
        z = xt + h @ Wh
        i, j, f, o = jnp.split(z, 4, axis=1)
        c2 = jax.nn.sigmoid(f + params["forget_bias"]) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        return (c2, h2), h2

    z0 = jnp.zeros((B, H), x.dtype) + 0.0 * x[:, 0, :1]
    _, ys = jax.lax.scan(step, (z0, z0), xb.transpose(1, 0, 2), unroll=unroll)
    return ys.transpose(1, 0, 2)


def lstm_init(key, in_dim, units, bidirectional: bool = True):
    if not bidirectional:
        return {"fw": lstm_dir_init(key, in_dim, units)}
    kf, kb = jax.random.split(key)
    return {"fw": lstm_dir_init(kf, in_dim, units), "bw": lstm_dir_init(kb, in_dim, units)}


def lstm_apply(params, x, unroll: int = 1):
    fw = _lstm_dir_apply(params["fw"], x, unroll)
    if "bw" not in params:
        return fw
    bw = _lstm_dir_apply(params["bw"], x[:, ::-1, :], unroll)[:, ::-1, :]
    return jnp.concatenate([fw, bw], axis=2)


# ---------------------------------------------------------------- maxpool ---

def maxpool1d_same(x):
    """pool_size=2, stride=1, 'same' (TF pads one -inf at the end): modules.py:331."""
    shifted = jnp.concatenate([x[:, 1:, :], jnp.full_like(x[:, :1, :], -jnp.inf)], axis=1)
    return jnp.maximum(x, shifted)


# ------------------------------------------------------------------- CBHG ---

@dataclasses.dataclass(frozen=True)
class CBHGConfig:
    embed_size: int
    num_banks: int
    num_highway: int
    use_lstm: bool = False
    fused_gru: bool = False  # one direction-fused scan (T steps, not 2T)
    scan_unroll: int = 1     # lax.scan body replication (bit-identical math)


def cbhg_init(key, cfg: CBHGConfig, in_dim=None):
    """in_dim defaults to embed_size//2 (prenet output feeds CBHG)."""
    if in_dim is None:
        in_dim = cfg.embed_size // 2
    E2 = cfg.embed_size // 2
    keys = jax.random.split(key, 5 + cfg.num_highway)
    banks_params, banks_state = conv1d_banks_init(keys[0], cfg.num_banks, in_dim)
    bn1_p, bn1_s = bn_init(E2)
    bn2_p, bn2_s = bn_init(E2)
    rnn_init = lstm_init if cfg.use_lstm else gru_init
    params = {
        "banks": banks_params,
        "conv1d_1": conv1d_init(keys[1], 3, cfg.num_banks * (BANK_EMBED // 2), E2),
        "bn1": bn1_p,
        "conv1d_2": conv1d_init(keys[2], 3, E2, E2),
        "bn2": bn2_p,
        "highway": [highway_init(keys[5 + i], E2) for i in range(cfg.num_highway)],
        "gru": rnn_init(keys[3], E2, E2, bidirectional=True),
    }
    state = {"banks": banks_state, "bn1": bn1_s, "bn2": bn2_s}
    return params, state


def cbhg_apply(params, state, x, *, cfg: CBHGConfig, train: bool,
               bn_momentum=None):
    """[B, T, E/2] -> [B, T, E]; returns (out, new_state)."""
    h, banks_state = conv1d_banks_apply(params["banks"], state["banks"], x,
                                        train=train, bn_momentum=bn_momentum)
    h = maxpool1d_same(h)
    h = conv1d(params["conv1d_1"], h)
    h, bn1_state = bn_apply(params["bn1"], state["bn1"], h, train,
                            momentum=bn_momentum)
    h = jax.nn.relu(h)
    h = conv1d(params["conv1d_2"], h)
    h, bn2_state = bn_apply(params["bn2"], state["bn2"], h, train,
                            momentum=bn_momentum)
    h = h + x  # residual (modules.py:340)
    for hw in params["highway"]:
        h = highway_apply(hw, h)
    rnn = lstm_apply if cfg.use_lstm else (
        gru_apply_fused if cfg.fused_gru else gru_apply)
    out = rnn(params["gru"], h, cfg.scan_unroll)
    new_state = {"banks": banks_state, "bn1": bn1_state, "bn2": bn2_state}
    return out, new_state
