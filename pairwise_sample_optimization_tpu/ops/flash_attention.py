"""Pallas TPU flash attention (forward + custom-VJP backward).

The hot op of the SDXL UNet transformer blocks and CLIP towers (replaces
the reference's torch SDPA/xformers path, ``config_sdxl_turbo_dpo.py:40``).
Tuned for this workload's shapes: non-causal, head_dim 64, self-attention
over 256-16384 image tokens and cross-attention against 77 text tokens
(padded to a 128 lane tile and masked).

Design (standard online-softmax tiling):
- grid (batch*heads, q_tiles, kv_tiles), kv innermost ("arbitrary"),
  fp32 m/l/acc scratch persisting across kv tiles;
- output normalized incrementally; logsumexp saved as the only softmax
  residual;
- backward = two kernels: dKV (kv-major, accumulates over q tiles) and
  dQ (q-major, accumulates over kv tiles), both recomputing the
  probability tile from the saved logsumexp;
- mask value is a large negative finite number (not -inf) so fully
  masked rows stay NaN-free.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -1e30
_LANES = 128

_INTERPRET = False  # flipped by tests on CPU


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _best_tile(n: int, cap: int) -> int:
    size = min(cap, n)
    while n % size:
        size //= 2
    return max(size, min(n, 128))


# forward tile caps (tunable like the backward's for on-chip sweeps)
_FWD_CAPS = (1024, 1024)


def set_fwd_block_caps(bq_cap: int, bk_cap: int) -> None:
    global _FWD_CAPS
    _FWD_CAPS = (int(bq_cap), int(bk_cap))


def _block_sizes(sq: int, skv: int, d: int = 64):
    """Largest tiles that divide the (padded) sequences, capped for VMEM.

    Swept on v5e with RTT-AMORTIZED timing (a lax.scan of 20 kernel
    calls per dispatch — the axon tunnel adds a session-dependent
    ~25 ms per dispatch+readback that polluted earlier per-call
    sweeps, BENCHMARKS.md "tunnel RTT"): at the mandatory-route UNet
    shape (s4096 h10 d64) bk=1024 beats bk=512 by 25% at b2
    (2.47 vs 3.29 ms) and 31% at b8 (6.88 vs 10.04 ms). Wide heads
    (the VAE mid-block's single d512 head) hold bk*d-sized k/v tiles:
    bk=1024 there exceeds the 16M scoped-VMEM limit by 192K (measured
    compile OOM) and was a timing tie anyway — so the bk cap stays 512
    when d > 128.
    """
    bq_cap, bk_cap = _FWD_CAPS
    if d > 128:
        bk_cap = min(bk_cap, 512)
    return _best_tile(sq, bq_cap), _best_tile(skv, bk_cap)


# backward tile caps, tunable independently of the forward (the backward
# holds more live tiles — q, k, v, do, p, ds — so its VMEM optimum
# differs; swept on-chip at seq 4096, see BENCHMARKS.md)
_BWD_CAPS = (1024, 512)


def set_bwd_block_caps(bq_cap: int, bk_cap: int) -> None:
    global _BWD_CAPS
    _BWD_CAPS = (int(bq_cap), int(bk_cap))


def _block_sizes_bwd(sq: int, skv: int):
    return _best_tile(sq, _BWD_CAPS[0]), _best_tile(skv, _BWD_CAPS[1])


# ---------------------------------------------------------------------- #
# forward
# ---------------------------------------------------------------------- #


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale, kv_len, n_kv):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    bq, bk = q.shape[0], k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)

    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    s = jnp.where(col < kv_len, s, _MASK)

    m_prev = m_scr[...]  # (bq, LANES) all-equal lanes
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)  # (bq, LANES)
    p = jnp.exp(s - m_next[:, :1])  # (bq, bk)
    l_corr = alpha * l_prev
    l_next = l_corr + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_scr[...] = m_next
    l_scr[...] = l_next

    l_next_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
    acc_scr[...] = acc_scr[...] * (l_corr * l_next_inv)[:, :1]
    v = v_ref[0]  # (bk, d)
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] + pv * l_next_inv[:, :1]

    @pl.when(ki == n_kv - 1)
    def _store():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)
        l_safe = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
        lse_row = (m_scr[...] + jnp.log(l_safe))[:, 0]  # (bq,)
        # (1, 8, bq) block: 8 replicated sublanes satisfy the TPU tiling rule
        lse_ref[0] = jnp.broadcast_to(lse_row[None, :], (8, lse_row.shape[0]))


def _fwd(q, k, v, scale, kv_len):
    """q (BH, Sq, D), k/v (BH, Skv, D) -> (o, lse)."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    bq, bk = _block_sizes(sq, skv, d)
    n_q, n_kv = sq // bq, skv // bk
    grid = (bh, n_q, n_kv)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=kv_len, n_kv=n_kv
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 8, bq), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------- #
# backward
# ---------------------------------------------------------------------- #


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, kv_len, n_q):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    bq, bk = q.shape[0], k.shape[0]
    ki = pl.program_id(1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    s = jnp.where(col < kv_len, s, _MASK)

    lse = lse_ref[0][0]  # (bq,)
    p = jnp.exp(s - lse[:, None])  # (bq, bk)

    # matmul operands stay in the INPUT dtype (bf16 on chip): the v5e MXU
    # is bf16-native — fp32xfp32 products run at a fraction of peak and
    # were the dominant cost of the seq-4096 backward. Accumulation stays
    # fp32 via preferred_element_type (standard flash-bwd practice; the
    # forward already does p.astype(v.dtype)).
    do = do_ref[0]
    dv_scr[...] = dv_scr[...] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # p^T @ do -> (bk, d)

    v = v_ref[0]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    di = di_ref[0][0]  # (bq,)
    ds = p * (dp - di[:, None]) * scale
    dk_scr[...] = dk_scr[...] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # ds^T @ q -> (bk, d)

    @pl.when(qi == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                   dq_ref, dq_scr, *, scale, kv_len, n_kv):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    bq, bk = q.shape[0], k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    s = jnp.where(col < kv_len, s, _MASK)

    lse = lse_ref[0][0]
    p = jnp.exp(s - lse[:, None])
    do = do_ref[0]
    v = v_ref[0]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    di = di_ref[0][0]
    ds = p * (dp - di[:, None]) * scale
    dq_scr[...] = dq_scr[...] + jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd(scale, kv_len, residuals, do):
    q, k, v, o, lse = residuals
    bh, sq, d = q.shape
    skv = k.shape[1]
    bq, bk = _block_sizes_bwd(sq, skv)
    n_q, n_kv = sq // bq, skv // bk

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # (BH,Sq)
    di = jnp.broadcast_to(di[:, None, :], (bh, 8, sq))

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len, n_q=n_q),
        grid=(bh, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),  # q
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),  # k
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),  # v
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),  # do
            pl.BlockSpec((1, 8, bq), lambda b, ki, qi: (b, 0, qi)),  # lse
            pl.BlockSpec((1, 8, bq), lambda b, ki, qi: (b, 0, qi)),  # di
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(q, k, v, do, lse, di)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len, n_kv=n_kv),
        grid=(bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 8, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 8, bq), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(q, k, v, do, lse, di)
    return dq, dk, dv


# ---------------------------------------------------------------------- #
# public entry
# ---------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, kv_len):
    o, _ = _fwd(q, k, v, scale, kv_len)
    return o


def _flash_fwd(q, k, v, scale, kv_len):
    o, lse = _fwd(q, k, v, scale, kv_len)
    return o, (q, k, v, o, lse)


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """(B, S, H, D) attention via the Pallas kernel.

    Handles kv-length padding (e.g. 77-token cross-attention) by padding
    to the 128-lane tile and masking. Causal masking is not needed by any
    diffusion-path consumer; CLIP's causal towers route to XLA instead.
    """
    if causal:
        raise NotImplementedError("causal path uses the XLA implementation")
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * x.shape[2], x.shape[1], d)

    qf, kf, vf = fold(q), fold(k), fold(v)

    kv_len = skv
    pad_kv = (-skv) % _LANES
    if pad_kv:
        kf = jnp.pad(kf, ((0, 0), (0, pad_kv), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_kv), (0, 0)))
    pad_q = (-sq) % _LANES
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))

    o = _flash(qf, kf, vf, scale, kv_len)
    if pad_q:
        o = o[:, :sq]
    return o.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
