"""AdaLN-modulated MLP flow head + LSD sampler.

Functional re-design of /root/reference/pocket_tts/modules/mlp.py (SimpleMLPAdaLN,
arXiv 2406.11838) and the LSD sampler (models/flow_lm.py:19-40, arXiv 2505.18825):

* two sinusoidal TimestepEmbedders (for the flow start/end times s, t), averaged
* cond_embed projects the backbone output into the head width
* `num_res_blocks` AdaLN residual blocks, scanned over stacked params
* final AdaLN layer projecting back to the latent dim

Numerics bit-match the reference: RMSNorm uses *unbiased* variance (mlp.py:20-25),
the block LayerNorms use biased variance with eps=1e-6, SiLU activations.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Params = dict[str, Any]


class FlowMLPConfig(NamedTuple):
    in_channels: int  # latent dim (32)
    model_channels: int  # 512
    cond_channels: int  # backbone d_model (1024)
    num_res_blocks: int  # 6
    num_time_conds: int = 2
    freq_embed_size: int = 256
    max_period: float = 10_000.0


def _rms_norm_unbiased(x: jnp.ndarray, alpha: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    n = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / (n - 1)
    return x * (alpha * jax.lax.rsqrt(eps + var))


def _layer_norm(x, scale=None, bias=None, eps: float = 1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale + bias
    return y


def _modulate(x, shift, scale):
    return x * (1 + scale) + shift


def timestep_embedding(t: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """t: [..., 1] -> [..., 2*half] sinusoidal features (cos first, then sin)."""
    args = t * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def default_freqs(cfg: FlowMLPConfig) -> jnp.ndarray:
    half = cfg.freq_embed_size // 2
    return jnp.exp(
        -math.log(cfg.max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )


def init_flow_mlp_params(cfg: FlowMLPConfig, key, dtype=jnp.float32) -> Params:
    C, M = cfg.in_channels, cfg.model_channels
    n_keys = 2 * (2 * cfg.num_time_conds + 4 * cfg.num_res_blocks + 4)
    ks = iter(jax.random.split(key, n_keys))

    def linear(shape_out, shape_in):
        bound = 1.0 / math.sqrt(shape_in)
        return {
            "w": jax.random.uniform(next(ks), (shape_out, shape_in), dtype, -bound, bound),
            "b": jax.random.uniform(next(ks), (shape_out,), dtype, -bound, bound),
        }

    def stacked(n, make):
        outs = [make() for _ in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    params: Params = {
        "freqs": default_freqs(cfg),
        "time_embed": stacked(
            cfg.num_time_conds,
            lambda: {
                "l0": linear(M, cfg.freq_embed_size),
                "l1": linear(M, M),
                "rms_alpha": jnp.ones((M,), dtype),
            },
        ),
        "cond_embed": linear(M, cfg.cond_channels),
        "input_proj": linear(M, C),
        "res_blocks": stacked(
            cfg.num_res_blocks,
            lambda: {
                "ln": {"w": jnp.ones((M,), dtype), "b": jnp.zeros((M,), dtype)},
                "mlp0": linear(M, M),
                "mlp1": linear(M, M),
                "ada": linear(3 * M, M),
            },
        ),
        "final": {
            "linear": linear(C, M),
            "ada": linear(2 * M, M),
        },
    }
    return params


def _apply_linear(p, x):
    # matmul_t handles both plain [O, I] weights and int8-quantized
    # {"q","s"} dicts (quant.py "flow_net"/"all" scopes)
    from pocket_tts_tpu.nn.linear import matmul_t

    return matmul_t(x, p["w"]) + p["b"]


def flow_mlp_apply(
    cfg: FlowMLPConfig,
    params: Params,
    cond: jnp.ndarray,
    s: jnp.ndarray,
    t: jnp.ndarray,
    x: jnp.ndarray,
) -> jnp.ndarray:
    """cond: [B, cond_channels]; s, t: [B, 1] flow times; x: [B, C] -> flow [B, C]."""
    x = _apply_linear(params["input_proj"], x)

    def embed_time(p, tv):
        emb = timestep_embedding(tv, params["freqs"])
        h = _apply_linear(p["l0"], emb)
        h = _apply_linear(p["l1"], jax.nn.silu(h))
        return _rms_norm_unbiased(h, p["rms_alpha"])

    te = params["time_embed"]
    t0 = embed_time(jax.tree.map(lambda a: a[0], te), s)
    t1 = embed_time(jax.tree.map(lambda a: a[1], te), t)
    y = (t0 + t1) / cfg.num_time_conds + _apply_linear(params["cond_embed"], cond)

    def block(x, p):
        shift, scale, gate = jnp.split(_apply_linear(p["ada"], jax.nn.silu(y)), 3, axis=-1)
        h = _modulate(_layer_norm(x, p["ln"]["w"], p["ln"]["b"]), shift, scale)
        h = _apply_linear(p["mlp1"], jax.nn.silu(_apply_linear(p["mlp0"], h)))
        return x + gate * h, None

    x, _ = jax.lax.scan(block, x, params["res_blocks"], unroll=True)

    fp = params["final"]
    shift, scale = jnp.split(_apply_linear(fp["ada"], jax.nn.silu(y)), 2, axis=-1)
    x = _modulate(_layer_norm(x), shift, scale)
    return _apply_linear(fp["linear"], x)


def lsd_decode(
    cfg: FlowMLPConfig,
    params: Params,
    cond: jnp.ndarray,
    x0: jnp.ndarray,
    num_steps: int,
) -> jnp.ndarray:
    """Euler integration of the learned flow from noise x0: [B, C] (flow_lm.py:19-40)."""
    current = x0
    ones = jnp.ones_like(x0[..., :1])
    for i in range(num_steps):
        s = (i / num_steps) * ones
        t = ((i + 1) / num_steps) * ones
        current = current + flow_mlp_apply(cfg, params, cond, s, t, current) / num_steps
    return current
