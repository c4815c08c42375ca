"""Mimi-style neural codec: SEANet encoder/decoder + windowed transformers +
frame-rate resamplers, as pure jit-able functions.

Re-designs /root/reference/pocket_tts/models/mimi.py for TPU:
* `encode_to_latent` — one-shot (voice cloning): wav [B,1,T] -> latents
  [B, inner_dim, T/1920] (mimi.py:96-119).
* `decoder_step`  — streaming: K 12.5 Hz latent frames -> 16K codec steps ->
  1920K samples of 24 kHz audio (mimi.py:89-94), with every piece of streaming
  state (conv left-contexts, conv-transpose overlap tails, transformer
  sliding-window KV caches) carried in one explicit pytree. Any block length
  K per call: the generation drivers decode whole scan blocks through one
  call (16K-timestep convs and one windowed attention instead of K sequential
  single-frame chains — the batched-serving hot path).

The decoder transformer uses a sliding-window (shift) KV cache sized to its
250-step context instead of the reference's full-sequence linear cache, making
the per-frame state O(context) and the whole step compilable once.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import MimiConfig
from pocket_tts_tpu.nn.linear import matmul_t
from pocket_tts_tpu.nn.conv import (
    ConvSpec,
    ConvTrSpec,
    conv1d_step,
    conv_transpose1d_step,
    get_extra_padding_for_conv1d,
    init_conv_params,
    init_conv_tr_state,
)
from pocket_tts_tpu.nn.seanet import (
    SEANetArch,
    SEANetSpec,
    decoder_spec,
    encoder_spec,
    init_seanet_params,
    init_seanet_state,
    seanet_apply,
)
from pocket_tts_tpu.nn.transformer import (
    StackState,
    TransformerConfig,
    init_layer_params,
    init_stack_state,
    transformer_apply,
    transformer_oneshot,
)
from pocket_tts_tpu.ops.codec_decode import (
    decoder_is_fusable,
    pack_decoder_params,
    seanet_decoder_fused,
)

@dataclass(frozen=True)
class MimiSpecs:
    arch: SEANetArch
    encoder: SEANetSpec
    decoder: SEANetSpec
    transformer: TransformerConfig
    quantizer_dim: int  # latent dim (32)
    quantizer_out_dim: int  # seanet dimension (512)
    inner_dim: int
    outer_dim: int
    sample_rate: int
    frame_rate: float
    downsample_stride: int  # encoder_frame_rate / frame_rate (16)
    # ProjectedTransformer dims (reference mimi_transformer.py:104-150): the
    # transformer is wrapped in an input projection (t_input_dim -> d_model)
    # and one output projection (d_model -> t_output_dims[0]) whenever the
    # dimensions differ; identity otherwise. All 12 shipped configs are
    # identity, but non-identity checkpoints must build correctly too.
    t_input_dim: int = 0
    t_output_dims: tuple[int, ...] = ()

    @property
    def has_input_proj(self) -> bool:
        return self.t_input_dim not in (0, self.transformer.d_model)

    @property
    def has_output_proj(self) -> bool:
        return bool(self.t_output_dims) and (
            self.t_output_dims[0] != self.transformer.d_model
        )

    @property
    def encoder_frame_rate(self) -> float:
        return self.sample_rate / self.hop_length

    @property
    def hop_length(self) -> int:
        n = 1
        for r in self.arch.ratios:
            n *= r
        return n

    @property
    def frame_size(self) -> int:
        return int(self.sample_rate / self.frame_rate)

    @property
    def downsample_spec(self) -> ConvSpec:
        s = self.downsample_stride
        return ConvSpec(self.arch.dimension, self.inner_dim, 2 * s, stride=s,
                        pad_mode="replicate")

    @property
    def upsample_spec(self) -> ConvTrSpec:
        s = self.downsample_stride
        return ConvTrSpec(self.outer_dim, self.arch.dimension, 2 * s, stride=s,
                          groups=self.arch.dimension)

    @property
    def quantizer_spec(self) -> ConvSpec:
        return ConvSpec(self.quantizer_dim, self.quantizer_out_dim, 1)


def build_mimi_specs(cfg: MimiConfig) -> MimiSpecs:
    arch = SEANetArch(
        channels=cfg.seanet.channels,
        dimension=cfg.seanet.dimension,
        n_filters=cfg.seanet.n_filters,
        n_residual_layers=cfg.seanet.n_residual_layers,
        ratios=tuple(cfg.seanet.ratios),
        kernel_size=cfg.seanet.kernel_size,
        last_kernel_size=cfg.seanet.last_kernel_size,
        residual_kernel_size=cfg.seanet.residual_kernel_size,
        dilation_base=cfg.seanet.dilation_base,
        pad_mode=cfg.seanet.pad_mode,
        compress=cfg.seanet.compress,
    )
    tcfg = TransformerConfig(
        d_model=cfg.transformer.d_model,
        num_heads=cfg.transformer.num_heads,
        num_layers=cfg.transformer.num_layers,
        dim_feedforward=cfg.transformer.dim_feedforward,
        context=cfg.transformer.context,
        max_period=cfg.transformer.max_period,
        layer_scale=cfg.transformer.layer_scale,
    )
    hop = 1
    for r in arch.ratios:
        hop *= r
    encoder_frame_rate = cfg.sample_rate / hop
    stride = int(encoder_frame_rate / cfg.frame_rate)
    if len(cfg.transformer.output_dimensions) != 1:
        # the Mimi container consumes exactly one transformer output
        # (reference mimi.py:93 `(emb,) = self.decoder_transformer(...)`)
        raise ValueError(
            "Mimi transformers must have exactly one output dimension; got "
            f"{cfg.transformer.output_dimensions}"
        )
    return MimiSpecs(
        arch=arch,
        encoder=encoder_spec(arch),
        decoder=decoder_spec(arch),
        transformer=tcfg,
        quantizer_dim=cfg.quantizer.dimension,
        quantizer_out_dim=cfg.quantizer.output_dimension,
        inner_dim=cfg.inner_dim or cfg.seanet.dimension,
        outer_dim=cfg.outer_dim or cfg.seanet.dimension,
        sample_rate=cfg.sample_rate,
        frame_rate=cfg.frame_rate,
        downsample_stride=stride,
        t_input_dim=cfg.transformer.input_dimension,
        t_output_dims=tuple(cfg.transformer.output_dimensions),
    )


def init_mimi_params(specs: MimiSpecs, key, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 11)
    params = {
        "encoder": init_seanet_params(specs.encoder, ks[0], dtype),
        "decoder": init_seanet_params(specs.decoder, ks[1], dtype),
        "encoder_transformer": init_layer_params(specs.transformer, ks[2], dtype),
        "decoder_transformer": init_layer_params(specs.transformer, ks[3], dtype),
        "quantizer_out_proj": init_conv_params(specs.quantizer_spec, ks[4], dtype, bias=False),
        "downsample": init_conv_params(specs.downsample_spec, ks[5], dtype, bias=False),
        "upsample": init_conv_params(specs.upsample_spec, ks[6], dtype, bias=False),
    }
    # ProjectedTransformer in/out projections, torch Linear layout [out, in]
    # (reference mimi_transformer.py:129-137); absent when identity.
    d = specs.transformer.d_model

    def unif(k, out_dim, in_dim):
        bound = 1.0 / (in_dim**0.5)
        return jax.random.uniform(k, (out_dim, in_dim), dtype, -bound, bound)

    if specs.has_input_proj:
        params["encoder_transformer_in_proj"] = unif(ks[7], d, specs.t_input_dim)
        params["decoder_transformer_in_proj"] = unif(ks[8], d, specs.t_input_dim)
    if specs.has_output_proj:
        params["encoder_transformer_out_proj"] = unif(ks[9], specs.t_output_dims[0], d)
        params["decoder_transformer_out_proj"] = unif(ks[10], specs.t_output_dims[0], d)
    return params


def init_decoder_state(specs: MimiSpecs, batch_size: int, dtype=jnp.float32) -> dict:
    # sliding-window cache: holds the last W slots (shift_kv update). A query
    # at position p attends keys >= p - (context-1), so W >= context - 1
    # history slots suffice for any block length; round to a lane multiple.
    W = ((specs.transformer.context or 256) + 15) // 16 * 16
    return {
        "upsample": init_conv_tr_state(specs.upsample_spec, batch_size, dtype),
        "transformer": init_stack_state(specs.transformer, batch_size, W, dtype),
        "decoder": init_seanet_state(specs.decoder, batch_size, dtype),
    }


def encode_to_latent(specs: MimiSpecs, params: dict, audio: jnp.ndarray) -> jnp.ndarray:
    """Wav [B, 1, T] -> continuous latents [B, inner_dim, ceil(T/1920)]. One-shot.

    Matches reference mimi.py:96-119: pad to a whole frame, SEANet encode,
    windowed transformer over the whole sequence, strided downsample to 12.5 Hz.
    """
    fs = specs.frame_size
    pad = get_extra_padding_for_conv1d(audio.shape[-1], fs, fs)
    if pad:
        audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad)))
    emb, _ = seanet_apply(specs.encoder, params["encoder"], audio, None)
    # one-shot transformer over the full (windowed) sequence, no cache
    h = emb.transpose(0, 2, 1)
    if "encoder_transformer_in_proj" in params:
        h = matmul_t(h, params["encoder_transformer_in_proj"])
    out = transformer_oneshot(specs.transformer, params["encoder_transformer"], h)
    if "encoder_transformer_out_proj" in params:
        out = matmul_t(out, params["encoder_transformer_out_proj"])
    emb = out.transpose(0, 2, 1)
    latent, _ = conv1d_step(emb, specs.downsample_spec, params["downsample"], None)
    return latent


def decoder_step(
    specs: MimiSpecs,
    params: dict,
    latent: jnp.ndarray,
    state: dict,
) -> tuple[jnp.ndarray, dict]:
    """One streaming decode: projected latents [B, outer_dim, T_f] -> audio
    [B, 1, T_f*16*hop] (1920 samples per frame) and the updated state.

    When `params` carries a "decoder_packed" subtree (attached by
    enable_fused_codec on TPU/bf16 serving), the SEANet stack runs as one
    fused Pallas kernel instead of the XLA op program."""
    x, up_state = conv_transpose1d_step(
        latent, specs.upsample_spec, params["upsample"], state["upsample"]
    )
    h = x.transpose(0, 2, 1)
    if "decoder_transformer_in_proj" in params:
        h = matmul_t(h, params["decoder_transformer_in_proj"])
    out, tstate = transformer_apply(
        specs.transformer,
        params["decoder_transformer"],
        h,
        state["transformer"],
        window=True,
        unroll=True,
    )
    if "decoder_transformer_out_proj" in params:
        out = matmul_t(out, params["decoder_transformer_out_proj"])
    x = out.transpose(0, 2, 1)
    # the fused kernel is shaped (and wins) for the single-frame low-latency
    # step; multi-frame blocks run the XLA op program, whose convs get
    # efficient at T = 16*K (measured faster than K fused calls at b32)
    packed = params.get("decoder_packed")
    if packed is not None and x.shape[-1] == specs.downsample_stride:
        audio, dec_state = seanet_decoder_fused(
            specs.decoder, packed, x, state["decoder"]
        )
    else:
        audio, dec_state = seanet_apply(
            specs.decoder, params["decoder"], x, state["decoder"]
        )
    return audio, {"upsample": up_state, "transformer": tstate, "decoder": dec_state}


def enable_fused_codec(specs: MimiSpecs, params: dict) -> dict:
    """Attach the pre-packed (kernel-layout) decoder weights so decoder_step
    takes the fused Pallas path. Pack once per model — packing inside the jit
    would re-transpose ~8 MB of weights every frame."""
    if "decoder_packed" in params or not decoder_is_fusable(specs.decoder):
        return params
    return {**params,
            "decoder_packed": pack_decoder_params(specs.decoder, params["decoder"])}


def project_latent(specs: MimiSpecs, params: dict, latent: jnp.ndarray) -> jnp.ndarray:
    """DummyQuantizer output projection (dummy_quantizer.py:15-18): [B,ldim,T]->[B,512,T]."""
    y, _ = conv1d_step(latent, specs.quantizer_spec, params["quantizer_out_proj"], None)
    return y
