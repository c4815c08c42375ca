"""TTS pipeline orchestrator: the public TTSModel.

TPU-native re-design of /root/reference/pocket_tts/models/tts_model.py. The
reference runs two Python threads (FlowLM ∥ Mimi) around eager torch; here the
whole per-frame computation — FlowLM decode step + EOS head + LSD flow sampling
+ Mimi codec decode (16 codec steps → 1920 samples) — is ONE fused jit-compiled
step with donated state buffers. The host driver:

* buckets prompt lengths and KV capacities so there are only a handful of
  compiled variants (no shape-driven recompiles mid-stream);
* runs the decode loop speculatively ahead of the EOS check (an in-flight
  block deque, resolved in fetch groups — see the emit loop), so the device
  never waits on the host; audio for frames past the EOS cut is computed but
  simply never emitted — Mimi is causal, so earlier frames are unaffected;
* keeps JAX arrays immutable: `copy_state=True` is free (the voice state is
  never mutated; decode steps build fresh buffers via donation), while
  `copy_state=False` reproduces the reference's modify-in-place contract
  (tts_model.py:637-638) by writing the post-generation arrays back into the
  caller's (mutable) StackState holder, with the offset trimmed to exactly the
  number of AR steps the reference would have executed.

Batched generation (generate_audio_batch) runs B utterances with per-row
offsets, per-row EOS latching and ragged emission — a capability the reference
lacks (it pins batch_size=1, tts_model.py:370).
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.config import CONFIGS_DIR, Config, load_config
from pocket_tts_tpu.core.hub import (
    PREDEFINED_VOICE_ORIGINS,
    download_if_necessary,
    get_predefined_voice,
)
from pocket_tts_tpu.core.typecheck import typechecked
from pocket_tts_tpu.core.weights import (
    flow_lm_params_from_sd,
    load_safetensors,
    mimi_params_from_sd,
)
from pocket_tts_tpu.default_parameters import (
    DEFAULT_EOS_THRESHOLD,
    DEFAULT_LANGUAGE,
    DEFAULT_LSD_DECODE_STEPS,
    DEFAULT_NOISE_CLAMP,
    DEFAULT_TEMPERATURE,
    MAX_TOKEN_PER_CHUNK,
)
from pocket_tts_tpu.io.audio import audio_read, convert_audio
from pocket_tts_tpu.models.flow_lm import (
    FlowLMSpecs,
    build_flow_lm_specs,
    decode_step,
    embed_text_tokens,
    init_flow_lm_params,
    init_flow_lm_state,
    prompt_step,
)
from pocket_tts_tpu.models.mimi import (
    MimiSpecs,
    build_mimi_specs,
    decoder_step,
    enable_fused_codec,
    encode_to_latent,
    init_decoder_state,
    init_mimi_params,
    project_latent,
)
from pocket_tts_tpu.nn.transformer import StackState
from pocket_tts_tpu.pipeline.states import (
    batch_states,
    expand_state,
    export_model_state,
    import_model_state,
)
from pocket_tts_tpu.text.sentencepiece import SentencePieceTokenizer
from pocket_tts_tpu.text.splitter import prepare_text_prompt, split_into_best_sentences

logger = logging.getLogger(__name__)

VOICE_CLONING_UNSUPPORTED = (
    "Could not load the voice-cloning weights, but voice cloning was requested. "
    f"Without them you can use the predefined voice catalog: "
    f"{list(PREDEFINED_VOICE_ORIGINS)}."
)

# KV-capacity buckets: compile once per bucket, never per exact length.
CAPACITY_BUCKETS = (256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)
PROMPT_BUCKETS = (8, 16, 32, 64, 128, 192, 256, 384, 512)
FIRST_BLOCK_FRAMES = 2  # single-frame dispatches up front (first-chunk latency)
SCAN_BLOCK_FRAMES = 8  # frames per scan dispatch while the stream ramps up
MAX_BLOCK_FRAMES = 32  # steady-state frames per dispatch (2.56 s of audio)
RAMP_FRAMES = FIRST_BLOCK_FRAMES + 4 * SCAN_BLOCK_FRAMES  # 8-frame blocks until here


def _block_size(frames_started: int, warm: bool = False) -> int:
    """Dispatch-size ramp: single frames for first-chunk latency, 8-frame
    blocks while the stream builds its buffer, then 32-frame blocks — the
    dominant cost at batch is per-dispatch overhead + per-block fixed work,
    and a listener 2.7 s into playback has 2.56 s of audio buffered, so block
    latency no longer matters. EOS can overshoot by up to a block of wasted
    compute; emission stays exact (the host trims at the stop step).

    `warm`: the stream already has buffered audio (chunks after the first in a
    long text), so skip the latency ramp entirely and dispatch steady-state
    blocks from frame 0 — on a long text the per-chunk cost is block count x
    dispatch/fetch round trips, not block latency."""
    if warm:
        return MAX_BLOCK_FRAMES
    if frames_started < FIRST_BLOCK_FRAMES:
        return 1
    if frames_started < RAMP_FRAMES:
        return SCAN_BLOCK_FRAMES
    return MAX_BLOCK_FRAMES


def _use_fused_codec(mimi_params: dict) -> bool:
    """Fused Pallas codec decoder: on for TPU serving in bf16 (the only dtype
    whose weights fit VMEM); POCKET_TTS_TPU_CODEC=0 disables, =1 forces."""
    flag = os.environ.get("POCKET_TTS_TPU_CODEC")
    if flag == "0":
        return False
    if flag == "1":
        return True
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    w = mimi_params["decoder"]["0"].weight
    return w.dtype == jnp.bfloat16


def _host_async(*arrs) -> None:
    """Begin D2H transfers now, overlapped with in-flight compute, so a later
    jax.device_get finds the bytes on the host (one round trip, no transfer
    wait). No-op on backends without async copies."""
    for arr in arrs:
        try:
            arr.copy_to_host_async()
        except Exception:
            pass


def _fresh_seed() -> int:
    """Entropy for a device-noise generation with no caller seed (matches
    NoiseSource's default_rng(None) contract: distinct runs differ)."""
    return int(np.random.SeedSequence().entropy % (2**31))


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


@dataclasses.dataclass
class GenerationParams:
    temp: float = DEFAULT_TEMPERATURE
    lsd_decode_steps: int = DEFAULT_LSD_DECODE_STEPS
    noise_clamp: float | None = DEFAULT_NOISE_CLAMP
    eos_threshold: float = DEFAULT_EOS_THRESHOLD


class NoiseSource:
    """Per-generation flow-noise stream: N(0, temp) with optional truncation.

    The only stochastic input in the whole pipeline (flow_lm.py:132-137); tests
    inject a recorded stream here to make runs bit-deterministic.
    """

    def __init__(self, params: GenerationParams, seed: int | None):
        self.params = params
        self.rng = np.random.default_rng(seed)

    def __call__(self, shape) -> np.ndarray:
        std = self.params.temp**0.5
        if self.params.noise_clamp is None:
            return (self.rng.standard_normal(shape) * std).astype(np.float32)
        from scipy.stats import truncnorm

        a = -self.params.noise_clamp / std
        b = self.params.noise_clamp / std
        return (
            truncnorm.rvs(a, b, scale=std, size=shape, random_state=self.rng)
        ).astype(np.float32)


# Outstanding-fetch depth bound: without it the host would enqueue every block
# up to max_gen_len within one fetch round trip (async dispatch never blocks),
# so an early EOS could no longer limit wasted device compute and — with
# write_back — would inflate the slot watermark by the full dispatched length,
# pushing continued chunks into larger capacity buckets. Waiting on the oldest
# fetch once more than this many groups are in flight keeps dispatch within
# ~2 fetch groups of the EOS discovery point.
MAX_PENDING_FETCHES = 2


class _ChunkEmit:
    """Per-chunk emission accounting (reference semantics, tts_model.py:756-764).

    One instance per sentence chunk of a pipelined stream: fetched blocks
    resolve through `emit` in dispatch order; `finish` fires once every fetch
    of the chunk has resolved (the no-EOS warning/strict-raise point, which in
    a pipelined stream can land while a later chunk is already dispatching).
    """

    def __init__(self, max_gen_len: int, frames_after_eos: int):
        self.max_gen_len = max_gen_len
        self.frames_after_eos = frames_after_eos
        self.eos_step: int | None = None
        self.emitted = 0
        self.stop = False
        self.stop_step: int | None = None  # first frame NOT executed by the reference loop
        self.dispatch_done = False
        self.frames_started = 0
        self.outstanding = 0  # fetch groups submitted but not yet resolved

    def emit(self, block_start: int, flags, audio, out: list) -> None:
        if self.stop:
            return
        flags = np.asarray(flags)  # [K, B] or [B]
        audio = np.asarray(audio)
        K = flags.shape[0] if flags.ndim == 2 else 1
        for i in range(K):
            s = block_start + i
            if s >= self.max_gen_len:
                break
            flag = bool(flags[i, 0] if flags.ndim == 2 else flags[0])
            if flag and self.eos_step is None:
                self.eos_step = s
            if self.eos_step is not None and s >= self.eos_step + self.frames_after_eos:
                self.stop = True
                self.stop_step = s + 1  # the break step is still executed
                return
            self.emitted += 1
            out.append(audio[i, 0, 0] if audio.ndim == 4 else audio[0, 0])

    def finish(self) -> None:
        """All flags resolved: apply the reference's no-EOS contract
        (tts_model.py:770-775; the reference reads a misspelled `KPOCKET_...`
        name, making its own switch dead — we honor the name its tests
        actually set, conftest.py:3)."""
        if self.eos_step is None and self.frames_started >= self.max_gen_len:
            if os.environ.get("POCKET_TTS_ERROR_WITHOUT_EOS", "0") == "1":
                raise RuntimeError("Generation reached maximum length without EOS!")
            logger.warning(
                "Maximum generation length reached without EOS; "
                "this very often indicates an error."
            )


class _FetchPipe:
    """Single background fetch thread shared by EVERY chunk of one stream.

    Fetch groups from successive chunks queue FIFO, so frames resolve and
    emit in global order while chunk N+1's dispatches overlap chunk N's
    outstanding round trips — the cross-chunk pipelining that removes the
    per-chunk blocking drain (~1-3 tunnel RTTs per sentence chunk)."""

    def __init__(self):
        self.pool = ThreadPoolExecutor(max_workers=1)
        self.pending: deque = deque()  # (run, entries, Future)

    def submit(self, run: _ChunkEmit, entries: list) -> None:
        run.outstanding += 1
        fut = self.pool.submit(jax.device_get, [(e, a) for _, e, a in entries])
        self.pending.append((run, entries, fut))

    def resolve(self, out: list, block: bool = False,
                max_pending: int | None = None) -> None:
        """Emit results of completed fetches, oldest first. `block=True` waits
        for every outstanding fetch; `max_pending` waits on the oldest fetch
        whenever more than that many groups are outstanding."""
        while self.pending and (
            block or self.pending[0][2].done()
            or (max_pending is not None and len(self.pending) > max_pending)
        ):
            run, entries, fut = self.pending.popleft()
            for (start, _, _), (flags, audio) in zip(entries, fut.result()):
                run.emit(start, flags, audio, out)
            run.outstanding -= 1
            if run.dispatch_done and run.outstanding == 0:
                run.finish()

    def shutdown(self) -> None:
        # abandoned generators (client disconnect) must not leak the fetch
        # thread; cancel queued device_gets nobody will read so a hung tunnel
        # fetch can't block interpreter shutdown
        self.pool.shutdown(wait=False, cancel_futures=True)


class TTSModel:
    """End-to-end streaming TTS on TPU: text -> 24 kHz waveform chunks."""

    _TOKENS_PER_SECOND_ESTIMATE = 3.0
    _GEN_SECONDS_PADDING = 2.0

    def __init__(
        self,
        specs: FlowLMSpecs,
        mimi_specs: MimiSpecs,
        params: dict,
        mimi_params: dict,
        tokenizer,
        config: Config,
        gen_params: GenerationParams,
        origin: Path | None = None,
    ):
        self.specs = specs
        self.mimi_specs = mimi_specs
        self.params = params
        if _use_fused_codec(mimi_params):
            mimi_params = enable_fused_codec(mimi_specs, mimi_params)
        self.mimi_params = mimi_params
        self.tokenizer = tokenizer
        self.config = config
        self.gen = gen_params
        self.origin = origin
        self.has_voice_cloning = True
        self.pad_with_spaces_for_short_inputs = config.pad_with_spaces_for_short_inputs
        self.remove_semicolons = config.remove_semicolons
        self.model_recommended_frames_after_eos = config.model_recommended_frames_after_eos
        self._jit_cache: dict[Any, Callable] = {}
        self._voice_state_cache: dict[str, StackState] = {}
        self.mesh = None  # set via shard_for_mesh for multi-chip DP serving
        # Grow the KV cache bucket-by-bucket as slots fill instead of
        # allocating the final capacity up front: every step's attention then
        # reads only the current bucket (~the valid prefix), with bit-identical
        # numerics (masked slots contribute exactly 0 after softmax). Costs one
        # pad-copy per bucket transition and one compile per bucket — strictly
        # cheaper than att_len slicing, which forces XLA to copy the cache
        # (sliced read + in-place dynamic_update_slice write on one buffer).
        self.cache_growth = True

    # ------------------------------------------------------------------ props

    # generation params as attributes, mirroring the reference API surface
    temp = property(lambda self: self.gen.temp)
    lsd_decode_steps = property(lambda self: self.gen.lsd_decode_steps)
    noise_clamp = property(lambda self: self.gen.noise_clamp)
    eos_threshold = property(lambda self: self.gen.eos_threshold)

    @property
    def _dtype(self):
        w = self.params["input_linear"]
        return (w["q"] if isinstance(w, dict) else w).dtype

    @property
    def sample_rate(self) -> int:
        return self.config.mimi.sample_rate

    @property
    def frame_rate(self) -> float:
        return self.config.mimi.frame_rate

    @property
    def samples_per_frame(self) -> int:
        return self.mimi_specs.frame_size  # 1920 @ 24 kHz / 12.5 Hz

    @property
    def device(self):
        return jax.devices()[0]

    # ------------------------------------------------------------------ load

    @classmethod
    @typechecked(
        language=(str, None), config=(str, Path, None),
        temp=(float, int), lsd_decode_steps=int,
        noise_clamp=(float, int, None), eos_threshold=(float, int),
        quantize=bool, quantize_config=(str, frozenset, set, None),
        allow_random_init=bool, param_dtype=str,
    )
    def load_model(
        cls,
        language: str | None = None,
        config: str | Path | None = None,
        temp: float = DEFAULT_TEMPERATURE,
        lsd_decode_steps: int = DEFAULT_LSD_DECODE_STEPS,
        noise_clamp: float | None = DEFAULT_NOISE_CLAMP,
        eos_threshold: float = DEFAULT_EOS_THRESHOLD,
        quantize: bool = False,
        quantize_config: str | frozenset | set | None = None,
        allow_random_init: bool = False,
        param_dtype: str = "float32",
    ) -> "TTSModel":
        """Load a pre-trained TTS model (see reference tts_model.py:232-315).

        `quantize_config`: which layer groups to int8-quantize — a named config
        ("attention_ffn" default, "all" = attention+ffn+flow_net, ...) or an
        explicit set of groups, mirroring the reference's quantize_groups
        (quantization.py:60-75). Setting it implies `quantize=True`.
        `allow_random_init=True` builds the model with random weights when no
        checkpoint is reachable (offline development / benchmarking).
        `param_dtype`: "float32" (reference-parity) or "bfloat16" (serving; the
        flow head and all norm/softmax math stay f32 either way).
        """
        if config is not None and language is not None:
            raise ValueError("Cannot specify both config and language.")
        if config is None and language is None:
            language = DEFAULT_LANGUAGE
        if language is not None:
            if language == "french":
                raise ValueError(
                    "Only a larger 24-layer model is available for French; "
                    "use the 'french_24l' language instead."
                )
            config = CONFIGS_DIR / f"{language}.yaml"
        config_path = Path(config)
        if config_path.suffix not in (".yaml", ".yml"):
            raise ValueError("Config should be a path to a YAML file ending with .yaml")
        cfg = load_config(config_path)

        specs = build_flow_lm_specs(cfg)
        mimi_specs = build_mimi_specs(cfg.mimi)
        gen = GenerationParams(temp, lsd_decode_steps, noise_clamp, eos_threshold)

        tokenizer = None
        try:
            from pocket_tts_tpu.text.native import best_tokenizer

            tok_path = download_if_necessary(cfg.flow_lm.lookup_table.tokenizer_path)
            tokenizer = best_tokenizer(cfg.flow_lm.lookup_table.n_bins, tok_path)
        except Exception as e:  # offline or missing
            logger.warning("Tokenizer unavailable (%s); text APIs need token ids.", e)

        params = mimi_params = None
        has_voice_cloning = True
        if cfg.weights_path is not None:
            try:
                weights_file = download_if_necessary(cfg.weights_path)
                sd = load_safetensors(weights_file)
            except Exception:
                try:
                    weights_file = download_if_necessary(cfg.weights_path_without_voice_cloning)
                    sd = load_safetensors(weights_file)
                    has_voice_cloning = False
                except Exception as e:
                    if not allow_random_init:
                        raise
                    logger.warning("Weights unavailable (%s); using random init.", e)
                    sd = None
            if sd is not None:
                params = flow_lm_params_from_sd(
                    specs.transformer, specs.flow, sd, prefix="flow_lm."
                )
                mimi_params = mimi_params_from_sd(mimi_specs, sd, prefix="mimi.")
        if params is None:
            key = jax.random.PRNGKey(0)
            k1, k2 = jax.random.split(key)
            params = init_flow_lm_params(specs, k1)
            mimi_params = init_mimi_params(mimi_specs, k2)

        params = jax.tree.map(jnp.asarray, params)
        mimi_params = jax.tree.map(jnp.asarray, mimi_params)
        if param_dtype != "float32":
            target = jnp.dtype(param_dtype)
            cast = lambda x: x.astype(target) if x.dtype == jnp.float32 else x  # noqa: E731
            params = jax.tree.map(cast, params)
            mimi_params = jax.tree.map(cast, mimi_params)

        import os

        if os.environ.get("POCKET_TTS_SAVE_WEIGHTS", "0") == "1":
            from pocket_tts_tpu.core.weights import save_combined_checkpoint

            save_combined_checkpoint("./model.safetensors", params, mimi_specs,
                                     mimi_params)
            logger.info("Saved model weights to ./model.safetensors")

        model = cls(specs, mimi_specs, params, mimi_params, tokenizer, cfg, gen,
                    origin=config_path)
        model.has_voice_cloning = has_voice_cloning
        if quantize or quantize_config is not None:
            from pocket_tts_tpu.quant import (
                RECOMMENDED_CONFIG,
                quantize_flow_lm_int8,
                resolve_config,
            )

            groups = (RECOMMENDED_CONFIG if quantize_config is None
                      else resolve_config(quantize_config))
            model.params = quantize_flow_lm_int8(model.params, groups)
        return model

    # ------------------------------------------------------------- jit plumbing

    def _jit(self, key, build: Callable[[], Callable]) -> Callable:
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = build()
            self._jit_cache[key] = fn
        return fn

    def _step_jit(self, run, donate):
        """jit a decode-step function, optionally pinning the KV-cache leaves
        to the DEFAULT layout at the dispatch boundary
        (POCKET_TTS_TPU_PIN_LAYOUT=1). Rationale: XLA's layout assignment may
        pick a tiled cache layout inside the step while the states cross the
        boundary in another, materializing cache-sized relayout copies per
        dispatch (the large-batch residual named in STATUS round 4); pinning
        makes the boundary layout the one the donated round trip keeps."""
        if os.environ.get("POCKET_TTS_TPU_PIN_LAYOUT", "0") != "1" \
                or self.mesh is not None:
            return jax.jit(run, donate_argnums=donate)
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        auto = Format()
        dev = SingleDeviceSharding(jax.devices()[0])
        pinned = Format(Layout((0, 1, 2, 3, 4)), dev)
        pinned_state = StackState(
            k=pinned, v=pinned, pos=auto, offset=auto, write_pos=auto,
        )
        # args: (params, mimi_params, lm_state, mimi_state, prev, is_bos, noise)
        in_s = (auto, auto, pinned_state, auto, auto, auto, auto)
        # outputs: (latents, eos, audio, lm_state, mimi_state)
        out_s = (auto, auto, auto, pinned_state, auto)
        return jax.jit(run, donate_argnums=donate,
                       in_shardings=in_s, out_shardings=out_s)

    def _text_prompt_fn(self):
        def run(params, state, tokens, true_len):
            emb = embed_text_tokens(params, tokens)
            return prompt_step(self.specs, params, state, emb, true_len=true_len)

        return self._jit("text_prompt", lambda: jax.jit(run))

    def _audio_prompt_fn(self):
        def run(params, state, cond, true_len):
            return prompt_step(self.specs, params, state, cond, true_len=true_len)

        return self._jit("audio_prompt", lambda: jax.jit(run))

    def _ensure_stack_packed(self) -> None:
        """Lazily build the fused decode-stack kernel's packed weight bundle
        (ops/decode_stack.py) — after any quantization, before the first step
        function compiles. No-op when the kernel is disabled or the params are
        not packable (mixed quantization, f32 weights)."""
        from pocket_tts_tpu.ops.decode_stack import (
            pack_decode_stack,
            use_decode_stack,
        )

        if "stack_packed" in self.params or not use_decode_stack():
            return
        if self.mesh is not None:  # sharded serving decodes batches; XLA path
            return
        packed = pack_decode_stack(self.specs.transformer,
                                   self.params["transformer"])
        if packed is not None:
            self.params = {**self.params, "stack_packed": packed}

    def _device_noise(self, key, shape):
        """Flow noise generated ON DEVICE inside the jitted step: N(0, temp)
        with the same absolute ±noise_clamp truncation as NoiseSource (the
        host/numpy twin kept for injected/recorded streams). Production
        drivers use this path — it removes both the per-block host truncnorm
        computation and the H2D upload round trip (the tunneled device pays
        ~tens of ms per transfer; measured in the long-text bench)."""
        std = self.gen.temp ** 0.5
        if self.gen.noise_clamp is None:
            return jax.random.normal(key, shape, jnp.float32) * std
        c = self.gen.noise_clamp / std
        return jax.random.truncated_normal(key, -c, c, shape, jnp.float32) * std

    def _fused_step_fn(self, att_len: int | None = None, device_noise: bool = False):
        """(lm_state, mimi_state, prev_latent, is_bos, noise) -> one 80 ms frame.

        `device_noise=True`: the `noise` argument is a PRNG key instead of a
        [B, ldim] array; the flow noise is generated inside the step."""
        self._ensure_stack_packed()

        def run(params, mimi_params, lm_state, mimi_state, prev_latent, is_bos, noise):
            if device_noise:
                noise = self._device_noise(noise, prev_latent.shape)
            latent, eos, lm_state = decode_step(
                self.specs, params, lm_state, prev_latent, is_bos, noise,
                lsd_steps=self.gen.lsd_decode_steps,
                eos_threshold=self.gen.eos_threshold,
                att_len=att_len,
            )
            denorm = latent * params["emb_std"] + params["emb_mean"]
            quantized = project_latent(self.mimi_specs, mimi_params, denorm[:, :, None])
            audio, mimi_state = decoder_step(
                self.mimi_specs, mimi_params, quantized, mimi_state
            )
            return latent, eos, audio, lm_state, mimi_state

        key = ("fused_step", att_len, self.gen.lsd_decode_steps, self.gen.eos_threshold,
               device_noise and (self.gen.temp, self.gen.noise_clamp))
        return self._jit(key, lambda: self._step_jit(run, (2, 3)))

    def _multi_step_fn(self, block: int, att_len: int | None = None,
                       device_noise: bool = False):
        """K frames per dispatch: the (sequential) FlowLM decode runs as a
        lax.scan, then the WHOLE block's latents go through the Mimi codec in
        one call — one windowed attention over 16K timesteps and 16K-long
        convs instead of K sequential single-frame chains. Amortizes both the
        host->device dispatch and the codec's op overhead (the per-frame Mimi
        chain dominated the b32 frame time at ~0.9 ms).

        Returns (latents [K,B,ldim], eos [K,B], audio [K,B,1,1920], states)."""
        self._ensure_stack_packed()

        def run(params, mimi_params, lm_state, mimi_state, prev_latent, is_bos0, noise):
            if device_noise:
                B, ldim = prev_latent.shape
                noise = self._device_noise(noise, (block, B, ldim))

            def body(carry, xs):
                lm_state, prev, is_bos = carry
                step_noise = xs
                latent, eos, lm_state = decode_step(
                    self.specs, params, lm_state, prev, is_bos, step_noise,
                    lsd_steps=self.gen.lsd_decode_steps,
                    eos_threshold=self.gen.eos_threshold,
                    att_len=att_len,
                )
                return (lm_state, latent, jnp.zeros_like(is_bos)), (latent, eos)

            carry = (lm_state, prev_latent, is_bos0)
            (lm_state, last_latent, _), (latents, eos) = jax.lax.scan(
                body, carry, noise
            )
            denorm = latents * params["emb_std"] + params["emb_mean"]  # [K,B,ldim]
            quantized = project_latent(
                self.mimi_specs, mimi_params, denorm.transpose(1, 2, 0)
            )  # [B, 512, K]
            audio, mimi_state = decoder_step(
                self.mimi_specs, mimi_params, quantized, mimi_state
            )  # [B, 1, K*1920]
            B = audio.shape[0]
            spf = audio.shape[-1] // block
            audio = audio.reshape(B, 1, block, spf).transpose(2, 0, 1, 3)
            return latents, eos, audio, lm_state, mimi_state

        key = ("multi_step", block, att_len, self.gen.lsd_decode_steps,
               self.gen.eos_threshold,
               device_noise and (self.gen.temp, self.gen.noise_clamp))
        return self._jit(key, lambda: self._step_jit(run, (2, 3)))

    def _encode_fn(self):
        def run(mimi_params, audio):
            latent = encode_to_latent(self.mimi_specs, mimi_params, audio)
            return latent

        return self._jit("encode", lambda: jax.jit(run))

    # ------------------------------------------------------------- voice state

    def init_blank_state(self, batch_size: int = 1, capacity: int = 256) -> StackState:
        return init_flow_lm_state(self.specs, batch_size, capacity, self._dtype)

    @typechecked(audio_conditioning=(str, Path, np.ndarray), truncate=bool)
    def get_state_for_audio_prompt(
        self, audio_conditioning: str | Path | np.ndarray, truncate: bool = False
    ) -> StackState:
        """Build the voice state from audio / a .safetensors export / a catalog name
        (reference tts_model.py:787-905)."""
        if isinstance(audio_conditioning, (str, Path)) and str(audio_conditioning).endswith(
            ".safetensors"
        ):
            path = download_if_necessary(str(audio_conditioning))
            return import_model_state(path)

        if (
            isinstance(audio_conditioning, str)
            and audio_conditioning in PREDEFINED_VOICE_ORIGINS
        ):
            if self.origin is None or not Path(self.origin).is_relative_to(CONFIGS_DIR):
                raise ValueError(
                    "Predefined voices need a model loaded from a language config; "
                    f"origin is {self.origin}"
                )
            return import_model_state(
                download_if_necessary(
                    get_predefined_voice(language=Path(self.origin).stem,
                                         name=audio_conditioning)
                )
            )

        if not self.has_voice_cloning and isinstance(audio_conditioning, (str, Path)):
            raise ValueError(VOICE_CLONING_UNSUPPORTED)

        if isinstance(audio_conditioning, (str, Path)):
            path = download_if_necessary(str(audio_conditioning))
            audio, sr = audio_read(path)
            if truncate:
                max_samples = int(30 * sr)
                if audio.shape[-1] > max_samples:
                    audio = audio[..., :max_samples]
            audio = convert_audio(audio, sr, self.sample_rate, 1)
        else:
            audio = np.asarray(audio_conditioning, dtype=np.float32)

        return self.state_for_audio_array(audio)

    def state_for_audio_array(self, audio: np.ndarray) -> StackState:
        """audio: [1, T] or [B, 1, T] float32 at the model sample rate."""
        if audio.ndim == 2:
            audio = audio[None]
        B, _, T = audio.shape
        fs = self.mimi_specs.frame_size
        n_frames = math.ceil(T / fs)
        # bucket the wav length so the encoder compiles a few shapes only
        frame_bucket = _bucket(n_frames, (25, 50, 75, 100, 150, 200, 250, 300, 375, 512))
        padded = np.zeros((B, 1, frame_bucket * fs), np.float32)
        padded[:, :, :T] = audio
        latent = self._encode_fn()(self.mimi_params, jnp.asarray(padded))
        latent = latent[:, :, :n_frames]
        # speaker projection into backbone space (tts_model.py:379-388)
        cond = jnp.einsum("bct,dc->btd", latent.astype(jnp.float32),
                          self.params["speaker_proj_weight"])
        if self.specs.insert_bos_before_voice:
            bos = jnp.broadcast_to(self.params["bos_before_voice"],
                                   (B, 1, self.specs.transformer.d_model))
            cond = jnp.concatenate([bos, cond], axis=1)
        prompt_len = cond.shape[1]
        pad_to = _bucket(prompt_len, PROMPT_BUCKETS)
        cond = jnp.pad(cond, ((0, 0), (0, pad_to - prompt_len), (0, 0)))
        capacity = _bucket(pad_to, CAPACITY_BUCKETS)  # slots incl. prompt padding
        state = init_flow_lm_state(self.specs, B, capacity, self._dtype)
        true_len = jnp.full((B,), prompt_len, jnp.int32)
        return self._audio_prompt_fn()(self.params, state, cond, true_len)

    def cached_get_state_for_audio_prompt(
        self, audio_conditioning: str, truncate: bool = False
    ) -> StackState:
        """True LRU(2), like the reference server's functools.lru_cache(2)
        (tts_model.py:781-785): a hit moves the entry to most-recently-used, so
        alternating between two voices never evicts the hot one."""
        key = f"{audio_conditioning}|{truncate}"
        cache = self._voice_state_cache
        if key in cache:
            cache[key] = cache.pop(key)  # move-to-end: mark most recently used
        else:
            if len(cache) >= 2:
                cache.pop(next(iter(cache)))  # evict least recently used
            cache[key] = self.get_state_for_audio_prompt(audio_conditioning, truncate)
        return cache[key]

    # ----------------------------------------------------------------- sharding

    def shard_for_mesh(self, mesh, tensor_parallel: bool = False) -> None:
        """Prepare for multi-chip serving.

        DP (always): batched decode states shard over the 'data' axis.
        TP (`tensor_parallel=True`, for the 24-layer variants): the FlowLM
        backbone's megatron axes and the KV-cache head axis shard over 'model';
        everything else (flow head, Mimi) is replicated. GSPMD inserts the ICI
        collectives (one reduce per attention/FFN residual).
        """
        from pocket_tts_tpu.parallel.mesh import (
            flow_lm_param_specs,
            replicated,
            shard_tree,
        )

        self.mesh = mesh
        self._tp = tensor_parallel
        # sharded serving decodes batches on the XLA path; the b1 decode-stack
        # pack has no sharding specs and would confuse shard_tree
        self.params = {k: v for k, v in self.params.items() if k != "stack_packed"}
        if tensor_parallel:
            self.params = shard_tree(self.params, flow_lm_param_specs(self.params), mesh)
        else:
            self.params = replicated(self.params, mesh)
        self.mimi_params = replicated(self.mimi_params, mesh)
        self._jit_cache.clear()

    def _maybe_shard_batch(self, lm_state, mimi_state):
        if self.mesh is None:
            return lm_state, mimi_state
        from pocket_tts_tpu.parallel.mesh import shard_decode_state

        tp = getattr(self, "_tp", False)
        return (
            shard_decode_state(lm_state, self.mesh, model_axis=tp),
            shard_decode_state(mimi_state, self.mesh),
        )

    # -------------------------------------------------------------- generation

    def _ensure_capacity(self, lm_state: StackState, slots_needed: int) -> StackState:
        """Progressive capacity growth: pad the cache up to the smallest bucket
        covering `slots_needed` (the slot watermark after the next dispatch).
        No-op when the cache is already big enough; never shrinks."""
        cap = _bucket(slots_needed, CAPACITY_BUCKETS)
        if cap > lm_state.k.shape[2]:
            lm_state = expand_state(lm_state, cap)
            if self.mesh is not None:
                from pocket_tts_tpu.parallel.mesh import shard_decode_state

                lm_state = shard_decode_state(
                    lm_state, self.mesh, model_axis=getattr(self, "_tp", False)
                )
        return lm_state

    def _estimate_max_gen_len(self, token_count: int) -> int:
        gen_len_sec = token_count / self._TOKENS_PER_SECOND_ESTIMATE + self._GEN_SECONDS_PADDING
        return math.ceil(gen_len_sec * self.frame_rate)

    def _encode_text(self, text: str) -> list[int]:
        if self.tokenizer is None:
            raise RuntimeError(
                "No tokenizer available (offline?); use generate_audio_stream_from_tokens."
            )
        return self.tokenizer.encode(text)

    @typechecked(
        model_state=StackState, text_to_generate=str, max_tokens=int,
        frames_after_eos=(int, None), copy_state=bool, seed=(int, None),
    )
    def generate_audio_stream(
        self,
        model_state: StackState,
        text_to_generate: str,
        max_tokens: int = MAX_TOKEN_PER_CHUNK,
        frames_after_eos: int | None = None,
        copy_state: bool = True,
        seed: int | None = None,
        noise_source: Callable | None = None,
    ) -> Iterator[np.ndarray]:
        """Yield [samples] float32 chunks (80 ms each) as they are decoded.

        Long text is split into sentence chunks; chunks are PIPELINED: chunk
        N+1's prompt and decode blocks dispatch while chunk N's fetches are
        still in flight (the state handoff is computed on device — see
        `_finalize_fn` — so it needs no host round trip), removing the 1-3
        fetch RTTs a per-chunk blocking drain would cost. With
        `copy_state=True` (default) every chunk generates against the
        unmodified voice state, which bounds KV growth structurally. With
        `copy_state=False` the passed state is modified in place, each chunk
        continuing from the previous one's end — the reference's accumulate
        semantics (tts_model.py:637-638).
        """
        if frames_after_eos is None:
            frames_after_eos = self.model_recommended_frames_after_eos
        chunks = split_into_best_sentences(
            self.tokenizer, text_to_generate, max_tokens,
            self.pad_with_spaces_for_short_inputs, self.remove_semicolons,
        )
        # noise_source=None -> device-side PRNG inside the jitted step (no
        # host truncnorm, no per-block H2D upload); an explicit source (tests,
        # recorded parity streams) keeps the host path. Chunk seeds are spawned
        # through SeedSequence([seed, i]) so chunk N is deterministic given
        # (seed, N) while adjacent caller seeds give statistically independent
        # streams (seed+i would alias seed=5/chunk 1 with seed=6/chunk 0).
        specs = []
        for i, chunk in enumerate(chunks):
            _, guess = prepare_text_prompt(
                chunk, self.pad_with_spaces_for_short_inputs, self.remove_semicolons
            )
            effective = frames_after_eos if frames_after_eos is not None else guess + 2
            specs.append(dict(
                tokens=self._encode_text(chunk),
                frames_after_eos=effective,
                warm_start=i > 0,
                seed=None if seed is None else
                int(np.random.SeedSequence([seed, i]).generate_state(1)[0]),
            ))
        yield from self._run_chunks(
            model_state, specs, noise_source, write_back=not copy_state
        )

    def generate_audio_stream_from_tokens(
        self,
        model_state: StackState,
        tokens: list[int],
        frames_after_eos: int,
        noise_source: Callable | None = None,
        max_gen_len: int | None = None,
        write_back: bool = False,
        warm_start: bool = False,
        seed: int | None = None,
    ) -> Iterator[np.ndarray]:
        """Single-chunk generation from token ids (B=1). Emission semantics match
        the reference AR loop exactly (tts_model.py:744-779).

        `write_back=True` reproduces the reference's `copy_state=False`
        contract: `model_state`'s fields are replaced with the post-generation
        state, its offset advanced by token_count + the number of AR steps the
        reference loop would have executed (every generated frame incl. the
        final break step, tts_model.py:744-764). Speculatively decoded frames
        beyond that point sit past the offset watermark and are never attended.
        The trim is computed ON DEVICE from the block EOS flags (`_finalize_fn`)
        so a continued chunk can start before this chunk's audio arrives.

        `warm_start=True` (chunks after the first in a long text): skip the
        single-frame latency ramp — the listener already has buffered audio,
        so per-chunk overhead matters more than first-frame latency.
        """
        spec = dict(tokens=tokens, frames_after_eos=frames_after_eos,
                    warm_start=warm_start, seed=seed, max_gen_len=max_gen_len)
        yield from self._run_chunks(
            model_state, [spec], noise_source, write_back=write_back
        )

    def _finalize_fn(self):
        """Device-side post-generation state trim — the key to cross-chunk
        pipelining: the reference's stop point (first EOS + frames_after_eos
        + the break step, capped at max_gen_len) is recomputed from the block
        EOS flags ON DEVICE, so the continued chunk's prompt can be dispatched
        immediately after this chunk's last block, without waiting for any
        EOS flag to reach the host. Numerically identical to the host trim:
        slots at positions >= the stop offset get pos = -1 and are never
        attended (reference contract tts_model.py:744-764)."""

        def run(lm_state, orig_offset, token_count, fae, max_gen, *eos_blocks):
            fl = [b if b.ndim == 2 else b[None] for b in eos_blocks]
            flags = jnp.concatenate(fl, axis=0).astype(jnp.int32)  # [S, B]
            S = flags.shape[0]
            step_ix = jnp.arange(S, dtype=jnp.int32)[:, None]
            flags = jnp.where(step_ix < max_gen, flags, 0)  # host emit ignores s >= max
            latched = jnp.cumsum(flags, axis=0) > 0
            has_eos = latched[-1]
            eos_step = jnp.argmax(latched, axis=0).astype(jnp.int32)
            stop = jnp.where(
                has_eos, jnp.minimum(eos_step + fae + 1, max_gen), max_gen
            )
            final_offset = (orig_offset + token_count + stop).astype(jnp.int32)
            pos = jnp.where(lm_state.pos < final_offset[:, None], lm_state.pos, -1)
            return StackState(k=lm_state.k, v=lm_state.v, pos=pos,
                              offset=final_offset, write_pos=lm_state.write_pos)

        return self._jit("finalize", lambda: jax.jit(run, donate_argnums=(0,)))

    def _run_chunks(
        self,
        model_state: StackState,
        chunk_specs: list[dict],
        noise_source: Callable | None,
        write_back: bool,
    ) -> Iterator[np.ndarray]:
        """Pipelined chunk driver: dispatch chunk i+1 while chunk i's fetches
        are outstanding; one shared FIFO fetch pipe keeps emission in global
        frame order. With write_back the inter-chunk state handoff runs on
        device (`_finalize_fn`), so no host round trip separates chunks; the
        final blocking drain happens once, after the LAST chunk's dispatches."""
        t_start = time.monotonic()
        pipe = _FetchPipe()
        out: list[np.ndarray] = []
        runs: list[_ChunkEmit] = []
        try:
            for spec in chunk_specs:
                run, lm_state, eos_blocks, info = yield from self._dispatch_chunk(
                    model_state, spec, noise_source, pipe, out
                )
                runs.append(run)
                if write_back:
                    token_count, pad_to, orig_offset, slots_used = info
                    new_state = self._finalize_fn()(
                        lm_state, orig_offset,
                        jnp.asarray(token_count, jnp.int32),
                        jnp.asarray(run.frames_after_eos, jnp.int32),
                        jnp.asarray(run.max_gen_len, jnp.int32),
                        *eos_blocks,
                    )
                    model_state.k = new_state.k
                    model_state.v = new_state.v
                    model_state.pos = new_state.pos
                    model_state.offset = new_state.offset
                    model_state.write_pos = new_state.write_pos
                    # host mirror (slots advanced by pad_to + every dispatched
                    # frame — all host-known; no device fetch)
                    model_state._slots_used = (
                        slots_used + pad_to + run.frames_started)
            pipe.resolve(out, block=True)
            while out:
                yield out.pop(0)
        finally:
            pipe.shutdown()
        emitted = sum(r.emitted for r in runs)
        dur_ms = emitted * self.samples_per_frame * 1000 / self.sample_rate
        wall_ms = (time.monotonic() - t_start) * 1000
        logger.info(
            "Generated %d ms of audio in %d ms (%.2fx real-time)",
            int(dur_ms), int(wall_ms), dur_ms / max(wall_ms, 1e-6),
        )

    def _dispatch_chunk(self, model_state, spec, noise_source, pipe, out):
        """Dispatch one chunk: text prompt + speculative decode blocks.

        Yields frames as earlier fetches (possibly of PREVIOUS chunks) resolve;
        returns (run, lm_state, eos_blocks, (token_count, pad_to, orig_offset,
        slots_used)) for the caller's device-side finalize. Never drains: the
        remaining fetches stay queued on the shared pipe.
        """
        tokens = spec["tokens"]
        token_count = len(tokens)
        max_gen_len = spec.get("max_gen_len") or self._estimate_max_gen_len(token_count)
        warm_start = spec.get("warm_start", False)
        seed = spec.get("seed")
        orig_offset = model_state.offset
        # capacity is measured in SLOTS (write_pos): prompts append their full
        # padded bucket, so account for pad_to rather than token_count. The
        # loop dispatches whole blocks while frames_started < max_gen_len, so
        # appends can overshoot max_gen_len by up to MAX_BLOCK_FRAMES-1 slots —
        # capacity must cover that, or the clamped dynamic_update_slice
        # silently overwrites the last real slot's K/V/pos when `required`
        # lands within a block of a bucket boundary.
        # The slot watermark is host-mirrored on the state holder (_slots_used,
        # maintained by the caller's write_back): slots advance by host-known
        # amounts only, and fetching the device scalar costs a tunnel round
        # trip per chunk — the dominant per-chunk overhead term.
        slots_used = getattr(model_state, "_slots_used", None)
        if slots_used is None:
            slots_used = int(np.asarray(model_state.write_pos))
            model_state._slots_used = slots_used
        pad_to = _bucket(token_count, PROMPT_BUCKETS)
        required = slots_used + pad_to + max_gen_len + MAX_BLOCK_FRAMES - 1
        capacity = _bucket(required, CAPACITY_BUCKETS)
        if self.cache_growth:  # start small; _ensure_capacity grows per block
            capacity = _bucket(slots_used + pad_to, CAPACITY_BUCKETS)

        lm_state = expand_state(model_state, capacity)
        mimi_state = init_decoder_state(self.mimi_specs, 1, self._dtype)
        lm_state, mimi_state = self._maybe_shard_batch(lm_state, mimi_state)
        lm_state = self._prompt_text_tokens(lm_state, tokens)

        B = lm_state.offset.shape[0]
        ldim = self.specs.ldim
        prev_latent = jnp.zeros((B, ldim), jnp.float32)
        is_bos = jnp.ones((B,), bool)
        device_noise = noise_source is None
        if device_noise:
            base_key = jax.random.PRNGKey(
                seed if seed is not None else _fresh_seed())

        # Low-latency single steps for the first frames, then K-frame scan
        # blocks (one dispatch per block amortizes the host->device round
        # trip). Blocks stay speculatively in flight so the device never idles
        # on the host-side EOS check; fetches run on the stream's shared
        # background thread so their round-trip latency overlaps the next
        # blocks' dispatch/compute instead of serializing with it.
        run = _ChunkEmit(max_gen_len, spec["frames_after_eos"])
        inflight: deque = deque()
        eos_blocks: list = []
        start_slots = slots_used + pad_to  # slot watermark after the text prompt
        frames_started = 0
        while frames_started < max_gen_len and not run.stop:
            K = _block_size(frames_started, warm=warm_start)
            if self.cache_growth:
                lm_state = self._ensure_capacity(
                    lm_state, start_slots + frames_started + K
                )
            if device_noise:
                noise = jax.random.fold_in(base_key, frames_started)
            else:
                noise = jnp.asarray(
                    noise_source((B, ldim) if K == 1 else (K, B, ldim)))
            if K == 1:
                latent, eos, audio, lm_state, mimi_state = self._fused_step_fn(
                    device_noise=device_noise)(
                    self.params, self.mimi_params, lm_state, mimi_state,
                    prev_latent, is_bos, noise,
                )
            else:
                latent, eos, audio, lm_state, mimi_state = self._multi_step_fn(
                    K, device_noise=device_noise)(
                    self.params, self.mimi_params, lm_state, mimi_state,
                    prev_latent, is_bos, noise,
                )
                latent = latent[-1]
            prev_latent = latent
            is_bos = jnp.zeros((B,), bool)
            _host_async(eos, audio)
            inflight.append((frames_started, eos, audio))
            eos_blocks.append(eos)
            frames_started += K
            # Fetch-group schedule. Measured on the tunneled chip (see
            # STATUS.md long-text section): with async dispatch the b1 device
            # is <35% busy, so wall time for a warmed stream is almost
            # entirely fetch-count x round-trip (~40-90 ms each) — the group
            # depth IS the sustained-RTF knob. The cold ramp keeps group 1
            # only while the listener has <~1 s buffered; warm chunks go
            # straight to the deepest group (their remaining fetches overlap
            # the NEXT chunk's dispatches on the shared pipe).
            if warm_start:
                group = 8
            elif frames_started <= FIRST_BLOCK_FRAMES + SCAN_BLOCK_FRAMES:
                group = 1
            elif frames_started <= RAMP_FRAMES:
                group = 2
            elif frames_started <= 4 * MAX_BLOCK_FRAMES:
                group = 4
            else:
                group = 8
            if len(inflight) > group:
                pipe.submit(run, [inflight.popleft() for _ in range(group)])
            pipe.resolve(out, block=False, max_pending=MAX_PENDING_FETCHES)
            while out:
                yield out.pop(0)
        if inflight and not run.stop:
            # stop=True means frames past the cut were dispatched but their
            # audio is never emitted — don't pay fetch round trips for them
            pipe.submit(run, list(inflight))
        inflight.clear()
        run.frames_started = frames_started
        run.dispatch_done = True
        if run.outstanding == 0:
            run.finish()
        return run, lm_state, eos_blocks, (token_count, pad_to, orig_offset,
                                           slots_used)

    def _prompt_text_tokens(self, lm_state: StackState, tokens: list[int]) -> StackState:
        B = lm_state.offset.shape[0]
        pad_to = _bucket(len(tokens), PROMPT_BUCKETS)
        tok = np.zeros((B, pad_to), np.int32)
        tok[:, : len(tokens)] = tokens
        true_len = jnp.full((B,), len(tokens), jnp.int32)
        return self._text_prompt_fn()(self.params, lm_state, jnp.asarray(tok), true_len)

    @typechecked(
        model_state=StackState, text_to_generate=str, max_tokens=int,
        frames_after_eos=(int, None), copy_state=bool, seed=(int, None),
    )
    def generate_audio(
        self,
        model_state: StackState,
        text_to_generate: str,
        max_tokens: int = MAX_TOKEN_PER_CHUNK,
        frames_after_eos: int | None = None,
        copy_state: bool = True,
        seed: int | None = None,
        noise_source: Callable | None = None,
    ) -> np.ndarray:
        """Generate the full waveform [samples] for a text prompt."""
        chunks = list(
            self.generate_audio_stream(
                model_state, text_to_generate, max_tokens=max_tokens,
                frames_after_eos=frames_after_eos, copy_state=copy_state,
                seed=seed, noise_source=noise_source,
            )
        )
        return np.concatenate(chunks, axis=0) if chunks else np.zeros((0,), np.float32)

    # --------------------------------------------------------------- batched

    def generate_audio_batch(
        self,
        model_states: list[StackState] | StackState,
        token_lists: list[list[int]],
        frames_after_eos: int = 3,
        seed: int | None = None,
        noise_source: Callable | None = None,
    ) -> list[np.ndarray]:
        """Batched decode of B utterances in one compiled step train.

        Per-row EOS latching + ragged emission; rows finish independently and
        their audio is trimmed at their own cut frame.
        """
        token_counts = [len(t) for t in token_lists]
        B = len(token_lists)
        max_gen_len = self._estimate_max_gen_len(max(token_counts))
        pad_to = _bucket(max(token_counts), PROMPT_BUCKETS)

        # same overshoot guard as the streaming path: scan blocks may append up
        # to MAX_BLOCK_FRAMES-1 slots past max_gen_len
        if isinstance(model_states, list):
            slots_used = max(int(np.asarray(s.write_pos)) for s in model_states)
        else:
            slots_used = int(np.asarray(model_states.write_pos))
        required = slots_used + pad_to + max_gen_len + MAX_BLOCK_FRAMES - 1
        capacity = _bucket(required, CAPACITY_BUCKETS)
        if self.cache_growth:  # start small; _ensure_capacity grows per block
            capacity = _bucket(slots_used + pad_to, CAPACITY_BUCKETS)
        if isinstance(model_states, list):
            lm_state = batch_states(model_states, capacity)
        else:
            lm_state = expand_state(model_states, capacity)
            assert lm_state.offset.shape[0] == B

        # right-pad token rows to one bucket; per-row true lengths
        tok = np.zeros((B, pad_to), np.int32)
        for i, ts in enumerate(token_lists):
            tok[i, : len(ts)] = ts
        true_len = jnp.asarray(token_counts, jnp.int32)
        mimi_state = init_decoder_state(self.mimi_specs, B, self._dtype)
        lm_state, mimi_state = self._maybe_shard_batch(lm_state, mimi_state)
        lm_state = self._text_prompt_fn()(self.params, lm_state, jnp.asarray(tok), true_len)

        device_noise = noise_source is None
        if device_noise:
            batch_key = jax.random.PRNGKey(
                seed if seed is not None else _fresh_seed())

        ldim = self.specs.ldim
        prev_latent = jnp.zeros((B, ldim), jnp.float32)
        eos_step = np.full((B,), -1, np.int64)
        end_step = np.full((B,), max_gen_len, np.int64)
        # per dispatched block: (start step, eos [K,B], audio [K,B,1,1920]) —
        # whole-block device arrays, async-copied once each; slicing into
        # per-frame views happens host-side after the fused device_get (2K
        # separate small transfers per block regress on a tunneled device
        # where per-transfer cost dominates)
        blocks: list[tuple[int, Any, Any]] = []
        start_slots = slots_used + pad_to

        def _fold_flags(block_list) -> bool:
            """Fold a batch of fetched EOS blocks into the per-row cut state;
            returns True when every row is finished."""
            host_eos = jax.device_get([eb for _, eb, _ in block_list])
            for (bstart, _, _), hf in zip(block_list, host_eos):
                hf = np.asarray(hf)
                for i in range(hf.shape[0]):
                    s = bstart + i
                    if s >= max_gen_len:
                        break
                    self._update_row_cuts(hf[i], s, eos_step, end_step,
                                          frames_after_eos)
                    if all(end_step <= s):
                        return True
            return False

        # Multi-frame scan blocks, one dispatch per SCAN_BLOCK_FRAMES frames
        # (same shape as the streaming path): a single-frame dispatch at b32
        # costs a full host->device round trip per 80 ms frame across all rows,
        # which dominated the b32 bench. Flags resolve one block behind so the
        # newest block stays speculatively in flight.
        resolved_blocks = 0  # blocks whose EOS flags are folded into end_step
        step = 0
        done = False
        while step < max_gen_len and not done:
            K = _block_size(step)
            if self.cache_growth:
                lm_state = self._ensure_capacity(lm_state, start_slots + step + K)
            is_bos = jnp.full((B,), step == 0, bool)
            if device_noise:
                noise = jax.random.fold_in(batch_key, step)
            else:
                noise = jnp.asarray(
                    noise_source((B, ldim) if K == 1 else (K, B, ldim)))
            if K == 1:
                latent, eos, audio, lm_state, mimi_state = self._fused_step_fn(
                    device_noise=device_noise)(
                    self.params, self.mimi_params, lm_state, mimi_state,
                    prev_latent, is_bos, noise,
                )
                eos, audio = eos[None], audio[None]  # [1,B], [1,B,1,1920]
            else:
                latent, eos, audio, lm_state, mimi_state = self._multi_step_fn(
                    K, device_noise=device_noise)(
                    self.params, self.mimi_params, lm_state, mimi_state,
                    prev_latent, is_bos, noise,
                )
                latent = latent[-1]
            _host_async(eos, audio)
            blocks.append((step, eos, audio))
            prev_latent = latent
            step += K
            # resolve every fully-dispatched block except the newest (kept
            # speculatively in flight); ONE fused fetch per resolution batch
            if len(blocks) - 1 > resolved_blocks:
                done = _fold_flags(blocks[resolved_blocks:-1])
                resolved_blocks = len(blocks) - 1
        if resolved_blocks < len(blocks):
            _fold_flags(blocks[resolved_blocks:])

        if (eos_step < 0).any():
            rows = np.nonzero(eos_step < 0)[0].tolist()
            if os.environ.get("POCKET_TTS_ERROR_WITHOUT_EOS", "0") == "1":
                raise RuntimeError(
                    f"Generation reached maximum length without EOS (rows {rows})!"
                )
            logger.warning(
                "Maximum generation length reached without EOS on rows %s; "
                "this very often indicates an error.", rows,
            )

        # one fused fetch of all audio blocks; per-frame slicing host-side
        host_audio = jax.device_get([ab for _, _, ab in blocks])
        stacked = np.concatenate(
            [np.asarray(a)[:, :, 0, :] for a in host_audio], axis=0
        )  # [S, B, 1920]
        out = []
        for b in range(B):
            n = min(int(end_step[b]), stacked.shape[0])
            out.append(stacked[:n, b].reshape(-1))
        return out

    def generate_audio_batch_from_texts(
        self,
        model_states: list[StackState] | StackState,
        texts: list[str],
        frames_after_eos: int | None = None,
        seed: int | None = None,
    ) -> list[np.ndarray]:
        """Batched generation from raw texts (each text must fit one chunk;
        long texts should go through generate_audio_stream per utterance)."""
        token_lists = []
        guesses = []
        for text in texts:
            prepared, guess = prepare_text_prompt(
                text, self.pad_with_spaces_for_short_inputs, self.remove_semicolons
            )
            token_lists.append(self._encode_text(prepared))
            guesses.append(guess + 2)
        if frames_after_eos is None:
            frames_after_eos = self.model_recommended_frames_after_eos
        if frames_after_eos is None:
            frames_after_eos = max(guesses)
        return self.generate_audio_batch(
            model_states, token_lists, frames_after_eos=frames_after_eos, seed=seed
        )

    @staticmethod
    def _update_row_cuts(step_flags, s, eos_step, end_step, frames_after_eos):
        flags = np.asarray(step_flags)
        newly = (flags > 0) & (eos_step < 0)
        eos_step[newly] = s
        has = eos_step >= 0
        end_step[has] = np.minimum(end_step[has], eos_step[has] + frames_after_eos)

    # ----------------------------------------------------------------- export

    def export_model_state(self, state: StackState, dest: str | Path) -> None:
        export_model_state(state, dest)
