"""Multi-host data-parallel serving driver.

The reference scales out by running one independent server process per language
behind a load balancer (/root/reference/swarm-config.yaml); this is the
TPU-native replacement: N coordinated `jax.distributed` processes (one per
host) serving ONE logical deployment —

  1. every process calls `jax.distributed.initialize` (multihost.py) so
     `jax.devices()` spans the job;
  2. process 0 owns the utterance batch and broadcasts it over DCN
     (`multihost_utils.broadcast_one_to_all` — the "scatter" of DP serving);
  3. each process decodes its contiguous slice of rows on its local chips
     (data parallelism is process-local by construction: no cross-host
     collectives in the decode loop, which is what makes DP the right scaling
     axis for utterance batches — see docs/scaling.md);
  4. the audio gathers back to every process over DCN
     (`multihost_utils.process_allgather`), and process 0 reports;
  5. a global-mesh psum heartbeat (multihost.assert_mesh_healthy) verifies
     every chip in the job is alive before and after the batch.

Run as a module:

  # production (one process per TPU host; env provides the coordinator):
  python -m pocket_tts_tpu.parallel.launch --worker --language english ...

  # local bring-up / CI: spawn N CPU-backend processes on this machine
  python -m pocket_tts_tpu.parallel.launch --processes 2 --cpu 2 --tiny \
      --utterances 4

The spawning mode is also how `__graft_entry__.dryrun_multichip` validates the
multi-process path without multi-host hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

MULTIHOST_TAG = "MULTIHOST_RESULT "


def _tiny_config():
    """Flagship-shaped model at toy dims (same as __graft_entry__'s dryrun)."""
    from pocket_tts_tpu.config import CONFIGS_DIR, Config, load_config

    d = load_config(CONFIGS_DIR / "english.yaml").model_dump()
    d["flow_lm"]["transformer"].update(d_model=64, num_heads=4, num_layers=2,
                                       hidden_scale=2)
    d["flow_lm"]["flow"].update(dim=48, depth=2)
    d["flow_lm"]["lookup_table"].update(n_bins=31)
    d["mimi"]["seanet"].update(dimension=64, n_filters=8)
    d["mimi"]["transformer"].update(d_model=64, num_heads=4, dim_feedforward=128,
                                    input_dimension=64, output_dimensions=(64,),
                                    context=30)
    d["mimi"]["quantizer"].update(dimension=8, output_dimension=64)
    d["mimi"]["inner_dim"] = 8
    d["mimi"]["outer_dim"] = 64
    d["weights_path"] = None
    return Config(**d)


def _build_model(args):
    from pocket_tts_tpu.pipeline.tts import GenerationParams, TTSModel

    if args.tiny:
        import jax

        from pocket_tts_tpu.models.flow_lm import (
            build_flow_lm_specs,
            init_flow_lm_params,
        )
        from pocket_tts_tpu.models.mimi import build_mimi_specs, init_mimi_params

        cfg = _tiny_config()
        specs = build_flow_lm_specs(cfg)
        mimi_specs = build_mimi_specs(cfg.mimi)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return TTSModel(specs, mimi_specs, init_flow_lm_params(specs, k1),
                        init_mimi_params(mimi_specs, k2), tokenizer=None,
                        config=cfg, gen_params=GenerationParams())
    return TTSModel.load_model(language=args.language, config=args.config,
                               allow_random_init=args.allow_random_init,
                               param_dtype=args.dtype)


def run_worker(args) -> dict:
    """One process of the DP serving job. Returns the report dict
    (identical on every process; only process 0 prints it)."""
    # backend setup must precede any device use; the container sitecustomize
    # pins the platform, so force it via config like tests/conftest.py
    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    # fault injection for the recovery tests: worker 1 dies once, leaving a
    # marker so the retry attempt proceeds. fail_point "init" dies before
    # joining the job; "after_decode" dies after every worker has decoded AND
    # saved its rows (post-barrier), deleting its own saved rows first — so
    # the relaunch demonstrably re-decodes ONLY those rows.
    def _maybe_crash(point: str, cleanup=None):
        if (args.fail_once_marker and args.process_id == 1
                and args.fail_point == point
                and not os.path.exists(args.fail_once_marker)):
            if cleanup is not None:
                cleanup()
            with open(args.fail_once_marker, "w") as f:
                f.write("crashed")
            raise RuntimeError(f"injected worker failure ({point})")

    _maybe_crash("init")

    from pocket_tts_tpu.parallel.multihost import (
        assert_mesh_healthy,
        initialize_multihost,
    )

    info = initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from pocket_tts_tpu.pipeline.tts import NoiseSource

    n_proc = info["process_count"]
    pid = info["process_index"]
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    if not assert_mesh_healthy(mesh):
        raise RuntimeError("mesh heartbeat failed before serving")

    model = _build_model(args)

    # ---- ingest: process 0 owns the batch; broadcast it over DCN ----
    B = args.utterances
    if B % n_proc:
        raise ValueError(f"--utterances {B} must divide over {n_proc} processes")
    tok_len = args.prompt_tokens
    if pid == 0:
        rng = np.random.default_rng(args.seed)
        token_batch = rng.integers(1, 30, size=(B, tok_len), dtype=np.int32)
    else:
        token_batch = np.zeros((B, tok_len), np.int32)
    token_batch = np.asarray(multihost_utils.broadcast_one_to_all(token_batch))

    # ---- local slice: rows [pid*local : (pid+1)*local] decode on this host ----
    local = B // n_proc
    rows = slice(pid * local, (pid + 1) * local)
    rng = np.random.default_rng(1000 + args.seed)  # same voices everywhere
    voice_wavs = (rng.standard_normal((B, 1, 1, 3000)) * 0.1).astype(np.float32)

    # Row-level recovery: with --results-dir, every decoded GLOBAL row is
    # persisted as row_{g}.npy; a job relaunch after a worker failure loads
    # the survivors and re-decodes ONLY the missing rows (per-global-row
    # noise streams make cached and re-decoded rows bit-identical).
    def _row_path(g: int) -> str:
        return os.path.join(args.results_dir, f"row_{g}.npy")

    audio_rows: dict[int, np.ndarray] = {}
    missing = list(range(local))
    if args.results_dir:
        os.makedirs(args.results_dir, exist_ok=True)
        missing = []
        for i in range(local):
            try:
                audio_rows[i] = np.load(_row_path(rows.start + i))
            except Exception:
                missing.append(i)

    t0 = time.monotonic()
    if missing:
        states = [model.state_for_audio_array(voice_wavs[rows.start + i])
                  for i in missing]
        token_lists = [token_batch[rows.start + i].tolist() for i in missing]

        # per-GLOBAL-row noise streams: the audio is then invariant to how
        # many processes the batch is sharded over (tested: 1-proc == N-proc)
        row_noise = [NoiseSource(model.gen, seed=args.seed + 7919 * (rows.start + i))
                     for i in missing]

        def batch_noise(shape):
            if len(shape) == 3:  # scan block [K, B, L]: row streams advance per step
                K, Bl, L = shape
                return np.stack(
                    [np.stack([row_noise[b]((L,)) for b in range(Bl)])
                     for _ in range(K)]
                )
            Bl, L = shape
            return np.stack([row_noise[b]((L,)) for b in range(Bl)])

        decoded = model.generate_audio_batch(
            states, token_lists, frames_after_eos=2, noise_source=batch_noise,
        )
        for i, a in zip(missing, decoded):
            audio_rows[i] = a
            if args.results_dir:
                np.save(_row_path(rows.start + i), a)
    decode_s = time.monotonic() - t0
    audio = [audio_rows[i] for i in range(local)]

    # barrier: every worker's rows are decoded AND persisted before anyone
    # proceeds to the gather (also where the deterministic fault injection
    # for the row-recovery test lands — see _maybe_crash)
    multihost_utils.sync_global_devices("rows_persisted")
    _maybe_crash("after_decode", cleanup=lambda: [
        os.remove(_row_path(rows.start + i))
        for i in range(local)
        if args.results_dir and os.path.exists(_row_path(rows.start + i))
    ])

    # ---- egress: gather every host's rows back over DCN ----
    max_len = model._estimate_max_gen_len(tok_len) * model.samples_per_frame
    padded = np.zeros((local, max_len), np.float32)
    lengths = np.zeros((local,), np.int32)
    for i, a in enumerate(audio):
        lengths[i] = min(len(a), max_len)
        padded[i, : lengths[i]] = a[: lengths[i]]
    all_audio = np.asarray(multihost_utils.process_allgather(jnp.asarray(padded)))
    all_lengths = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(lengths))
    ).reshape(-1)
    all_audio = all_audio.reshape(B, max_len)

    healthy = assert_mesh_healthy(mesh)
    rows_decoded = int(np.asarray(multihost_utils.process_allgather(
        jnp.asarray([len(missing)], jnp.int32))).sum())
    report = {
        "processes": n_proc,
        "audio_rows": int(B),
        "rows_per_process": int(local),
        "rows_decoded": rows_decoded,  # this attempt (rest served from cache)
        "global_devices": len(jax.devices()),
        "row_samples": all_lengths.tolist(),
        "audio_checksum": round(float(np.abs(all_audio).sum()), 4),
        "mesh_healthy": bool(healthy),
        "decode_s": round(decode_s, 3),
    }
    if pid == 0:
        print(MULTIHOST_TAG + json.dumps(report), flush=True)
        if args.out:
            from pocket_tts_tpu.io.audio import StreamingWAVWriter

            with open(args.out, "wb") as f:
                w = StreamingWAVWriter(f, model.sample_rate)
                w.write_header(model.sample_rate)
                for b in range(B):
                    w.write_pcm_data(all_audio[b, : all_lengths[b]])
                w.finalize()
    return report


def _spawn_once(args) -> dict:
    import socket

    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    cmd_base = [
        sys.executable, "-m", "pocket_tts_tpu.parallel.launch", "--worker",
        "--coordinator", f"127.0.0.1:{port}",
        "--processes", str(args.processes),
        "--cpu", str(args.cpu or 2),
        "--utterances", str(args.utterances),
        "--prompt-tokens", str(args.prompt_tokens),
        "--seed", str(args.seed),
    ]
    if args.tiny:
        cmd_base.append("--tiny")
    else:
        if args.language:
            cmd_base += ["--language", args.language]
        if args.config:
            cmd_base += ["--config", str(args.config)]
        if args.allow_random_init:
            cmd_base.append("--allow-random-init")
    if args.out:
        cmd_base += ["--out", args.out]
    if args.results_dir:
        cmd_base += ["--results-dir", args.results_dir]
    if args.fail_once_marker:
        cmd_base += ["--fail-once-marker", args.fail_once_marker,
                     "--fail-point", args.fail_point]

    procs = []
    for pid in range(args.processes):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(subprocess.Popen(
            cmd_base + ["--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
        ))
    # supervise: the moment any worker dies, terminate the rest (they would
    # otherwise block in jax.distributed init / heartbeats for minutes)
    deadline = time.monotonic() + args.timeout
    failed = None
    while any(p.poll() is None for p in procs):
        if time.monotonic() > deadline:
            for p in procs:
                p.terminate()
            raise subprocess.TimeoutExpired("launch workers", args.timeout)
        for pid, p in enumerate(procs):
            rc = p.poll()
            if rc is not None and rc != 0 and failed is None:
                failed = (pid, rc)
                for q in procs:
                    if q.poll() is None:
                        q.terminate()
        time.sleep(0.2)
    report = None
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate()
        outs.append(out or "")
        if p.returncode != 0 and failed is None and p.returncode is not None:
            failed = (pid, p.returncode)
        for line in (out or "").splitlines():
            if line.startswith(MULTIHOST_TAG):
                report = json.loads(line[len(MULTIHOST_TAG):])
    if failed is not None:
        for o in outs:
            sys.stderr.write(o)
        raise RuntimeError(f"worker {failed[0]} exited with {failed[1]}")
    if report is None:
        for o in outs:
            sys.stderr.write(o)
        raise RuntimeError("no worker reported a result")
    return report


def spawn_local(args) -> dict:
    """Spawn --processes CPU-backend workers of this module on this machine
    (bring-up / CI mode) and return process 0's report.

    Failure recovery at deployment scope (SURVEY §5): inference is stateless —
    weights reload, voice states rebuild — so a worker dying (the
    jax.distributed health check then tears the whole job down) is recovered
    by relaunching the job. Recovery is ROW-level, not job-level: each
    attempt persists every decoded row to a shared results dir, so a relaunch
    re-decodes only the rows the failed attempt didn't finish. `--retries`
    bounds the relaunches."""
    if args.results_dir is None and args.retries > 0:
        import tempfile

        args.results_dir = tempfile.mkdtemp(prefix="ptts_rows_")
    last = None
    for attempt in range(args.retries + 1):
        try:
            report = _spawn_once(args)
            report["attempts"] = attempt + 1
            print(MULTIHOST_TAG + json.dumps(report), flush=True)
            return report
        except (RuntimeError, subprocess.TimeoutExpired) as e:
            last = e
            if attempt < args.retries:
                print(f"job attempt {attempt + 1} failed ({e}); relaunching",
                      file=sys.stderr, flush=True)
    raise last


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pocket-tts-tpu-launch",
        description="multi-host data-parallel TTS serving driver",
    )
    p.add_argument("--worker", action="store_true",
                   help="run as one worker process (else: spawn local workers)")
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (auto-detected on TPU pods)")
    p.add_argument("--cpu", type=int, default=0,
                   help="force the CPU backend with N virtual devices/process")
    p.add_argument("--tiny", action="store_true",
                   help="toy flagship-shaped model (bring-up / CI)")
    p.add_argument("--language", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--allow-random-init", action="store_true")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--utterances", type=int, default=4,
                   help="global batch size (must divide across processes)")
    p.add_argument("--prompt-tokens", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="concatenated WAV (process 0)")
    p.add_argument("--timeout", type=float, default=600.0)
    p.add_argument("--retries", type=int, default=1,
                   help="job relaunches after a worker failure (row-level: "
                        "completed rows are cached in --results-dir)")
    p.add_argument("--results-dir", default=None,
                   help="shared dir persisting per-row audio across attempts "
                        "(auto tempdir in spawn mode when retries > 0)")
    p.add_argument("--fail-once-marker", default=None,
                   help=argparse.SUPPRESS)  # fault injection (tests)
    p.add_argument("--fail-point", default="init",
                   choices=("init", "after_decode"),
                   help=argparse.SUPPRESS)  # fault injection (tests)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.worker:
        run_worker(args)
        return 0
    spawn_local(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
