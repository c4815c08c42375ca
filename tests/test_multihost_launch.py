"""Multi-host DP serving driver: 2 coordinated `jax.distributed` processes
(CPU backend, gloo collectives) serve one utterance batch — process 0
broadcasts the batch over DCN, each process decodes its row slice on its local
devices, audio gathers back, and a global-mesh heartbeat brackets the run.
Sharding the batch over processes must not change the audio (per-global-row
noise streams), so the 2-process run is checked against a 1-process run.

The reference's only scale-out analog is process-per-language replication
behind Traefik (/root/reference/swarm-config.yaml) — independent servers, no
shared deployment; this driver is new capability (SURVEY §2.5)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
TAG = "MULTIHOST_RESULT "


def _launch(processes: int, utterances: int = 4) -> dict:
    cmd = [
        sys.executable, "-m", "pocket_tts_tpu.parallel.launch",
        "--processes", str(processes), "--cpu", "2", "--tiny",
        "--utterances", str(utterances), "--seed", "3",
    ]
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    for line in out.stdout.splitlines():
        if line.startswith(TAG):
            return json.loads(line[len(TAG):])
    raise AssertionError(f"no result line in output:\n{out.stdout}\n{out.stderr}")


@pytest.fixture(scope="module")
def two_proc():
    return _launch(processes=2)


def test_two_process_dp_serving(two_proc):
    r = two_proc
    assert r["processes"] == 2
    assert r["audio_rows"] == 4
    assert r["rows_per_process"] == 2
    assert r["global_devices"] == 4  # 2 processes x 2 virtual devices
    assert r["mesh_healthy"] is True
    assert all(s > 0 for s in r["row_samples"])


def _launch_with_fault(tmp_path, processes, utterances, fail_point):
    marker = tmp_path / "crash.marker"
    cmd = [
        sys.executable, "-m", "pocket_tts_tpu.parallel.launch",
        "--processes", str(processes), "--cpu", "2", "--tiny",
        "--utterances", str(utterances), "--seed", "3",
        "--fail-once-marker", str(marker), "--fail-point", fail_point,
    ]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                         timeout=540)
    assert out.returncode == 0, out.stdout + out.stderr
    assert marker.exists()  # the injected crash really happened
    assert "relaunching" in out.stderr
    report = None
    for line in out.stdout.splitlines():
        if line.startswith(TAG):
            report = json.loads(line[len(TAG):])
    assert report is not None
    assert report["attempts"] == 2
    assert report["mesh_healthy"] and all(s > 0 for s in report["row_samples"])
    return report


def test_worker_failure_recovers_by_relaunch(tmp_path):
    """Failure recovery at deployment scope (SURVEY §5): a worker process dies
    on the first job attempt (fault-injected at init); the launcher terminates
    the peers, relaunches once — inference is stateless, so the batch simply
    re-decodes — and the job completes with attempts=2."""
    report = _launch_with_fault(tmp_path, processes=2, utterances=2,
                                fail_point="init")
    # the crash happened before anyone decoded: attempt 2 decodes every row
    assert report["rows_decoded"] == 2


def test_row_level_recovery_four_processes(tmp_path, two_proc):
    """Row-level recovery (N=4): worker 1 crashes AFTER every worker decoded
    and persisted its row (post-barrier), deleting its own saved row first.
    The relaunch must re-decode ONLY that row — the other three are served
    from the shared results dir — and the recovered audio must be
    bit-identical to the healthy 2-process run of the same batch."""
    report = _launch_with_fault(tmp_path, processes=4, utterances=4,
                                fail_point="after_decode")
    assert report["processes"] == 4
    assert report["rows_per_process"] == 1
    assert report["rows_decoded"] == 1  # only the deleted row re-decodes
    assert report["row_samples"] == two_proc["row_samples"]
    assert report["audio_checksum"] == pytest.approx(
        two_proc["audio_checksum"], rel=1e-5
    )


def test_process_sharding_is_audio_invariant(two_proc):
    """The same batch through 1 process and 2 processes yields identical audio
    (identical per-row noise + voices + tokens; only the process sharding
    differs) — the DP-correctness contract of the serving driver."""
    r1 = _launch(processes=1)
    assert r1["row_samples"] == two_proc["row_samples"]
    assert r1["audio_checksum"] == pytest.approx(
        two_proc["audio_checksum"], rel=1e-5
    )
