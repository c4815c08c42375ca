"""The one-command real-weights parity harness must be runnable offline.

tools/real_weights_parity.py closes BASELINE's "waveform allclose against the
published checkpoints" target the first time it runs with network access; this
smoke test proves the harness end-to-end on the test suite's random-weight
reference so that online run is a pure artifact swap.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))


def test_offline_smoke_passes(tmp_path, capsys):
    import real_weights_parity as tool

    out = tmp_path / "report.json"
    rc = tool.main(["--offline-smoke", "--out", str(out)])
    assert rc == 0
    reports = json.loads(out.read_text())
    assert len(reports) == 1
    r = reports[0]
    assert r["passed"] and r["allclose"] and r["noise_sensitive"]
    assert r["ref_samples"] == r["our_samples"] > 0
    assert r["mean_abs_err"] < tool.MEAN_TOL
    # the guard stream really broke the agreement (codec is noise-sensitive)
    assert r["other_noise_mean_err"] > tool.SENSITIVITY_FLOOR


def test_online_entrypoint_wired():
    """The online path can't execute offline, but its surface must stay
    importable and callable so the first online round runs it unchanged."""
    import real_weights_parity as tool

    assert callable(tool.online)
    assert callable(tool.run_case)
    assert tool.RTOL > 0 and tool.ATOL > 0 and tool.SENSITIVITY_FLOOR > 0
