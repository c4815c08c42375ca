"""Doc-drift tests: the code blocks in README.md and docs/*.md are extracted
and executed (offline-safe), so documentation rots loudly.

Same idea as the reference's test_documentation_examples.py (161 LoC, which
re-runs README snippets against the live package): we exec the documented
*python lines verbatim*, substituting only the network-bound pieces
(load_model -> offline small config; hf:// voice -> local random wav), and we
parse the documented CLI invocations against the real argparse tree so a
renamed flag or subcommand fails the suite.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import pytest

from small_model import build_small_tts_model

REPO = Path(__file__).parent.parent


def _code_blocks(path: Path, lang: str) -> list[str]:
    text = path.read_text()
    return re.findall(rf"```{lang}\n(.*?)```", text, re.DOTALL)


# --------------------------------------------------------------------- README


def test_readme_has_python_and_bash_blocks():
    blocks_py = _code_blocks(REPO / "README.md", "python")
    blocks_sh = _code_blocks(REPO / "README.md", "bash")
    assert blocks_py, "README lost its python usage example"
    assert blocks_sh, "README lost its bash blocks"


def test_readme_python_usage_executes():
    """Execute the README usage block line-for-line with offline stand-ins for
    the two network touchpoints (weights download, hf:// voice wav)."""
    [block] = [b for b in _code_blocks(REPO / "README.md", "python")
               if "TTSModel" in b]

    offline = build_small_tts_model()
    rng = np.random.default_rng(0)
    voice_wav = (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)

    class _OfflineTTSModel:
        @staticmethod
        def load_model(*a, **kw):
            return offline

    real_get_state = offline.get_state_for_audio_prompt
    # the documented call passes an hf:// URL; serve it from the local array
    offline.get_state_for_audio_prompt = lambda *a, **kw: offline.state_for_audio_array(
        voice_wav
    )
    played = []
    ns = {
        "play": played.append,  # the docs' placeholder playback callback
        "__name__": "readme_example",
    }
    import pocket_tts_tpu

    real_cls = pocket_tts_tpu.TTSModel
    pocket_tts_tpu.TTSModel = _OfflineTTSModel
    try:
        exec(compile(block, "README.md", "exec"), ns)
    finally:
        pocket_tts_tpu.TTSModel = real_cls
        offline.get_state_for_audio_prompt = real_get_state

    audio = ns["audio"]
    assert isinstance(audio, np.ndarray) and audio.ndim == 1 and audio.size > 0
    assert audio.dtype == np.float32
    assert played and all(isinstance(c, np.ndarray) for c in played)


def test_readme_cli_lines_parse():
    """Every documented `python -m pocket_tts_tpu ...` invocation must be
    accepted by the real argparse tree."""
    from pocket_tts_tpu.api.cli import build_parser

    parser = build_parser()
    lines = []
    launch_lines = []
    for block in _code_blocks(REPO / "README.md", "bash"):
        for line in block.splitlines():
            line = line.strip()
            if line.startswith("python -m pocket_tts_tpu.parallel.launch"):
                line = line.split("#")[0]
                launch_lines.append(
                    line.removeprefix("python -m pocket_tts_tpu.parallel.launch").strip())
            elif line.startswith("python -m pocket_tts_tpu"):
                line = line.split("#")[0]  # strip trailing doc comments
                lines.append(line.removeprefix("python -m pocket_tts_tpu").strip())
    assert lines, "README lost its CLI examples"
    import shlex

    for line in lines:
        args = parser.parse_args(shlex.split(line))
        assert args.command in ("generate", "serve", "export-voice"), line

    # the multi-host launcher examples parse against its own argparse tree
    from pocket_tts_tpu.parallel.launch import build_parser as launch_parser

    assert launch_lines, "README lost its multi-host launcher examples"
    for line in launch_lines:
        launch_parser().parse_args(shlex.split(line))


def test_readme_pytest_line_matches_reality():
    blocks = _code_blocks(REPO / "README.md", "bash")
    joined = "\n".join(blocks)
    assert "pytest tests/" in joined


# ---------------------------------------------------------------------- docs/


def test_quantization_doc_commands_parse():
    """docs/quantization.md documents evaluate_quantization.py invocations;
    its flags must exist on the real parser."""
    doc = (REPO / "docs" / "quantization.md").read_text()
    flags = set(re.findall(r"--[a-z-]+", doc))
    import importlib.util
    import shlex

    spec = importlib.util.spec_from_file_location(
        "evalq", REPO / "scripts" / "evaluate_quantization.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    parser_actions = set()
    # reach the parser by parsing the documented command lines directly
    for block in _code_blocks(REPO / "docs" / "quantization.md", "bash"):
        for line in block.splitlines():
            line = line.strip()
            if "evaluate_quantization.py" in line:
                argv = shlex.split(line)[2:]  # drop "python script.py"
                ns = mod.parse_args(argv) if hasattr(mod, "parse_args") else None
                if ns is None:
                    pytest.skip("script exposes no parse_args; flags checked textually")
                parser_actions.add(tuple(sorted(vars(ns))))
    assert parser_actions, "quantization doc lost its command examples"
    assert "--random-init" in flags


def test_scaling_doc_dryrun_command_is_current():
    """docs/scaling.md tells users to run __graft_entry__.py on a virtual CPU
    mesh; the entry point and its two functions must exist as documented."""
    doc = (REPO / "docs" / "scaling.md").read_text()
    assert "__graft_entry__.py" in doc
    import __graft_entry__ as g

    assert callable(g.entry) and callable(g.dryrun_multichip)


def test_architecture_doc_names_real_modules():
    """Module paths cited in docs/architecture.md must exist (drift check for
    renames)."""
    doc = (REPO / "docs" / "architecture.md").read_text()
    # citations are package-relative ("nn/attention.py"); resolve both bare
    # and pocket_tts_tpu/-prefixed forms
    cited = set(re.findall(r"(?:[a-z_0-9]+/)+[a-z_0-9]+\.py", doc))
    assert cited, "architecture doc no longer cites concrete modules"
    missing = [
        c for c in cited
        if not (REPO / c).exists() and not (REPO / "pocket_tts_tpu" / c).exists()
    ]
    assert not missing, f"architecture.md cites nonexistent modules: {missing}"


# ----------------------------------------------------- quickstart / cli / api


def _sh_lines(path: Path, prefix: str) -> list[str]:
    """Documented shell invocations starting with `prefix`, with backslash
    continuations joined and comments stripped."""
    lines = []
    for block in _code_blocks(path, "bash"):
        joined = block.replace("\\\n", " ")
        for line in joined.splitlines():
            line = line.split("#")[0].strip()
            if line.startswith(prefix):
                lines.append(line.removeprefix(prefix).strip())
    return lines


def test_quickstart_python_usage_executes():
    """The quickstart's Python block runs verbatim with offline stand-ins for
    the two network touchpoints (checkpoint download, catalog voice)."""
    quickstart = REPO / "docs" / "quickstart.md"
    blocks = [b for b in _code_blocks(quickstart, "python") if "TTSModel" in b]
    assert blocks, "quickstart lost its python usage block"

    offline = build_small_tts_model()
    rng = np.random.default_rng(0)
    voice_wav = (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    offline_get_state = offline.get_state_for_audio_prompt
    offline.get_state_for_audio_prompt = (
        lambda *a, **kw: offline.state_for_audio_array(voice_wav))

    class _OfflineTTSModel:
        @staticmethod
        def load_model(*a, **kw):
            return offline

    played = []
    import pocket_tts_tpu

    real_cls = pocket_tts_tpu.TTSModel
    pocket_tts_tpu.TTSModel = _OfflineTTSModel
    try:
        for block in blocks:
            ns = {"play": played.append, "__name__": "quickstart_example"}
            exec(compile(block, "quickstart.md", "exec"), ns)
    finally:
        pocket_tts_tpu.TTSModel = real_cls
        offline.get_state_for_audio_prompt = offline_get_state

    assert played, "quickstart stream loop produced no chunks"
    assert all(isinstance(c, np.ndarray) and c.dtype == np.float32
               for c in played)


def test_quickstart_and_cli_doc_invocations_parse():
    """Every `python -m pocket_tts_tpu ...` line in quickstart.md and cli.md
    must be accepted by the real argparse tree (a renamed flag or subcommand
    fails the suite)."""
    import shlex

    from pocket_tts_tpu.api.cli import build_parser

    parser = build_parser()
    n = 0
    for doc in ("quickstart.md", "cli.md"):
        for line in _sh_lines(REPO / "docs" / doc, "python -m pocket_tts_tpu"):
            if line.startswith((".", "_")):  # submodule invocations
                continue
            # pipelines: parse only the segment belonging to our CLI
            line = line.split("|")[0].strip()
            args = parser.parse_args(shlex.split(line))
            assert args.command in ("generate", "serve", "export-voice")
            n += 1
    assert n >= 6, "docs lost their CLI examples"


def test_cli_doc_covers_every_flag():
    """cli.md must document every flag the parser actually exposes (drift in
    EITHER direction fails: a new undocumented flag, or a documented flag
    that no longer exists)."""
    from pocket_tts_tpu.api.cli import build_parser

    doc = (REPO / "docs" / "cli.md").read_text()
    documented = set(re.findall(r"--[a-z][a-z0-9-]+", doc))
    real = set()
    parser = build_parser()
    subparsers = next(a for a in parser._actions
                      if isinstance(a, __import__("argparse")._SubParsersAction))
    for p in [parser, *subparsers.choices.values()]:
        for action in p._actions:
            for opt in action.option_strings:
                if opt.startswith("--"):
                    real.add(opt)
    real.discard("--help")
    missing = real - documented
    stale = documented - real
    assert not missing, f"cli.md does not document: {sorted(missing)}"
    assert not stale, f"cli.md documents nonexistent flags: {sorted(stale)}"


def test_api_doc_names_real_methods():
    """Every `model.<name>(` / property cited in api.md must exist on
    TTSModel, and the documented package exports must be importable."""
    import pocket_tts_tpu
    from pocket_tts_tpu.pipeline.tts import TTSModel

    doc = (REPO / "docs" / "api.md").read_text()
    methods = set(re.findall(r"model\.([a-z_0-9]+)\(", doc))
    methods |= set(re.findall(r"TTSModel\.([a-z_0-9]+)\(", doc))
    assert "load_model" in methods and "generate_audio_stream" in methods
    missing = [m for m in methods if not hasattr(TTSModel, m)]
    assert not missing, f"api.md cites nonexistent methods: {missing}"
    for prop in ("sample_rate", "frame_rate", "samples_per_frame", "temp",
                 "lsd_decode_steps", "noise_clamp", "eos_threshold", "device"):
        assert prop in doc and hasattr(TTSModel, prop)
    assert hasattr(pocket_tts_tpu, "TTSModel")
    assert hasattr(pocket_tts_tpu, "export_model_state")
