"""HTTP server integration: /health, /, /metrics, utterance retry, and a
streamed /tts request producing a valid 24 kHz mono WAV (mirrors reference
test_cli_generate WAV checks, plus the SURVEY §5 observability additions)."""

import json
import threading
import urllib.request
import wave
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from small_model import build_small_tts_model

from pocket_tts_tpu.api.server import ServingMetrics, make_handler


@pytest.fixture(scope="module")
def server():
    model = build_small_tts_model()
    rng = np.random.default_rng(0)
    voice_wav = (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    state = model.state_for_audio_array(voice_wav)
    model._voice_state_cache["alba|True"] = state  # avoid network voice fetch
    metrics = ServingMetrics()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(model, "alba", metrics))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", model, metrics
    httpd.shutdown()


def test_health(server):
    url, _, _ = server
    with urllib.request.urlopen(url + "/health") as r:
        assert r.status == 200
        assert b"ok" in r.read()


def test_index(server):
    url, _, _ = server
    with urllib.request.urlopen(url + "/") as r:
        body = r.read()
        assert b"<html" in body.lower()


def test_tts_streams_valid_wav(server, tmp_path):
    url, model, _ = server
    data = b"text=Hello+world+this+is+a+test"
    req = urllib.request.Request(
        url + "/tts", data=data,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()
    p = tmp_path / "out.wav"
    p.write_bytes(body)
    with wave.open(str(p)) as w:
        assert w.getframerate() == model.sample_rate
        assert w.getnchannels() == 1
        frames = w.readframes(-1)
    samples = np.frombuffer(frames, np.int16)
    assert samples.size > model.sample_rate // 10  # >0.1 s incl. trailing silence


def test_index_has_voice_field_and_catalog(server):
    """The embedded web UI exposes voice selection like the reference page
    (reference static/index.html:35-60): a voice-URL input with the predefined
    catalog documented in-page, and a file upload for voice cloning."""
    url, _, _ = server
    with urllib.request.urlopen(url + "/") as r:
        body = r.read().decode()
    assert 'id="voice-url"' in body
    assert 'id="voice-wav"' in body
    assert "voice_url" in body  # the JS actually posts the field
    from pocket_tts_tpu.core.hub import PREDEFINED_VOICE_ORIGINS

    for name in ("alba", "javert"):
        assert name in PREDEFINED_VOICE_ORIGINS and name in body


def test_tts_voice_url_roundtrip_via_form(server):
    """A voice_url posted through the UI's multipart form reaches the voice
    cache and yields a valid WAV (the UI form path end-to-end)."""
    url, model, _ = server
    # a second cached voice under the name the form will reference
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    model._voice_state_cache["javert|True"] = model.state_for_audio_array(wav)
    boundary = "XBOUNDARYX"
    parts = []
    for name, value in (("text", "Voice url form check"), ("voice_url", "javert")):
        parts.append(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{name}"\r\n\r\n{value}\r\n'
        )
    body = ("".join(parts) + f"--{boundary}--\r\n").encode()
    req = urllib.request.Request(
        url + "/tts", data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        wav_bytes = r.read()
    assert wav_bytes[:4] == b"RIFF"
    # the hit moved "javert" to most-recently-used (true LRU)
    assert list(model._voice_state_cache)[-1] == "javert|True"


def test_voice_cache_is_true_lru():
    """A,B,A,C access pattern: the C miss must evict B (least recently used),
    not A — the reference's functools.lru_cache(2) behavior."""
    model = build_small_tts_model()
    built: list[str] = []

    def fake_build(key, truncate=False):
        built.append(key)
        return object()

    model.get_state_for_audio_prompt = fake_build
    for key in ("A", "B", "A", "C"):
        model.cached_get_state_for_audio_prompt(key)
    assert built == ["A", "B", "C"]
    assert set(model._voice_state_cache) == {"A|False", "C|False"}
    # A stays hot: accessing it again must not rebuild
    model.cached_get_state_for_audio_prompt("A")
    assert built == ["A", "B", "C"]


def test_tts_missing_text(server):
    url, _, _ = server
    req = urllib.request.Request(
        url + "/tts", data=b"",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_metrics_after_request(server):
    """/metrics exposes per-stage timings + rates once a /tts succeeded
    (SURVEY §5 observability: tokens/s, frames/s, audio-s/s)."""
    url, _, metrics = server
    req = urllib.request.Request(
        url + "/tts", data=b"text=Metrics+check+sentence",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        r.read()
    with urllib.request.urlopen(url + "/metrics") as r:
        snap = json.loads(r.read())
    assert snap["requests"] >= 1
    last = snap["last_request"]
    for key in ("voice_ms", "first_chunk_ms", "total_ms", "tokens_per_s",
                "frames_per_s", "audio_s_per_s", "audio_s_per_s_per_chip"):
        assert key in last, key
    assert last["audio_s"] > 0
    assert last["first_chunk_ms"] is not None
    assert snap["overall_audio_s_per_s"] > 0
    # in-process aggregate agrees with the HTTP view
    assert metrics.snapshot()["requests"] == snap["requests"]


def test_retry_recovers_transient_failure(server):
    """Utterance-level retry: a generation that dies before the first audio
    byte is retried transparently and the request still succeeds."""
    url, model, metrics = server
    real = model.generate_audio_stream
    calls = {"n": 0}

    def flaky(state, text, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated transient device failure")
        yield from real(state, text, **kw)

    model.generate_audio_stream = flaky
    try:
        before = metrics.snapshot()["retries"]
        req = urllib.request.Request(
            url + "/tts", data=b"text=Retry+check+sentence",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            body = r.read()
        assert body[:4] == b"RIFF"
        assert calls["n"] == 2
        assert metrics.snapshot()["retries"] == before + 1
    finally:
        model.generate_audio_stream = real


def test_retry_with_held_first_chunk_no_duplicate_audio(server, monkeypatch, tmp_path):
    """FIRST_CHUNK_LENGTH_SECONDS > 0 holds PCM in the writer; a first attempt
    that emits chunks into the hold buffer and THEN dies must be retried (no
    byte reached the client) and the held bytes must not replay — the final
    WAV contains exactly one generation's audio."""
    import wave

    url, model, metrics = server
    real = model.generate_audio_stream
    calls = {"n": 0}

    def flaky(state, text, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # emit a couple of real chunks (they land in the hold buffer,
            # never the socket), then die
            it = real(state, text, **kw)
            yield next(it)
            yield next(it)
            raise RuntimeError("simulated mid-hold device failure")
        yield from real(state, text, **kw)

    # hold ~10 s of audio: far more than the toy generation produces, so every
    # first-attempt chunk is guaranteed to still be held at failure time
    monkeypatch.setenv("FIRST_CHUNK_LENGTH_SECONDS", "10")
    model.generate_audio_stream = flaky
    try:
        req = urllib.request.Request(
            url + "/tts", data=b"text=Held+retry+check",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            body = r.read()
        assert calls["n"] == 2
        p = tmp_path / "held.wav"
        p.write_bytes(body)
        with wave.open(str(p)) as w:
            samples = np.frombuffer(w.readframes(-1), np.int16)
        # reference single-shot generation of the same text through the same
        # pipeline: retried output = one generation + 0.2 s silence tail
        single = model.generate_audio(
            model._voice_state_cache["alba|True"], "Held retry check")
        tail = int(0.2 * model.sample_rate)
        assert samples.size == single.shape[0] + tail, (
            samples.size, single.shape[0], tail)
    finally:
        model.generate_audio_stream = real
