"""HTTP server integration: /health, /, and a streamed /tts request producing a
valid 24 kHz mono WAV (mirrors reference test_cli_generate WAV checks)."""

import threading
import urllib.request
import wave
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from small_model import build_small_tts_model

from pocket_tts_tpu.api.server import make_handler


@pytest.fixture(scope="module")
def server():
    model = build_small_tts_model()
    rng = np.random.default_rng(0)
    voice_wav = (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    state = model.state_for_audio_array(voice_wav)
    model._voice_state_cache["alba|True"] = state  # avoid network voice fetch
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(model, "alba"))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", model
    httpd.shutdown()


def test_health(server):
    url, _ = server
    with urllib.request.urlopen(url + "/health") as r:
        assert r.status == 200
        assert b"ok" in r.read()


def test_index(server):
    url, _ = server
    with urllib.request.urlopen(url + "/") as r:
        body = r.read()
        assert b"<html" in body.lower()


def test_tts_streams_valid_wav(server, tmp_path):
    url, model = server
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


def test_tts_missing_text(server):
    url, _ = server
    req = urllib.request.Request(
        url + "/tts", data=b"",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
