"""Streaming HTTP server (stdlib only).

Same surface as the reference FastAPI app (main.py:39-214):
  GET  /        — minimal web UI with streaming playback
  GET  /health  — liveness
  POST /tts     — multipart/form-data {text, voice_url | voice_wav} ->
                  chunked WAV stream

Generation runs while the response streams (chunked transfer encoding); voice
states for URL/name voices are LRU-cached on the model. Like the reference, one
model instance serves requests serially per worker thread — the ThreadingHTTP
server accepts concurrent connections but generation holds a lock (the reference
model is likewise "NOT thread-safe", tts_model.py:493-494).
"""

from __future__ import annotations

import io
import json
import logging
import re
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pocket_tts_tpu.io.audio import StreamingWAVWriter

logger = logging.getLogger(__name__)

INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>pocket-tts-tpu</title>
<style>
 body{font-family:system-ui;margin:2rem auto;max-width:40rem;padding:0 1rem}
 textarea{width:100%;height:6rem} button{padding:.5rem 1.5rem;margin-top:.5rem}
 #status{color:#555;margin-top:.5rem}
</style></head><body>
<h2>pocket-tts-tpu</h2>
<textarea id="text">__DEFAULT_TEXT__</textarea><br>
<button id="go">Speak</button>
<div id="status"></div>
<script>
// Streaming playback: read the chunked WAV body, strip the 44-byte header,
// and schedule int16 PCM chunks into WebAudio as they arrive.
const SAMPLE_RATE = 24000;
document.getElementById('go').onclick = async () => {
  const status = document.getElementById('status');
  status.textContent = 'generating…';
  const form = new FormData();
  form.append('text', document.getElementById('text').value);
  const t0 = performance.now();
  const resp = await fetch('/tts', {method: 'POST', body: form});
  const reader = resp.body.getReader();
  const ctx = new AudioContext({sampleRate: SAMPLE_RATE});
  let nextTime = ctx.currentTime + 0.1;
  let skipped = 0, carry = new Uint8Array(0), first = true;
  const parts = [];
  while (true) {
    const {done, value} = await reader.read();
    if (done) break;
    parts.push(value);
    let buf = new Uint8Array(carry.length + value.length);
    buf.set(carry); buf.set(value, carry.length);
    if (skipped < 44) {                        // WAV header
      const take = Math.min(44 - skipped, buf.length);
      buf = buf.subarray(take); skipped += take;
    }
    const usable = buf.length - (buf.length % 2);
    carry = buf.subarray(usable);
    if (usable === 0) continue;
    if (first) {
      status.textContent = `first audio in ${((performance.now()-t0)/1000).toFixed(2)}s`;
      first = false;
    }
    const pcm = new Int16Array(buf.buffer.slice(buf.byteOffset, buf.byteOffset + usable));
    const audioBuf = ctx.createBuffer(1, pcm.length, SAMPLE_RATE);
    const ch = audioBuf.getChannelData(0);
    for (let i = 0; i < pcm.length; i++) ch[i] = pcm[i] / 32768;
    const src = ctx.createBufferSource();
    src.buffer = audioBuf; src.connect(ctx.destination);
    nextTime = Math.max(nextTime, ctx.currentTime);
    src.start(nextTime);
    nextTime += audioBuf.duration;
  }
  const blob = new Blob(parts, {type: 'audio/wav'});
  const a = document.createElement('a');
  a.href = URL.createObjectURL(blob); a.download = 'tts.wav';
  a.textContent = 'download wav';
  status.appendChild(document.createTextNode(' — '));
  status.appendChild(a);
};
</script></body></html>
"""

DEFAULT_TEXT = "Hello world. I am a TPU-native streaming text to speech system."


def _parse_multipart(body: bytes, content_type: str) -> dict[str, bytes]:
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return {}
    boundary = b"--" + m.group(1).encode()
    fields: dict[str, bytes] = {}
    for part in body.split(boundary):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        header_blob, value = part.split(b"\r\n\r\n", 1)
        header = header_blob.decode("utf-8", "replace")
        name_m = re.search(r'name="([^"]+)"', header)
        if name_m:
            fields[name_m.group(1)] = value
    return fields


class _QueueWriter(io.RawIOBase):
    """File-like that forwards wav bytes to the HTTP chunked stream."""

    def __init__(self, wfile):
        self.wfile = wfile

    def write(self, data):
        if data:
            self.wfile.write(f"{len(data):x}\r\n".encode())
            self.wfile.write(data)
            self.wfile.write(b"\r\n")
            self.wfile.flush()
        return len(data)

    def close(self):
        pass


def make_handler(model, default_voice: str):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.address_string(), *args)

        def _cors(self):
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods", "GET, POST, OPTIONS")
            self.send_header("Access-Control-Allow-Headers", "Content-Type")

        def _send(self, code: int, body: bytes, ctype: str = "text/plain"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self._cors()
            self.end_headers()
            self.wfile.write(body)

        def do_OPTIONS(self):
            self.send_response(204)
            self._cors()
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_GET(self):
            if self.path == "/health":
                self._send(200, json.dumps({"status": "ok"}).encode(),
                           "application/json")
            elif self.path == "/":
                html = INDEX_HTML.replace("__DEFAULT_TEXT__", DEFAULT_TEXT)
                self._send(200, html.encode(), "text/html; charset=utf-8")
            else:
                self._send(404, b"not found")

        def do_POST(self):
            if self.path != "/tts":
                self._send(404, b"not found")
                return
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if ctype.startswith("multipart/form-data"):
                fields = _parse_multipart(body, ctype)
            else:
                from urllib.parse import parse_qs

                fields = {
                    k: v[0].encode() for k, v in parse_qs(body.decode()).items()
                }
            text = fields.get("text", b"").decode("utf-8", "replace").strip()
            if not text:
                self._send(400, b"missing 'text' form field")
                return
            voice_url = fields.get("voice_url", b"").decode() or None
            voice_wav = fields.get("voice_wav")
            if voice_url and voice_wav:
                self._send(400, b"voice_url and voice_wav are mutually exclusive")
                return

            try:
                with lock:
                    if voice_wav:
                        with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
                            tmp.write(voice_wav)
                            tmp.flush()
                            state = model.get_state_for_audio_prompt(
                                tmp.name, truncate=True
                            )
                    else:
                        state = model.cached_get_state_for_audio_prompt(
                            voice_url or default_voice, truncate=True
                        )

                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Transfer-Encoding", "chunked")
                    self._cors()
                    self.end_headers()

                    writer = StreamingWAVWriter(_QueueWriter(self.wfile),
                                                model.sample_rate)
                    writer.write_header(model.sample_rate)
                    for chunk in model.generate_audio_stream(state, text):
                        writer.write_pcm_data(chunk)
                    writer.finalize()
                    self.wfile.write(b"0\r\n\r\n")
            except BrokenPipeError:
                logger.info("client disconnected")
            except Exception as e:
                logger.exception("generation failed")
                try:
                    self._send(500, str(e).encode())
                except Exception:
                    pass

    return Handler


def serve(model, host: str = "0.0.0.0", port: int = 8000,
          default_voice: str = "alba") -> None:
    server = ThreadingHTTPServer((host, port), make_handler(model, default_voice))
    logger.info("Serving on http://%s:%d", host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
