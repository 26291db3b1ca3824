"""Remote dataset server / client.

Counterpart of the reference's Flask ``remote_dataset`` server +
``HTTPAudioDataset`` (``scripts/remote_dataset.py:40-64``,
``rave/dataset.py:292-311``): expose a preprocessed dataset over HTTP so
trainer hosts can stream items without a shared filesystem.  Implemented
on the stdlib (no Flask in this image): ``/len`` and ``/get/<i>`` return
JSON / raw int16 little-endian records.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def serve_dataset(dataset, host: str = "0.0.0.0", port: int = 8080):
    """Serve ``dataset`` (AudioDataset) over HTTP; returns the server."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/len":
                body = json.dumps({"len": len(dataset),
                                   "n_signal": dataset.n_signal,
                                   "sr": dataset.sr}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/get/"):
                try:
                    i = int(self.path.split("/")[-1])
                    item = dataset[i]
                except (ValueError, IndexError):
                    self.send_response(404)
                    self.end_headers()
                    return
                x = np.clip(item["x"], -1, 1)
                raw = (x * 32767).astype("<i2").tobytes()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(raw)))
                self.send_header("X-Speaker", str(int(item["speaker"])))
                self.end_headers()
                self.wfile.write(raw)
            else:
                self.send_response(404)
                self.end_headers()

    server = ThreadingHTTPServer((host, port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


class HTTPAudioDataset:
    """Client-side dataset fetching items over HTTP (reference
    ``HTTPAudioDataset``, ``rave/dataset.py:292-311``)."""

    def __init__(self, host: str):
        self.host = host.rstrip("/")
        with urllib.request.urlopen(f"{self.host}/len", timeout=30) as r:
            meta = json.loads(r.read())
        self._len = meta["len"]
        self.n_signal = meta["n_signal"]
        self.sr = meta["sr"]

    def __len__(self):
        return self._len

    def __getitem__(self, i: int):
        with urllib.request.urlopen(f"{self.host}/get/{i}", timeout=30) as r:
            raw = r.read()
            spk = int(r.headers.get("X-Speaker", 0))
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        return dict(x=x, speaker=np.int32(spk))
