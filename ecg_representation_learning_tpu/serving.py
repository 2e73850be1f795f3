"""Minimal batch-inference HTTP server (the serving layer the reference
lacks -- its only entry points are ``__main__`` blocks and notebooks,
SURVEY.md §1 "no CLI layer and no serving layer").

Design: the model stays resident on the accelerator inside a ``Trainer``
(jitted eval program, compiled once at warmup); requests are plain JSON over
stdlib ``http.server`` -- no web-framework dependency.  Concurrency model:
``ThreadingHTTPServer`` accepts in parallel, inference itself is serialized
by a lock (one device; batching inside a request is the throughput lever --
send (N, C, L) per call).

API:
  GET  /health   -> {"status": "ok", "model": ..., "num_class": ...}
  POST /predict  {"signals": [[[...],...12 leads...]], "top_k": 5}
                 -> {"probs": [[...num_class...]],
                     "top": [[{"code", "description", "prob"}, ...]]}

Wire format: raw 250 Hz signals, shape (N, C, L) with C = the model's lead
count; normalization/padding happen on device exactly as in training
(Trainer.predict).
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from .registry import PTBXL_CODE2DESCRIPTION, PTBXL_ID2CODE


class InferenceService:
    """Request handling as a pure(ish) object, independent of HTTP -- the
    unit under test.  Wraps a ``train.Trainer`` with loaded params."""

    def __init__(self, trainer, default_top_k: int = 5,
                 max_batch: int = 1024):
        self.trainer = trainer
        self.default_top_k = default_top_k
        self.max_batch = max_batch
        self._lock = threading.Lock()

    def health(self) -> Dict[str, Any]:
        cfg = self.trainer.model_cfg
        return {'status': 'ok', 'model': self.trainer.name,
                'num_class': cfg.num_class, 'num_channels': cfg.num_channels,
                'max_signal_length': cfg.max_signal_length}

    def warmup(self) -> None:
        """Compile the eval program before the first request."""
        cfg = self.trainer.model_cfg
        dummy = np.zeros((1, cfg.num_channels, cfg.max_signal_length
                          - cfg.patch_size), np.float32)
        self.predict({'signals': dummy.tolist(), 'top_k': 1})

    def predict(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        if not isinstance(payload, dict):
            raise ValueError(f'request body must be a JSON object, '
                             f'got {type(payload).__name__}')
        signals = np.asarray(payload.get('signals'), np.float32)
        if signals.ndim == 2:      # single record (C, L)
            signals = signals[None]
        if signals.ndim != 3:
            raise ValueError(f'signals must be (N, C, L) or (C, L); '
                             f'got shape {signals.shape}')
        cfg = self.trainer.model_cfg
        if signals.shape[1] != cfg.num_channels:
            raise ValueError(f'expected {cfg.num_channels} leads, '
                             f'got {signals.shape[1]}')
        if signals.shape[0] > self.max_batch:
            raise ValueError(f'batch too large: {signals.shape[0]} > '
                             f'{self.max_batch}')
        k = int(payload.get('top_k', self.default_top_k))
        agg = str(payload.get('agg', 'max'))
        if agg not in ('max', 'mean'):
            raise ValueError(f"agg must be 'max' or 'mean', got {agg!r}")
        with self._lock:
            # predict_long routes internally: direct lossless predict() for
            # L < max_signal_length, sliding windows + per-class aggregation
            # ('max' default; payload 'agg') for long records (e.g. a full
            # INCART strip)
            probs = self.trainer.predict_long(signals, agg=agg)
        order = np.argsort(-probs, axis=1)[:, :k]
        n_code = len(PTBXL_ID2CODE)
        top = [[{'code': PTBXL_ID2CODE[int(c)] if c < n_code else str(int(c)),
                 'description': PTBXL_CODE2DESCRIPTION.get(
                     PTBXL_ID2CODE[int(c)], '') if c < n_code else '',
                 'prob': round(float(probs[i, c]), 6)}
                for c in order[i]] for i in range(probs.shape[0])]
        return {'probs': np.round(probs, 6).tolist(), 'top': top}


def _make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/health':
                self._send(200, service.health())
            else:
                self._send(404, {'error': f'unknown path {self.path}'})

        def do_POST(self):
            if self.path != '/predict':
                self._send(404, {'error': f'unknown path {self.path}'})
                return
            try:
                n = int(self.headers.get('Content-Length', 0))
                payload = json.loads(self.rfile.read(n) or b'{}')
                self._send(200, service.predict(payload))
            except (ValueError, TypeError, KeyError,
                    json.JSONDecodeError) as e:
                # malformed payload -> 400 (non-retryable client error)
                self._send(400, {'error': f'{type(e).__name__}: {e}'})
            except Exception as e:  # server-side fault (device OOM, XLA
                # runtime error, ...) -> 500 so clients/load-balancers may
                # retry; never a dropped connection either way
                self._send(500, {'error': f'{type(e).__name__}: {e}'})

        def log_message(self, fmt, *args):  # route through our logger
            pass

    return Handler


def serve(trainer, host: str = '127.0.0.1', port: int = 8000,
          warmup: bool = True) -> ThreadingHTTPServer:
    """Start the inference server (returns the server; call
    ``serve_forever()`` to block, or use the returned handle in tests)."""
    service = InferenceService(trainer)
    if warmup:
        service.warmup()
    httpd = ThreadingHTTPServer((host, port), _make_handler(service))
    httpd.service = service
    return httpd
