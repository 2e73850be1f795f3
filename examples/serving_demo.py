"""Serving walkthrough: train-or-restore a model, start the HTTP server,
and demonstrate cross-request micro-batching with concurrent clients.

Covers the production serving surface (the reference has no serving layer,
SURVEY.md §1):
  1. build a model (fresh init here; pass --checkpoint for trained weights)
  2. optional weight-only int8 quantization (4x smaller resident weights)
  3. serve() -- resident-model HTTP server with the MicroBatcher
  4. N concurrent batch-1 clients: every client gets its own row; the
     /health counters prove the requests were coalesced into far fewer
     device dispatches (continuous batching)

Run:  python examples/serving_demo.py [--platform cpu] [--clients 16]
Expected output (counts vary with scheduling):
  health: ... requests: 17, dispatches: 3-6 ...
  16/16 clients got their own correct row
  coalescing: 17 requests over N dispatches (~4x fewer device calls)
"""
import argparse
import json
import os
import sys
import threading
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--platform', default=None)
    ap.add_argument('--clients', type=int, default=16)
    ap.add_argument('--checkpoint', default=None,
                    help='orbax checkpoint from `cli train` (fresh init if unset)')
    ap.add_argument('--int8', action='store_true')
    ap.add_argument('--max-wait-ms', type=float, default=50.0,
                    help='micro-batching collection deadline (0 = coalesce '
                         'only while a dispatch is in flight)')
    args = ap.parse_args()

    from ecg_representation_learning_tpu.runtime import (
        enable_compilation_cache, force_platform)
    force_platform(args.platform)
    enable_compilation_cache()

    import numpy as np
    from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
    from ecg_representation_learning_tpu.serving import serve
    from ecg_representation_learning_tpu.train import Trainer

    cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                 use_flash_attention=False)
    tr = Trainer(cfg, TrainConfig(eval_batch_size=32, log_to_console=False))
    tr.init_state()
    if args.checkpoint:
        tr.load_checkpoint(args.checkpoint)
    if args.int8:
        print('int8:', tr.enable_int8_inference())

    httpd = serve(tr, port=0, warmup=True, max_wait_ms=args.max_wait_ms)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    print(f'serving on 127.0.0.1:{port}')

    n = args.clients
    rng = np.random.default_rng(0)
    sigs = rng.standard_normal((n, 12, 250)).astype(np.float32)
    want = tr.predict(sigs)                       # ground truth, one batch
    got = [None] * n

    def client(i):
        body = json.dumps({'signals': sigs[i].tolist(), 'top_k': 3}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=body,
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        got[i] = np.asarray(out['probs'])[0]
        if i == 0:
            print('client 0 top codes:',
                  [t['code'] for t in out['top'][0]])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    ok = sum(np.allclose(got[i], np.round(want[i], 6), atol=2e-6)
             for i in range(n))
    h = json.loads(urllib.request.urlopen(
        f'http://127.0.0.1:{port}/health', timeout=30).read())
    print('health:', h)
    print(f'{ok}/{n} clients got their own correct row')
    print(f"coalescing: {h['requests']} requests over {h['dispatches']} "
          f"dispatches (~{h['requests'] / max(h['dispatches'], 1):.1f}x "
          f'fewer device calls)')
    httpd.shutdown()
    assert ok == n


if __name__ == '__main__':
    main()
