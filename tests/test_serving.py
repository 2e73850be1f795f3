"""Inference HTTP server (serving.py): the serving layer the reference
lacks.  Covers the service object directly and a live server round-trip
over localhost (port 0 = OS-assigned).
"""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.serving import InferenceService, serve
from ecg_representation_learning_tpu.train import Trainer


@pytest.fixture(scope='module')
def trainer():
    cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                 use_flash_attention=False)
    tr = Trainer(cfg, TrainConfig(eval_batch_size=8, log_to_console=False))
    tr.init_state()
    return tr


def test_service_predict_shapes_and_topk(trainer):
    svc = InferenceService(trainer)
    rng = np.random.default_rng(0)
    out = svc.predict({'signals': rng.standard_normal((3, 12, 250)).tolist(),
                       'top_k': 4})
    probs = np.asarray(out['probs'])
    assert probs.shape == (3, trainer.model_cfg.num_class)
    assert np.all((probs >= 0) & (probs <= 1))
    assert len(out['top']) == 3 and len(out['top'][0]) == 4
    entry = out['top'][0][0]
    assert set(entry) == {'code', 'description', 'prob'}
    # top-1 prob is the max prob
    assert entry['prob'] == pytest.approx(float(probs[0].max()), abs=1e-5)


def test_service_single_record_and_validation(trainer):
    svc = InferenceService(trainer)
    rng = np.random.default_rng(1)
    out = svc.predict({'signals': rng.standard_normal((12, 250)).tolist()})
    assert np.asarray(out['probs']).shape[0] == 1
    with pytest.raises(ValueError, match='leads'):
        svc.predict({'signals': rng.standard_normal((1, 3, 250)).tolist()})
    with pytest.raises(ValueError, match='N, C, L'):
        svc.predict({'signals': [1.0, 2.0]})


def test_service_long_record_auto_windows(trainer):
    """Records longer than the model input auto-route through
    predict_long (sliding windows + max aggregation)."""
    svc = InferenceService(trainer)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 12, 900)).astype(np.float32)
    out = svc.predict({'signals': x.tolist()})
    want = trainer.predict_long(x, agg='max')
    np.testing.assert_allclose(np.asarray(out['probs']), np.round(want, 6),
                               atol=1e-6)
    out_mean = svc.predict({'signals': x.tolist(), 'agg': 'mean'})
    want_mean = trainer.predict_long(x, agg='mean')
    np.testing.assert_allclose(np.asarray(out_mean['probs']),
                               np.round(want_mean, 6), atol=1e-6)


def test_http_round_trip(trainer):
    httpd = serve(trainer, port=0, warmup=False)  # port 0: OS-assigned
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/health', timeout=30) as r:
            health = json.loads(r.read())
        assert health['status'] == 'ok'
        assert health['num_class'] == trainer.model_cfg.num_class

        rng = np.random.default_rng(2)
        body = json.dumps({'signals':
                           rng.standard_normal((2, 12, 250)).tolist()}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=body,
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert np.asarray(out['probs']).shape == (2, trainer.model_cfg.num_class)

        # malformed request -> 400 with an error payload, server stays up
        bad = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=b'{"signals": [1]}',
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/health', timeout=30) as r:
            assert json.loads(r.read())['status'] == 'ok'
    finally:
        httpd.shutdown()


def test_http_server_fault_maps_to_500(trainer):
    """An internal fault (device/runtime error inside predict) must surface
    as a retryable 500, not a 400 'bad request' -- and the server must stay
    up either way."""
    httpd = serve(trainer, port=0, warmup=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    orig = httpd.service.trainer.predict_long

    def boom(*a, **k):
        raise RuntimeError('XlaRuntimeError: RESOURCE_EXHAUSTED (simulated)')

    try:
        httpd.service.trainer.predict_long = boom
        rng = np.random.default_rng(3)
        body = json.dumps(
            {'signals': rng.standard_normal((1, 12, 250)).tolist()}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=body,
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 500
        assert 'RESOURCE_EXHAUSTED' in json.loads(ei.value.read())['error']
        # server survives; a client error is still a 400
        bad = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=b'not json',
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei2:
            urllib.request.urlopen(bad, timeout=30)
        assert ei2.value.code == 400
    finally:
        httpd.service.trainer.predict_long = orig
        httpd.shutdown()
