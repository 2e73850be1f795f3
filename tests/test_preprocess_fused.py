"""Fused preprocessing pipeline entry points (ops/preprocess.py)."""
import numpy as np
import jax.numpy as jnp

from ecg_representation_learning_tpu.configs import PreprocessConfig
from ecg_representation_learning_tpu.ops import fused_export, fused_train_path, zheng_denoise
from ecg_representation_learning_tpu.registry import PTBXL_TRAIN_STATS
import pytest


def test_fused_train_path_shapes_and_norm(rng):
    x = jnp.asarray(rng.standard_normal((4, 12, 5000)).astype(np.float32))
    stats = PTBXL_TRAIN_STATS['original']
    mean = jnp.asarray(stats['mean'])
    std = jnp.asarray(stats['std'])
    y = fused_train_path(x, mean, std, fqs=500, target_fqs=250, patch_size=64)
    assert y.shape == (4, 12, 2560)  # 2500 padded to patch multiple
    assert np.isfinite(np.asarray(y)).all()
    # padded tail is zero
    assert float(jnp.abs(y[..., 2500:]).max()) == 0.0


def test_fused_export_resample_only(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 1000)).astype(np.float32))
    y = fused_export(x, fqs=500, denoise=False)
    assert y.shape == (2, 12, 500)


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_fused_export_with_denoise(rng):
    cfg = PreprocessConfig(nlm_search_width=16, loess_window=51)
    x = jnp.asarray(rng.standard_normal((1, 2, 600)).astype(np.float32) * 100)
    y = fused_export(x, fqs=500, cfg=cfg, denoise=True)
    assert y.shape == (1, 2, 300)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_zheng_denoise_reduces_wander(rng):
    # the full chain must strip low-frequency baseline wander
    fs, L = 250, 2500
    t = np.arange(L) / fs
    wander = 300 * np.sin(2 * np.pi * 0.25 * t)
    phase = (t * 1.2) % 1.0
    qrs = 500 * np.exp(-((phase - 0.5) ** 2) / (2 * 0.0006))
    x = jnp.asarray((wander + qrs)[None, None].astype(np.float32))
    cfg = PreprocessConfig(nlm_search_width=64)
    y = np.asarray(zheng_denoise(x, fqs=fs, cfg=cfg))[0, 0]
    inner = slice(400, -400)
    flat = qrs[inner] < 1
    assert np.abs(y[inner][flat]).max() < 80  # wander (300) mostly removed
