"""End-to-end attention-rollout visualizer smoke test (Agg backend)."""
import os

import matplotlib
matplotlib.use('Agg')

import numpy as np
import jax
import jax.numpy as jnp


def test_visualizer_renders(tmp_path, rng):
    from ecg_representation_learning_tpu.configs import VitConfig
    from ecg_representation_learning_tpu.models import create_vit
    from ecg_representation_learning_tpu.utils import EcgVitVisualizer

    cfg = VitConfig.from_defined('debug', max_signal_length=640,
                                 use_flash_attention=False)
    model, params = create_vit(cfg, jax.random.PRNGKey(0))
    sig = rng.standard_normal((12, 640)).astype(np.float32)
    labels = np.zeros(71, np.float32)
    labels[[4, 10]] = 1.0

    os.chdir(tmp_path)
    viz = EcgVitVisualizer(model, params)
    path = viz(sig, labels, save=True)
    assert path and os.path.exists(path)
