"""ecg_representation_learning_tpu -- a TPU-native ECG representation-learning framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of
StefanHeng/ECG-Representation-Learning (see SURVEY.md for the structural map
of the reference this build follows):

- ``registry``  -- dataset registry + PTB-XL 71-code taxonomy (frozen data)
- ``configs``   -- frozen model/train/preprocess dataclass configs
- ``ops``       -- the device kernel layer: resample, Butterworth filtfilt,
                   robust LOESS, non-local means, normalization, padding,
                   augmentation, fused preprocessing pipelines
- ``models``    -- 1-D ViT (debug..large ladder), MAE pretrainer, tokenizer
- ``data``      -- corpus ingest/export, datasets, PTB-XL splits, input pipeline
- ``parallel``  -- mesh construction and sharding rules (DP x TP/FSDP)
- ``train``     -- jitted train/eval loops, optimizer/schedule, checkpointing,
                   metrics (macro-AUROC), early stopping
- ``utils``     -- logging, plotting, attention-rollout & AUROC visualizers
"""

__version__ = '0.1.0'

from . import configs, registry, runtime  # noqa: F401
