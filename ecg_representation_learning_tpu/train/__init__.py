"""Training harness: optimizer, metrics, trainer loop, checkpointing."""
from .optim import make_optimizer, make_schedule
from .metrics import (binary_stats, classification_report, get_accuracy,
                      multilabel_auroc, per_class_recall, roc_auc)
from .trainer import SplitData, Trainer, TrainState, get_all_setup
from .checkpoint import restore_checkpoint, save_checkpoint
from .long_record import EcgMim, RingPretrainer
from .pipeline_vit import PipelineVitTrainer
from .contrastive import ContrastiveTrainer, load_any_encoder

__all__ = [
    'PipelineVitTrainer',
    'ContrastiveTrainer', 'load_any_encoder',
    'make_optimizer', 'make_schedule',
    'binary_stats', 'classification_report', 'get_accuracy',
    'multilabel_auroc', 'per_class_recall', 'roc_auc',
    'SplitData', 'Trainer', 'TrainState', 'get_all_setup',
    'restore_checkpoint', 'save_checkpoint',
    'EcgMim', 'RingPretrainer',
]
