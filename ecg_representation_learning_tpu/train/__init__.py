"""Training harness: optimizer, metrics, trainer loop, checkpointing."""
from .optim import make_optimizer, make_schedule
from .metrics import binary_stats, get_accuracy, multilabel_auroc, roc_auc
from .trainer import SplitData, Trainer, TrainState, get_all_setup
from .checkpoint import restore_checkpoint, save_checkpoint

__all__ = [
    'make_optimizer', 'make_schedule',
    'binary_stats', 'get_accuracy', 'multilabel_auroc', 'roc_auc',
    'SplitData', 'Trainer', 'TrainState', 'get_all_setup',
    'restore_checkpoint', 'save_checkpoint',
]
