"""Model layer: 1-D ViT family, MAE pretrainer, signal tokenizer."""
from .vit import EcgVit, EcgVitEncoder, VitOutput, bce_with_logits, create_vit, param_count
from .mae import EcgMae, MaeOutput, patchify, random_masking, unpatchify

__all__ = [
    'EcgVit', 'EcgVitEncoder', 'VitOutput', 'bce_with_logits', 'create_vit', 'param_count',
    'EcgMae', 'MaeOutput', 'patchify', 'random_masking', 'unpatchify',
]
