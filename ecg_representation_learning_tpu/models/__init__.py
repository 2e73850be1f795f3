"""Model layer: 1-D ViT family, MAE + contrastive pretrainers, signal tokenizer."""
from .vit import EcgVit, EcgVitEncoder, VitOutput, bce_with_logits, create_vit, param_count
from .mae import EcgMae, MaeOutput, patchify, random_masking, unpatchify
from .contrastive import EcgContrastive, nt_xent

__all__ = [
    'EcgVit', 'EcgVitEncoder', 'VitOutput', 'bce_with_logits', 'create_vit', 'param_count',
    'EcgMae', 'MaeOutput', 'patchify', 'random_masking', 'unpatchify',
    'EcgContrastive', 'nt_xent',
]
