"""DSP / compute op library -- the TPU-native ("native kernel") layer.

Replaces the reference's scipy/MATLAB numerics (preprocess/data_preprocessor.py,
preprocess_matlab/) with jnp + Pallas device kernels.  See SURVEY.md §2.
"""
from .filter import butter_lowpass_design, butterworth_low_pass, filtfilt_fir, filtfilt_scan, lfilter, odd_ext
from .resample import resample_fft, resample_poly, resample_to
from .loess import remove_baseline, rloess
from .nlm import est_noise_std, nlm
from .nlm_pallas import nlm_pallas
from .attention import attention, flash_attention
from .filter import fir_correlate_matmul
from .normalize import NormStats, apply_norms, fit_dynamic_norm, normalize_fixed
from .pad import pad_to_multiple, time_end_pad
from .augment import timeout
from .preprocess import fused_export, fused_train_path, zheng_denoise

__all__ = [
    'butter_lowpass_design', 'butterworth_low_pass', 'filtfilt_fir', 'filtfilt_scan',
    'lfilter', 'odd_ext',
    'resample_fft', 'resample_poly', 'resample_to',
    'remove_baseline', 'rloess',
    'est_noise_std', 'nlm', 'nlm_pallas',
    'attention', 'flash_attention', 'fir_correlate_matmul',
    'NormStats', 'apply_norms', 'fit_dynamic_norm', 'normalize_fixed',
    'pad_to_multiple', 'time_end_pad',
    'timeout',
    'fused_export', 'fused_train_path', 'zheng_denoise',
]
