"""Frozen configuration dataclasses for models and training.

Replaces the reference's ``EcgVitConfig`` (HF ``PretrainedConfig`` subclass,
``models/ecg_vit.py:26-92``) and the plain-dict ``get_train_args``
(``models/train.py:407-436``) with immutable dataclasses that are hashable and
therefore safe to close over inside ``jax.jit``.

The model size ladder (debug/tiny/small/base/large) reproduces the reference's
``EcgVitConfig.from_defined`` exactly (ecg_vit.py:66-92).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .registry import PTBXL_N_CLASS


@dataclasses.dataclass(frozen=True)
class VitConfig:
    """1-D ViT configuration (reference ecg_vit.py:29-53 defaults)."""
    max_signal_length: int = 2560
    patch_size: int = 64
    num_channels: int = 12
    hidden_size: int = 512
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    num_class: int = PTBXL_N_CLASS
    pool: str = 'cls'               # 'cls' | 'mean' (reference uses cls, ecg_vit.py:110)
    patch_norm: bool = True         # LayerNorm before/after the patch projection
                                    # (vit-pytorch >=0.35 'better plain ViT' layout;
                                    # the reference pins 0.33.2 which has neither --
                                    # set False to load reference checkpoints,
                                    # see models/port.py)
    dtype: str = 'float32'          # compute dtype for activations ('bfloat16' on TPU)
    use_flash_attention: bool = True
    flash_min_seq: int = 128        # below this sequence length dispatch XLA
                                    # attention instead of the Pallas kernel:
                                    # at 41 tokens the kernel's 128-padded
                                    # blocks lose to XLA's exact einsums
                                    # (measured, PERF.md); at T>=1k the kernel
                                    # wins by orders of magnitude.  0 = always
                                    # use the kernel.
    flash_interpret: bool = False   # run the Pallas kernel in interpreter mode
                                    # (CPU-mesh tests of the kernel path)
    ring_axis: Optional[str] = None  # context parallelism: when set, attention
                                    # runs ring-sharded over this mesh axis
                                    # (the module must be applied inside a
                                    # shard_map with the sequence sharded over
                                    # that axis -- train/long_record.py);
                                    # attention-prob dropout is not applied on
                                    # the ring path
    dropout_impl: str = 'flax'      # 'flax': nn.Dropout masks from the
                                    # session PRNG -- with the production
                                    # 'rbg' impl these are measured FREE
                                    # (PERF.md round 3) | 'hash': stateless
                                    # counter-hash masks (ops/dropout.py):
                                    # ~2% slower but bit-identical across
                                    # backends/PRNG impls, and 7 ms/step
                                    # faster than flax if threefry
                                    # reproducibility is required
    remat: bool = False             # jax.checkpoint each block (memory for FLOPs
                                    # -- long-record pretraining / large models)
    scan_blocks: bool = False       # lax.scan over the transformer stack:
                                    # params stacked (L, ...), one traced block
                                    # -- shrinks the XLA program ~L-fold (fast
                                    # compiles; large batches clear the remote
                                    # compiler's size limit).  Param tree is
                                    # NOT checkpoint-compatible with the
                                    # unrolled layout (block_i vs blocks).
    size: Optional[str] = None      # name from the ladder, if built via from_defined
    # Mixture-of-Experts / expert parallelism (models/moe.py): >0 replaces the
    # dense MLP of every moe_every-th block with moe_num_experts expert FFNs
    # behind a Switch top-1 router.  Expert weights are stacked (E, d, f) and
    # sharded over the 'model' mesh axis (EP rides the TP axis); trainers add
    # moe_aux_weight * the Switch load-balance loss to the objective.
    # Incompatible with scan_blocks (per-layer structure differs).
    moe_num_experts: int = 0
    moe_every: int = 2              # MoE in blocks i with (i+1) % moe_every == 0
    moe_capacity_factor: float = 1.25  # per-expert buffer = ceil(cf * S / E);
                                    # overflow tokens fall through the residual
    moe_aux_weight: float = 0.01    # weight of the load-balance auxiliary loss

    @property
    def num_patches(self) -> int:
        assert self.max_signal_length % self.patch_size == 0
        return self.max_signal_length // self.patch_size

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    # the five named sizes of the reference ladder (ecg_vit.py:66-92)
    _SIZES = {
        'debug': dict(hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
                      intermediate_size=256),
        'tiny': dict(hidden_size=256, num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=1024),
        'small': dict(hidden_size=512, num_hidden_layers=8, num_attention_heads=8,
                      intermediate_size=2048),
        'base': dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                     intermediate_size=3072),
        'large': dict(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
                      intermediate_size=4096),
    }

    @classmethod
    def from_defined(cls, model_name: str, **overrides) -> 'VitConfig':
        """Build a config from a ladder name like ``'ecg-vit-base'`` or ``'base'``."""
        size = model_name.split('-')[-1]
        if size not in cls._SIZES:
            raise ValueError(
                f'Unknown model size {size!r}; expected one of {sorted(cls._SIZES)}')
        return cls(size=size, **{**cls._SIZES[size], **overrides})

    @property
    def meta(self) -> dict:
        """Human-readable summary (mirrors the reference ``EcgVit.meta``, ecg_vit.py:124-127)."""
        return {
            'name': 'EcgVit',
            'input shape': f'{self.num_channels} x {self.max_signal_length}',
            '#patch': self.num_patches,
            '#layer': self.num_hidden_layers,
            '#head': self.num_attention_heads,
        }


@dataclasses.dataclass(frozen=True)
class MaeConfig:
    """MAE-style masked-patch pretraining head (north-star addition; the reference
    names self-supervision as the goal -- dataset.py:2-5 -- but never implements it).
    """
    mask_ratio: float = 0.75
    decoder_hidden_size: int = 256
    decoder_num_layers: int = 2
    decoder_num_heads: int = 4
    decoder_intermediate_size: int = 1024
    norm_patch_targets: bool = True  # normalize each target patch to zero-mean/unit-var


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    """SimCLR-style contrastive pretraining (NT-Xent over two stochastic views).

    Second self-supervised family next to masked-patch modeling (MaeConfig):
    the paper the reference's headline metric comes from (*Self-supervised
    representation learning from 12-lead ECG data*, util/train.py:34-40)
    pretrains contrastively; the reference itself never implements it.  Views
    are built ON DEVICE from morphology-safe augmentations (ops/augment.py)
    inside the jitted step; negatives are the full GLOBAL batch -- with the
    batch sharded over the data axis GSPMD all-gathers the projection matrix
    (one (2B, proj_dim) collective over ICI), so every chip contrasts against
    all 2B-2 negatives, not just its local shard.
    """
    temperature: float = 0.1
    proj_hidden_size: int = 512     # hidden width of the 2-layer projection MLP
    proj_dim: int = 128             # embedding dim the loss acts on
    # view-construction knobs (ops/augment.py contrastive_view)
    scale_lo: float = 0.8
    scale_hi: float = 1.25
    jitter_sigma: float = 0.05
    lead_dropout: float = 0.2
    shift_frac: float = 0.5
    timeout_hi: float = 0.25


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters (defaults from reference models/train.py:407-427)."""
    num_train_epoch: int = 3
    train_batch_size: int = 64
    eval_batch_size: int = 64
    do_eval: bool = True
    optimizer: str = 'AdamW'            # 'AdamW' | 'Adam'
    learning_rate: float = 3e-4
    weight_decay: float = 1e-2
    warmup_ratio: float = 0.05
    schedule: str = 'cosine'            # 'cosine' | 'constant'
    grad_clip_norm: float = 1.0         # reference train.py:281
    n_sample: Optional[int] = None
    augment_timeout: bool = False
    patience: int = 8
    precision: str = 'bf16'             # compute precision: 'bf16' | 'fp32'
    prng_impl: str = 'rbg'              # JAX PRNG implementation for the run:
                                        # 'rbg' uses the hardware RngBitGenerator
                                        # (threefry dropout masks cost 4.3 ms on
                                        # a 26 ms ViT-base step -- PERF.md);
                                        # 'threefry2x32' for cross-platform
                                        # reproducible streams
    adam_mu_dtype: Optional[str] = None  # dtype of Adam's first moment
                                        # ('bfloat16' halves its HBM traffic;
                                        # None = param dtype; second moment
                                        # stays f32 for stability)
    fused_optimizer: bool = True        # single-pass Adam/AdamW (+clip
                                        # +nonfinite-zeroing folded into one
                                        # scalar): ~2.4 GB HBM/step vs the
                                        # optax chain's ~5.8 GB (train/optim.py
                                        # FusedAdamW; measured -4 ms/step on
                                        # ViT-base bs-64).  False = the optax
                                        # chain (reference implementation)
    log_per_epoch: bool = False
    epoch_scan: bool = False            # run each training epoch as ONE jitted
                                        # dispatch: lax.scan over the train
                                        # step with a per-epoch (steps, bsz)
                                        # index matrix gathering from the
                                        # HBM-resident split.  Batches, rng
                                        # evolution and updates are
                                        # bit-identical to the per-step loop
                                        # (tested); requires a device-resident
                                        # split (falls back with a warning);
                                        # per-step losses still reach
                                        # TensorBoard at epoch end.  NOTE:
                                        # measured SLOWER on the tunneled dev
                                        # chip (226 vs 28 ms/step -- the axon
                                        # runtime executes while-loop bodies
                                        # pathologically, PERF.md); use
                                        # steps_per_dispatch there instead
    steps_per_dispatch: int = 1         # unroll K train steps into one jitted
                                        # dispatch (a (K, bsz) index matrix;
                                        # leftover steps run the single-step
                                        # program).  Amortizes the per-dispatch
                                        # runtime cost -- on the tunneled dev
                                        # chip the PJRT client walks every
                                        # input buffer at ~260 GB/s per call,
                                        # so a 2.6 GB HBM-resident split costs
                                        # ~10 ms/step at K=1 (PERF.md).
                                        # Bit-identical to the per-step loop;
                                        # program size grows ~K-fold (remote
                                        # compiler limits: keep K small)
    resident_dtype: Optional[str] = None  # storage dtype for the HBM-resident
                                        # signals ('bfloat16'/'float16' halve
                                        # resident HBM and the per-dispatch
                                        # input-walk cost above); steps upcast
                                        # to float32 before normalization.
                                        # None = float32 (bit-exact).  Raw ECG
                                        # spans ~+-30 mV, well inside fp16
                                        # range; quality impact unmeasurable
                                        # (bench dress rehearsal)
    grad_accum: int = 1                 # split each optimizer step's batch
                                        # into this many sequentially-computed
                                        # microbatches (lax.scan): activation
                                        # memory shrinks ~grad_accum-fold at
                                        # the same effective batch; grads are
                                        # averaged before ONE update, so the
                                        # schedule/step count is unchanged.
                                        # Train large models / long records
                                        # past the HBM activation ceiling.
                                        # Must divide train_batch_size
    ema_decay: float = 0.0              # >0: keep an exponential moving
                                        # average of the params (updated on
                                        # device every step, checkpointed with
                                        # the state); evaluate()/predict()
                                        # then run on the EMA weights -- the
                                        # standard serving-quality smoothing
                                        # the reference lacks.  Typical 0.999
    log_to_console: bool = True
    save_every_n_epoch: int = 0         # 0 = only save at the end
    save_final: bool = True             # save ckpt-final when train() returns
                                        # (False: benchmarking / throwaway
                                        # runs -- on the tunneled dev chip a
                                        # full ViT-base state save is a
                                        # ~6 min D2H transfer)
    async_checkpoint: bool = False      # orbax AsyncCheckpointer: save()
                                        # returns after the host snapshot;
                                        # serialization/disk write happen in
                                        # a background thread (periodic saves
                                        # stop stalling long runs).  train()
                                        # waits for the last save before
                                        # returning; restore waits for any
                                        # in-flight save on the same path
    seed: int = 77                      # reference config.json 'random-seed'
    debug_nans: bool = True             # stop on non-finite grads (reference
                                        # error_if_nonfinite grad-clip, train.py:281).
                                        # Detection is accumulated on device every
                                        # step (a non-finite step's gradients are
                                        # zeroed so params stay clean) and raised at
                                        # the next host sync -- independent of the
                                        # log_per_epoch throttle.
    jax_debug_nans: bool = False        # opt-in: enable jax.config jax_debug_nans
                                        # (op-by-op NaN localization inside jitted
                                        # programs; slow -- debugging only)
    loss_weight: Optional[Tuple[float, float]] = None  # (w_neg, w_pos) per-element
                                        # BCE weights by label value (reference
                                        # EcgVit.loss_weight, ecg_vit.py:144-148)
    linear_probe: bool = False          # freeze the trunk, train only the
                                        # classification head (the standard
                                        # probe protocol for a pretrained
                                        # encoder -- train/pretrain.py)
    device_resident: Optional[bool] = None  # keep the whole split in HBM and
                                        # gather batches on device by index
                                        # (per-step host->device traffic drops
                                        # from the batch to a (bsz,) int32
                                        # vector).  None = automatic when the
                                        # split fits hbm_split_max_bytes.
    hbm_split_max_bytes: int = 4 << 30  # auto device-residency cap (PTB-XL:
                                        # 21,837 x 12 x 2500 f32 = 2.6 GB)
    # parallelism (new first-class components, absent in the reference -- SURVEY.md §2.3)
    mesh_data: Optional[int] = None     # data-parallel axis size (None = all
                                        # devices not claimed by mesh_model)
    mesh_model: int = 1                 # model (tensor-parallel) axis size
    mesh_stage: int = 1                 # pipeline-parallel stage count: >1
                                        # stages the transformer stack over a
                                        # 'stage' mesh axis (GPipe microbatch
                                        # schedule, train/pipeline_vit.py);
                                        # requires VitConfig.scan_blocks and
                                        # the PipelineVitTrainer; composes
                                        # with mesh_data (DP x PP)
    fsdp: bool = False                  # ZeRO-style fully-sharded storage:
                                        # params + Adam moments sharded over
                                        # 'data' (largest free dim); GSPMD
                                        # all-gathers at use, reduce-scatters
                                        # grads.  ~1/n_data param+optimizer
                                        # memory per chip; composes with
                                        # mesh_model (hybrid TP x FSDP)

    def steps_per_epoch(self, n_train: int) -> int:
        # floor: the trainer drops the last partial batch (static shapes under
        # jit); the reference's ceil(a // b) quirk (train.py:433) is not kept
        return max(1, n_train // self.train_batch_size)

    def total_steps(self, n_train: int) -> int:
        return self.steps_per_epoch(n_train) * self.num_train_epoch


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Fused preprocessing pipeline settings (reference Zheng chain constants in
    config.json ``pre_processing.zheng``; see ops/ for the kernels)."""
    source_fqs: int = 500
    target_fqs: int = 250
    lowpass_passband: float = 50.0
    lowpass_stopband: float = 60.0
    lowpass_ripple_db: float = 1.0
    lowpass_attenuation_db: float = 2.5
    loess_window: Optional[int] = None   # default: = source fqs (data_preprocessor.py:44)
    # MATLAB 'rloess' runs 5 bisquare robustness iterations; 2 stays within
    # the reference's own export tolerance (atol=10, data_preprocessor.py:196)
    # at ~2.4x the rloess speed -- the documented semantic speed knob
    # (PERF.md round-4 denoise floor analysis)
    loess_robust_iters: int = 5
    nlm_smooth_factor: float = 1.5
    nlm_patch_halfwidth: int = 10
    nlm_search_width: Optional[int] = None  # None = full signal (data_preprocessor.py:98-99)
