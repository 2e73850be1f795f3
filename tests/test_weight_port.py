"""Torch -> flax weight-porter parity tests (SURVEY §4 item (c)).

Builds a from-spec torch replica of ``vit_pytorch.ViT`` at the reference's
pinned version (0.33.2, /root/reference/requirements.txt:174) with the exact
module tree / state_dict key layout, wraps it like the reference ``EcgVit``
(models/ecg_vit.py:95-161), and asserts the ported flax model reproduces its
forward logits to float32 round-off.  ``vit_pytorch`` itself is not installed
in this environment; the replica is the parity oracle, and since the porter
consumes only the *state_dict layout*, a real 0.33.2 checkpoint maps
identically.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecg_representation_learning_tpu.configs import VitConfig
from ecg_representation_learning_tpu.models.port import (
    port_vit_pytorch_state_dict, reference_vit_config, strip_wrapper_prefix,
)
from ecg_representation_learning_tpu.models.vit import EcgVit, create_vit


# ---------------------------------------------------------------------------
# vit-pytorch 0.33.2 replica (module names define the state_dict key layout)
# ---------------------------------------------------------------------------
class _Rearrange(tnn.Module):
    """'b c (h p1) (w p2) -> b (h w) (p1 p2 c)' with h = p1 = 1: each patch
    vector is time-major / channel-minor.  Parameter-free, so it occupies
    index 0 of to_patch_embedding without touching the key layout."""

    def __init__(self, p1, p2):
        super().__init__()
        self.p1, self.p2 = p1, p2

    def forward(self, x):
        b, c, h, w = x.shape
        gh, gw = h // self.p1, w // self.p2
        x = x.reshape(b, c, gh, self.p1, gw, self.p2)
        # -> (b, gh, gw, p1, p2, c) -> (b, gh*gw, p1*p2*c)
        x = x.permute(0, 2, 4, 3, 5, 1)
        return x.reshape(b, gh * gw, self.p1 * self.p2 * c)


class _PreNorm(tnn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class _FeedForward(tnn.Module):
    def __init__(self, dim, hidden_dim, dropout=0.0):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Linear(dim, hidden_dim), tnn.GELU(), tnn.Dropout(dropout),
            tnn.Linear(hidden_dim, dim), tnn.Dropout(dropout))

    def forward(self, x):
        return self.net(x)


class _Attention(tnn.Module):
    def __init__(self, dim, heads, dim_head, dropout=0.0):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.attend = tnn.Softmax(dim=-1)
        self.dropout = tnn.Dropout(dropout)
        self.to_qkv = tnn.Linear(dim, inner * 3, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, dim), tnn.Dropout(dropout))

    def forward(self, x):
        b, n, _ = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = [t.reshape(b, n, self.heads, -1).transpose(1, 2) for t in qkv]
        attn = self.attend(q @ k.transpose(-1, -2) * self.scale)
        attn = self.dropout(attn)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class _Transformer(tnn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim, dropout=0.0):
        super().__init__()
        self.layers = tnn.ModuleList([
            tnn.ModuleList([
                _PreNorm(dim, _Attention(dim, heads, dim_head, dropout)),
                _PreNorm(dim, _FeedForward(dim, mlp_dim, dropout)),
            ]) for _ in range(depth)])

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return x


class TorchViT(tnn.Module):
    """vit_pytorch.ViT 0.33.2 layout: to_patch_embedding = (Rearrange, Linear),
    pos_embedding / cls_token params, PreNorm transformer, mlp_head = (LN, Linear)."""

    def __init__(self, *, image_size, patch_size, num_classes, dim, depth,
                 heads, mlp_dim, pool='cls', channels=3, dim_head=64,
                 dropout=0.0, emb_dropout=0.0):
        super().__init__()
        ih, iw = image_size
        ph, pw = patch_size
        num_patches = (ih // ph) * (iw // pw)
        patch_dim = channels * ph * pw
        self.to_patch_embedding = tnn.Sequential(
            _Rearrange(ph, pw), tnn.Linear(patch_dim, dim))
        self.pos_embedding = tnn.Parameter(torch.randn(1, num_patches + 1, dim))
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim))
        self.dropout = tnn.Dropout(emb_dropout)
        self.transformer = _Transformer(dim, depth, heads, dim_head, mlp_dim, dropout)
        self.pool = pool
        self.mlp_head = tnn.Sequential(tnn.LayerNorm(dim), tnn.Linear(dim, num_classes))

    def forward(self, img):
        x = self.to_patch_embedding(img)
        b, n, _ = x.shape
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.pos_embedding[:, :n + 1]
        x = self.dropout(x)
        x = self.transformer(x)
        x = x[:, 0] if self.pool == 'cls' else x.mean(dim=1)
        return self.mlp_head(x)


class TorchEcgVit(tnn.Module):
    """The reference wrapper: self.vit = ViT(...), forward adds a dummy height
    dim (ecg_vit.py:95-149) -> state_dict keys carry the 'vit.' prefix."""

    def __init__(self, cfg: VitConfig):
        super().__init__()
        self.vit = TorchViT(
            image_size=(1, cfg.max_signal_length),
            patch_size=(1, cfg.patch_size),
            num_classes=cfg.num_class,
            dim=cfg.hidden_size,
            depth=cfg.num_hidden_layers,
            heads=cfg.num_attention_heads,
            mlp_dim=cfg.intermediate_size,
            pool=cfg.pool,
            channels=cfg.num_channels,
            dim_head=cfg.head_dim,
            dropout=cfg.hidden_dropout_prob,
            emb_dropout=cfg.attention_probs_dropout_prob,
        )

    def forward(self, x):
        return self.vit(x.unsqueeze(-2))


TINY = reference_vit_config(
    'ecg-vit-debug', max_signal_length=256, patch_size=32, num_class=7,
    use_flash_attention=False, hidden_dropout_prob=0.1,
    attention_probs_dropout_prob=0.1)


def _torch_and_flax(cfg, seed=0):
    torch.manual_seed(seed)
    tm = TorchEcgVit(cfg).eval()
    params = port_vit_pytorch_state_dict(tm.state_dict(), cfg)
    return tm, EcgVit(cfg), params


def test_ported_logits_match_torch_forward():
    cfg = TINY
    tm, fm, params = _torch_and_flax(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, cfg.num_channels, cfg.max_signal_length)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(fm.apply(params, jnp.asarray(x)).logits)
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()


def test_ported_params_tree_matches_init():
    # the ported tree must be structurally identical to a fresh init:
    # no silently-missing or extra parameters
    cfg = TINY
    _, _, params = _torch_and_flax(cfg)
    _, init_params = create_vit(cfg, jax.random.PRNGKey(0))
    got = jax.tree_util.tree_structure(jax.tree.map(np.shape, params))
    want = jax.tree_util.tree_structure(jax.tree.map(np.shape, init_params))
    assert got == want
    shapes_got = jax.tree.map(np.shape, params)
    shapes_want = jax.tree.map(lambda a: tuple(a.shape), init_params)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, shapes_got, shapes_want))


def test_wrapper_prefix_stripped():
    cfg = TINY
    torch.manual_seed(1)
    tm = TorchEcgVit(cfg)
    sd = tm.state_dict()
    assert all(k.startswith('vit.') for k in sd)
    bare = strip_wrapper_prefix(sd)
    assert all(not k.startswith('vit.') for k in bare)
    # porting the prefixed dict directly also works
    port_vit_pytorch_state_dict(sd, cfg)


def test_porter_rejects_patch_norm_config():
    with pytest.raises(ValueError, match='patch_norm'):
        port_vit_pytorch_state_dict({}, VitConfig(patch_norm=True))


def test_porter_rejects_shape_mismatch():
    cfg = TINY
    torch.manual_seed(2)
    sd = TorchEcgVit(cfg).state_dict()
    sd['vit.mlp_head.1.weight'] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match='mlp_head.1.weight'):
        port_vit_pytorch_state_dict(sd, cfg)


def test_cli_evaluate_with_ported_checkpoint(tmp_path, monkeypatch):
    # the documented one-command real-PTB-XL path: cli evaluate
    # --port-checkpoint ref.pt [--hdf5 ... --labels-csv ...]; synthetic corpus
    # here since the environment has no PhysioNet data
    import contextlib, io, json, os
    cfg = reference_vit_config('ecg-vit-debug')
    torch.manual_seed(4)
    tm = TorchEcgVit(cfg)
    ckpt = str(tmp_path / 'ref.pt')
    torch.save(tm.state_dict(), ckpt)

    from ecg_representation_learning_tpu.cli import main
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(['--platform', 'cpu', 'evaluate', '--size', 'debug',
              '--synth-n', '48', '--no-bf16', '--port-checkpoint', ckpt,
              '--out', str(tmp_path / 'ev')])
    out = json.loads(buf.getvalue())
    assert 'eval' in out and 'test' in out
    assert 0.0 <= out['test'] <= 1.0  # macro-AUROC of an untrained net


def test_load_reference_checkpoint_end_to_end(tmp_path):
    # save a replica state_dict as the reference's load_trained would read it
    # (torch.load of a bare state_dict, ecg_vit.py:158-160)
    cfg = TINY
    torch.manual_seed(3)
    tm = TorchEcgVit(cfg).eval()
    path = str(tmp_path / 'ep8.pt')
    torch.save(tm.state_dict(), path)

    from ecg_representation_learning_tpu.models.port import load_reference_checkpoint
    model, params, got_cfg = load_reference_checkpoint(
        path, 'ecg-vit-debug', max_signal_length=256, patch_size=32,
        num_class=7, use_flash_attention=False)
    assert got_cfg.patch_norm is False
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 256)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)).logits)
    assert np.abs(got - want).max() < 1e-4


def test_export_roundtrip_to_torch():
    # flax -> torch state_dict -> torch forward matches flax forward; and a
    # full round-trip (flax -> torch -> flax) is bit-exact
    from ecg_representation_learning_tpu.models.port import (
        export_vit_pytorch_state_dict)
    cfg = TINY
    _, fm, params = _torch_and_flax(cfg, seed=7)
    sd_np = export_vit_pytorch_state_dict(params, cfg)
    tm = TorchEcgVit(cfg).eval()
    tm.load_state_dict({k: torch.from_numpy(v) for k, v in sd_np.items()},
                       strict=True)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, cfg.num_channels, cfg.max_signal_length)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(fm.apply(params, jnp.asarray(x)).logits)
    assert np.abs(got - want).max() < 1e-4

    back = port_vit_pytorch_state_dict(sd_np, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_port_to_orbax_then_evaluate(tmp_path, monkeypatch):
    # one-time .pt -> orbax conversion, then evaluate from the orbax ckpt
    import contextlib, io, json, os
    cfg = reference_vit_config('ecg-vit-debug')
    torch.manual_seed(5)
    tm = TorchEcgVit(cfg)
    pt = str(tmp_path / 'ref.pt')
    torch.save(tm.state_dict(), pt)

    from ecg_representation_learning_tpu.cli import main
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(['--platform', 'cpu', 'port', '--size', 'debug', '--no-bf16',
              '--port-checkpoint', pt, '--out', str(tmp_path / 'ported')])
    ckpt = json.loads(buf.getvalue())['checkpoint']
    assert os.path.isdir(ckpt)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(['--platform', 'cpu', 'evaluate', '--size', 'debug', '--no-bf16',
              '--synth-n', '48', '--no-patch-norm',  # reference model layout
              '--checkpoint', ckpt, '--out', str(tmp_path / 'ev')])
    out = json.loads(buf.getvalue())
    assert 'test' in out
