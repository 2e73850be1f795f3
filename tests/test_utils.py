"""Utils tests: formatting, domain helpers, rollout math, plots (Agg), CLI."""
import json
import os

import matplotlib
matplotlib.use('Agg')

import numpy as np
import pytest

from ecg_representation_learning_tpu.utils import (
    attention_rollout, fmt_time, pretty_single, r2, readable_int, refine_rpeak,
    top_predictions,
)
from ecg_representation_learning_tpu.utils.ecg_domain import detect_rpeaks
from ecg_representation_learning_tpu.utils.misc import StepTimer


def test_readable_int():
    assert readable_int(999) == '999.0'
    assert readable_int(1234) == '1.2K'
    assert readable_int(85_700_000) == '85.7M'


def test_fmt_time():
    assert fmt_time(59) == '59s'
    assert fmt_time(61) == '1m 1s'
    assert fmt_time(3661) == '1h 1m 1s'


def test_pretty_single():
    assert pretty_single('loss', 0.1) == ' 0.1000'
    assert pretty_single('macro_auc', 0.876) == ' 87.60'
    assert pretty_single('auc', None) == '-'
    assert pretty_single('learning_rate', 3e-4) == '3.000e-04'
    assert pretty_single('epoch', 3, {'#epoch': 32}) == ' 3/32'


def test_r2():
    y = np.asarray([1.0, 2.0, 3.0])
    assert r2(y, y) == 1.0
    assert r2(y, np.full(3, y.mean())) == 0.0


def test_refine_rpeak(rng):
    fs = 250
    t = np.arange(1000) / fs
    sig = np.zeros(1000)
    true_peaks = np.arange(100, 1000, 200)
    for p in true_peaks:
        sig[p] = 10.0
    sig += 0.05 * rng.standard_normal(1000)
    tentative = true_peaks + rng.integers(-15, 15, true_peaks.size)
    refined = refine_rpeak(sig, tentative, fs)
    np.testing.assert_array_equal(refined, true_peaks)


def test_detect_rpeaks(rng):
    fs = 250
    t = np.arange(2500) / fs
    phase = (t * 1.2) % 1.0
    sig = 100 * np.exp(-((phase - 0.5) ** 2) / (2 * 0.0004))
    sig += 0.5 * rng.standard_normal(sig.size)
    peaks = detect_rpeaks(sig, fs)
    # ~12 beats in 10 s at 1.2 Hz
    assert 10 <= peaks.size <= 14
    assert (np.diff(peaks) > fs * 0.3).all()


def test_attention_rollout_math(rng):
    L, H, T = 3, 2, 5
    attn = rng.uniform(size=(L, H, T, T))
    attn = attn / attn.sum(-1, keepdims=True)
    scores = attention_rollout(attn)
    assert scores.shape == (L, T - 1)
    assert scores.max() == 1.0 and scores.min() >= 0.0
    # identity attention: cls never attends to patches -> all-zero scores,
    # and the normalization must not produce NaNs
    eye = np.broadcast_to(np.eye(T), (L, H, T, T))
    s2 = attention_rollout(eye)
    assert np.isfinite(s2).all() and s2.max() == 0.0


def test_top_predictions():
    probs = np.zeros(71)
    probs[[3, 10]] = [0.9, 0.7]
    labels = np.zeros(71)
    labels[[3, 20]] = 1
    preds, confs, correct = top_predictions(probs, labels)
    from ecg_representation_learning_tpu.registry import PTBXL_ID2CODE
    assert PTBXL_ID2CODE[3] in preds and PTBXL_ID2CODE[10] in preds
    assert PTBXL_ID2CODE[20] in preds  # ground truth appended
    i3 = preds.index(PTBXL_ID2CODE[3])
    assert correct[i3] is True


def test_step_timer():
    st = StepTimer()
    st.input_done()
    st.step_done()
    s = st.summary()
    assert s['steps'] == 1 and 0 <= s['input_fraction'] <= 1


def test_auc_plot_renders(tmp_path, rng):
    from ecg_representation_learning_tpu.registry import PTBXL_ID2CODE
    from ecg_representation_learning_tpu.utils import PtbxlAucVisualizer
    code2auc = {c: float(rng.uniform(0.5, 1.0)) for c in PTBXL_ID2CODE}
    os.chdir(tmp_path)
    viz = PtbxlAucVisualizer(code2auc)
    p1 = viz.grouped_plot(save=True)
    p2 = viz.sorted_plot(save=True)
    assert os.path.exists(p1) and os.path.exists(p2)
    # score mode renders the colorbar axis + value-mapped bar colors
    # (reference chore/plot.py:55-59); must save cleanly too
    p3 = viz.grouped_plot(save=True, color_by='score',
                          title='score-mode grouped AUROC')
    assert os.path.exists(p3)


def test_auc_grouped_plot_taxonomy_layout(tmp_path, rng):
    """The grouped plot reproduces the reference's hand-tuned GridSpec
    (chore/plot.py:31-46): 7 bar axes on a 4-row grid -- NORM narrower than
    HYP narrower than MI on row 0, CD/STTC on row 1, centered form/rhythm
    rows -- plus a colorbar axis that is visible exactly in score mode."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from ecg_representation_learning_tpu.registry import PTBXL_ID2CODE
    from ecg_representation_learning_tpu.utils import PtbxlAucVisualizer
    code2auc = {c: float(rng.uniform(0.5, 1.0)) for c in PTBXL_ID2CODE}
    os.chdir(tmp_path)
    viz = PtbxlAucVisualizer(code2auc)
    for mode, cbar_visible in (('class', False), ('score', True)):
        plt.close('all')
        viz.grouped_plot(save=True, color_by=mode, title=f'layout-{mode}')
        fig = plt.gcf()
        axes = fig.get_axes()
        # 1 colorbar + NORM/HYP/MI/CD/STTC/form/rhythm = 8 axes total; in
        # score mode the colorbar draw adds its own child axis
        bar_axes = [a for a in axes if a.get_xlabel()]
        assert len(bar_axes) == 7, [a.get_xlabel() for a in axes]
        by_label = {a.get_xlabel().split('(')[-1].rstrip(')'): a
                    for a in bar_axes}
        w = {k: by_label[k].get_position().width
             for k in ('NORM', 'HYP', 'MI', 'CD', 'STTC')}
        # taxonomy-proportional row 0: NORM (1 code) < HYP (5) < MI (9)
        assert w['NORM'] < w['HYP'] < w['MI'], w
        # rows: NORM/HYP/MI above CD/STTC above Form above Rhythm
        y0 = {a.get_xlabel(): a.get_position().y0 for a in bar_axes}
        assert y0['Form'] > y0['Rhythm']
        norm_y = by_label['NORM'].get_position().y0
        cd_y = by_label['CD'].get_position().y0
        assert norm_y > cd_y > y0['Form']
        # the dedicated colorbar axis: visible only in score mode
        cbars = [a for a in axes if a not in bar_axes]
        assert any(a.get_visible() for a in cbars) == cbar_visible, mode


def test_plot_ecg_renders(tmp_path, rng):
    from ecg_representation_learning_tpu.utils import plot_ecg
    os.chdir(tmp_path)
    ax = plot_ecg(rng.standard_normal((12, 500)), title='t', save='ecg-test',
                  show=False)
    assert os.path.exists(os.path.join('plots', 'ecg-test.png'))


def test_cli_synth_and_tokenize(tmp_path):
    from ecg_representation_learning_tpu.cli import main
    import contextlib, io
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(['synth', '--n', '32', '--out', str(tmp_path)])
    info = json.loads(out.getvalue())
    assert os.path.exists(info['hdf5']) and os.path.exists(info['labels_csv'])

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(['tokenize', '--hdf5', info['hdf5'], '--k', '8', '--clusters', '16',
              '--iters', '8', '--out', str(tmp_path / 'tok.pickle')])
    tok_info = json.loads(out.getvalue())
    assert os.path.exists(tok_info['tokenizer'])
