"""Harvest-style pitch extractor: accuracy, voicing, and registry wiring.

The reference's ``pe: harvest`` runs pyworld Harvest
(``/root/reference/modules/pe/pw.py:7-29``); this validates our from-scratch
coarse-to-fine implementation on signals with known ground truth.
"""

import numpy as np
import pytest

from xiaoicesing_io_tpu.models.pe.harvest import HarvestPE, harvest_f0


SR, HOP = 44100, 512


def _singing(secs=2.0, f0_base=220.0, vibrato=0.02, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * secs)) / SR
    f0 = f0_base * (1 + vibrato * np.sin(2 * np.pi * 5.5 * t))
    ph = 2 * np.pi * np.cumsum(f0) / SR
    wav = sum(np.sin(k * ph) / k ** 0.8 for k in range(1, 10)) * 0.15
    wav = wav + 0.01 * rng.standard_normal(len(wav))
    return wav, f0, t


@pytest.mark.parametrize("f0_base", [110.0, 220.0, 440.0])
def test_harvest_tracks_known_f0(f0_base):
    wav, f0_true, t = _singing(f0_base=f0_base)
    length = len(wav) // HOP
    f0, uv = harvest_f0(wav, SR, length, hop_size=HOP)
    frame_t = np.arange(length) * HOP / SR
    ref = np.interp(frame_t, t, f0_true)
    core = (frame_t > 0.1) & (frame_t < frame_t[-1] - 0.1)
    assert (~uv[core]).mean() > 0.95  # voiced detected
    ok = core & ~uv
    cents = 1200 * np.abs(np.log2(f0[ok] / ref[ok]))
    assert np.median(cents) < 10
    assert np.percentile(cents, 95) < 30  # no octave errors


def test_harvest_silence_and_noise_unvoiced():
    rng = np.random.default_rng(1)
    wav, _, _ = _singing(secs=1.5)
    noise = 0.003 * rng.standard_normal(SR)
    full = np.concatenate([noise, wav])
    length = len(full) // HOP
    f0, uv = harvest_f0(full, SR, length, hop_size=HOP)
    frame_t = np.arange(length) * HOP / SR
    sil = frame_t < 1.0 - 0.05
    assert uv[sil].mean() > 0.95
    assert (f0[uv] == 0).all()


def test_harvest_registry_and_interface():
    from xiaoicesing_io_tpu.models.pe import initialize_pe

    pe = initialize_pe({"pe": "harvest"})
    assert isinstance(pe, HarvestPE)
    wav, f0_true, t = _singing(secs=1.0)
    length = len(wav) // HOP
    f0, uv = pe.get_pitch(wav, SR, length, hop_size=HOP, interp_uv=True)
    assert f0.shape == (length,) and f0.dtype == np.float32
    assert (f0 > 0).all()  # interp_uv fills gaps
