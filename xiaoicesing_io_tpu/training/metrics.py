"""Objective validation metrics.

Math parity with ``/root/reference/modules/metrics/``:
* RawCurveAccuracy: fraction of masked points with |pred - gt| <= tolerance
* RhythmCorrectness: word-boundary durations within relative tolerance
* PhonemeDurationAccuracy: phone durations after rhythm-regulator alignment

States are (numerator, denominator) pairs — summable across hosts with a
psum, mirroring torchmetrics' dist_reduce_fx='sum'.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.seq import rhythm_regulator


@dataclass
class SumMetric:
    numer: float = 0.0
    denom: float = 0.0

    def compute(self) -> float:
        return self.numer / max(self.denom, 1e-9)

    def reset(self):
        self.numer = self.denom = 0.0


def _word_sum(x, ph2word, num_words):
    out = np.zeros((x.shape[0], num_words + 1), x.dtype)
    for b in range(x.shape[0]):
        np.add.at(out[b], ph2word[b], x[b])
    return out[:, 1:]


class RawCurveAccuracy(SumMetric):
    def __init__(self, tolerance: float):
        super().__init__()
        self.tolerance = tolerance

    def update(self, pred, target, mask=None):
        pred, target = np.asarray(pred), np.asarray(target)
        close = np.abs(pred - target) <= self.tolerance
        if mask is not None:
            mask = np.asarray(mask).astype(bool)
            close = close & mask
            self.denom += mask.sum()
        else:
            self.denom += pred.size
        self.numer += close.sum()


class RhythmCorrectness(SumMetric):
    def __init__(self, tolerance: float):
        super().__init__()
        assert 0.0 < tolerance < 1.0
        self.tolerance = tolerance

    def update(self, pdur_pred, pdur_target, ph2word, mask=None):
        pdur_pred = np.asarray(pdur_pred, np.float64)
        pdur_target = np.asarray(pdur_target, np.float64)
        ph2word = np.asarray(ph2word)
        num_words = int(ph2word.max())
        wdur_pred = _word_sum(pdur_pred, ph2word, num_words)
        wdur_target = _word_sum(pdur_target, ph2word, num_words)
        if mask is None:
            wmask = np.ones_like(wdur_pred, bool)
        else:
            wmask = _word_sum(np.asarray(mask, np.float64), ph2word, num_words) > 0
        correct = (np.abs(wdur_pred - wdur_target) <= wdur_target * self.tolerance) & wmask
        self.numer += correct.sum()
        self.denom += wmask.sum()


class PhonemeDurationAccuracy(SumMetric):
    def __init__(self, tolerance: float):
        super().__init__()
        self.tolerance = tolerance

    def update(self, pdur_pred, pdur_target, ph2word, mask=None):
        pdur_pred = np.asarray(pdur_pred, np.float64)
        pdur_target = np.asarray(pdur_target, np.float64)
        ph2word = np.asarray(ph2word)
        num_words = int(ph2word.max())
        wdur_target = _word_sum(pdur_target, ph2word, num_words)
        pdur_align = np.asarray(
            rhythm_regulator(
                jnp.asarray(pdur_pred), jnp.asarray(ph2word), jnp.asarray(wdur_target)
            )
        )
        accurate = np.abs(pdur_align - pdur_target) <= pdur_target * self.tolerance
        if mask is not None:
            mask = np.asarray(mask).astype(bool)
            accurate = accurate & mask
            self.denom += mask.sum()
        else:
            self.denom += pdur_pred.size
        self.numer += accurate.sum()
