"""RMVPE JAX port: parity vs the reference torch implementation with random
weights, plus decode-path checks."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted")

if REFERENCE.exists():
    sys.path.insert(0, str(REFERENCE))
    from test_reference_parity import _install_lightning_stub

    _install_lightning_stub()

    # The reference's modules.pe package imports librosa/parselmouth/pyworld/
    # torchaudio at import time; none are needed to run the torch E2E0 oracle.
    import types
    from unittest import mock

    for mod in ["librosa", "librosa.filters", "librosa.sequence", "parselmouth",
                "pyworld", "torchaudio", "torchaudio.transforms"]:
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            sys.modules[mod] = m
    sys.modules["torchaudio.transforms"].Resample = mock.MagicMock()
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    sys.modules["librosa"].filters = sys.modules["librosa.filters"]

    def _librosa_mel(sr, n_fft, n_mels, fmin, fmax, htk=False):
        from xiaoicesing_io_tpu.ops.mel import mel_filterbank

        return mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk)

    sys.modules["librosa.filters"].mel = lambda **kw: _librosa_mel(
        kw["sr"], kw["n_fft"], kw["n_mels"], kw["fmin"], kw["fmax"],
        kw.get("htk", False),
    )
    sys.modules["librosa"].mel = sys.modules["librosa.filters"].mel

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from xiaoicesing_io_tpu.models.pe.rmvpe import (  # noqa: E402
    E2E0,
    to_local_average_f0,
    to_viterbi_f0,
)
from xiaoicesing_io_tpu.utils import torch_ckpt  # noqa: E402


def test_e2e0_parity(rng):
    from modules.pe.rmvpe.model import E2E0 as TorchE2E0

    torch.manual_seed(0)
    tmodel = TorchE2E0(4, 1, (2, 2)).eval()
    T = 32
    mel = rng.standard_normal((1, 128, T)).astype(np.float32)  # torch input [B, M, T]
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(mel)).numpy()  # [B, T, 360]

    model = E2E0()
    params = torch_ckpt.convert_rmvpe(tmodel.state_dict())
    ours = np.asarray(model.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_local_average_decode():
    hidden = np.zeros((4, 360), np.float32)
    hidden[:, 100] = 0.9  # cents = 100*20 + CONST
    f0 = to_local_average_f0(hidden)
    expected = 10 * 2 ** ((100 * 20 + 1997.3794084376191) / 1200)
    np.testing.assert_allclose(f0, expected, rtol=1e-5)
    # below threshold -> unvoiced
    hidden2 = np.full((4, 360), 0.01, np.float32)
    assert (to_local_average_f0(hidden2) == 0).all()


def test_viterbi_decode_matches_librosa_style():
    rng = np.random.default_rng(0)
    hidden = rng.uniform(0, 0.1, (20, 360)).astype(np.float32)
    path_bin = np.linspace(100, 140, 20).astype(int)
    hidden[np.arange(20), path_bin] = 0.8
    f0_v = to_viterbi_f0(hidden)
    f0_l = to_local_average_f0(hidden)
    # on a clean ridge both decoders agree
    np.testing.assert_allclose(f0_v, f0_l, rtol=1e-4)
