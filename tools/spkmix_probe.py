"""Speaker-mix inference probe for a trained multi-speaker acoustic model.

Runs the acoustic infer CLI three times on one ``.ds`` segment — speaker A,
speaker B, and a 50/50 static mix (``--spk "A:0.5|B:0.5"``, the reference's
CLI mix syntax, ref: scripts/infer.py:40-72, basics/base_svs_infer.py:37-122)
— and reports the pairwise mel MAEs. A working mix embedding must land the
mixed timbre strictly BETWEEN the pure speakers: MAE(mix, A) and MAE(mix, B)
both well below MAE(A, B).

Usage: python tools/spkmix_probe.py <song.ds> <exp> <spkA> <spkB> [out.json]
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _infer(ds: str, exp: str, spk: str, out_dir: Path, title: str):
    cmd = [
        sys.executable, str(REPO / "scripts/infer.py"), "acoustic", ds,
        "--exp", exp, "--spk", spk, "--mel", "--seed", "0",
        "--out", str(out_dir), "--title", title,
    ]
    subprocess.run(cmd, check=True, cwd=REPO)
    path = out_dir / f"{title}.mel.npz"
    with np.load(path) as z:
        mels = [k for k in z.files if k.endswith("_mel")]
        return np.asarray(z[mels[0]], np.float64)


def main():
    ds, exp, spk_a, spk_b = sys.argv[1:5]
    out_json = Path(sys.argv[5]) if len(sys.argv) > 5 else None
    work = REPO / ".work/spkmix_probe"
    work.mkdir(parents=True, exist_ok=True)
    mel_a = _infer(ds, exp, spk_a, work, f"pure_{spk_a}")
    mel_b = _infer(ds, exp, spk_b, work, f"pure_{spk_b}")
    mel_mix = _infer(ds, exp, f"{spk_a}:0.5|{spk_b}:0.5", work, "mix50")

    def mae(x, y):
        n = min(len(x), len(y))
        return float(np.mean(np.abs(x[:n] - y[:n])))

    report = {
        "ds": ds, "exp": exp, "spk_a": spk_a, "spk_b": spk_b,
        "mae_a_b": mae(mel_a, mel_b),
        "mae_mix_a": mae(mel_mix, mel_a),
        "mae_mix_b": mae(mel_mix, mel_b),
    }
    report["mix_between"] = bool(
        report["mae_mix_a"] < report["mae_a_b"]
        and report["mae_mix_b"] < report["mae_a_b"]
    )
    print(json.dumps(report, indent=2))
    if out_json:
        out_json.parent.mkdir(parents=True, exist_ok=True)
        out_json.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
