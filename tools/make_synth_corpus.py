"""Generate a synthetic singing corpus for convergence/throughput runs.

~25 minutes of harmonic "singing": random melodies (piecewise notes with
portamento + vibrato), per-phoneme harmonic timbres with spectral tilt,
breath noise for AP, silence for SP.  Learnable but non-trivial: the mel
target depends on phoneme identity, f0, and the amplitude envelope.

Usage: python tools/make_synth_corpus.py <out_root> [minutes]
Writes raw/synthspk/{wavs,transcriptions.csv}, dict.txt, and acoustic.yaml
(full-size flagship config).
"""

import sys
import wave
from pathlib import Path

import numpy as np

SR = 44100
VOICED = ["a", "e", "i", "o", "u", "n", "l"]
TIMBRE = {
    ph: dict(
        tilt=0.6 + 0.12 * k,         # harmonic rolloff exponent
        formant=500.0 + 320.0 * k,    # emphasized band center (Hz)
        bw=180.0 + 40.0 * k,
        breath=0.004 + 0.002 * (k % 3),
    )
    for k, ph in enumerate(VOICED)
}


def midi_name(m: float) -> str:
    names = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]
    m = int(round(m))
    return f"{names[m % 12]}{m // 12 - 1}"


def synth_item(rng, secs):
    """Returns (wav, ph_seq list, ph_dur list, note_seq list)."""
    phs, durs = [], []
    t_total = 0.0
    phs.append("SP"); durs.append(round(float(rng.uniform(0.1, 0.3)), 4))
    t_total += durs[-1]
    while t_total < secs - 0.5:
        if rng.random() < 0.12:
            ph = "AP"
            d = float(rng.uniform(0.15, 0.4))
        else:
            ph = VOICED[rng.integers(len(VOICED))]
            d = float(rng.uniform(0.12, 0.8))
        phs.append(ph); durs.append(round(d, 4)); t_total += d
    phs.append("SP"); durs.append(round(float(rng.uniform(0.1, 0.3)), 4))
    t_total += durs[-1]

    n = int(round(t_total * SR))
    t = np.arange(n) / SR

    # melody: one note per voiced phoneme, random walk in MIDI
    midi = 60.0
    f0 = np.zeros(n)
    voiced_mask = np.zeros(n, bool)
    notes = []
    pos = 0
    for ph, d in zip(phs, durs):
        ln = int(round(d * SR))
        sl = slice(pos, min(pos + ln, n))
        if ph in TIMBRE:
            midi = float(np.clip(midi + rng.integers(-4, 5), 52, 72))
            f0[sl] = 440.0 * 2 ** ((midi - 69) / 12)
            voiced_mask[sl] = True
            notes.append(midi_name(midi))
        else:
            notes.append("rest")
        pos += ln
    # portamento: smooth the step curve; vibrato on top
    k = int(0.06 * SR) | 1
    win = np.hanning(k); win /= win.sum()
    f0s = np.convolve(np.where(f0 > 0, f0, np.nan), win, "same")
    f0s = np.where(np.isfinite(f0s), f0s, 0.0)
    f0 = np.where(voiced_mask & (f0s > 0), f0s, f0)
    f0 = f0 * (1 + 0.015 * np.sin(2 * np.pi * 5.5 * t) * voiced_mask)

    phase = 2 * np.pi * np.cumsum(f0) / SR
    wav = np.zeros(n)
    pos = 0
    for ph, d in zip(phs, durs):
        ln = int(round(d * SR))
        sl = slice(pos, min(pos + ln, n))
        seg_t = t[sl]
        env = np.ones(sl.stop - sl.start)
        a = min(int(0.03 * SR), len(env) // 3)
        if a > 0:
            env[:a] = np.linspace(0, 1, a)
            env[-a:] = np.linspace(1, 0, a)
        if ph in TIMBRE:
            tb = TIMBRE[ph]
            f_base = max(float(f0[sl].mean()), 1.0)
            seg = np.zeros(len(env))
            for h in range(1, 24):
                fh = h * f_base
                if fh > SR / 2 - 1000:
                    break
                amp = h ** -tb["tilt"]
                amp *= 1.0 + 2.0 * np.exp(-((fh - tb["formant"]) / tb["bw"]) ** 2)
                seg += amp * np.sin(h * phase[sl] + 0.1 * h)
            seg = 0.25 * seg / np.max(np.abs(seg) + 1e-9)
            seg += tb["breath"] * rng.standard_normal(len(env))
        elif ph == "AP":
            noise = rng.standard_normal(len(env))
            # breathy: high-passed-ish noise
            noise = np.diff(noise, prepend=noise[0])
            seg = 0.05 * noise
        else:
            seg = 0.001 * rng.standard_normal(len(env))
        wav[sl] += env * seg
        pos += ln
    return np.clip(wav, -1, 1), phs, durs, notes


def main():
    root = Path(sys.argv[1])
    minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 25.0
    rng = np.random.default_rng(42)
    wav_dir = root / "raw/synthspk/wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    # one CSV serves both binarizers: the acoustic one reads name/ph_seq/
    # ph_dur and ignores the variance columns (csv.DictReader); the variance
    # one additionally needs ph_num (one word per phoneme) + note_seq/note_dur
    # (one note per phoneme, rest for SP/AP — the melody is known exactly)
    rows = ["name,ph_seq,ph_dur,ph_num,note_seq,note_dur"]
    total = 0.0
    i = 0
    while total < minutes * 60:
        secs = float(rng.uniform(8, 18))
        wav, phs, durs, notes = synth_item(rng, secs)
        name = f"synth{i:04d}"
        with wave.open(str(wav_dir / f"{name}.wav"), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(SR)
            w.writeframes((wav * 32767).astype(np.int16).tobytes())
        dur_str = " ".join(map(str, durs))
        rows.append(
            f"{name},{' '.join(phs)},{dur_str},"
            f"{' '.join(['1'] * len(phs))},{' '.join(notes)},{dur_str}"
        )
        total += len(wav) / SR
        i += 1
    (root / "raw/synthspk/transcriptions.csv").write_text("\n".join(rows) + "\n")
    dict_rows = [f"{ph}\t{ph}" for ph in VOICED]
    (root / "dict.txt").write_text("\n".join(dict_rows) + "\n")
    (root / "synth_acoustic.yaml").write_text(f"""
base_config: [acoustic.yaml]
dictionary: {root}/dict.txt
raw_data_dir: [{root}/raw/synthspk]
speakers: [synthspk]
binary_data_dir: {root}/binary
test_prefixes: [synth0000, synth0001]
binarization_args:
  num_workers: 2
val_check_interval: 2000
num_valid_plots: 2
val_with_vocoder: false
log_interval: 200
""")
    (root / "synth_variance.yaml").write_text(f"""
base_config: [variance.yaml]
dictionary: {root}/dict.txt
raw_data_dir: [{root}/raw/synthspk]
speakers: [synthspk]
binary_data_dir: {root}/binary_variance
test_prefixes: [synth0000, synth0001]
binarization_args:
  num_workers: 2
predict_dur: true
predict_pitch: true
predict_energy: true
predict_breathiness: true
val_check_interval: 2000
num_valid_plots: 2
log_interval: 200
""")
    print(f"| wrote {i} items, {total/60:.1f} min -> {root}")


if __name__ == "__main__":
    main()
