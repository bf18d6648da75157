"""Generate a synthetic singing corpus for convergence/throughput runs.

Round-4 revision: multi-speaker, higher-diversity corpus designed so a
held-out split is actually representative of the training distribution
(the round-3 25-minute / 7-phoneme / single-speaker corpus overfit by 8k
steps and the held-out diffusion-vs-aux crossover could not be shown).

Diversity axes:
  - 18 voiced phonemes, each with a 2-formant timbre + spectral tilt;
  - N speakers (default 3) with distinct formant scaling, pitch range,
    vibrato rate/depth, tilt offset and breathiness;
  - per-phoneme log-normal duration families (round 5): open vowels long,
    glides/liquids short, so phone identity carries duration signal;
  - per-item tempo factor (0.65-1.5x) scaling phoneme durations;
  - melodies as random walks with occasional leaps, clipped to the
    speaker's range, with portamento + speaker-specific vibrato.

The mel target therefore depends on phoneme identity, f0, speaker timbre
and the amplitude envelope - learnable but not memorizable at 2-3 hours.

Usage: python tools/make_synth_corpus.py <out_root> [minutes] [num_speakers]
Writes raw/<spk>/{wavs,transcriptions.csv} per speaker, dict.txt, and
synth_acoustic.yaml / synth_variance.yaml (full-size flagship configs;
use_spk_id is enabled automatically when num_speakers > 1).
"""

import sys
import wave
from pathlib import Path

import numpy as np

SR = 44100

# ---------------------------------------------------------------------------
# phoneme inventory: 18 voiced phonemes, 2-formant timbres
# (F1/F2 loosely vowel-like; consonant-ish entries get low F2 energy)
VOICED_SPECS = {
    "a":   (850, 1200, 0.55), "e":   (550, 1800, 0.60), "i":   (300, 2300, 0.70),
    "o":   (500, 900, 0.58),  "u":   (320, 800, 0.72),  "y":   (280, 2100, 0.74),
    "w":   (340, 700, 0.76),  "er":  (490, 1350, 0.62), "an":  (780, 1300, 0.57),
    "en":  (520, 1550, 0.63), "ang": (760, 1100, 0.56), "n":   (350, 1450, 0.82),
    "l":   (380, 1600, 0.78), "m":   (300, 1100, 0.85), "r":   (420, 1300, 0.80),
    "ng":  (330, 1000, 0.84), "v":   (400, 1700, 0.79), "j":   (310, 2200, 0.77),
}
VOICED = list(VOICED_SPECS)

# Per-phoneme log-normal duration families (median seconds, log-sd).
# Open vowels long, nasal-coda finals medium, glides/liquids/nasals short —
# the natural-data shape where phone identity is the dominant duration
# signal (cf. reference DurationPredictor learning from ph_dur targets,
# /root/reference/modules/fastspeech/tts_modules.py:53-134). Round 4 drew
# durations iid-uniform regardless of phoneme, which put an information
# ceiling on rhythm correctness; round 5 makes duration learnable.
DUR_SPECS = {
    "a": (0.52, 0.18), "e": (0.46, 0.18), "i": (0.42, 0.18),
    "o": (0.48, 0.18), "u": (0.44, 0.18), "y": (0.38, 0.18),
    "er": (0.40, 0.20), "an": (0.34, 0.20), "en": (0.32, 0.20),
    "ang": (0.36, 0.20),
    "w": (0.14, 0.22), "n": (0.11, 0.22), "l": (0.10, 0.22),
    "m": (0.12, 0.22), "r": (0.13, 0.22), "ng": (0.15, 0.22),
    "v": (0.12, 0.22), "j": (0.10, 0.22),
}

# speaker profiles: formant scale, MIDI range, vibrato rate/depth,
# tilt offset, breathiness multiplier
SPEAKER_SPECS = [
    ("alto",    dict(fscale=0.88, midi_lo=48, midi_hi=67, vib_rate=4.8,
                     vib_depth=0.010, tilt_off=0.08, breath=1.6)),
    ("mezzo",   dict(fscale=1.00, midi_lo=53, midi_hi=72, vib_rate=5.5,
                     vib_depth=0.015, tilt_off=0.00, breath=1.0)),
    ("soprano", dict(fscale=1.15, midi_lo=58, midi_hi=77, vib_rate=6.2,
                     vib_depth=0.020, tilt_off=-0.06, breath=0.7)),
    ("tenor",   dict(fscale=0.93, midi_lo=45, midi_hi=64, vib_rate=5.1,
                     vib_depth=0.013, tilt_off=0.04, breath=1.2)),
]


def midi_name(m: float) -> str:
    names = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]
    m = int(round(m))
    return f"{names[m % 12]}{m // 12 - 1}"


def synth_item(rng, secs, spk):
    """Returns (wav, ph_seq, ph_dur, ph_num, note_seq)."""
    tempo = float(rng.uniform(0.65, 1.5))
    phs, durs = [], []
    t_total = 0.0
    phs.append("SP"); durs.append(round(float(rng.uniform(0.1, 0.3)), 4))
    t_total += durs[-1]
    while t_total < secs - 0.5:
        if rng.random() < 0.10:
            ph = "AP"
            d = float(rng.uniform(0.15, 0.4))
        else:
            ph = VOICED[rng.integers(len(VOICED))]
            med, sd = DUR_SPECS[ph]
            d = float(np.clip(med * np.exp(rng.normal(0.0, sd)) * tempo,
                              0.05, 1.2))
        phs.append(ph); durs.append(round(d, 4)); t_total += d
    phs.append("SP"); durs.append(round(float(rng.uniform(0.1, 0.3)), 4))
    t_total += durs[-1]

    # word grouping for the variance model: AP/SP are their own words,
    # voiced runs split into words of 1-3 phonemes
    ph_num = []
    i = 0
    while i < len(phs):
        if phs[i] in ("AP", "SP"):
            ph_num.append(1); i += 1
        else:
            run = 1
            while (i + run < len(phs) and phs[i + run] not in ("AP", "SP")
                   and run < 3 and rng.random() < 0.6):
                run += 1
            ph_num.append(run); i += run

    n = int(round(t_total * SR))
    t = np.arange(n) / SR

    # melody: one note per voiced phoneme - random walk + occasional leaps
    midi = float(rng.integers(spk["midi_lo"] + 4, spk["midi_hi"] - 3))
    f0 = np.zeros(n)
    voiced_mask = np.zeros(n, bool)
    notes = []
    pos = 0
    for ph, d in zip(phs, durs):
        ln = int(round(d * SR))
        sl = slice(pos, min(pos + ln, n))
        if ph in VOICED_SPECS:
            step = rng.integers(-4, 5) if rng.random() > 0.12 else rng.choice([-7, 7, -12, 12])
            midi = float(np.clip(midi + step, spk["midi_lo"], spk["midi_hi"]))
            f0[sl] = 440.0 * 2 ** ((midi - 69) / 12)
            voiced_mask[sl] = True
            notes.append(midi_name(midi))
        else:
            notes.append("rest")
        pos += ln
    # portamento: smooth the step curve; speaker-specific vibrato on top
    k = int(0.06 * SR) | 1
    win = np.hanning(k); win /= win.sum()
    f0s = np.convolve(np.where(f0 > 0, f0, np.nan), win, "same")
    f0s = np.where(np.isfinite(f0s), f0s, 0.0)
    f0 = np.where(voiced_mask & (f0s > 0), f0s, f0)
    f0 = f0 * (1 + spk["vib_depth"] * np.sin(2 * np.pi * spk["vib_rate"] * t) * voiced_mask)

    phase = 2 * np.pi * np.cumsum(f0) / SR
    wav = np.zeros(n)
    pos = 0
    for ph, d in zip(phs, durs):
        ln = int(round(d * SR))
        sl = slice(pos, min(pos + ln, n))
        env = np.ones(sl.stop - sl.start)
        a = min(int(0.03 * SR), len(env) // 3)
        if a > 0:
            env[:a] = np.linspace(0, 1, a)
            env[-a:] = np.linspace(1, 0, a)
        if ph in VOICED_SPECS:
            f1, f2, tilt = VOICED_SPECS[ph]
            f1 *= spk["fscale"]; f2 *= spk["fscale"]
            tilt += spk["tilt_off"]
            f_base = max(float(f0[sl].mean()), 1.0)
            seg = np.zeros(len(env))
            for h in range(1, 24):
                fh = h * f_base
                if fh > SR / 2 - 1000:
                    break
                amp = h ** -tilt
                amp *= 1.0 + 2.2 * np.exp(-((fh - f1) / 170.0) ** 2)
                amp *= 1.0 + 1.4 * np.exp(-((fh - f2) / 280.0) ** 2)
                seg += amp * np.sin(h * phase[sl] + 0.1 * h)
            seg = 0.25 * seg / np.max(np.abs(seg) + 1e-9)
            seg += 0.004 * spk["breath"] * rng.standard_normal(len(env))
        elif ph == "AP":
            noise = rng.standard_normal(len(env))
            noise = np.diff(noise, prepend=noise[0])  # breathy: high-passed-ish
            seg = 0.05 * spk["breath"] * noise
        else:
            seg = 0.001 * rng.standard_normal(len(env))
        wav[sl] += env * seg
        pos += ln
    return np.clip(wav, -1, 1), phs, durs, ph_num, notes


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__.split("Usage:")[-1].strip())
        sys.exit(0 if len(sys.argv) > 1 else 2)
    root = Path(sys.argv[1])
    minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 25.0
    n_spk = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    speakers = SPEAKER_SPECS[:n_spk]
    per_spk_secs = minutes * 60 / len(speakers)

    raw_dirs, spk_names = [], []
    n_items = 0
    for si, (spk_name, spk) in enumerate(speakers):
        rng = np.random.default_rng(42 + si)
        wav_dir = root / f"raw/{spk_name}/wavs"
        wav_dir.mkdir(parents=True, exist_ok=True)
        rows = ["name,ph_seq,ph_dur,ph_num,note_seq,note_dur"]
        total, i = 0.0, 0
        while total < per_spk_secs:
            secs = float(rng.uniform(8, 18))
            wav, phs, durs, ph_num, notes = synth_item(rng, secs, spk)
            name = f"{spk_name}{i:04d}"
            with wave.open(str(wav_dir / f"{name}.wav"), "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(SR)
                w.writeframes((wav * 32767).astype(np.int16).tobytes())
            dur_str = " ".join(map(str, durs))
            rows.append(
                f"{name},{' '.join(phs)},{dur_str},"
                f"{' '.join(map(str, ph_num))},{' '.join(notes)},{dur_str}"
            )
            total += len(wav) / SR
            i += 1
        (root / f"raw/{spk_name}/transcriptions.csv").write_text("\n".join(rows) + "\n")
        raw_dirs.append(f"{root}/raw/{spk_name}")
        spk_names.append(spk_name)
        n_items += i
        print(f"| {spk_name}: {i} items, {total/60:.1f} min")

    dict_rows = [f"{ph}\t{ph}" for ph in VOICED]
    (root / "dict.txt").write_text("\n".join(dict_rows) + "\n")

    test_prefixes = [f"{s}000{j}" for s in spk_names for j in range(3)]
    multi = len(speakers) > 1
    spk_block = (
        f"num_spk: {len(speakers)}\nuse_spk_id: true\n" if multi else ""
    )
    (root / "synth_acoustic.yaml").write_text(f"""
base_config: [acoustic.yaml]
dictionary: {root}/dict.txt
raw_data_dir: {raw_dirs}
speakers: {spk_names}
{spk_block}binary_data_dir: {root}/binary
test_prefixes: {test_prefixes}
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
raw_data_dir: {raw_dirs}
speakers: {spk_names}
{spk_block}binary_data_dir: {root}/binary_variance
test_prefixes: {test_prefixes}
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
    print(f"| wrote {n_items} items, {minutes:.0f} min, {len(speakers)} speakers -> {root}")


if __name__ == "__main__":
    main()
