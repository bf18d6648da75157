"""Export a binarized dataset item as a ``.ds`` segment file.

Round-trips the offline features (ph_seq from tokens, ph_dur from the
stored per-phoneme durations, f0 at the mel timestep) into the same
segment-JSON the reference's samples/ use, so a training corpus item can
be driven through ``scripts/infer.py acoustic`` — e.g. to render a
speaker-mix sample (``--spk "alto:0.5|soprano:0.5"``) from the corpus a
multi-speaker model was trained on.

Usage: python tools/ds_from_binary.py <binary_dir> <dataset> <item_idx> <out.ds>
"""

import json
import sys
from pathlib import Path

import numpy as np


def main():
    binary_dir, dataset, idx, out = (
        Path(sys.argv[1]), sys.argv[2], int(sys.argv[3]), Path(sys.argv[4])
    )
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from xiaoicesing_io_tpu.data.indexed_dataset import IndexedDataset
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    phdict = PhonemeDictionary.load(binary_dir / "dictionary.txt")
    enc = TokenTextEncoder(phdict.phoneme_list)
    ds = IndexedDataset(binary_dir, dataset)
    item = ds[idx]
    tokens = np.asarray(item["tokens"])
    ph_seq = enc.decode(tokens)
    # per-phoneme seconds reconstructed from the frame alignment
    # (mel2ph -> frames per token, ref: tts_modules.py:344-350)
    timestep = 512 / 44100
    mel2ph = np.asarray(item["mel2ph"], np.int64)
    frames_per_ph = np.bincount(mel2ph, minlength=len(tokens) + 1)[1:len(tokens) + 1]
    ph_dur = frames_per_ph.astype(np.float64) * timestep
    f0 = np.asarray(item["f0"], np.float64)
    seg = {
        "offset": 0.0,
        "text": ph_seq,
        "ph_seq": ph_seq,
        "ph_dur": " ".join(f"{d:.6f}" for d in ph_dur),
        "f0_seq": " ".join(f"{v:.1f}" for v in f0),
        "f0_timestep": str(timestep),
    }
    out.write_text(json.dumps([seg], indent=1))
    print(f"| wrote {out}: {len(tokens)} phonemes, {len(f0)} f0 frames")


if __name__ == "__main__":
    main()
