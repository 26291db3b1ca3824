"""Synthesize a small multi-speaker speech-like corpus (formant
synthesis: glottal pulse train -> per-vowel formant filters + noise
consonants), for training-quality evidence runs without shipping audio.

The reference trains on VCTK-style speaker-per-directory trees
(``rave/dataset.py:275``); this writes the same layout:
``out/<speaker>/<i>.wav``.

Usage: python scripts/synth_speech.py --out /tmp/corpus --n_clips 40
"""
import argparse
from pathlib import Path

import numpy as np
from scipy.signal import lfilter

VOWELS = {  # (F1, F2, F3) Hz
    "a": (800, 1200, 2500), "e": (400, 2200, 2800),
    "i": (300, 2500, 3200), "o": (450, 800, 2600), "u": (325, 700, 2530),
}


def formant_filter(x, sr, freqs, bw=80.0):
    for f in freqs:
        r = np.exp(-np.pi * bw / sr)
        w = 2 * np.pi * f / sr
        x = lfilter([1 - r], [1, -2 * r * np.cos(w), r * r], x)
    return x


def synth_utterance(rng, sr, seconds, f0_median):
    n = int(sr * seconds)
    out = np.zeros(n)
    t = 0
    while t < n:
        seg = int(rng.uniform(0.08, 0.25) * sr)      # one phone
        seg = min(seg, n - t)
        if rng.uniform() < 0.75:                     # voiced vowel
            f0 = f0_median * np.exp(rng.uniform(-0.2, 0.2))
            # glottal pulse train with vibrato + jitter
            tt = np.arange(seg) / sr
            f0t = f0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * tt)
                        + 0.01 * rng.standard_normal(seg).cumsum() / sr)
            phase = np.cumsum(f0t) / sr
            pulses = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(
                np.float64)
            v = VOWELS[list(VOWELS)[rng.integers(len(VOWELS))]]
            x = formant_filter(pulses, sr, v)
        else:                                        # unvoiced consonant
            x = rng.standard_normal(seg) * 0.3
            x = formant_filter(x, sr, (rng.uniform(2000, 6000),), bw=800)
        h = min(seg, 512) // 2
        if h > 0:
            fade = np.hanning(2 * h)
            x[:h] *= fade[:h]
            x[-h:] *= fade[h:]
        out[t:t + seg] += x
        t += seg
    out = out / (np.abs(out).max() + 1e-9) * 0.7
    return out.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument("--n_clips", type=int, default=40)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--speakers", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from rave_tpu.data.audio_io import save_wav

    rng = np.random.default_rng(args.seed)
    medians = np.exp(rng.uniform(np.log(95), np.log(240), args.speakers))
    per = args.n_clips // args.speakers
    for s in range(args.speakers):
        d = Path(args.out) / f"spk{s}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per):
            x = synth_utterance(rng, args.sr, args.seconds, medians[s])
            save_wav(d / f"{i:03d}.wav", x, args.sr)
    print(f"wrote {per * args.speakers} clips "
          f"({args.speakers} speakers, f0 medians "
          f"{[round(m) for m in medians]}) under {args.out}")


if __name__ == "__main__":
    main()
