"""Analytic FLOPs/bytes per discriminator group of the v2_fork step,
for the speed-of-light table in docs/speed_of_light.md.

Pure python/numpy (no TPU needed): counts the TRUE math FLOPs (what a
perfect kernel must do), the FORMULATION FLOPs (what the shipped
packed/supergrouped XLA formulation executes, redundancy included), and
the minimum HBM bytes, then compares with measured ms/step from the
xprof profile (scripts/profile_step.py).

Usage: python scripts/roofline.py [--ms-json /tmp/prof_v2_fork.json]
"""
import argparse
import json
import math
import sys

V5E_BF16_TFLOPS = 197e12
V5E_HBM_BPS = 819e9

B = 16          # batched real+fake pass (2 x batch 8)
T = 131072
SR = 44100


def conv_flops(n_sites, k, ci, co):
    return 2.0 * n_sites * k * ci * co


def melgan():
    """StackDiscriminators: 3 scales, ladder k=41 s=4 groups=4^i,
    supergrouped to ~128-out-channel blocks."""
    true_f = form_f = bytes_min = 0.0
    for scale in range(3):
        Ts = T >> scale
        # conv0: k15 1->16 s1
        true_f += conv_flops(B * Ts, 15, 1, 16)
        form_f += conv_flops(B * Ts, 15, 1, 16)
        bytes_min += B * Ts * (1 + 16) * 2
        ch_in, t = 16, Ts
        for i in range(4):
            ch_out = min(1024, 16 * 4 ** (i + 1))
            g = 4 ** (i + 1)
            og = ch_out // g
            sgf = max(1, min(g, 128 // og))
            while g % sgf:
                sgf -= 1
            t_out = t // 4
            true_f += conv_flops(B * t_out, 41, ch_in // g, ch_out)
            form_f += conv_flops(B * t_out, 41, ch_in // g * sgf, ch_out)
            bytes_min += B * (t + t_out * ch_out) * 2
            ch_in, t = ch_out, t_out
        true_f += conv_flops(B * t, 5, ch_in, ch_in)
        form_f += conv_flops(B * t, 5, ch_in, ch_in)
        true_f += conv_flops(B * t, 1, ch_in, 1)
        form_f += conv_flops(B * t, 1, ch_in, 1)
        bytes_min += B * t * (2 * ch_in + 1) * 2
    return true_f, form_f, bytes_min


def mrd():
    """UnivNet MRD, packed-resident over TIME rows (round-4 orientation).
    Tap counts from the shipped _chain_taps algebra."""
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from rave_tpu.models.discriminators import _chain_taps
    true_f = form_f = bytes_min = 0.0
    for hop_ms, win_ms in [(5, 25), (10, 50), (2, 10)]:
        hop = int(0.001 * hop_ms * 16000)
        win = int(0.001 * win_ms * 16000)
        n_fft = int(2 ** (int(math.log2(win)) + 1))
        F = n_fft // 2 + 1
        To = (T + (n_fft - hop) - n_fft) // hop + 1
        p, Tc, o = 8, To, 0
        ci = 1
        for kh, kw, sh in [(9, 3, 1), (9, 3, 2), (9, 3, 2), (9, 3, 2),
                           (3, 3, 1)]:
            ph, pw = (kh - 1) // 2, (kw - 1) // 2
            pout = p // sh
            Tn = (Tc + 2 * ph - kh) // sh + 1
            o_out, kb_lo, kb_hi, _ = _chain_taps(p, pout, sh, kh, ph, o)
            taps = kb_hi - kb_lo + 1
            nb_out = -(-(Tn + o_out) // pout)
            true_f += conv_flops(B * Tn * F, kh * kw, ci, 32)
            # packed conv: (taps, kw, p*ci) x (pout*32) at nb_out x F sites
            form_f += 2.0 * B * nb_out * F * taps * kw * (p * ci) * (pout * 32)
            bytes_min += B * F * (Tc * ci + Tn * 32) * 2
            p, Tc, o, ci = pout, Tn, o_out, 32
        true_f += conv_flops(B * Tc * F, 9, 32, 1)
        form_f += conv_flops(B * Tc * F, 9, 32, 1)
    return true_f, form_f, bytes_min


def mpd():
    true_f = bytes_min = 0.0
    for per in (2, 3, 5, 7, 11):
        rows = -(-T // per)
        t, ci = rows, 1
        for ch in (64, 128, 256, 512):
            t_out = -(-t // 3)
            true_f += conv_flops(B * t_out * per, 5, ci, ch)
            bytes_min += B * per * (t * ci + t_out * ch) * 2
            t, ci = t_out, ch
        true_f += conv_flops(B * t * per, 5, 512, 1024)
        true_f += conv_flops(B * t * per, 3, 1024, 1)
        bytes_min += B * per * t * (1024 * 2 + 1) * 2
    return true_f, true_f, bytes_min


def report(name, true_f, form_f, bytes_min, measured_ms):
    t_flop = form_f / V5E_BF16_TFLOPS * 1e3 * 3       # fwd + dx + dw
    t_mem = bytes_min / V5E_HBM_BPS * 1e3 * 3
    floor = max(t_flop, t_mem)
    true_floor = max(true_f / V5E_BF16_TFLOPS * 1e3 * 3, t_mem)
    print(f"{name:8s} true {true_f/1e12:6.2f} TF  form {form_f/1e12:6.2f} TF "
          f"(x{form_f/true_f:4.1f})  minB {bytes_min/1e9:5.2f} GB  "
          f"formulation-floor {floor:5.1f} ms  true-floor {true_floor:5.1f} ms"
          + (f"  measured {measured_ms:5.1f} ms (x{measured_ms/floor:4.2f} "
             f"of formulation floor)" if measured_ms else ""))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", type=json.loads,
                    default={"MelGAN": 32.4, "MRD": 43.0, "MPD": 15.8})
    a = ap.parse_args()
    report("MelGAN", *melgan(), a.measured.get("MelGAN"))
    report("MRD", *mrd(), a.measured.get("MRD"))
    report("MPD", *mpd(), a.measured.get("MPD"))
