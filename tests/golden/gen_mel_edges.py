"""Generate the Slaney mel band-edge golden table with 50-digit decimal
arithmetic — an arithmetic path fully independent of sed_tpu.ops.mel (which
uses float64 numpy) and of librosa (not installed in this environment).

Spec being pinned (reference: /root/reference/dataset/spectogram/preprocess.py:13-18
builds ``librosa.filters.mel(sr=48000, n_fft=32768, n_mels=64, fmin=20,
fmax=24000)``; librosa htk=False, norm='slaney'):

  Slaney auditory-toolbox mel scale —
    linear region (f < 1000 Hz):  mel(f) = f / (200/3) = 3 f / 200
    log region    (f >= 1000 Hz): mel(f) = 15 + ln(f/1000) / (ln(6.4)/27)
  band edges — n_mels + 2 = 66 points uniform in mel between
    mel(fmin=20) = 0.3  and  mel(fmax=24000) = 15 + 27 ln(24)/ln(6.4),
  mapped back to Hz with the inverse scale.

Each edge is computed as  m_i = m0 + i*(m1 - m0)/65  and
  f(m) = m * 200/3                        if m < 15
       = 1000 * exp((m - 15) * ln(6.4)/27) otherwise
using decimal.Decimal with 50 significant digits (ln/exp are exact to
context precision in the decimal module), then rounded to 30 digits for
the committed table.  Run:  python tests/golden/gen_mel_edges.py
Writes slaney_mel_edges_sr48000_n64_20_24000.json next to this file.
"""

import json
import os
from decimal import Decimal, getcontext

getcontext().prec = 50

N_MELS = 64
FMIN = Decimal(20)
FMAX = Decimal(24000)

F_SP = Decimal(200) / Decimal(3)
MIN_LOG_HZ = Decimal(1000)
MIN_LOG_MEL = MIN_LOG_HZ / F_SP          # == 15 exactly
LOGSTEP = (Decimal(64) / Decimal(10)).ln() / Decimal(27)


def hz_to_mel(f: Decimal) -> Decimal:
    if f < MIN_LOG_HZ:
        return f / F_SP
    return MIN_LOG_MEL + (f / MIN_LOG_HZ).ln() / LOGSTEP


def mel_to_hz(m: Decimal) -> Decimal:
    if m < MIN_LOG_MEL:
        return m * F_SP
    return MIN_LOG_HZ * ((m - MIN_LOG_MEL) * LOGSTEP).exp()


def main():
    m0, m1 = hz_to_mel(FMIN), hz_to_mel(FMAX)
    n_pts = N_MELS + 2
    edges = []
    for i in range(n_pts):
        m = m0 + (m1 - m0) * Decimal(i) / Decimal(n_pts - 1)
        f = mel_to_hz(m)
        # 30 significant digits — far beyond float64 (~17), so the table
        # itself contributes no error at the test's comparison precision.
        edges.append(f"{f:.30g}")
    out = {
        "spec": "librosa.filters.mel band edges (htk=False, norm='slaney')",
        "sr": 48000,
        "n_fft": 32768,
        "n_mels": N_MELS,
        "fmin": "20",
        "fmax": "24000",
        "derivation": "decimal.Decimal prec=50; see gen_mel_edges.py",
        "hz_edges": edges,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "slaney_mel_edges_sr48000_n64_20_24000.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(f"wrote {path} ({n_pts} edges; first={edges[0]} last={edges[-1]})")


if __name__ == "__main__":
    main()
