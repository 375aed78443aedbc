"""Roofline placement of the stock train step (VERDICT r4 #4).

Counts, ANALYTICALLY from the recipe shapes, per kernel-family and per step:
  * useful MXU FLOPs (2*M*N*K per dot),
  * MXU-equivalent FLOPs — each dot costed at its real systolic-array
    occupancy: a K-contraction below 128 still pays full passes, and an
    output width below 128 lanes still pays full tiles, so
    equiv = 2*M*ceil(N/128)*128*ceil(K/128)*128 (the number that predicts
    time on the 128x128 MXU),
  * VPU elementwise ops (mixing/softmax/LN/dropout chains),
  * HBM bytes (kernel operands in + outputs out; VMEM-resident
    intermediates are free).

Then places the step on the v5e roofline (197 TFLOP/s bf16, 819 GB/s HBM)
and says, per family, which wall it sits against. This is the justification
artifact for kernel-change decisions (e.g. head-packing the dh=48
contractions).

Usage: python scripts_dev/roofline.py [measured_step_ms]
"""

from __future__ import annotations

import sys

PEAK_BF16 = 197e12       # TPU v5e dense bf16 FLOP/s
PEAK_HBM = 819e9         # TPU v5e HBM GB/s
PEAK_VPU = 3.9e12        # ~8x128 lanes x 4 ALUs x 0.94 GHz, f32 ops/s

# stock voc0712 recipe shapes
B, N, D, H = 8, 1024, 192, 4
DH = D // H              # 48
DEPTH, TOK, ENC, DEC, Q, FFN, C = 48, 2, 3, 6, 300, 2048, 21
STAGES = 2               # base + 1 refine decoder pass (batched)
T_CA = 1 + C             # class tokens
MAXT = 120               # repeated targets (24 x 5)
PROBLEMS = STAGES * DEC * B  # auction problems per step


def ceil(a, b):
    return -(-a // b)


def dot_cost(m, n, k):
    """(useful_flops, mxu_equiv_flops) of an (m,k)@(k,n) dot."""
    useful = 2 * m * n * k
    equiv = 2 * m * ceil(n, 128) * 128 * ceil(k, 128) * 128
    return useful, equiv


def acc(*costs):
    u = sum(c[0] for c in costs)
    e = sum(c[1] for c in costs)
    return u, e


def block_family():
    """48 patch blocks, fwd + bwd (bwd recomputes fwd minus save-residuals
    skips, then the grad chain ~ 2x fwd dots)."""
    q_tile = 512
    tiles = N // q_tile
    # fwd dots per sample. QK^T is the wl-FOLDED dot (pallas_block._mix_rows):
    # mixed_g = (q_all * row_g) @ k_all^T contracts over the FULL D=192 (2
    # MXU K-passes vs 1 for the unfolded DH=48 — but dots at these widths
    # are latency-bound, measured shape-insensitive), which deletes the
    # pre-softmax H^2 mixing from the VPU column below.
    # 'useful' stays the ALGORITHMIC count (unfolded DH contraction) so the
    # MFU figure is not inflated by fold-spent FLOPs; 'equiv' charges the
    # folded dot's real MXU occupancy (K=192 -> 2 passes).
    def qk_cost():
        alg, _ = dot_cost(q_tile, N, DH)
        _, eq = dot_cost(q_tile, N, D)
        return alg, eq

    fwd = acc(
        dot_cost(N, 3 * D, D),                      # qkv
        *(qk_cost() for _ in range(H * tiles)),     # folded QK^T
        *(dot_cost(q_tile, DH, N) for _ in range(H * tiles)),   # attn@V
        dot_cost(N, D, D),                          # proj
        dot_cost(N, FFN // (2048 // (4 * D)), D) if False else dot_cost(N, 4 * D, D),  # fc1
        dot_cost(N, D, 4 * D),                      # fc2
    )
    # VPU: post-softmax mix H^2 x (q_tile,N) mul+add (pre-mix folded into
    # the QK dot), softmax ~5 passes, fold row-scaling H x (q_tile, D)
    vpu_fwd = (H * H * 2 + H * 5) * N * N + H * N * D  # per sample
    # bwd = recompute(fwd minus attn@V and fc2 — save-residuals) + grad
    # chain (~2x fwd dots: each dot spawns dA and dB dots)
    recompute = acc(
        dot_cost(N, 3 * D, D),
        *(qk_cost() for _ in range(H * tiles)),
        dot_cost(N, 4 * D, D),
        dot_cost(N, D, D),
    )
    grads = tuple((2 * u, 2 * e) for u, e in [fwd])
    bwd = acc(recompute, *grads)
    vpu_bwd = vpu_fwd * 2.5
    # HBM per block per direction: x in, y out, params both ways, residuals
    bytes_fwd = B * N * D * 2 * 2 + 0.45e6 * 2 + B * 1.2e6  # x+y bf16, params, residuals
    bytes_bwd = B * N * D * 2 * 3 + 0.45e6 * 4 + B * 1.2e6  # x+dy+dx, params+grads
    return {
        "calls": DEPTH,
        "useful": B * (fwd[0] + bwd[0]),
        "equiv": B * (fwd[1] + bwd[1]),
        "vpu": B * (vpu_fwd + vpu_bwd),
        "bytes": bytes_fwd + bytes_bwd,
    }


def ca_family():
    TQ = T_CA
    fwd = acc(
        dot_cost(TQ + N, D, D),                    # k over all tokens? q/k/v
        dot_cost(TQ, D, D),
        dot_cost(TQ + N, D, D),
        *(dot_cost(TQ, TQ + N, DH) for _ in range(H)),
        *(dot_cost(TQ, DH, TQ + N) for _ in range(H)),
        dot_cost(TQ, D, D),
        dot_cost(TQ, 4 * D, D),
        dot_cost(TQ, D, 4 * D),
    )
    bwd = tuple(3 * v for v in fwd)
    vpu = H * 6 * TQ * (TQ + N) * 3.5
    bytes_ = B * ((N + TQ) * D * 2 * 2 + TQ * D * 2 * 4) + 0.6e6 * 6
    return {"calls": TOK, "useful": B * (fwd[0] + bwd[0]),
            "equiv": B * (fwd[1] + bwd[1]), "vpu": B * vpu, "bytes": bytes_}


def enc_family():
    fwd = acc(
        *(dot_cost(N, D, D) for _ in range(4)),
        *(dot_cost(N, N, DH) for _ in range(H)),
        *(dot_cost(N, DH, N) for _ in range(H)),
        dot_cost(N, FFN, D),
        dot_cost(N, D, FFN),
    )
    bwd = tuple(3 * v for v in fwd)
    vpu = H * 6 * N * N * 3.5
    bytes_ = B * (N * D * 2 * 4) + (4 * D * D + 2 * D * FFN) * 2 * 6
    return {"calls": ENC, "useful": B * (fwd[0] + bwd[0]),
            "equiv": B * (fwd[1] + bwd[1]), "vpu": B * vpu, "bytes": bytes_}


def dec_family():
    SQ = STAGES * Q  # both decoder passes batched
    fwd = acc(
        *(dot_cost(SQ, D, D) for _ in range(8)),          # self/cross projections
        *(dot_cost(SQ, SQ // STAGES, DH) for _ in range(H)),   # self-attn scores
        *(dot_cost(SQ, DH, SQ // STAGES) for _ in range(H)),
        *(dot_cost(SQ, N, 2 * DH) for _ in range(H)),     # cross at 2*d_model
        *(dot_cost(SQ, DH, N) for _ in range(H)),
        dot_cost(SQ, FFN, D),
        dot_cost(SQ, D, FFN),
    )
    bwd = tuple(3 * v for v in fwd)
    vpu = H * 6 * SQ * N * 3.5
    bytes_ = B * (SQ * D * 2 * 6 + N * D * 2 * 2) + (8 * D * D + 2 * D * FFN) * 2 * 6
    return {"calls": DEC, "useful": B * (fwd[0] + bwd[0]),
            "equiv": B * (fwd[1] + bwd[1]), "vpu": B * vpu, "bytes": bytes_}


def auction_family(iters=60):
    # per iteration: dense (T, Qp) compare/reduce work on VMEM state — VPU
    vpu = PROBLEMS * iters * MAXT * 384 * 10
    bytes_ = PROBLEMS * (MAXT * 384 * 4 + MAXT * 4 * 2)
    return {"calls": 1, "useful": 0, "equiv": 0, "vpu": vpu, "bytes": bytes_}


def optimizer_family(n_params=26.3e6):
    # flat AdamW: read p, mu, nu, lr_vec, g; write p, mu, nu (f32)
    bytes_ = n_params * 4 * 8
    return {"calls": 1, "useful": 0, "equiv": 0, "vpu": n_params * 12,
            "bytes": bytes_}


def main():
    step_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 91.1
    fams = {
        "patch blocks (x48)": block_family(),
        "class-attn blocks (x2)": ca_family(),
        "encoder layers (x3)": enc_family(),
        "decoder layers (x6, 2 stages)": dec_family(),
        "auction (all problems)": auction_family(),
        "flat AdamW tail": optimizer_family(),
    }
    tot = {k: 0.0 for k in ("useful", "equiv", "vpu", "bytes")}
    print(f"{'family':34s} {'useful GF':>10s} {'equiv GF':>9s} {'VPU Gop':>8s} "
          f"{'HBM MB':>7s} {'t_mxu ms':>8s} {'t_vpu ms':>8s} {'t_hbm ms':>8s} wall")
    for name, f in fams.items():
        u = f["useful"] * f["calls"]
        e = f["equiv"] * f["calls"]
        v = f["vpu"] * f["calls"]
        by = f["bytes"] * f["calls"]
        for k, val in (("useful", u), ("equiv", e), ("vpu", v), ("bytes", by)):
            tot[k] += val
        t_mxu = e / PEAK_BF16 * 1e3
        t_vpu = v / PEAK_VPU * 1e3
        t_hbm = by / PEAK_HBM * 1e3
        wall = max(t_mxu, t_vpu, t_hbm)
        bound = ["MXU", "VPU", "HBM"][[t_mxu, t_vpu, t_hbm].index(wall)]
        print(f"{name:34s} {u/1e9:10.1f} {e/1e9:9.1f} {v/1e9:8.1f} "
              f"{by/1e6:7.1f} {t_mxu:8.2f} {t_vpu:8.2f} {t_hbm:8.2f} {bound}")
    t_mxu = tot["equiv"] / PEAK_BF16 * 1e3
    t_vpu = tot["vpu"] / PEAK_VPU * 1e3
    t_hbm = tot["bytes"] / PEAK_HBM * 1e3
    print(f"\nstep totals: useful {tot['useful']/1e9:.0f} GF "
          f"(= {tot['useful']/1e9/step_ms*1000/1e3:.1f} TF/s at {step_ms} ms "
          f"= {tot['useful']/1e9/step_ms*1000/197e3*100:.1f}% MFU)")
    print(f"  MXU-equiv {tot['equiv']/1e9:.0f} GF -> {t_mxu:.1f} ms floor "
          f"({tot['equiv']/tot['useful']:.2f}x inflation from tile underfill)")
    print(f"  VPU {tot['vpu']/1e9:.0f} Gop -> {t_vpu:.1f} ms floor")
    print(f"  HBM {tot['bytes']/1e6:.0f} MB -> {t_hbm:.1f} ms floor")
    floor = max(t_mxu, t_vpu, t_hbm)
    print(f"  roofline floor max(MXU,VPU,HBM) = {floor:.1f} ms; measured "
          f"{step_ms:.1f} ms -> {floor/step_ms*100:.0f}% of the wall explained")
    print("  => the step is bound by",
          ["the MXU (tile-underfilled dots)", "the VPU (serial softmax/"
           "mixing chains)", "HBM"][[t_mxu, t_vpu, t_hbm].index(floor)])


if __name__ == "__main__":
    main()
