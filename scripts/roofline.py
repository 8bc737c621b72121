"""Roofline accounting for the 720p video-mode forward (one v5e chip).

Analytic per-frame FLOP counts from the SPEINet template dimensions
(config.py SPEINet: n_feat=32, n_resblock=3, k=5; swin embed=256, 36
blocks, heads=8, ws=5, mlp_ratio=2), joined with the measured component
times (profile_components.py / scripts/profile_video.py) and the chip's
demonstrated rates, printed as the roofline table committed in README.

Peaks used:
- bf16 matmul peak, v5e: 197 TFLOPS (datasheet); this relay's measured
  large-GEMM rate is ~260 TFLOPS on [8k,8k]x[8k,8k] bf16 (scripts/ab_*),
  so 197 is the conservative denominator.
- HBM: 819 GB/s (v5e datasheet).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
(no TPU needed - this is arithmetic, the measured ms are recorded inputs;
re-measure with profile_components.py / scripts/profile_video.py.)
"""

H, W = 720, 1280
F = 32                      # n_feat
K2 = 25                     # 5x5 conv taps
C = 256                     # swin embed dim
WS2 = 25                    # 5x5 window tokens
BLOCKS = 36                 # swin depth (6 groups x 6)
MLP_HIDDEN = 2 * C
PEAK_T = 197e12             # bf16 TFLOPS, v5e
HBM = 819e9

G = 1e9
T = 1e12


def conv_flops(h, w, cin, cout, k2=K2):
    return 2 * h * w * k2 * cin * cout


def encoder_leg():
    """in(3->f)+3RB @720p, enc1(f->2f,s2)+3RB @360p, enc2(2f->4f,s2)+3RB @180p.
    Each ResBlock = 2 kxk convs (SE/Triplet gates are <1% FLOPs)."""
    fl = conv_flops(H, W, 3, F)
    fl += 6 * conv_flops(H, W, F, F)                      # 3 RB @ lv1
    fl += conv_flops(H // 2, W // 2, F, 2 * F)            # stride-2 (out px)
    fl += 6 * conv_flops(H // 2, W // 2, 2 * F, 2 * F)    # 3 RB @ lv2
    fl += conv_flops(H // 4, W // 4, 2 * F, 4 * F)
    fl += 6 * conv_flops(H // 4, W // 4, 4 * F, 4 * F)    # 3 RB @ lv3
    return fl


def decoder():
    fl = 6 * conv_flops(H // 4, W // 4, 4 * F, 4 * F)     # dec2 3 RB
    fl += conv_flops(H // 2, W // 2, 4 * F, 2 * F, 9)     # up convT 3x3
    fl += 6 * conv_flops(H // 2, W // 2, 2 * F, 2 * F)    # dec1 3 RB
    fl += conv_flops(H, W, 2 * F, F, 9)
    fl += 6 * conv_flops(H, W, F, F)                      # out 3 RB
    fl += conv_flops(H, W, F, 3)
    return fl


def swin_per_frame(s_batch=2, g=8, compact=True, group_w=4, quad_h=4):
    """Two neighbor-fusion streams x 36 blocks at lv3 (180x320 tokens).
    'useful' counts window-local attention; 'issued' adds the packing
    waste. Non-compact [sgn, sgn] block-diagonal packing wastes
    sgn/25 = s*g on scores/AV; the compact column-grouped head-quad
    packing (pallas_swin._attn_compact, the shipped default) wastes
    (group_w*25/25) x (quad_h*hd/hd) = group_w*quad_h (16x at GW4 QH4)
    independent of s and g - the price of filling the 128-lane MXU with
    5x5 windows and 32-wide heads."""
    l = (H // 4) * (W // 4)
    per_block_proj = (2 * l * C * 2 * C      # kv
                      + 2 * l * C * C        # q
                      + 2 * l * C * C        # proj
                      + 2 * 2 * l * C * MLP_HIDDEN)
    attn_useful = 2 * 2 * l * WS2 * C        # scores + weighted sum
    waste = (group_w * quad_h) if compact else (s_batch * g)
    attn_issued = attn_useful * waste
    streams = 2
    return (streams * BLOCKS * (per_block_proj + attn_useful),
            streams * BLOCKS * (per_block_proj + attn_issued))


def main():
    # measured per-frame ms (720p, bf16, batch-4 profile amortized to
    # per-frame; round-5 re-profile: profile_components.py PROF_BATCH=4
    # (421 ms x7 legs -> 45 for the video-mode 3; swin 359 / 4; corr
    # 177.2 / 4; decoder 85.3 / 4) and the sharp-routed TransferUnit
    # 384 ms / 4 = 96 minus the corr kernel and the measured 40.4 ms/frame
    # combined-gather saving (scripts/ab_gf3.py: 286.1 -> 124.6 ms at b=4)
    measured = {
        "encoder (3 legs, video mode)": (3 * encoder_leg(), 45.0),
        "swin fusion (2 streams x 36 blocks)": (None, 90.0),
        "correlation search (online max/argmax)": (7.6e12, 44.0),
        "transfer/gather_fold + fusion glue": (0.5e12, 12.0),
        "decoder (dec2+dec1+out)": (decoder(), 21.0),
    }
    useful, issued = swin_per_frame(s_batch=2, g=16)
    print(f"{'component':44s} {'TFLOP':>7s} {'ms':>6s} {'TFLOPS':>7s} {'%peak':>6s}")
    tot_fl, tot_ms = 0.0, 0.0
    for name, (fl, ms) in measured.items():
        if fl is None:
            fl = useful
        rate = fl / (ms / 1e3)
        print(f"{name:44s} {fl / T:7.2f} {ms:6.1f} {rate / T:7.1f} "
              f"{100 * rate / PEAK_T:5.1f}%")
        tot_fl += fl
        tot_ms += ms
    swin_ms = measured["swin fusion (2 streams x 36 blocks)"][1]
    print(f"{'swin issued incl. compact packing waste':44s} "
          f"{issued / T:7.2f} {'':6s} {issued / T / (swin_ms / 1e3):7.1f}")
    print("-" * 78)
    rate = tot_fl / (tot_ms / 1e3)
    print(f"{'sum of profiled components':44s} {tot_fl / T:7.2f} {tot_ms:6.1f} "
          f"{rate / T:7.1f} {100 * rate / PEAK_T:5.1f}%")
    best = 169e12   # correlation kernel's demonstrated rate on this chip
    print(f"\nper-frame useful FLOPs: {tot_fl / T:.1f} TFLOP")
    print(f"floor at bf16 peak (197 TFLOPS):            "
          f"{tot_fl / PEAK_T * 1e3:6.1f} ms/frame = {PEAK_T / tot_fl:5.1f} fps")
    print(f"floor at the demonstrated kernel rate (169): "
          f"{tot_fl / best * 1e3:6.1f} ms/frame = {best / tot_fl:5.1f} fps")
    print(f"HBM floor (~6 GB/frame activation traffic):  "
          f"{6e9 / HBM * 1e3:6.1f} ms/frame")


if __name__ == "__main__":
    main()
