"""Head-to-head quality evidence: reference SPEINet (torch) vs this
framework, trained under an IDENTICAL budget (VERDICT r2 #3).

The reference repo ships no weights (experiment/ is a placeholder), so
golden-PSNR parity is impossible; the strongest available evidence is a
controlled experiment: instantiate the reference architecture in torch
(structure per /root/reference/model/speinet.py — the replica style of
tests/test_convert.py), train BOTH models on the SAME synthetic GoProRS
tree, with the SAME batch sequence (same window indices, same crops, same
flips — produced by the shared sample plan), the SAME loss (1*L1+2*HEM),
optimizer (Adam 1e-4) and step count, then evaluate both with the SAME
PSNR metric on the SAME eval windows.

Phases (so the slow single-core torch run can proceed in the background
while the TPU does other work):

    python scripts/head_to_head.py --phase gen            # tree + plan
    JAX_PLATFORMS=cpu python scripts/head_to_head.py --phase torch
    python scripts/head_to_head.py --phase jax            # TPU or CPU
    python scripts/head_to_head.py --phase report         # markdown table

Shared tiny config (CPU-trainable reference): n_feat=16, n_resblock=2,
embed_dim=64, depths=[2,2], heads=[4,4], ws=5, patch 80, batch 4 — the
same architecture shrunk identically on both sides.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# shrunk default (round-3/4 evidence config); env overrides allow the
# scale-step rerun (e.g. H2H_NFEAT=32 H2H_EMBED=128 H2H_DEPTHS=4,4 —
# VERDICT r4 #6) without editing the script
N_FEAT = int(os.environ.get("H2H_NFEAT", "16"))
N_RES = int(os.environ.get("H2H_NRES", "2"))
EMBED = int(os.environ.get("H2H_EMBED", "64"))
DEPTHS = tuple(int(v) for v in os.environ.get("H2H_DEPTHS", "2,2").split(","))
HEADS = tuple(int(v) for v in os.environ.get("H2H_HEADS", "4,4").split(","))
WS, MLP = 5, 2.0
PATCH = int(os.environ.get("H2H_PATCH", "80"))
BATCH, LR = 4, 1e-4
SEED = 11


def build_cfg():
    from speinet_tpu.config import Config, set_template

    return set_template(Config(template="SPEINet")).replace(
        n_feat=N_FEAT, n_resblock=N_RES, embed_dim=EMBED,
        depths=list(DEPTHS), num_heads=list(HEADS), window_size=WS,
        mlp_ratio=MLP, patch_size=PATCH, batch_size=BATCH, lr=LR,
        n_threads=1, process=True)


# --------------------------------------------------------------------------
# phase gen: dataset tree + deterministic sample plan
# --------------------------------------------------------------------------

def phase_gen(root: str, steps: int):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from speinet_tpu.data.gopro_rs import generate_dataset
    from quality_evidence import make_sharp_videos
    os.makedirs(root, exist_ok=True)
    sharp = os.path.join(root, "sharp")
    make_sharp_videos(os.path.join(sharp, "train"), n_videos=3, n_frames=120,
                      h=192, w=224, seed=SEED)
    # eval frames 180x220 -> lv3 45x55: window-multiple at ws=5, so the
    # torch replica (which, unlike the real reference, has no
    # check_image_size padding) and our model see identical unpadded grids
    make_sharp_videos(os.path.join(sharp, "eval"), n_videos=1, n_frames=40,
                      h=180, w=220, seed=SEED + 1)
    generate_dataset(os.path.join(sharp, "train"), os.path.join(root, "train"),
                     ratios=(0.5,), seed=SEED, mixed=False)
    generate_dataset(os.path.join(sharp, "eval"), os.path.join(root, "eval"),
                     ratios=(0.5,), seed=SEED + 1, mixed=False)

    cfg = build_cfg().replace(dir_data=os.path.join(root, "train"))
    from speinet_tpu.data.videodata import VideoDataset

    ds = VideoDataset(cfg, train=True)
    rng = np.random.default_rng(SEED)
    plan = {
        "steps": steps,
        "batch": BATCH,
        "indices": rng.integers(0, len(ds), size=(steps, BATCH)).tolist(),
        "seeds": rng.integers(0, 2**31 - 1, size=(steps, BATCH)).tolist(),
    }
    with open(os.path.join(root, "plan.json"), "w") as f:
        json.dump(plan, f)
    print(f"tree + plan ready under {root} ({steps} steps x {BATCH})")


def iter_batches(root: str, cfg):
    """Yield (inputs [B,5,3,h,w], gt_center [B,3,h,w]) float32 — identical
    in every phase (explicit per-sample rng through VIDEODATA.__getitem__)."""
    from speinet_tpu.data.videodata import VideoDataset

    with open(os.path.join(root, "plan.json")) as f:
        plan = json.load(f)
    ds = VideoDataset(cfg.replace(dir_data=os.path.join(root, "train")), train=True)
    mid = cfg.n_sequence // 2
    for step in range(plan["steps"]):
        rows = [ds.__getitem__(plan["indices"][step][j],
                               rng=np.random.default_rng(plan["seeds"][step][j]))
                for j in range(plan["batch"])]
        inputs = np.stack([r[0] for r in rows]).astype(np.float32)
        gt = np.stack([r[1][mid] for r in rows]).astype(np.float32)
        yield step, inputs, gt


def eval_windows(root: str, cfg, n_windows: int = 16):
    """Fixed eval set: the first n full-frame windows of the eval tree."""
    from speinet_tpu.data.videodata import VideoDataset

    ds = VideoDataset(cfg.replace(dir_data_test=os.path.join(root, "eval")),
                   train=False)
    rows = [ds[i] for i in range(0, min(len(ds), n_windows))]
    mid = cfg.n_sequence // 2
    inputs = np.stack([r[0] for r in rows]).astype(np.float32)
    gt = np.stack([r[1][mid] for r in rows]).astype(np.float32)
    return inputs, gt


def psnr_shave4(out: np.ndarray, gt: np.ndarray) -> float:
    """Reference util/utils.py:81-92 calc_psnr (shave=4, rgb_range=1)."""
    diff = (out - gt)[..., 4:-4, 4:-4]
    mse = float((diff ** 2).mean())
    return -10.0 * np.log10(max(mse, 1e-12))


# --------------------------------------------------------------------------
# torch replica of the reference SPEINet (structure per model/speinet.py;
# module replicas shared with tests/test_convert.py)
# --------------------------------------------------------------------------

def build_torch_model():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from test_convert import TRecons, TSwinIR

    def t_rl(img, n_iter, reg=0.01, k_size=5):
        # rcl.py:18-51 semantics on CPU: box-blur ratio correction with
        # NaN->0 / neg->0 clamps + Laplacian-regularized update
        k = torch.ones(1, 1, k_size, k_size) / (k_size ** 2)
        lap = torch.tensor([[0., -1., 0.], [-1., 4., -1.], [0., -1., 0.]]
                           ).view(1, 1, 3, 3)
        chans = []
        for c in range(img.shape[1]):
            ch = img[:, c:c + 1]
            d = ch.clone()
            for _ in range(n_iter):
                blurred = F.conv2d(d, k, padding=k_size // 2)
                corr = ch / blurred
                corr = torch.where(torch.isnan(corr), torch.zeros(()), corr)
                corr = torch.clamp_min(corr, 0.0)
                d = corr * (d + reg * F.conv2d(d, lap, padding=1))
            chans.append(d)
        return torch.cat(chans, 1)

    def gather_patches(unfolded, idx):
        # SearchTransfer.py:12-22 batched index-select along dim 2
        b, ck, _ = unfolded.shape
        return torch.gather(unfolded, 2,
                            idx.view(b, 1, -1).expand(b, ck, idx.shape[1]))

    class TSearchTransfer(nn.Module):
        def forward(self, lr3, ref3q, r1, r2, r3):
            # SearchTransfer.py:24-51
            lr_u = F.normalize(F.unfold(lr3, 3, padding=1), dim=1)
            rf_u = F.normalize(F.unfold(ref3q, 3, padding=1).permute(0, 2, 1),
                               dim=2)
            corr = torch.bmm(rf_u, lr_u)
            s, arg = torch.max(corr, dim=1)
            h, w = lr3.shape[-2:]
            t3 = F.fold(gather_patches(F.unfold(r3, 3, padding=1), arg),
                        (h, w), 3, padding=1) / 9.0
            t2 = F.fold(gather_patches(F.unfold(r2, 6, padding=2, stride=2), arg),
                        (h * 2, w * 2), 6, padding=2, stride=2) / 9.0
            t1 = F.fold(gather_patches(F.unfold(r1, 12, padding=4, stride=4), arg),
                        (h * 4, w * 4), 12, padding=4, stride=4) / 9.0
            return s.view(-1, 1, h, w), t3, t2, t1

    class TSelfTransfer(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.search1 = nn.Conv2d(f * 4, f * 2, 1)
            self.search2 = nn.Conv2d(f * 2, f, 1)

        def forward(self, lr3):
            # SearchTransfer.py:53-79: reference = transpose+flip of input
            ref = lr3.transpose(2, 3).flip(2)
            lr_u = F.normalize(F.unfold(lr3, 3, padding=1), dim=1)
            rf_u = F.normalize(F.unfold(ref, 3, padding=1).permute(0, 2, 1),
                               dim=2)
            s, _ = torch.max(torch.bmm(rf_u, lr_u), dim=1)
            h, w = lr3.shape[-2:]
            t2 = F.relu(self.search1(
                F.interpolate(lr3, scale_factor=2, mode="bicubic")))
            t1 = F.relu(self.search2(
                F.interpolate(t2, scale_factor=2, mode="bicubic")))
            return s.view(-1, 1, h, w), lr3, t2, t1

    class TorchSPEINet(nn.Module):
        """speinet.py:28-168 with the shrunk shared hyperparams."""

        def __init__(self, f=N_FEAT):
            super().__init__()
            self.n_sequence = 3
            self.swin = TSwinIR(f * 4, EMBED, DEPTHS, HEADS, WS, MLP)
            self.recons_net = TRecons(f=f, n_res=N_RES)
            self.SearchTransfer = TSearchTransfer()
            self.SelfTransfer = TSelfTransfer(f)
            self.conv_lv1 = nn.Conv2d(f * 2, f, 1)
            self.conv_lv2 = nn.Conv2d(f * 4, f * 2, 1)
            self.conv_lv3 = nn.Conv2d(f * 8, f * 4, 1)
            self.fusion = nn.Conv2d(f * 4 * 3, f * 4, 1)
            self.search3 = nn.Conv2d(f * 2, f * 2, 3, padding=1)
            self.search2 = nn.Conv2d(f * 4, f * 2, 1)
            self.search1 = nn.Conv2d(f * 4, f * 2, 1)
            self.search43 = nn.Conv2d(f, f, 3, padding=1)
            self.search33 = nn.Conv2d(f * 2, f, 3, padding=1)
            self.search13 = nn.Conv2d(f * 2, f, 1)

        def _enc3(self, img):
            r = self.recons_net
            return r.encoder_second(r.encoder_first(r.inBlock(img)))

        def _mid_features(self, frames):
            mid = frames[self.n_sequence // 2]
            return self._enc3(mid) + self._enc3(t_rl(mid, 5))

        def _neighbor_fusion(self, frames, f_mid):
            # speinet.py:75-90
            f_fusion = f_mid
            for i in range(self.n_sequence):
                if i == self.n_sequence // 2:
                    continue
                feats = self._enc3(frames[i]) + self._enc3(t_rl(frames[i], 1))
                f_fusion = torch.cat((f_fusion, self.swin_features(f_mid, feats)), 1)
            return f_fusion

        def swin_features(self, x3, y3):
            # swinir upsampler='' feature-space path (test_convert TSwinIR
            # already implements x + conv_last(res) on the feature maps)
            return self.swin(x3, y3)

        def _decode(self, f_fusion, s, t3, t2, t1):
            # speinet.py:92-120
            F_ = torch.nn.functional
            r = self.recons_net
            v3 = self.conv_lv3(torch.cat((f_fusion, t3), 1)) * s
            f_lv3 = f_fusion + v3
            d2 = r.decoder_second(f_lv3)
            f_v2 = self.conv_lv2(torch.cat((d2, t2), 1)) * F_.interpolate(
                s, scale_factor=2, mode="bicubic")
            f_lv2 = d2 + f_v2
            s1 = F_.relu(self.search1(F_.interpolate(f_lv3, scale_factor=2,
                                                     mode="bicubic")))
            s2 = F_.relu(self.search3(f_lv2))
            s11 = F_.relu(self.search2(torch.cat((d2, s1), 1)))
            s22 = F_.relu(self.search2(torch.cat((f_lv2, s2), 1)))
            f_v3 = d2 + s11
            f_lv2 = f_lv2 + s22
            d1 = r.decoder_first(f_lv2)
            f_v1 = self.conv_lv1(torch.cat((d1, t1), 1)) * F_.interpolate(
                s, scale_factor=4, mode="bicubic")
            f_lv1 = d1 + f_v1
            s13 = F_.relu(self.search13(F_.interpolate(f_v3, scale_factor=2,
                                                       mode="bicubic")))
            s23 = F_.relu(self.search33(F_.interpolate(f_lv2, scale_factor=2,
                                                       mode="bicubic")))
            s33 = F_.relu(self.search43(f_lv1))
            f_lv1 = (f_lv1 + F_.relu(self.search33(torch.cat((s13, s23), 1)))
                     + F_.relu(self.search33(torch.cat((s13, s33), 1)))
                     + F_.relu(self.search33(torch.cat((s23, s33), 1))))
            return r.outBlock(f_lv1)

        def _forward_sharp(self, x):
            # speinet.py:122-136
            frames = [x[:, i] for i in range(self.n_sequence)]
            r = self.recons_net
            sharp1 = r.inBlock(x[:, self.n_sequence + 1])
            sharp2 = r.encoder_first(sharp1)
            sharp3 = r.encoder_second(sharp2)
            f_mid = self._mid_features(frames)
            f_fusion = self.fusion(self._neighbor_fusion(frames, f_mid))
            s, t3, t2, t1 = self.SearchTransfer(f_fusion, sharp3, sharp1,
                                                sharp2, sharp3)
            return self._decode(f_fusion, s, t3, t2, t1)

        def _forward_blur(self, x):
            # speinet.py:138-148
            frames = [x[:, i] for i in range(self.n_sequence)]
            f_mid = self._mid_features(frames)
            f_fusion = self.fusion(self._neighbor_fusion(frames, f_mid))
            s, t3, t2, t1 = self.SelfTransfer(f_fusion)
            return self._decode(f_fusion, s, t3, t2, t1)

        def forward(self, x):
            # speinet.py:150-168 — route on frame[3] all-zero only
            zero3 = (x[:, 3] == 0).flatten(1).all(1)
            out = torch.empty((x.shape[0], x.shape[2], x.shape[3], x.shape[4]),
                              dtype=x.dtype)
            if zero3.any():
                out[zero3] = self._forward_blur(x[zero3])
            if (~zero3).any():
                out[~zero3] = self._forward_sharp(x[~zero3])
            return out

    return TorchSPEINet()


def torch_hem_loss(out, gt, rng):
    """Loss/hard_example_mining.py:14-47 semantics (mask in no-grad numpy)."""
    import torch

    with torch.no_grad():
        res = torch.sum(torch.abs(out - gt), dim=1, keepdim=True)
        b, _, h, w = res.shape
        flat = res.view(b, -1)
        thr = torch.sort(flat, dim=1, descending=True)[0][:, int(0.5 * h * w)]
        hard = (res > thr.view(b, 1, 1, 1)).float()
        rnd = np.zeros((b, h * w), np.float32)
        rnd[:, : int(0.1 * h * w)] = 1.0
        for i in range(b):
            rng.shuffle(rnd[i])
        mask = ((hard + torch.from_numpy(rnd.reshape(b, 1, h, w))) > 0).float()
    return torch.nn.functional.l1_loss(out * mask, gt * mask)


def phase_torch(root: str, out_json: str, eval_every: int, seed: int = SEED):
    import torch

    torch.manual_seed(seed)
    cfg = build_cfg()
    model = build_torch_model()
    n_par = sum(p.numel() for p in model.parameters())
    print(f"torch reference replica: {n_par/1e6:.2f} M params", flush=True)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    hem_rng = np.random.RandomState(seed)
    ev_in, ev_gt = eval_windows(root, cfg)
    ev_in_t = torch.from_numpy(ev_in)
    curve, t0 = [], time.time()

    def evaluate(step):
        model.eval()
        with torch.no_grad():
            outs = [model(ev_in_t[i:i + 1]).numpy() for i in range(len(ev_in))]
        model.train()
        p = float(np.mean([psnr_shave4(o[0], g) for o, g in zip(outs, ev_gt)]))
        curve.append({"step": step, "psnr": round(p, 4),
                      "wall_s": round(time.time() - t0, 1)})
        print(f"[torch] step {step}: eval PSNR {p:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        with open(out_json, "w") as f:
            json.dump({"framework": "torch-reference", "params_m": n_par / 1e6,
                       "curve": curve}, f, indent=1)

    model.train()
    for step, inputs, gt in iter_batches(root, cfg):
        x = torch.from_numpy(inputs)
        y = torch.from_numpy(gt)
        out = model(x)
        loss = torch.nn.functional.l1_loss(out, y) + 2.0 * torch_hem_loss(
            out, y, hem_rng)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 10 == 0:
            print(f"[torch] step {step}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (step + 1) % eval_every == 0:
            evaluate(step + 1)
    evaluate_final_needed = not curve or curve[-1]["step"] != step + 1
    if evaluate_final_needed:
        evaluate(step + 1)


def phase_jax(root: str, out_json: str, eval_every: int, seed: int = SEED):
    import jax
    import jax.numpy as jnp

    from speinet_tpu.models.speinet import SPEINet
    from speinet_tpu.training.train_state import (create_train_state,
                                                  make_eval_step,
                                                  make_train_step)
    from speinet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = build_cfg()
    model = SPEINet.from_config(cfg)
    ev_in, ev_gt = eval_windows(root, cfg)
    sample = jnp.zeros((BATCH, 5, 3, PATCH, PATCH), jnp.float32)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(seed), sample)
    n_par = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"jax model: {n_par/1e6:.2f} M params", flush=True)
    train_step = make_train_step(cfg, model, tx, mesh=None)
    eval_step = make_eval_step(model)
    rng = jax.random.PRNGKey(seed + 2)
    curve, t0 = [], time.time()

    def evaluate(step):
        outs = [np.asarray(eval_step(state.params, state.batch_stats,
                                     jnp.asarray(ev_in[i:i + 1])))
                for i in range(len(ev_in))]
        p = float(np.mean([psnr_shave4(o[0], g) for o, g in zip(outs, ev_gt)]))
        curve.append({"step": step, "psnr": round(p, 4),
                      "wall_s": round(time.time() - t0, 1)})
        print(f"[jax] step {step}: eval PSNR {p:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        with open(out_json, "w") as f:
            json.dump({"framework": "speinet_tpu", "params_m": n_par / 1e6,
                       "curve": curve}, f, indent=1)

    last = 0
    for step, inputs, gt in iter_batches(root, cfg):
        rng, k = jax.random.split(rng)
        state, total, _ = train_step(state, jnp.asarray(inputs),
                                     jnp.asarray(gt), k)
        if step % 10 == 0:
            print(f"[jax] step {step}: loss {float(total):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (step + 1) % eval_every == 0:
            evaluate(step + 1)
        last = step + 1
    if not curve or curve[-1]["step"] != last:
        evaluate(last)


def phase_report(root: str, out_md: str):
    """Aggregate every curve_{torch,jax}*.json under root (multi-seed)."""
    import glob as _glob
    import re as _re

    rows = {}   # (framework, seed) -> record
    for path in sorted(_glob.glob(os.path.join(root, "curve_*.json"))):
        m = _re.match(r"curve_(torch|jax)(?:_s(\d+))?\.json",
                      os.path.basename(path))
        if not m:
            continue
        with open(path) as f:
            rows[(m.group(1), int(m.group(2) or SEED))] = json.load(f)
    keys = sorted(rows, key=lambda k: (k[0] != "torch", k[1]))
    with open(out_md, "w") as f:
        f.write("# Head-to-head: reference architecture (torch) vs "
                "speinet_tpu\n\n")
        f.write("Identical synthetic GoProRS tree, identical batch sequence "
                "(shared sample plan), identical shrunk hyperparams "
                f"(n_feat={N_FEAT}, n_resblock={N_RES}, embed={EMBED}, "
                f"depths={list(DEPTHS)}, ws={WS}, patch={PATCH}, "
                f"batch={BATCH}, Adam lr={LR}, loss 1*L1+2*HEM). "
                "Eval: PSNR shave=4 on the same fixed eval windows. "
                "Seeds vary model init + HEM sampling only; the data/batch "
                "sequence is shared.\n\n")
        header = " | ".join(f"{fw} s{sd}" for fw, sd in keys)
        f.write(f"| step | {header} |\n|---|{'---|' * len(keys)}\n")
        steps = sorted({c["step"] for r in rows.values() for c in r["curve"]})
        for s in steps:
            cells = []
            for k in keys:
                v = next((c["psnr"] for c in rows[k]["curve"]
                          if c["step"] == s), None)
                cells.append(f"{v:.3f}" if v is not None else "—")
            f.write(f"| {s} | {' | '.join(cells)} |\n")
        for (fw, sd), r in [(k, rows[k]) for k in keys]:
            f.write(f"\n{fw} s{sd}: {r['params_m']:.2f} M params, final "
                    f"{r['curve'][-1]['psnr']:.3f} dB at step "
                    f"{r['curve'][-1]['step']} "
                    f"({r['curve'][-1]['wall_s']:.0f}s wall)\n")
    print(f"wrote {out_md}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", required=True,
                   choices=["gen", "torch", "jax", "report"])
    p.add_argument("--root", default="/tmp/head_to_head")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--eval_every", type=int, default=100)
    p.add_argument("--seed", type=int, default=SEED,
                   help="model-init/HEM seed (data plan stays fixed)")
    p.add_argument("--out", default="docs/quality_evidence/head_to_head.md")
    a = p.parse_args()
    suff = "" if a.seed == SEED else f"_s{a.seed}"
    if a.phase == "gen":
        phase_gen(a.root, a.steps)
    elif a.phase == "torch":
        phase_torch(a.root, os.path.join(a.root, f"curve_torch{suff}.json"),
                    a.eval_every, a.seed)
    elif a.phase == "jax":
        phase_jax(a.root, os.path.join(a.root, f"curve_jax{suff}.json"),
                  a.eval_every, a.seed)
    else:
        phase_report(a.root, a.out)


if __name__ == "__main__":
    main()
