"""Inference engine (parity: inference_SPEINet.py).

Self-contained end-to-end evaluation: per video — load or infer sharp
labels, build border-padded sliding windows with pre/sub sharp frames,
run the jitted forward (whole windows batched over the dp mesh; optional
4-tile spatial chop), compute PSNR (border-crop 4, float64 host parity) and
MATLAB SSIM, save PNGs, and write the reference's `inference_log` format
including per-frame pre/forward/post timings and per-video + total
averages (inference_SPEINet.py:338-429).

    python -m speinet_tpu.infer --data_path <tree> --model_path <ckpt-dir> \
        --result_path ./infer_results
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import List, Optional

import imageio.v2 as imageio
import numpy as np
import jax
import jax.numpy as jnp

from speinet_tpu.config import Config, set_template
from speinet_tpu.data.indices import frame_number, gene_seq, gene_seq_nsf
from speinet_tpu.detector.classifier import LogisticRegressionJAX
from speinet_tpu.detector.train import video_features
from speinet_tpu.models.speinet import SPEINet
from speinet_tpu.ops.metrics import psnr_uint8_host, ssim_matlab
from speinet_tpu.parallel.chop import chop_forward
from speinet_tpu.parallel.mesh import (batch_sharding, make_mesh_for_batch,
                                       replicate_sharding)


class TraverseLogger:
    """Parity: inference_SPEINet.py:26-34."""

    def __init__(self, result_dir: str, filename: str = "inference_log.txt"):
        self.path = os.path.join(result_dir, filename)
        open_type = "a" if os.path.exists(self.path) else "w"
        self.f = open(self.path, open_type)

    def write_log(self, log: str):
        print(log, flush=True)
        self.f.write(log + "\n")
        self.f.flush()


def forward_x8(x: jnp.ndarray, fwd) -> jnp.ndarray:
    """8-way flip/rotation self-ensemble (capability parity:
    util/network_utils.py:308-341). x: [B, T, C, H, W]."""
    outs = []
    for tf in range(8):
        xt = x
        if tf & 1:
            xt = jnp.flip(xt, -1)
        if tf & 2:
            xt = jnp.flip(xt, -2)
        if tf & 4:
            xt = jnp.swapaxes(xt, -1, -2)
        y = fwd(xt)
        if tf & 4:
            y = jnp.swapaxes(y, -1, -2)
        if tf & 2:
            y = jnp.flip(y, -2)
        if tf & 1:
            y = jnp.flip(y, -1)
        outs.append(y)
    return jnp.mean(jnp.stack(outs), axis=0)


class Inference:
    def __init__(self, cfg: Config, data_path: str, model_path: str,
                 result_path: str, save_image: bool = True, border: bool = True,
                 detector_pickle: Optional[str] = None,
                 self_ensemble: bool = False, batch_windows: int = 1,
                 cache_pyramids: bool = False):
        self.cfg = cfg
        self.n_seq = cfg.n_sequence
        self.size_must_mode = cfg.size_must_mode
        self.save_image = save_image
        self.border = border
        self.data_path = data_path
        self.result_path = result_path
        self.detector_pickle = detector_pickle
        self.self_ensemble = self_ensemble
        self.batch_windows = max(1, batch_windows)
        self.cache_pyramids = cache_pyramids
        # data-parallel mesh over the window batch — the TPU-native analog
        # of the reference engine's nn.DataParallel + <=4-GPU forward_chop
        # (inference_SPEINet.py:234-235,569). dp_devices=0 -> all local
        # devices (same convention as training).
        n_target = cfg.dp_devices if cfg.dp_devices > 0 else len(jax.devices())
        if n_target > 1 and not cfg.chop and self.batch_windows % n_target:
            # round the window batch up to fill the mesh
            self.batch_windows = -(-self.batch_windows // n_target) * n_target
        eff_batch = 4 * self.batch_windows if cfg.chop else self.batch_windows
        mesh = make_mesh_for_batch(eff_batch, n_target)
        self.mesh = mesh if mesh.size > 1 else None
        os.makedirs(result_path, exist_ok=True)
        self.input_path = os.path.join(data_path, "blur")
        self.gt_path = os.path.join(data_path, "gt")
        self.label_path = os.path.join(data_path, "label")

        now = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
        self.logger = TraverseLogger(result_path, f"inference_log_{now}.txt")
        self.logger.write_log(f"Inference - {now}")
        for k, v in [("save_image", save_image), ("border", border),
                     ("model_path", model_path), ("data_path", data_path),
                     ("result_path", result_path), ("n_seq", self.n_seq),
                     ("size_must_mode", self.size_must_mode),
                     ("device", str(jax.devices()))]:
            self.logger.write_log(f"{k}: {v}")

        self.model = SPEINet.from_config(cfg)
        self.params, self.batch_stats = self._load_weights(model_path)
        self.logger.write_log(f"Loading model from {model_path}")
        if self.mesh is not None:
            self.logger.write_log(
                f"dp mesh: {self.mesh.size} devices, "
                f"batch_windows={self.batch_windows}")
            self.params = jax.device_put(self.params,
                                         replicate_sharding(self.mesh))
            self.batch_stats = jax.device_put(self.batch_stats,
                                              replicate_sharding(self.mesh))
            bsh = batch_sharding(self.mesh)
        else:
            bsh = None

        def _c(a):
            """Constrain the leading (batch) axis to the dp mesh; a
            constraint (not in_shardings) so committed eager intermediates
            reshard instead of erroring."""
            return (jax.lax.with_sharding_constraint(a, bsh)
                    if bsh is not None else a)

        # params passed as traced args (not closure constants) so one
        # compiled program serves any weights
        self._fwd_jit = jax.jit(
            lambda p, b, x: self._forward(p, b, _c(x)))
        self._fwd_chop_jit = jax.jit(self._forward_chop)
        self._fwd = lambda x: self._fwd_jit(self.params, self.batch_stats, x)
        self._fwd_chop = lambda x: self._fwd_chop_jit(self.params,
                                                      self.batch_stats, x)
        if self.cache_pyramids:
            mv = self._make_variables
            # legs returns PER-FRAME slices from inside the program (the
            # cache stores per-frame features; un-jitted m[k:k+1] slicing
            # was 2 extra device dispatches per frame)
            def _legs_split(p, b, f):
                m, n = self.model.apply(mv(p, b), _c(f),
                                        method=SPEINet.encode_window_legs)
                return tuple((m[k : k + 1], n[k : k + 1])
                             for k in range(f.shape[0]))
            self._jit_legs = jax.jit(_legs_split)
            self._jit_anchor = jax.jit(lambda p, b, f: self.model.apply(
                mv(p, b), f, method=SPEINet.anchor_pyramid))
            # one restore program per host-known routing mode (the reference
            # engine routes host-side too, speinet.py:150-168): an all-sharp
            # chunk skips the SelfTransfer compute, an all-self chunk skips
            # the gather_folds; 'mixed' handles any split. Compiled lazily
            # on first use.
            # the per-window cached slices enter as TUPLES and are
            # concatenated INSIDE the program: 6 host-level jnp.concatenate
            # dispatches per chunk (~600 MB of relay round-trips at bw=8,
            # p1 alone is 8 x [1,720,1280,32]) become on-device ops XLA
            # fuses with their consumers. Tuple length == batch_windows is
            # static, so each routing still compiles exactly once.
            cat = lambda parts: (parts[0] if len(parts) == 1
                                 else jnp.concatenate(parts))
            self._jit_restore_by_routing = {
                routing: jax.jit(
                    lambda p, b, m, n0, n1, p1, p2, p3, hs,
                    _r=routing: self.model.apply(
                        mv(p, b), _c(cat(m)), (_c(cat(n0)), _c(cat(n1))),
                        _c(cat(p1)), _c(cat(p2)),
                        _c(cat(p3)), _c(hs), routing=_r,
                        method=SPEINet.restore_from_features))
                for routing in ("mixed", "sharp", "self")}
            self._jit_restore = self._jit_restore_by_routing["mixed"]

    def _load_weights(self, model_path: str):
        if model_path and os.path.exists(model_path):
            import orbax.checkpoint as ocp
            tree = ocp.StandardCheckpointer().restore(os.path.abspath(model_path))
            return tree["params"], tree.get("batch_stats", {})
        # random init (smoke/demo mode)
        x = jnp.zeros((1, 5, 3, 80, 80), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(0), x)
        return variables["params"], variables.get("batch_stats", {})

    @staticmethod
    def _make_variables(params, batch_stats):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    def _forward(self, params, batch_stats, x):
        return self.model.apply(self._make_variables(params, batch_stats), x,
                                train=False)

    def _forward_chop(self, params, batch_stats, x):
        # recursive above 6*160000 px so >720p frames still fit
        # (parity: inference_SPEINet.py:545,565,578-584); under a dp mesh
        # the 4B tiles are distributed over the devices (the reference
        # dispatches quadrants over <=4 GPUs, inference_SPEINet.py:569)
        fwd = lambda tiles: self.model.apply(
            self._make_variables(params, batch_stats), tiles, train=False)
        ts = batch_sharding(self.mesh) if self.mesh is not None else None
        return chop_forward(fwd, x, shave=self.cfg.chop_shave,
                            tile_sharding=ts)

    # ------------------------------------------------------------------
    def _labels_for_video(self, v: str, input_frames: List[str]) -> np.ndarray:
        if os.path.exists(self.label_path):
            return np.load(os.path.join(self.label_path, v + ".npy"))
        # on-the-fly sharpness detection (inference_SPEINet.py:349-353)
        frames = np.stack([imageio.imread(p) for p in input_frames])
        feats = video_features(frames, kernel_size=11)
        model = LogisticRegressionJAX.load(self.detector_pickle)
        return np.asarray(model.predict(feats)).reshape(-1)

    def _prepare_window(self, in_seq, gt_seq, pre_seq, sub_seq, padded_inputs):
        """Decode + crop + zero-rule one window (host side, thread-safe)."""
        filename = os.path.basename(in_seq[self.n_seq // 2]).split(".")[0]
        seq = list(in_seq)
        seq.append(padded_inputs[pre_seq[0]])
        seq.append(padded_inputs[sub_seq[self.n_seq - 1]])
        names = [os.path.split(os.path.dirname(p))[-1] + "." +
                 os.path.splitext(os.path.basename(p))[0] for p in seq]
        nums = [frame_number(n) for n in names]
        inputs = [imageio.imread(p) for p in seq]
        gt = imageio.imread(gt_seq[self.n_seq // 2])
        h, w = inputs[self.n_seq // 2].shape[:2]
        nh, nw = h - h % self.size_must_mode, w - w % self.size_must_mode
        inputs = [im[:nh, :nw] for im in inputs]
        gt = gt[:nh, :nw]
        if abs(nums[2] - nums[3]) > 7:
            inputs[-2] = np.zeros_like(inputs[-2])
        if abs(nums[2] - nums[4]) > 7:
            inputs[-1] = np.zeros_like(inputs[-1])
        x = np.stack([im.transpose(2, 0, 1) for im in inputs]).astype(np.float32)
        x *= self.cfg.rgb_range / 255.0
        return filename, x, gt

    def _infer_video_cached(self, v, input_frames, gt_frames, labels, pool):
        """Sliding-window inference with cross-window feature caching
        (beyond-reference): the reference re-encodes all window frames per
        window — 7 encoder legs (inference_SPEINet.py:393, speinet.py:125-132)
        — but at stride 1 each frame serves ~3 windows and sharp anchors
        repeat across many, so the per-frame legs (enc, enc(RL1), enc(RL5))
        and anchor pyramids are computed once and reused. Numerically
        identical to the direct path (tests/test_infer_equivalence.py)."""
        n_seq = self.n_seq
        bw = max(1, self.batch_windows)
        pre_lists, sub_lists = gene_seq_nsf(labels, n_seq=n_seq,
                                            border=self.border)
        input_seqs, padded_inputs = gene_seq(input_frames, n_seq=n_seq,
                                             border=self.border)
        gt_seqs, _ = gene_seq(gt_frames, n_seq=n_seq, border=self.border)
        n_win = len(input_seqs)
        num = lambda p: int(os.path.splitext(os.path.basename(p))[0].
                            split(".")[-1])
        probe = imageio.imread(padded_inputs[n_seq // 2])
        nh = probe.shape[0] - probe.shape[0] % self.size_must_mode
        nw = probe.shape[1] - probe.shape[1] % self.size_must_mode

        def load_frame(path):
            im = imageio.imread(path)[:nh, :nw]
            return im.transpose(2, 0, 1).astype(np.float32) * (
                self.cfg.rgb_range / 255.0)

        last_pos = {}
        for i, p in enumerate(padded_inputs):
            last_pos[p] = i
        # per-window metadata: (center, (nb0, nb1), has_sharp, anchor_key)
        metas = []
        for w in range(n_win):
            c_path = padded_inputs[w + n_seq // 2]
            nb_paths = tuple(padded_inputs[w + i] for i in range(n_seq)
                             if i != n_seq // 2)
            # the >7-distance zero rule is measured from the LAST window
            # frame (reference inference_SPEINet.py:385-388 nums[2]; same
            # as _prepare_window), NOT from the window center
            ref_n = num(padded_inputs[w + n_seq - 1])
            hs = abs(ref_n - num(padded_inputs[pre_lists[w][0]])) <= 7
            sub_path = padded_inputs[sub_lists[w][n_seq - 1]]
            akey = sub_path if abs(ref_n - num(sub_path)) <= 7 else "<ZERO>"
            metas.append((c_path, nb_paths, hs, akey))

        decoded, feat, anchors = {}, {}, {}

        def ensure_feats(paths):
            need = [p for p in dict.fromkeys(paths) if p not in feat]
            while need:
                chunk = need[:bw]
                batch = chunk + [chunk[-1]] * (bw - len(chunk))
                arr = np.stack([decoded[p].result() for p in batch])
                outs = self._jit_legs(self.params, self.batch_stats,
                                      jnp.asarray(arr))
                for k, p in enumerate(chunk):
                    feat[p] = outs[k]
                need = need[bw:]

        def ensure_anchor(key):
            if key in anchors:
                return
            if key == "<ZERO>":
                arr = np.zeros((1, 3, nh, nw), np.float32)
            else:
                arr = decoded[key].result()[None]
            anchors[key] = self._jit_anchor(self.params, self.batch_stats,
                                            jnp.asarray(arr))

        video_psnr, video_ssim = [], []
        for s in range(0, n_win, bw):
            start = time.time()
            wins = list(range(s, min(s + bw, n_win)))
            # prefetch decodes for this chunk and the next
            for w in range(s, min(s + 2 * bw, n_win)):
                for p in (metas[w][0],) + metas[w][1] + (metas[w][3],):
                    if p != "<ZERO>" and p not in decoded and p not in feat:
                        decoded[p] = pool.submit(load_frame, p)
            gts = [pool.submit(lambda pth: imageio.imread(pth)[:nh, :nw],
                               gt_seqs[w][n_seq // 2]) for w in wins]
            chunk_paths = [p for w in wins
                           for p in (metas[w][0],) + metas[w][1]]
            for p in dict.fromkeys(chunk_paths):
                if p not in feat:
                    decoded[p].result()
            t_pre = time.time()
            ensure_feats(chunk_paths)
            for w in wins:
                ensure_anchor(metas[w][3])
            idxs = wins + [wins[-1]] * (bw - len(wins))
            m_b = tuple(feat[metas[i][0]][0] for i in idxs)
            n0_b = tuple(feat[metas[i][1][0]][1] for i in idxs)
            n1_b = tuple(feat[metas[i][1][1]][1] for i in idxs)
            p1_b = tuple(anchors[metas[i][3]][0] for i in idxs)
            p2_b = tuple(anchors[metas[i][3]][1] for i in idxs)
            p3_b = tuple(anchors[metas[i][3]][2] for i in idxs)
            hs_host = np.array([metas[i][2] for i in idxs], bool)
            hs_b = jnp.asarray(hs_host)
            routing = ("sharp" if hs_host.all()
                       else "self" if not hs_host.any() else "mixed")
            out = self._jit_restore_by_routing[routing](
                self.params, self.batch_stats, m_b, n0_b,
                n1_b, p1_b, p2_b, p3_b, hs_b)
            out.block_until_ready()
            t_fwd = time.time()
            imgs = np.asarray(jnp.transpose(jnp.clip(jnp.round(
                out * (255.0 / self.cfg.rgb_range)), 0, 255), (0, 2, 3, 1))
            ).astype(np.uint8)
            for k, w in enumerate(wins):
                filename = os.path.basename(metas[w][0]).split(".")[0]
                img, gt = imgs[k], gts[k].result()
                psnr = psnr_uint8_host(img, gt, crop_border=4)
                ssim = float(ssim_matlab(jnp.asarray(gt), jnp.asarray(img)))
                video_psnr.append(psnr)
                video_ssim.append(ssim)
                if self.save_image:
                    os.makedirs(os.path.join(self.result_path, v),
                                exist_ok=True)
                    imageio.imwrite(os.path.join(self.result_path, v,
                                                 f"{filename}.png"), img)
                t_post = time.time()
                nb = len(wins)
                self.logger.write_log(
                    f"> {v}-{filename} PSNR={psnr:.5}, SSIM={ssim:.4} "
                    f"pre_time:{(t_pre - start) / nb:.3}s, "
                    f"forward_time:{(t_fwd - t_pre) / nb:.3}s, "
                    f"post_time:{(t_post - t_fwd) / nb:.3}s, "
                    f"total_time:{(t_post - start) / nb:.3}s")
            # evict features/decodes no longer needed by remaining windows
            horizon = s + bw
            for p in [p for p, i in last_pos.items() if i < horizon]:
                feat.pop(p, None)
                decoded.pop(p, None)
            keep = {metas[w][3] for w in range(horizon, n_win)} | {"<ZERO>"}
            for p in [p for p in anchors if p not in keep]:
                anchors.pop(p)
        return video_psnr, video_ssim

    def infer(self):
        """Per-video loop (parity: inference_SPEINet.py:338-429), with
        windows decoded by a thread pool ahead of the device and batched
        `batch_windows` per forward."""
        from concurrent.futures import ThreadPoolExecutor

        total_psnr, total_ssim = {}, {}
        videos = sorted(os.listdir(self.input_path))
        pool = ThreadPoolExecutor(max_workers=self.cfg.n_threads)
        for v in videos:
            video_psnr, video_ssim = [], []
            input_frames = sorted(glob.glob(os.path.join(self.input_path, v, "*")))
            gt_frames = sorted(glob.glob(os.path.join(self.gt_path, v, "*")))
            labels = self._labels_for_video(v, input_frames)
            if self.cache_pyramids:
                video_psnr, video_ssim = self._infer_video_cached(
                    v, input_frames, gt_frames, labels, pool)
                total_psnr[v] = video_psnr
                total_ssim[v] = video_ssim
                continue
            pre_lists, sub_lists = gene_seq_nsf(labels, n_seq=self.n_seq,
                                                border=self.border)
            input_seqs, padded_inputs = gene_seq(input_frames, n_seq=self.n_seq,
                                                 border=self.border)
            gt_seqs, _ = gene_seq(gt_frames, n_seq=self.n_seq, border=self.border)

            futures = [pool.submit(self._prepare_window, a, b, c, d, padded_inputs)
                       for a, b, c, d in zip(input_seqs, gt_seqs, pre_lists,
                                             sub_lists)]
            bw = max(1, self.batch_windows)
            for start_i in range(0, len(futures), bw):
                start = time.time()
                chunk = [f.result() for f in futures[start_i : start_i + bw]]
                xs = np.stack([c[1] for c in chunk])
                if len(chunk) < bw:   # pad the trailing batch (stable shapes)
                    pad = np.repeat(xs[-1:], bw - len(chunk), axis=0)
                    xs = np.concatenate([xs, pad])
                x = jnp.asarray(xs)
                t_pre = time.time()
                fwd = self._fwd_chop if self.cfg.chop else self._fwd
                out = forward_x8(x, fwd) if self.self_ensemble else fwd(x)
                out.block_until_ready()
                t_fwd = time.time()
                imgs = np.asarray(jnp.transpose(jnp.clip(jnp.round(
                    out * (255.0 / self.cfg.rgb_range)), 0, 255), (0, 2, 3, 1))
                ).astype(np.uint8)
                for k, (filename, _, gt) in enumerate(chunk):
                    img = imgs[k]
                    psnr = psnr_uint8_host(img, gt, crop_border=4)
                    ssim = float(ssim_matlab(jnp.asarray(gt), jnp.asarray(img)))
                    video_psnr.append(psnr)
                    video_ssim.append(ssim)
                    if self.save_image:
                        os.makedirs(os.path.join(self.result_path, v), exist_ok=True)
                        imageio.imwrite(os.path.join(self.result_path, v,
                                                     f"{filename}.png"), img)
                    t_post = time.time()
                    nb = len(chunk)
                    self.logger.write_log(
                        f"> {v}-{filename} PSNR={psnr:.5}, SSIM={ssim:.4} "
                        f"pre_time:{(t_pre - start) / nb:.3}s, "
                        f"forward_time:{(t_fwd - t_pre) / nb:.3}s, "
                        f"post_time:{(t_post - t_fwd) / nb:.3}s, "
                        f"total_time:{(t_post - start) / nb:.3}s")
                total_psnr[v] = video_psnr
                total_ssim[v] = video_ssim

        # per-video per-frame metric lists, kept for callers/tests that
        # verify engine equivalence frame by frame
        self.total_psnr, self.total_ssim = total_psnr, total_ssim
        sum_psnr = sum_ssim = 0.0
        n_img = 0
        for k in total_psnr:
            self.logger.write_log(
                f"# Video:{k} AVG-PSNR={np.mean(total_psnr[k]):.5}, "
                f"AVG-SSIM={np.mean(total_ssim[k]):.4}")
            sum_psnr += sum(total_psnr[k])
            sum_ssim += sum(total_ssim[k])
            n_img += len(total_psnr[k])
        if n_img:
            self.logger.write_log(
                f"# Total AVG-PSNR={sum_psnr / n_img:.5}, "
                f"AVG-SSIM={sum_ssim / n_img:.4}")
        return (sum_psnr / n_img if n_img else 0.0,
                sum_ssim / n_img if n_img else 0.0)


def main(argv=None):
    import sys

    from speinet_tpu.config import parse_args as parse_config_args
    from speinet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(
        description="SPEINet-TPU Inference",
        epilog="Any Config field (--template, --compute_dtype, --dp_devices, "
               "--chop_shave, ...) is also accepted and overlaid on the "
               "template, exactly as in main_train.py.")
    p.add_argument("--save_image", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--chop", action="store_true",
                   help="4-tile spatial chopped forward")
    p.add_argument("--default_data", type=str, default="",
                   help="preset: REDS | GOPRO | BSD")
    p.add_argument("--data_path", type=str, default="./dataset/test")
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--result_path", type=str, default="./infer_results")
    p.add_argument("--detector_pickle", type=str, default="")
    p.add_argument("--self_ensemble", action="store_true",
                   help="8-way flip/rot ensemble (forward_x8)")
    p.add_argument("--batch_windows", type=int, default=1,
                   help="sliding windows per forward pass")
    p.add_argument("--cache_pyramids", action="store_true",
                   help="reuse per-frame encoder features across sliding "
                        "windows (identical outputs, ~2x fewer encoder legs)")
    p.add_argument("--profile", type=str, default="",
                   help="write a jax.profiler trace to this directory")
    argv = list(sys.argv[1:] if argv is None else argv)
    args, config_argv = p.parse_known_args(argv)
    # remaining flags are Config fields (--compute_dtype bfloat16,
    # --template, --dp_devices, ...) — the same auto-generated surface as
    # the training CLI (config.parse_args), so the benchmarked bf16 engine
    # configuration is reachable from this entry point
    cfg = parse_config_args(config_argv).replace(chop=args.chop)

    # dataset presets (parity: inference_SPEINet.py:626-697 — the reference
    # hardcodes absolute user paths; here presets fill defaults relative to
    # the working tree and keep the template hyperparameters)
    presets = {
        "REDS": ("./data/deblur/REDS_8x_Random/test", "./infer_results/reds"),
        "GOPRO": ("./data/deblur/GOPRO/test", "./infer_results/gopro"),
        "BSD": ("./data/deblur/BSDtest", "./infer_results/bsd"),
        "BSDtest_all": ("./data/deblur/BSDtest_all/BSD_3ms24ms",
                        "./infer_results/bsd_3ms24ms"),
    }
    if args.default_data:
        if args.default_data not in presets:
            raise SystemExit(f"unknown preset {args.default_data}; "
                             f"choose from {sorted(presets)}")
        dpath, rpath = presets[args.default_data]
        if args.data_path == "./dataset/test":
            args.data_path = dpath
        if args.result_path == "./infer_results":
            args.result_path = rpath

    inf = Inference(cfg, args.data_path, args.model_path, args.result_path,
                    save_image=args.save_image, border=cfg.border,
                    detector_pickle=args.detector_pickle or None,
                    self_ensemble=args.self_ensemble,
                    batch_windows=args.batch_windows,
                    cache_pyramids=args.cache_pyramids)
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            inf.infer()
    else:
        inf.infer()


if __name__ == "__main__":
    main()
