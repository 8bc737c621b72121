"""Epoch trainer (parity: trainer/trainer.py + trainer_swint_hsa_nsf.py).

train(): per-epoch — set lr by the step-at-top StepLR rule, iterate
batches (center GT frame as target, trainer_swint_hsa_nsf.py:31-32),
jitted DP train step, print every print_every batches in the reference's
log format. test(): full-res eval, PSNR shave=4, best checkpoint by max
epoch PSNR, optional image dumps. terminate(): test_only short-circuit or
epoch >= epochs (trainer/trainer.py:38-44).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from speinet_tpu.config import Config
from speinet_tpu.data.loader import Data, prefetch_to_device
from speinet_tpu.ops.metrics import psnr_shave, postprocess_uint8
from speinet_tpu.parallel.mesh import (batch_sharding, make_mesh_for_batch,
                                       replicate_sharding)
from speinet_tpu.training.train_state import (create_train_state, lr_for_epoch,
                                              make_eval_step, make_train_step)
from speinet_tpu.utils.checkpoint import CheckpointManager
from speinet_tpu.utils.logging import Logger


class Trainer:
    def __init__(self, cfg: Config, data: Data, model, logger: Logger,
                 mesh=None):
        self.cfg = cfg
        self.data = data
        self.model = model
        self.ckp = logger
        self.mesh = mesh if mesh is not None else make_mesh_for_batch(
            cfg.batch_size, cfg.dp_devices)
        self.ckpt = CheckpointManager(f"{logger.dir}/model",
                                      save_middle=cfg.save_middle_models)

        sample = jnp.zeros((1, cfg.n_sequence + 2, cfg.n_colors,
                            max(cfg.size_must_mode * 10, 40),
                            max(cfg.size_must_mode * 10, 40)), jnp.float32)
        rng = jax.random.PRNGKey(cfg.seed)
        self.state, self.tx = create_train_state(cfg, model, rng, sample)

        restored = None
        if cfg.resume or cfg.load != ".":
            restored = self.ckpt.restore(self.state, "model_latest")
        elif cfg.test_only:
            restored = self.ckpt.restore(self.state, "model_best")
        if restored is not None:
            self.state = restored
            self.ckp.write_log(f"Restored checkpoint at step {int(self.state.step)}")
        elif cfg.pre_train != ".":
            import orbax.checkpoint as ocp
            import os
            if os.path.exists(cfg.pre_train):
                tree = ocp.StandardCheckpointer().restore(os.path.abspath(cfg.pre_train))
                self.state = self.state.replace(params=tree["params"],
                                                batch_stats=tree.get("batch_stats", {}))
                self.ckp.write_log(f"Loaded pre-trained weights from {cfg.pre_train}")

        self.state = jax.device_put(self.state, replicate_sharding(self.mesh))
        self.train_step = make_train_step(cfg, model, self.tx, mesh=self.mesh)
        # eval is sharded over the same mesh: per-epoch test() batches
        # eval frames to the mesh size (the reference's eval runs under
        # DataParallel too, trainer_swint_hsa_nsf.py:53-94)
        self.eval_step = make_eval_step(model, mesh=self.mesh)
        self.rng = jax.random.PRNGKey(cfg.seed + 1)
        # epoch counter resumes from the restored metric log (trainer.py:19-22)
        self.epoch = len(self.ckp.psnr_log)

    # ------------------------------------------------------------------
    def terminate(self) -> bool:
        if self.cfg.test_only:
            self.test()
            return True
        return self.epoch >= self.cfg.epochs

    # ------------------------------------------------------------------
    def train(self):
        self.epoch += 1
        lr = lr_for_epoch(self.cfg, self.epoch)
        self.state = self.state.replace(lr=jnp.asarray(lr, jnp.float32))
        self.ckp.write_log(f"Epoch {self.epoch:3d} with Lr {lr:.2e}")
        from speinet_tpu.training.loss import LossComputer
        self.ckp.start_log(comp_names=LossComputer(self.cfg.loss).names)
        sharding = batch_sharding(self.mesh)
        n_batches = 0
        t0 = time.time()
        # loss accumulators stay ON DEVICE between syncs: a float() per
        # step is a blocking host readback through the TPU relay that
        # serializes host data prep against device execution; one sync per
        # print_every window keeps the pipeline full
        run_total = run_comps = None
        last_comps = None

        def flush():
            nonlocal run_total, run_comps
            if run_total is None:
                return
            self.ckp.report_log(float(run_total),
                                components={k: float(v)
                                            for k, v in run_comps.items()})
            run_total = run_comps = None

        for batch, sample in enumerate(
                prefetch_to_device(iter(self.data.loader_train), sharding)):
            inputs, gts = sample[0], sample[1]   # 5-tuples carry blur maps
            gt_center = gts[:, self.cfg.n_sequence // 2]
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, total, comps = self.train_step(self.state, inputs,
                                                       gt_center, step_rng)
            if run_total is None:
                run_total, run_comps = total, dict(comps)
            else:
                run_total = run_total + total
                run_comps = {k: run_comps[k] + v for k, v in comps.items()}
            last_comps = comps
            n_batches += 1
            if (batch + 1) % self.cfg.print_every == 0:
                flush()
                comp_str = "".join(
                    f"[{k}: {float(v):.4f}]" for k, v in last_comps.items())
                self.ckp.write_log(
                    f"[{(batch + 1) * self.cfg.batch_size}/"
                    f"{len(self.data.loader_train) * self.cfg.batch_size}]\t"
                    f"Loss : [total: {self.ckp.loss_log[-1] / (batch + 1):.4f}]"
                    f"{comp_str}[{(time.time() - t0) / (batch + 1):.2f}s/b]")
        flush()
        self.ckp.end_log(max(n_batches, 1))

    # ------------------------------------------------------------------
    def test(self):
        self.ckp.write_log("\nEvaluation:")
        if self.cfg.bn_recalib > 0 and self.state.batch_stats:
            from speinet_tpu.training.train_state import recalibrate_batch_stats
            batches = []
            for sample in self.data.loader_train:
                batches.append(jnp.asarray(sample[0]))
                if len(batches) >= self.cfg.bn_recalib:
                    break
            self.rng, k = jax.random.split(self.rng)
            if not hasattr(self, "_bn_stats_step"):
                from speinet_tpu.training.train_state import make_bn_stats_step
                self._bn_stats_step = make_bn_stats_step(self.model)
            new_bs = recalibrate_batch_stats(self.model, self.state.params,
                                             self.state.batch_stats, batches, k,
                                             stats_step=self._bn_stats_step)
            self.state = self.state.replace(batch_stats=new_bs)
        self.ckp.start_log(train=False)
        n = 0
        params = self.state.params
        batch_stats = self.state.batch_stats
        # eval batches fill the dp mesh (batch-1 full frames would leave
        # mesh.size - 1 devices idle); trailing/odd-shaped batches padded
        # by repeating the last sample, padding results discarded
        dp = self.mesh.size
        pend = []

        def flush():
            nonlocal n
            if not pend:
                return
            n_real = len(pend)
            rows = pend + [pend[-1]] * (dp - n_real)
            inputs = jnp.asarray(np.concatenate([r[0] for r in rows]))
            gt = jnp.asarray(np.concatenate(
                [r[1][:, self.cfg.n_sequence // 2] for r in rows]))
            out = self.eval_step(params, batch_stats, inputs)
            for i in range(n_real):
                psnr = float(psnr_shave(gt[i], out[i],
                                        rgb_range=self.cfg.rgb_range))
                self.ckp.report_log(psnr, train=False)
                n += 1
                if self.cfg.save_images:
                    filename = pend[i][2][0][self.cfg.n_sequence // 2]
                    center_in = inputs[i, self.cfg.n_sequence // 2]
                    imgs = [np.asarray(postprocess_uint8(gt[i], self.cfg.rgb_range)),
                            np.asarray(postprocess_uint8(center_in, self.cfg.rgb_range)),
                            np.asarray(postprocess_uint8(out[i], self.cfg.rgb_range))]
                    self.ckp.save_images(filename, imgs, self.epoch)
            pend.clear()

        for sample in self.data.loader_test:
            inputs, gts, labels, names = sample[0], sample[1], sample[2], sample[3]
            if pend and np.shape(pend[0][0]) != np.shape(inputs):
                flush()   # frame size changed (e.g. across datasets)
            pend.append((np.asarray(inputs), np.asarray(gts), names))
            if len(pend) == dp:
                flush()
        flush()
        self.ckp.end_log(max(n, 1), train=False)
        best_idx = int(np.argmax(self.ckp.psnr_log))
        best_val = self.ckp.psnr_log[best_idx]
        self.ckp.write_log(
            f"[{self.cfg.data_test}]\taverage PSNR: {self.ckp.psnr_log[-1]:.3f} "
            f"(Best: {best_val:.3f} @epoch {best_idx + 1})")
        if not self.cfg.test_only:
            self.ckpt.save(self.state, self.epoch,
                           is_best=(best_idx + 1 == self.epoch))
            self.ckp.save_metrics()
