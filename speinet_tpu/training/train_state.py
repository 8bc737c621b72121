"""Train state + jitted DP train/eval steps.

Replaces the reference trainer's optimizer plumbing (trainer/trainer.py:24-30:
Adam(lr, weight_decay) + StepLR(lr_decay, gamma)) with optax, and
`nn.DataParallel` with sharding annotations on one jitted step: batch
sharded over the 'dp' mesh axis, params replicated, gradient all-reduce
inserted by the XLA SPMD partitioner.

LR schedule parity note: the reference calls scheduler.step() at the TOP of
each epoch (trainer_swint_hsa_nsf.py:20), so epoch e (1-based) trains with
lr0 * gamma^floor(e / lr_decay). `lr_for_epoch` reproduces that, including
the one-epoch-early decay quirk (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speinet_tpu.config import Config
from speinet_tpu.training.loss import LossComputer, parse_loss_spec


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    lr: jnp.ndarray                      # current learning rate (mutable per epoch)
    gan: Any = None                      # adversarial plugin state (loss.py GAN branch)


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    """StepLR with step-at-top-of-epoch semantics (1-based epoch)."""
    return cfg.lr * (cfg.gamma ** (epoch // cfg.lr_decay))


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with torch-style weight decay (added to grads before moments)."""
    chain = []
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.epsilon))
    chain.append(optax.scale(-1.0))      # lr applied separately (mutable)
    return optax.chain(*chain)


def create_train_state(cfg: Config, model, rng: jax.Array,
                       sample_input: jnp.ndarray) -> Tuple[TrainState, Any]:
    variables = model.init(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    gan = None
    if any("GAN" in name for _, name in parse_loss_spec(cfg.loss)):
        from speinet_tpu.training.adversarial import init_gan_state

        b = sample_input.shape[0]
        h, w = sample_input.shape[-2:]
        gan = init_gan_state(jax.random.fold_in(rng, 7), (b, 3, h, w),
                             rgb_range=cfg.rgb_range)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state,
                       lr=jnp.asarray(cfg.lr, jnp.float32), gan=gan)
    return state, tx


def make_train_step(cfg: Config, model, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Build the jitted train step. batch = (input [B,5,3,H,W], gt [B,3,H,W])."""
    loss_computer = LossComputer(cfg.loss, rgb_range=cfg.rgb_range)

    def step_fn(state: TrainState, inp, gt, rng):
        drop_rng, hem_rng = jax.random.split(rng)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables, inp, train=True, mutable=["batch_stats"],
                rngs={"droppath": drop_rng})
            total, comps = loss_computer(out, gt, hem_rng, gan=state.gan)
            return total, (comps, mutated.get("batch_stats", {}), out)

        (total, (comps, new_bs, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * state.lr, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_gan = state.gan
        if loss_computer.has_gan:
            from speinet_tpu.training.adversarial import discriminator_step

            new_gan, dis_loss = discriminator_step(
                state.gan, out, gt, rgb_range=cfg.rgb_range, lr=state.lr)
            comps["DIS"] = dis_loss
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt,
                                  gan=new_gan)
        return new_state, total, comps

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh, batch_sh, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0,),
    )


def make_bn_stats_step(model, momentum: float = 0.99) -> Callable:
    """One jitted recalibration pass: the PER-BATCH BatchNorm statistics of
    `inp` under the current params. A mutable train-mode apply performs the
    EMA update new = m*old + (1-m)*batch, so batch = (new - m*old)/(1-m)."""

    def stats_fn(params, batch_stats, inp, rng):
        _, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, inp, train=True,
            mutable=["batch_stats"], rngs={"droppath": rng})
        return jax.tree.map(
            lambda n, o: (n - momentum * o) / (1.0 - momentum),
            mutated["batch_stats"], batch_stats)

    return jax.jit(stats_fn)


def recalibrate_batch_stats(model, params, batch_stats, inputs, rng,
                            momentum: float = 0.99, stats_step=None):
    """SWA-style BatchNorm recalibration: replace the EMA running statistics
    with the plain average of per-batch statistics over `inputs` (a list of
    input batches) under the CURRENT params.

    Why: the reference's TripletAttention gates are unbounded and its BN
    momentum is 0.01 (block.py:56), an EMA with a ~100-step time constant.
    Early in training the activation distribution drifts faster than the
    EMA tracks, and the stale statistics compound multiplicatively through
    ~18 gated ResBlocks — eval-mode output diverges from train-mode output
    by several dB until the stats catch up. Averaging per-batch mean AND
    per-batch var (torch's momentum=None cumulative-average convention)
    under the final weights removes the lag without touching parameters.
    """
    if not batch_stats:
        return batch_stats
    step = stats_step if stats_step is not None else make_bn_stats_step(
        model, momentum)
    acc = None
    for inp in inputs:
        rng, k = jax.random.split(rng)
        bs = step(params, batch_stats, inp, k)
        acc = bs if acc is None else jax.tree.map(jnp.add, acc, bs)
    n = max(1, len(inputs))
    return jax.tree.map(lambda a: a / n, acc)


def make_eval_step(model, mesh: Optional[Mesh] = None) -> Callable:
    def eval_fn(params, batch_stats, inp):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, inp, train=False)

    if mesh is None:
        return jax.jit(eval_fn)
    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return jax.jit(eval_fn, in_shardings=(repl, repl, batch_sh),
                   out_shardings=batch_sh)
