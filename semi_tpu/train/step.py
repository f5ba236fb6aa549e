"""The jitted training / evaluation step.

One call = the reference's per-item work (train.py:179-223): streaming
forward over all chunks, loss, backprop, gradient accumulation, and a
conditional optimizer apply every ``accum_every`` micro-steps with
global-norm clipping — all inside a single XLA program. Model streaming
state threads through so the dataset's flag/continuation protocol works
exactly as in the reference.

Data-parallel: jit with the batch sharded over a 1-D mesh; the batch-
mean loss makes XLA insert the gradient all-reduce over ICI itself.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from semi_tpu.train.optim import PlateauState, make_optimizer, plateau_init

__all__ = ["TrainState", "init_train_state", "make_train_step", "make_eval_step"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    grad_accum: Any
    accum_count: jax.Array
    plateau: PlateauState
    step: jax.Array


def init_train_state(params, lr: float, max_grad_norm: float = 5.0) -> TrainState:
    tx = make_optimizer(max_grad_norm)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        grad_accum=jax.tree.map(jnp.zeros_like, params),
        accum_count=jnp.zeros((), jnp.int32),
        plateau=plateau_init(lr),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model, accum_every: int = 2, max_grad_norm: float = 5.0,
                    loss_kwargs: dict | None = None):
    """Returns ``step(ts, model_state, batch, flag) -> (ts, model_state, metrics)``.

    ``flag`` must be static (wrap with ``jax.jit(..., static_argnums=3)``
    or functools.partial per flag value).
    """
    tx = make_optimizer(max_grad_norm)
    loss_kwargs = loss_kwargs or {}

    # Models with a fused train_loss (e.g. DistillationCRN, where the loss
    # needs feature taps from two networks) bypass the 2-call contract.
    has_train_loss = hasattr(model, "train_loss")

    def step(ts: TrainState, model_state, batch, flag: bool):
        def loss_fn(params):
            if has_train_loss:
                loss, aux, sisnr, new_ms = model.train_loss(
                    params, model_state, batch, flag)
                return loss, (aux, sisnr, new_ms)
            pred, new_ms = model.realtime_process(
                params, model_state, batch["mix"], flag)
            loss, aux, sisnr = model.compute_loss(
                batch["source"], pred, batch["length"], **loss_kwargs)
            return loss, (aux, sisnr, new_ms)

        (loss, (aux, sisnr, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)

        # Accumulate loss/accum_every gradients (train.py:198)
        acc = jax.tree.map(lambda a, g: a + g / accum_every, ts.grad_accum, grads)
        count = ts.accum_count + 1

        def apply_update(_):
            updates, opt_state = tx.update(acc, ts.opt_state, ts.params)
            new_params = jax.tree.map(
                lambda p, u: p - ts.plateau.lr * u, ts.params, updates)
            return new_params, opt_state, jax.tree.map(jnp.zeros_like, acc), \
                jnp.zeros((), jnp.int32)

        def skip_update(_):
            return ts.params, ts.opt_state, acc, count

        new_params, opt_state, new_acc, new_count = jax.lax.cond(
            count >= accum_every, apply_update, skip_update, None)

        new_ts = TrainState(
            params=new_params, opt_state=opt_state, grad_accum=new_acc,
            accum_count=new_count, plateau=ts.plateau, step=ts.step + 1)
        metrics = {"loss": loss, "aux": aux, "sisnr": sisnr}
        return new_ts, new_ms, metrics

    return step


def make_batched_train_step(model, accum_every: int = 2,
                            max_grad_norm: float = 5.0):
    """Multi-stream train step: per-stream reset mask instead of the
    static flag — ONE compiled program for the whole run (see
    semi_tpu/data/stream.py). Batch dims shard over a dp mesh as usual.
    """
    tx = make_optimizer(max_grad_norm)

    def step(ts: TrainState, model_state, batch):
        def loss_fn(params):
            pred, new_ms = model.realtime_process_batched(
                params, model_state, batch["mix"], batch["reset"])
            loss, aux, sisnr = model.compute_loss(
                batch["source"], pred, batch["length"])
            return loss, (aux, sisnr, new_ms)

        (loss, (aux, sisnr, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        acc = jax.tree.map(lambda a, g: a + g / accum_every, ts.grad_accum, grads)
        count = ts.accum_count + 1

        def apply_update(_):
            updates, opt_state = tx.update(acc, ts.opt_state, ts.params)
            new_params = jax.tree.map(
                lambda p, u: p - ts.plateau.lr * u, ts.params, updates)
            return new_params, opt_state, jax.tree.map(jnp.zeros_like, acc), \
                jnp.zeros((), jnp.int32)

        def skip_update(_):
            return ts.params, ts.opt_state, acc, count

        new_params, opt_state, new_acc, new_count = jax.lax.cond(
            count >= accum_every, apply_update, skip_update, None)
        new_ts = TrainState(
            params=new_params, opt_state=opt_state, grad_accum=new_acc,
            accum_count=new_count, plateau=ts.plateau, step=ts.step + 1)
        return new_ts, new_ms, {"loss": loss, "aux": aux, "sisnr": sisnr}

    return step


def make_eval_step(model, loss_kwargs: dict | None = None):
    loss_kwargs = loss_kwargs or {}

    def step(params, model_state, batch, flag: bool):
        from semi_tpu.metrics.losses import stoi_loss

        pred, new_ms = model.realtime_process(
            params, model_state, batch["mix"], flag)
        loss, aux, sisnr = model.compute_loss(
            batch["source"], pred, batch["length"], **loss_kwargs)
        # device-side dev oracle: eval-form STOI (the metric, not the
        # weighted training objective) so best-checkpoint gating can
        # track eval quality even when the loss saturates (reference
        # dev-criterion switching, train_distillation.py:220)
        stoi = -stoi_loss(batch["source"], pred, batch["length"])
        return new_ms, {"loss": loss, "aux": aux, "sisnr": sisnr,
                        "stoi": stoi}, pred

    return step
