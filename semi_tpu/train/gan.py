"""HiFi-GAN 3-stage trainer (reference: Hifi-GAN/train.py:23-336).

Stage 1/2: generator-only with Adam + Noam warmup (STFT losses).
Stage 3: adds the discriminator optimizer; per item the discriminator
steps on the detached generator output, then the generator steps on
feature-matching + hinge loss.

Checkpoints per stage under ``<ckpt>/stage{N}/<udn>/``; ``load_model``
warm-starts stage N from stage N-1's generator (Hifi-GAN/train.py:96-103).
Augmentation is enabled for stages >= 2 (Hifi-GAN/train.py:161-163).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax

from semi_tpu.data.dataset import LibriPartyDataset
from semi_tpu.models.hifigan import HifiGAN
from semi_tpu.train.checkpoint import (
    load_counters, load_pytree, save_counters, save_pytree)
from semi_tpu.train.optim import make_optimizer, noam_lr
from semi_tpu.utils.config import load_config, validate_model_section
from semi_tpu.utils.tb import ScalarWriter

__all__ = ["GanProcessor"]


class GanProcessor:
    def __init__(self, config_path: str, user_defined_name: str = "model",
                 dataset=None):
        self.config = load_config(config_path)
        self.config["user_defined_name"] = user_defined_name
        section = validate_model_section(HifiGAN, self.config["Hifi_GAN"],
                                         "Hifi_GAN")
        self.model = HifiGAN(**section)
        self.dataset = dataset if dataset is not None else \
            LibriPartyDataset(self.config)
        self.epoch = -1
        self.train_step_count = 0
        self.stage = 1

    def _stage_dir(self, stage: int) -> str:
        return os.path.join(self.config["config"]["checkpoint_dir"],
                            f"stage{stage}",
                            self.config["user_defined_name"])

    def _make_steps(self, stage: int, lr: float, n_warm: int, max_norm: float):
        tx = make_optimizer(max_norm)
        model = self.model

        def g_step(params, g_opt, model_state, batch, step_i, flag: bool):
            def loss_fn(p):
                loss, y_hat, new_ms = model.stage_g_loss(
                    p, model_state, batch["mix"], batch["source"], stage, flag)
                return loss, (y_hat, new_ms)

            (loss, (y_hat, new_ms)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if stage == 3:
                # only the generator updates in the G step
                grads = {"generator": grads["generator"],
                         "mel_disc": jax.tree.map(jnp.zeros_like,
                                                  params["mel_disc"]),
                         "scale_disc": jax.tree.map(jnp.zeros_like,
                                                    params["scale_disc"])}
            updates, g_opt = tx.update(grads, g_opt, params)
            lr_t = noam_lr(step_i, lr, n_warm)
            params = jax.tree.map(lambda p, u: p - lr_t * u, params, updates)
            return params, g_opt, new_ms, loss, y_hat

        def d_step(params, d_opt, y_hat, y, step_i):
            def loss_fn(p):
                return model.stage_d_loss(p, y_hat, y)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = {"generator": jax.tree.map(jnp.zeros_like,
                                               params["generator"]),
                     "mel_disc": grads["mel_disc"],
                     "scale_disc": grads["scale_disc"]}
            updates, d_opt = tx.update(grads, d_opt, params)
            lr_t = noam_lr(step_i, lr, n_warm)
            params = jax.tree.map(lambda p, u: p - lr_t * u, params, updates)
            return params, d_opt, loss

        def gen_forward(params, model_state, batch, flag: bool):
            y_hat, _, _ = model.generator.realtime_process(
                params["generator"], model_state, batch["mix"],
                post=True, reset=not flag)
            return y_hat

        def dev_step(params, model_state, batch, flag: bool):
            loss, y_hat, new_ms = model.stage_g_loss(
                params, model_state, batch["mix"], batch["source"], stage, flag)
            if stage == 3:
                d_loss = model.stage_d_loss(params, y_hat, batch["source"])
            else:
                d_loss = jnp.zeros(())
            return new_ms, loss, d_loss

        return (jax.jit(g_step, static_argnums=5, donate_argnums=(0, 1)),
                jax.jit(d_step, donate_argnums=(0, 1)),
                jax.jit(gen_forward, static_argnums=3),
                jax.jit(dev_step, static_argnums=3))

    def train(self, stage: int = 1, resume: bool = False,
              load_model: bool = False) -> None:
        self.stage = stage
        scfg = self.config.get(f"stage{stage}", self.config.get("denoise", {}))
        num_epoch = scfg.get("num_epoch", 1)
        lr = scfg.get("lr", 3e-4)
        n_warm = scfg.get("n_warm_steps", 20000)
        max_norm = self.config["config"].get("max_grad_norm", 5)
        avg_step = self.config["config"].get("avg_step", 100)

        params = self.model.init(jax.random.PRNGKey(
            self.config["config"].get("seed", 0)))
        if load_model and stage > 1:
            prev = os.path.join(self._stage_dir(stage - 1), "Hifi_GAN.npz")
            if os.path.exists(prev):
                params = load_pytree(prev, params)
        tx = make_optimizer(max_norm)
        g_opt = tx.init(params)
        d_opt = tx.init(params) if stage == 3 else None
        if resume:
            d = self._stage_dir(stage)
            params = load_pytree(os.path.join(d, "Hifi_GAN.npz"), params)
            counters = load_counters(os.path.join(d, "Epoch.json"))
            self.epoch = counters["Epoch"]
            self.train_step_count = counters["Train_Step"]

        g_step, d_step, gen_forward, dev_step = self._make_steps(
            stage, lr, n_warm, max_norm)
        writer = ScalarWriter(os.path.join(
            self.config["config"]["log_dir"], f"stage{stage}",
            self.config["user_defined_name"]), purge_step=self.train_step_count)

        for epoch in range(self.epoch + 1, num_epoch):
            self.epoch = epoch
            # augmentation on for stages >= 2 (Hifi-GAN/train.py:161-163)
            self.dataset.set_attribute("train", augment=stage >= 2)
            self.dataset.init_seed(epoch + 1)
            self.dataset.buffer = []
            model_state = self.model.init_state(1)

            g_sum, d_sum, n = 0.0, 0.0, 0
            for i in range(len(self.dataset)):
                data = self.dataset[i]
                batch = {"mix": jnp.asarray(data["mix"]),
                         "source": jnp.asarray(data["source"][:, 0, 0])}
                step_i = jnp.asarray(self.train_step_count + 1, jnp.float32)
                if stage == 3:
                    # D first on the detached generator output, then G
                    # against the updated discriminator (train.py:210-228)
                    y_hat = gen_forward(params, model_state, batch,
                                        bool(data["flag"]))
                    params, d_opt, dl = d_step(params, d_opt, y_hat,
                                               batch["source"], step_i)
                    d_sum += float(dl)
                params, g_opt, model_state, gl, _ = g_step(
                    params, g_opt, model_state, batch, step_i,
                    bool(data["flag"]))
                g_sum += float(gl)
                n += 1
                self.train_step_count += 1
                if n % avg_step == 0:
                    writer.add_scalar("train_loss/g_loss", g_sum / n,
                                      self.train_step_count)
                    if stage == 3:
                        writer.add_scalar("train_loss/d_loss", d_sum / n,
                                          self.train_step_count)
                    print(f"stage{stage} epoch {epoch} step "
                          f"{self.train_step_count} g={g_sum/n:.4f}"
                          + (f" d={d_sum/n:.4f}" if stage == 3 else ""),
                          flush=True)

            # dev pass: stage losses without updates (Hifi-GAN/train.py:231-236)
            self.dataset.set_attribute("dev", augment=stage >= 2)
            self.dataset.init_seed(epoch + 1)
            self.dataset.buffer = []
            dev_ms = self.model.init_state(1)
            dev_g, dev_d, dev_n = 0.0, 0.0, 0
            for i in range(len(self.dataset)):
                data = self.dataset[i]
                batch = {"mix": jnp.asarray(data["mix"]),
                         "source": jnp.asarray(data["source"][:, 0, 0])}
                dev_ms, gl, dl = dev_step(params, dev_ms, batch,
                                          bool(data["flag"]))
                dev_g += float(gl)
                dev_d += float(dl)
                dev_n += 1
            writer.add_scalar("dev_loss/g_loss", dev_g / max(dev_n, 1),
                              self.train_step_count)
            if stage == 3:
                writer.add_scalar("dev_loss/d_loss", dev_d / max(dev_n, 1),
                                  self.train_step_count)

            d = self._stage_dir(stage)
            os.makedirs(d, exist_ok=True)
            save_pytree(os.path.join(d, "Hifi_GAN.npz"), params)
            save_counters(os.path.join(d, "Epoch.json"), self.epoch,
                          self.train_step_count, dev_n,
                          dev_g / max(dev_n, 1))
            writer.flush()
        self._final_params = params
