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
    AsyncCheckpointWriter, load_counters, load_pytree, save_counters,
    save_pytree)
from semi_tpu.train.optim import make_optimizer, noam_lr
from semi_tpu.utils.config import load_config, validate_model_section
from semi_tpu.utils.tb import ScalarWriter

__all__ = ["GanProcessor"]


def make_gan_utterance_step(model, dataset, stage: int, lr: float,
                            n_warm: int, max_norm: float,
                            use_corpus: bool = False):
    """Fused multi-stream GAN training: mix + K batches of B whole
    utterances per dispatch (round 3 — the stream-serial loop above is
    relay-dispatch-bound on this link, docs/BENCHMARKS.md).

    Returns ``step(carry, inputs) -> (carry, metrics)`` with
    ``carry = (params, g_opt, d_opt, step_count)``. Stage semantics
    mirror the per-item path exactly (reference Hifi-GAN/train.py:
    210-228): at stage 3 the discriminator updates FIRST on the
    detached generator output, then the generator steps against the
    updated discriminator. Deviation (documented, same as the
    utterance Processor): losses aggregate over whole zero-padded
    utterances instead of exact-length pieces.
    """
    from semi_tpu.train.utterance import (_gather_inputs, _mixed_batch,
                                          _mixer_fn)

    tx = make_optimizer(max_norm)
    mixer = _mixer_fn(dataset)
    lead = model.segment_length // 2
    snr = (float(dataset.snr_low), float(dataset.snr_high))
    mix_len = dataset.mix_len

    def one_batch(carry, batch_k):
        params, g_opt, d_opt, step = carry
        mix, target, _ = _mixed_batch(model, mixer, lead, snr, batch_k)
        b = mix.shape[0]
        ones = jnp.ones((b,), bool)
        lr_t = noam_lr((step + 1).astype(jnp.float32), lr, n_warm)

        d_loss_val = jnp.zeros(())
        if stage == 3:
            y_det, _, _ = model.generator.realtime_process_batched(
                jax.lax.stop_gradient(params["generator"]),
                model.init_state(b, mix.dtype), mix, ones, post=True)

            def d_loss_fn(p):
                return model.stage_d_loss(p, y_det, target)

            d_loss_val, d_grads = jax.value_and_grad(d_loss_fn)(params)
            d_grads = {"generator": jax.tree.map(jnp.zeros_like,
                                                 params["generator"]),
                       "mel_disc": d_grads["mel_disc"],
                       "scale_disc": d_grads["scale_disc"]}
            updates, d_opt = tx.update(d_grads, d_opt, params)
            params = jax.tree.map(lambda p, u: p - lr_t * u, params, updates)

        def g_loss_fn(p):
            y_hat, y_before, _ = model.generator.realtime_process_batched(
                p["generator"], model.init_state(b, mix.dtype), mix, ones,
                post=stage != 1)
            if stage == 1:
                return model.stft_loss(y_hat, target, phase=True)
            if stage == 2:
                return 0.5 * model.stft_loss(y_hat, target, phase=True) + \
                    0.5 * model.stft_loss(y_before, target, phase=True)
            dp = jax.lax.stop_gradient({"mel_disc": p["mel_disc"],
                                        "scale_disc": p["scale_disc"]})
            _, g_out, fmap_r, fmap_g = model.discriminator_forward(
                dp, y_hat[:, None], target[:, None])
            return model.feature_loss(fmap_r, fmap_g) + \
                model.generator_adv_loss(g_out)

        g_loss_val, g_grads = jax.value_and_grad(g_loss_fn)(params)
        if stage == 3:
            g_grads = {"generator": g_grads["generator"],
                       "mel_disc": jax.tree.map(jnp.zeros_like,
                                                params["mel_disc"]),
                       "scale_disc": jax.tree.map(jnp.zeros_like,
                                                  params["scale_disc"])}
        updates, g_opt = tx.update(g_grads, g_opt, params)
        params = jax.tree.map(lambda p, u: p - lr_t * u, params, updates)
        return (params, g_opt, d_opt, step + 1), \
            {"g": g_loss_val, "d": d_loss_val}

    if not use_corpus:
        def step(carry, inputs):
            xs = (inputs["clean"], inputs["noise"], inputs["key"],
                  inputs["utt_len"])
            return jax.lax.scan(one_batch, carry, xs)

        return step

    def step_corpus(carry, corpus_clean, corpus_noise, inputs):
        def body(c, meta):
            clean, noise = _gather_inputs(corpus_clean, corpus_noise,
                                          meta, mix_len)
            return one_batch(c, (clean, noise, meta["key"],
                                 meta["utt_len"]))

        return jax.lax.scan(body, carry, inputs)

    return step_corpus


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
        # config.async_ckpt: background writer, same contract as Processor
        self._ckpt_writer = (AsyncCheckpointWriter()
                             if self.config["config"].get("async_ckpt")
                             else None)
        self._watchdog = None  # config.stall_timeout (see train())

    def _stage_dir(self, stage: int) -> str:
        return os.path.join(self.config["config"]["checkpoint_dir"],
                            f"stage{stage}",
                            self.config["user_defined_name"])

    def _save_stage(self, stage: int, params, g_opt, d_opt,
                    dev_step: int = 0, dev_loss: float = 0.0,
                    step_in_epoch: int = 0) -> None:
        """Full stage checkpoint: generator+discriminator params, BOTH
        optimizer states (reference saves optimizer.pth too,
        train.py:77-99), counters; a nonzero ``step_in_epoch`` writes
        Step.json (mid-epoch restart marker, same contract as the
        Processor), a zero one clears it."""
        d = self._stage_dir(stage)
        os.makedirs(d, exist_ok=True)
        w = self._ckpt_writer
        save_tree = w.save_pytree if w else save_pytree
        save_cnt = w.save_counters if w else save_counters
        save_tree(os.path.join(d, "Hifi_GAN.npz"), params)
        save_tree(os.path.join(d, "optimizer.npz"),
                  {"g_opt": g_opt,
                   "d_opt": d_opt if d_opt is not None else g_opt})
        save_cnt(os.path.join(d, "Epoch.json"), self.epoch,
                 self.train_step_count, dev_step, dev_loss)
        step_file = os.path.join(d, "Step.json")

        def _update_step_marker():
            if step_in_epoch:
                import json
                with open(step_file + ".tmp", "w") as f:
                    json.dump({"Step_In_Epoch": step_in_epoch}, f)
                os.replace(step_file + ".tmp", step_file)
            elif os.path.exists(step_file):
                os.remove(step_file)

        if w:
            # through the same queue: the marker must never point past
            # weights that have not landed yet
            w.submit(_update_step_marker)
        else:
            _update_step_marker()

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

    def _pet(self) -> None:
        if self._watchdog is not None:
            self._watchdog.pet()

    def train(self, stage: int = 1, resume: bool = False,
              load_model: bool = False) -> None:
        """config.stall_timeout wraps the run in a StallWatchdog
        (failure detection for relay wedges — watchdog.py)."""
        stall_s = self.config["config"].get("stall_timeout", 0)
        if not stall_s:
            return self._train_impl(stage, resume, load_model)
        from semi_tpu.train.watchdog import StallWatchdog

        self._watchdog = StallWatchdog(
            stall_s, context=f"Hifi_GAN stage{stage}").start()
        try:
            return self._train_impl(stage, resume, load_model)
        finally:
            self._watchdog.stop()
            self._watchdog = None

    def _train_impl(self, stage: int = 1, resume: bool = False,
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
        self._start_index = 0
        if resume:
            d = self._stage_dir(stage)
            params = load_pytree(os.path.join(d, "Hifi_GAN.npz"), params)
            counters = load_counters(os.path.join(d, "Epoch.json"))
            self.epoch = counters["Epoch"]
            self.train_step_count = counters["Train_Step"]
            opt_file = os.path.join(d, "optimizer.npz")
            if os.path.exists(opt_file):
                tmpl = {"g_opt": g_opt,
                        "d_opt": d_opt if d_opt is not None else g_opt}
                opts = load_pytree(opt_file, tmpl)
                g_opt = opts["g_opt"]
                if stage == 3:
                    d_opt = opts["d_opt"]
            # mid-epoch restart: Step.json marks a partial epoch
            step_file = os.path.join(d, "Step.json")
            if os.path.exists(step_file):
                import json
                with open(step_file) as f:
                    self._start_index = json.load(f).get("Step_In_Epoch", 0)
                self.epoch -= 1  # re-enter the partial epoch
                print(f"resuming mid-epoch {self.epoch + 1} at item "
                      f"{self._start_index}")

        writer = ScalarWriter(os.path.join(
            self.config["config"]["log_dir"], f"stage{stage}",
            self.config["user_defined_name"]), purge_step=self.train_step_count)

        bs = scfg.get("batch_streams",
                      self.config.get("denoise", {}).get("batch_streams", 1))
        if bs > 1:
            k = scfg.get("k_batches",
                         self.config.get("denoise", {}).get("k_batches", 4))
            # Regimen fidelity: the reference's NoamScheduler steps once
            # per UTTERANCE (Hifi-GAN/train.py:212-217, batch_size=1), so
            # n_warm_steps counts utterances. One fused step consumes B
            # utterances — scale the warmup horizon accordingly, else the
            # effective LR schedule runs B times slower per utterance
            # (measured: stage 2 at B=16 left the mask path at noisy-level
            # STFT loss because LR never left the warmup floor).
            n_warm_eff = max(1, n_warm // bs)
            self._train_utterance(stage, params, g_opt, d_opt, bs, k,
                                  lr, n_warm_eff, max_norm, writer, num_epoch,
                                  avg_step)
            return

        g_step, d_step, gen_forward, dev_step = self._make_steps(
            stage, lr, n_warm, max_norm)

        for epoch in range(self.epoch + 1, num_epoch):
            self.epoch = epoch
            # augmentation on for stages >= 2 (Hifi-GAN/train.py:161-163)
            self.dataset.set_attribute("train", augment=stage >= 2)
            self.dataset.init_seed(epoch + 1)
            self.dataset.buffer = []
            model_state = self.model.init_state(1)

            g_sum, d_sum, n = 0.0, 0.0, 0
            for i in range(len(self.dataset)):
                self._pet()
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
                self._pet()
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

            self._save_stage(stage, params, g_opt, d_opt,
                             dev_step=dev_n, dev_loss=dev_g / max(dev_n, 1))
            writer.flush()
        self._final_params = params
        if self._ckpt_writer:
            self._ckpt_writer.wait()

    def _train_utterance(self, stage, params, g_opt, d_opt, b, k,
                         lr, n_warm, max_norm, writer, num_epoch, avg_step):
        """Fused multi-stream epochs (make_gan_utterance_step): ONE jit
        dispatch per K batches of B whole utterances, device corpus when
        manifests exist. Dev scores the stage G loss (+ D hinge at
        stage 3) batched, no updates."""
        from semi_tpu.train.utterance import (
            DeviceCorpus, UtteranceBatchSampler, UtteranceMetaSampler,
            _mixed_batch, _mixer_fn, _gather_inputs)

        model = self.model
        tx = make_optimizer(max_norm)
        if d_opt is None:
            d_opt = tx.init(params)  # pytree-stable carry (unused < stage 3)
        ds = self.dataset
        # device corpora built ONCE per stage (upload is relay-expensive)
        ds.set_attribute("dev", augment=stage >= 2)
        dev_corpus = DeviceCorpus(ds) if ds._have_real_data() else None
        ds.set_attribute("train", augment=stage >= 2)
        corpus = DeviceCorpus(ds) if ds._have_real_data() else None
        step_fn = jax.jit(make_gan_utterance_step(
            model, ds, stage, lr, n_warm, max_norm,
            use_corpus=corpus is not None))

        # batched dev: stage losses only
        mixer = _mixer_fn(ds)
        lead = model.segment_length // 2
        mix_len = ds.mix_len

        def dev_one(params_, batch_k):
            mix, target, _ = _mixed_batch(model, mixer,
                                          lead, (float(ds.snr_low),
                                                 float(ds.snr_high)), batch_k)
            bb = mix.shape[0]
            ones = jnp.ones((bb,), bool)
            y_hat, y_before, _ = model.generator.realtime_process_batched(
                params_["generator"], model.init_state(bb, mix.dtype), mix,
                ones, post=stage != 1)
            if stage == 1:
                g = model.stft_loss(y_hat, target, phase=True)
            elif stage == 2:
                g = 0.5 * model.stft_loss(y_hat, target, phase=True) + \
                    0.5 * model.stft_loss(y_before, target, phase=True)
            else:
                dp = {"mel_disc": params_["mel_disc"],
                      "scale_disc": params_["scale_disc"]}
                _, g_out, fmap_r, fmap_g = model.discriminator_forward(
                    dp, y_hat[:, None], target[:, None])
                g = model.feature_loss(fmap_r, fmap_g) + \
                    model.generator_adv_loss(g_out)
            dl = model.stage_d_loss(params_, y_hat, target) \
                if stage == 3 else jnp.zeros(())
            return {"g": g, "d": dl}

        if corpus is not None:
            def dev_fn(params_, cc, cn, inputs):
                def body(c, meta):
                    clean, noise = _gather_inputs(cc, cn, meta, mix_len)
                    return c, dev_one(params_, (clean, noise, meta["key"],
                                                meta["utt_len"]))
                _, ms = jax.lax.scan(body, None, inputs)
                return ms
        else:
            def dev_fn(params_, inputs):
                xs = (inputs["clean"], inputs["noise"], inputs["key"],
                      inputs["utt_len"])
                _, ms = jax.lax.scan(
                    lambda c, x: (c, dev_one(params_, x)), None, xs)
                return ms
        dev_jit = jax.jit(dev_fn)

        avg_every = max(1, avg_step // k)
        # mid-epoch checkpointing (same contract as Processor's
        # utterance engine): ckpt_every_steps is in ITEMS, one fused
        # call consumes k*b of them
        ckpt_every = self.config["config"].get("ckpt_every_steps", 0)
        ckpt_calls = max(1, ckpt_every // (k * b)) if ckpt_every else 0
        for epoch in range(self.epoch + 1, num_epoch):
            self.epoch = epoch
            ds.set_attribute("train", augment=stage >= 2)
            ds.init_seed(epoch + 1)
            start_call = getattr(self, "_start_index", 0) // (k * b)
            self._start_index = 0  # only the re-entered epoch is partial
            if corpus is not None:
                sampler = UtteranceMetaSampler(ds, corpus, b, k,
                                               start_index=start_call * k * b)
                run = lambda c, inp: step_fn(  # noqa: E731
                    c, corpus.clean, corpus.noise, inp)
            else:
                sampler = UtteranceBatchSampler(ds, b, k,
                                                start_index=start_call * k * b)
                run = step_fn
            carry = (params, g_opt, d_opt,
                     jnp.asarray(self.train_step_count, jnp.int32))
            # per-host shard (sampler strides the global index by
            # process_count; the dev pass stays replicated)
            num_calls = max(1, len(ds) // (k * b * jax.process_count()))
            g_sum = d_sum = 0.0
            try:
                for i in range(start_call, num_calls):
                    self._pet()
                    carry, ms = run(carry, sampler.next_batch())
                    g_sum += float(jnp.sum(ms["g"]))
                    d_sum += float(jnp.sum(ms["d"]))
                    self.train_step_count += k
                    if ckpt_calls and (i + 1 - start_call) % ckpt_calls == 0:
                        # mid-epoch checkpoint: params + BOTH optimizer
                        # states + Step.json (resume re-enters this epoch
                        # at the recorded item; train() decrements epoch
                        # when Step.json is present)
                        self._save_stage(stage, carry[0], carry[1], carry[2],
                                         step_in_epoch=(i + 1) * k * b)
                    if (i + 1) % avg_every == 0:
                        denom = avg_every * k
                        print(f"stage{stage}[utt B={b} K={k}] epoch {epoch} "
                              f"step {self.train_step_count} "
                              f"g={g_sum/denom:.4f}"
                              + (f" d={d_sum/denom:.4f}" if stage == 3
                                 else ""), flush=True)
                        writer.add_scalar("train_loss/g_loss", g_sum / denom,
                                          self.train_step_count)
                        if stage == 3:
                            writer.add_scalar("train_loss/d_loss",
                                              d_sum / denom,
                                              self.train_step_count)
                        g_sum = d_sum = 0.0
            finally:
                sampler.close()
            params, g_opt, d_opt, _ = carry

            # dev epoch (uses the dev split's device corpus, built once)
            ds.set_attribute("dev", augment=stage >= 2)
            ds.init_seed(epoch + 1)
            # dev is replicated across hosts (process_count=1) so every
            # host scores the identical set
            if dev_corpus is not None:
                s_dev = UtteranceMetaSampler(ds, dev_corpus, b, k,
                                             process_index=0, process_count=1)
                run_dev = lambda p, inp: dev_jit(  # noqa: E731
                    p, dev_corpus.clean, dev_corpus.noise, inp)
            else:
                s_dev = UtteranceBatchSampler(ds, b, k,
                                              process_index=0, process_count=1)
                run_dev = dev_jit
            dg = dd = 0.0
            ncall = max(1, len(ds) // (k * b))
            try:
                for _ in range(ncall):
                    self._pet()
                    ms = run_dev(params, s_dev.next_batch())
                    dg += float(jnp.sum(ms["g"]))
                    dd += float(jnp.sum(ms["d"]))
            finally:
                s_dev.close()
            count = ncall * k
            writer.add_scalar("dev_loss/g_loss", dg / count,
                              self.train_step_count)
            if stage == 3:
                writer.add_scalar("dev_loss/d_loss", dd / count,
                                  self.train_step_count)
            print(f"stage{stage} dev epoch {epoch}: g={dg/count:.4f}"
                  + (f" d={dd/count:.4f}" if stage == 3 else ""), flush=True)

            self._save_stage(stage, params, g_opt, d_opt,
                             dev_step=count, dev_loss=dg / count)
            writer.flush()
        self._final_params = params
        if self._ckpt_writer:
            self._ckpt_writer.wait()
