"""Host-side training driver: data prefetch, jitted step, checkpoints,
logging, auto-resume — the reference Trainer (trainer.py:18-189) rebuilt
around a jax.sharding.Mesh.

Differences from the reference:
  * DDP wrap + NCCL init (trainer.py:55-57, utils/dist.py) -> params
    replicated / batch sharded over the mesh; gradient psum is implicit
  * AMP GradScaler -> bf16 compute, no loss scaling; NaN-skip kept in-graph
  * torch DataLoader workers -> Prefetcher thread (data/jsondataset.py)
  * rank-0-only side effects keyed on jax.process_index() == 0
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from instancediffusion_tpu.config import Config
from instancediffusion_tpu.data.jsondataset import JsonDataset, Prefetcher, SampleDecoder
from instancediffusion_tpu.data.tokenizer import CLIPTokenizer
from instancediffusion_tpu.io import checkpoint as ckpt_io
from instancediffusion_tpu.ops.schedules import make_diffusion_schedule
from instancediffusion_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from instancediffusion_tpu.train.optimizer import (
    count_trainable, make_optimizer,
)
from instancediffusion_tpu.train.train_step import (
    TrainState, cast_frozen_bf16, init_train_state, make_train_step,
)
from instancediffusion_tpu.utils.logging import MetricLogger


def is_main() -> bool:
    return jax.process_index() == 0


class Trainer:
    def __init__(self, cfg: Config, train_list_file: str,
                 pretrained_ckpt: str | None = None):
        self.cfg = cfg
        tcfg = cfg.train

        self.diffusion = make_diffusion_schedule(
            cfg.diffusion.beta_schedule, cfg.diffusion.timesteps,
            cfg.diffusion.linear_start, cfg.diffusion.linear_end,
        )

        # mesh + sharded step
        self.mesh = make_mesh()
        state = init_train_state(cfg, seed=tcfg.seed)
        if pretrained_ckpt:
            # ingest SD1.5: frozen backbone + VAE + CLIP; new params keep init
            params = ckpt_io.load_pipeline_params(pretrained_ckpt, cfg)
            state = state._replace(
                unet_params=_merge_pretrained(state.unet_params, params.unet),
                vae_params=params.vae,
                clip_params=params.clip,
            )
        self.tx = make_optimizer(
            tcfg.base_learning_rate, tcfg.weight_decay, tcfg.warmup_steps,
            tcfg.scheduler_type, tcfg.total_iters, params=state.unet_params,
        )
        from instancediffusion_tpu.train.optimizer import init_ema

        state = state._replace(
            opt_state=self.tx.init(state.unet_params),
            ema_params=init_ema(state.unet_params),
        )

        # fp32 master weights for trainables only; frozen backbone/VAE/CLIP
        # stored bf16 (fits full-config training in one chip's HBM)
        state = cast_frozen_bf16(state)

        # auto-resume (utils/checkpoint.py:45-72,104-124); refuses to resume
        # with random frozen VAE/CLIP when the ckpt lacks them and no
        # official ckpt was passed
        self.folder, prev = ckpt_io.expt_folder_with_auto_resume(
            tcfg.output_dir, tcfg.name
        )
        if prev is not None:
            state = ckpt_io.restore_train_ckpt(
                prev, state, have_pretrained=pretrained_ckpt is not None
            )
            print(f"auto-resumed from {prev} at step {int(state.step)}")

        # ZeRO-1 (parallel/zero.py): moments + EMA sharded over 'data',
        # params replicated. Matching device_put / out_shardings keeps
        # buffer donation alive and makes XLA update moments shard-locally.
        from instancediffusion_tpu.parallel.zero import train_state_shardings

        state_sh = train_state_shardings(self.mesh, state, zero1=tcfg.zero1)
        self.state = jax.device_put(state, state_sh)
        self.train_step = jax.jit(
            make_train_step(cfg, self.diffusion, self.tx),
            donate_argnums=(0,), out_shardings=(state_sh, None),
        )

        # data
        decoder = SampleDecoder(
            image_size=cfg.data.image_size,
            max_boxes_per_data=cfg.data.max_boxes_per_data,
            prob_use_caption=cfg.data.prob_use_caption,
            random_flip=cfg.data.random_flip,
        )
        self.dataset = JsonDataset(train_list_file, decoder, seed=tcfg.seed)
        self.loader = Prefetcher(
            self.dataset, tcfg.batch_size, tokenizer=CLIPTokenizer.load_default(),
            host_index=jax.process_index(), num_hosts=jax.process_count(),
            seed=tcfg.seed,
        )
        self.logger = MetricLogger(
            log_dir=os.path.join(self.folder, "Log") if is_main() else None
        )
        import dataclasses

        self.config_dict = dataclasses.asdict(cfg)
        if is_main() and tcfg.wandb:
            # rank-0 wandb mirror (main_submitit.py:112-119)
            self.logger.enable_wandb(
                project="InstDiff", name=tcfg.name, config=self.config_dict
            )
        if is_main():
            print(
                f"trainable params: {count_trainable(state.unet_params)/1e6:.1f}M"
            )

    def start_training(self):
        tcfg = self.cfg.train
        rng = jax.random.PRNGKey(tcfg.seed + jax.process_index())
        step = int(jax.device_get(self.state.step))
        epoch = 0
        t_last = time.time()
        while step < tcfg.total_iters:
            for batch in self.loader.epoch(epoch):
                rng, sub = jax.random.split(rng)
                batch = shard_batch(self.mesh, batch)
                self.state, metrics = self.train_step(self.state, batch, sub)
                step += 1

                if step % 10 == 0:
                    loss = float(jax.device_get(metrics["loss"]))
                    dt = time.time() - t_last
                    t_last = time.time()
                    self.logger.log(step, {"loss": loss, "sec/iter": dt / 10})
                if step % tcfg.ckpt_every_iters == 0 and is_main():
                    ckpt_io.save_train_ckpt(
                        self.folder, jax.device_get(self.state),
                        self.config_dict,
                    )
                if step % tcfg.save_every_iters == 0 and is_main():
                    ckpt_io.save_train_ckpt(
                        self.folder, jax.device_get(self.state),
                        self.config_dict, latest=False, iter_idx=step,
                    )
                    self._save_samples(step)
                if step >= tcfg.total_iters:
                    break
            epoch += 1
        if is_main():
            ckpt_io.save_train_ckpt(
                self.folder, jax.device_get(self.state), self.config_dict
            )
            print("Model training is completed!")

    def _save_samples(self, step: int):
        """In-training visual inspection (the reference's de-facto training
        test): rank 0 runs the full PLMS sampler on n_sample_batches fresh
        training batches and writes (generated | real) grids with GT-box
        overlays — save_ckpt_and_result, utils/checkpoint.py:146-212."""
        tcfg = self.cfg.train
        if tcfg.n_sample_batches <= 0:
            return
        from instancediffusion_tpu.data.jsondataset import collate
        from instancediffusion_tpu.train.sample_saver import save_train_samples

        # Rotate the window through the dataset by step so successive dumps
        # show different items (the reference samples the LIVE loader's
        # current batches, utils/checkpoint.py:157; a fixed 0..N window
        # would make visual drift over training invisible)
        n = len(self.dataset)
        need = tcfg.n_sample_batches * tcfg.batch_size
        start = (step // max(1, tcfg.save_every_iters)) * need % max(1, n)
        batches = []
        idx = start
        for _ in range(tcfg.n_sample_batches):
            if n < tcfg.batch_size:
                break
            rows = [(idx + j) % n for j in range(tcfg.batch_size)]
            samples = [self.dataset.__getitem__(i, epoch=0) for i in rows]
            batches.append(
                collate(samples, self.loader.tokenizer, keep_caption=True)
            )
            idx += tcfg.batch_size
        if not batches:
            return
        out_dir = os.path.join(self.folder, f"samples_{step:08d}")
        save_train_samples(
            self.cfg, self.state, batches, out_dir,
            steps=tcfg.sample_steps, seed=tcfg.seed,
            tokenizer=self.loader.tokenizer,
        )
        print(f"saved {len(batches)} sample grids to {out_dir}", flush=True)


def _merge_pretrained(init_params, loaded_params):
    """Overlay loaded SD weights onto the init tree, keeping init for keys
    the checkpoint lacks (new InstanceDiffusion params) — the reference's
    strict=False load + missing_keys report (utils/model.py:37-39)."""

    def merge(a, b):
        if isinstance(a, dict):
            return {
                k: merge(a[k], b[k]) if isinstance(b, dict) and k in b else a[k]
                for k in a
            }
        if isinstance(a, list):
            return [
                merge(x, b[i]) if isinstance(b, list) and i < len(b) else x
                for i, x in enumerate(a)
            ]
        return b if b is not None else a

    return merge(init_params, loaded_params)
