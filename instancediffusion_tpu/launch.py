"""Multi-host training launcher (the reference's L7:
run_with_submitit.py + main_submitit.py, rebuilt for TPU pods).

On TPU slices there is no per-GPU process fan-out: you run ONE process per
host and `jax.distributed.initialize()` discovers the topology (from the
TPU metadata on Cloud TPU, or coordinator env vars elsewhere). This module:

  * parses the training flags of main_submitit.py:15-82 (same names)
  * initializes jax.distributed for multi-host when requested
  * seeds per-host (seed + process_index, main_submitit.py:90)
  * installs a SIGTERM/SIGUSR1 preemption hook that checkpoints and exits
    cleanly so a requeued job auto-resumes from OUTPUT/name/tagXX
    (run_with_submitit.py:57-67 requeue semantics; on SLURM, pair with
    `#SBATCH --requeue` + `scontrol requeue $SLURM_JOB_ID` in the epilog,
    or rely on Cloud TPU's queued-resource restarts)

Usage (single- or multi-host; identical command on every host):
  python -m instancediffusion_tpu.launch --name run1 --yaml_file cfg.yaml \
      --train_list DATA/train.txt --official_ckpt DATA/v1-5-pruned-emaonly.ckpt
"""

from __future__ import annotations

import argparse
import signal
import sys


def get_args_parser():
    p = argparse.ArgumentParser("InstanceDiffusion-TPU training launcher")
    # main_submitit.py flag names preserved
    p.add_argument("--name", type=str, default="test")
    p.add_argument("--yaml_file", type=str, default=None)
    p.add_argument("--train_list", type=str, required=True)
    p.add_argument("--official_ckpt", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--base_learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--scheduler_type", type=str, default="constant")
    p.add_argument("--total_iters", type=int, default=500000)
    p.add_argument("--save_every_iters", type=int, default=10000)
    p.add_argument("--ema_rate", type=float, default=0.9999)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--output_dir", type=str, default="OUTPUT")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before training")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port (non-TPU-metadata envs)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host rendezvous: the equivalent of the reference's
    init_process_group(backend='nccl') + barrier (utils/dist.py:13-37).
    Topology comes from the TPU metadata service on Cloud TPU, or from the
    explicit coordinator args elsewhere (incl. the CPU dryrun's 2-process
    DCN leg, which drives exactly this function). Returns
    (process_index, process_count) after the rendezvous completes."""
    import jax

    kw = {}
    if coordinator:
        kw = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)
    return jax.process_index(), jax.process_count()


def main(argv=None):
    args = get_args_parser().parse_args(argv)

    import jax

    if args.multihost:
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    from instancediffusion_tpu.config import load_config
    from instancediffusion_tpu.train.trainer import Trainer

    overrides = {
        "train": {
            k: getattr(args, k)
            for k in (
                "name", "batch_size", "base_learning_rate", "weight_decay",
                "warmup_steps", "scheduler_type", "total_iters",
                "save_every_iters", "ema_rate", "seed", "output_dir", "wandb",
            )
        }
    }
    cfg = load_config(args.yaml_file, overrides)

    trainer = Trainer(cfg, args.train_list, pretrained_ckpt=args.official_ckpt)

    # preemption -> checkpoint + clean exit; the requeued job auto-resumes
    def _preempt_handler(signum, frame):
        print(f"signal {signum}: checkpointing for requeue...", flush=True)
        if jax.process_index() == 0:
            from instancediffusion_tpu.io.checkpoint import save_train_ckpt

            save_train_ckpt(trainer.folder, jax.device_get(trainer.state), None)
        sys.exit(0)

    signal.signal(signal.SIGTERM, _preempt_handler)
    try:
        signal.signal(signal.SIGUSR1, _preempt_handler)
    except (ValueError, OSError):
        pass

    trainer.start_training()


if __name__ == "__main__":
    main()
