"""Training CLI — the `ctg_approx/avi.py` equivalent.

Usage (mirrors reference train.sh:4):
  python -m deepcubea_tpu.cli.train --env cube3 --states_per_update 50000000 \
      --batch_size 10000 --nnet_name cube3 --max_itrs 1200000 \
      --loss_thresh 0.06 --back_max 30

Checkpoints land in <save_dir>/<nnet_name>/{current,target}/ with resume on
restart (reference avi.py:162-173, 196-198); stdout tees to output.txt
(avi.py:181-182).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from argparse import ArgumentParser

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--env", type=str, required=True)
    p.add_argument("--debug", action="store_true", default=False)
    # gradient descent (reference avi.py:28-32)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lr_d", type=float, default=0.9999993)
    # training
    p.add_argument("--max_itrs", type=int, default=1_000_000)
    p.add_argument("--batch_size", type=int, default=1000)
    # update
    p.add_argument("--loss_thresh", type=float, default=0.05)
    p.add_argument("--states_per_update", type=int, default=1000)
    p.add_argument("--epochs_per_update", type=int, default=1)
    p.add_argument("--max_update_steps", type=int, default=1)
    p.add_argument("--update_method", type=str, default="GBFS")
    p.add_argument("--eps_max", type=float, default=0.0)
    p.add_argument("--label_group", type=int, default=0,
                   help="explorer label grouping: iterations' worth of "
                        "roots explored per batched call (0 auto, 1 off); "
                        "see AVIConfig.label_group")
    p.add_argument("--scramble_pool", type=int, default=-1,
                   help="mixing-chain scramble pool size: -1 auto (on), "
                        "0 off (fresh back_max-scan per iteration), >0 "
                        "explicit chain count (training/scramble_pool.py)")
    p.add_argument("--double_q", action="store_true", default=False,
                   help="double-Q Bellman labels: argmin child selected by "
                        "the current net, evaluated by the target net; "
                        "removes the min-over-children selection bias that "
                        "can freeze value iteration below the true cost "
                        "(AVIConfig.double_q)")
    p.add_argument("--plateau_promote", type=int, default=0,
                   help="promote current->target after this many update "
                        "phases with a stalled loss above loss_thresh "
                        "(automates the reference's manual promotion, "
                        "train.sh:5); 0 = exact reference gate only")
    # testing
    p.add_argument("--num_test", type=int, default=10000)
    # data
    p.add_argument("--back_max", type=int, required=True)
    # model
    p.add_argument("--nnet_name", type=str, required=True)
    p.add_argument("--update_num", type=int, default=None,
                   help="override the starting update number (reference "
                        "avi.py:89, used after a manual target promotion)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="devices on the mesh 'data' axis (batch sharding); "
                        "replaces the reference's DataParallel + worker "
                        "pool (avi.py:200-202, updater.py:100-112)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="devices on the mesh 'model' axis (fc1 tensor "
                        "parallelism)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the first update "
                        "phase into this directory (TensorBoard-viewable)")
    p.add_argument("--save_dir", type=str, default="saved_models")
    p.add_argument("--seed", type=int, default=0)
    # architecture overrides (default: the reference architecture per env)
    p.add_argument("--h1_dim", type=int, default=None)
    p.add_argument("--resnet_dim", type=int, default=None)
    p.add_argument("--num_resnet_blocks", type=int, default=None)
    p.add_argument("--sokoban_boards", type=str, default=None,
                   help="pickle of seed boards for sokoban hindsight "
                        "generation (reference data/sokoban layout)")
    return p.parse_args(argv)


def main(argv=None):
    from ..envs import get_environment
    from ..training import AVIConfig, AVITrainer
    from ..utils.checkpoint import (load_checkpoint, promote_to_target,
                                    save_checkpoint)
    from ..utils.logger import install_logger

    from ..utils.quiesce import install_quiesce_handler
    install_quiesce_handler()
    args = parse_args(argv)
    model_dir = os.path.join(args.save_dir, args.nnet_name)
    curr_dir = os.path.join(model_dir, "current")
    targ_dir = os.path.join(model_dir, "target")
    os.makedirs(curr_dir, exist_ok=True)
    os.makedirs(targ_dir, exist_ok=True)

    if not args.debug:
        install_logger(os.path.join(model_dir, "output.txt"))

    # args snapshot (reference avi.py:110-114)
    with open(os.path.join(model_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    env = get_environment(args.env)
    if env.name == "sokoban":
        _load_sokoban_boards(env, args.sokoban_boards)

    cfg = AVIConfig(
        back_max=args.back_max, batch_size=args.batch_size, lr=args.lr,
        lr_d=args.lr_d, max_itrs=args.max_itrs, loss_thresh=args.loss_thresh,
        states_per_update=args.states_per_update,
        epochs_per_update=args.epochs_per_update,
        max_update_steps=args.max_update_steps,
        update_method=args.update_method.lower(), eps_max=args.eps_max,
        num_test=args.num_test, plateau_promote=args.plateau_promote,
        scramble_pool=args.scramble_pool, label_group=args.label_group,
        double_q=args.double_q)

    nnet_config = dict(env.nnet_config)
    for k in ("h1_dim", "resnet_dim", "num_resnet_blocks"):
        if getattr(args, k) is not None:
            nnet_config[k] = getattr(args, k)

    from ..models import build_model
    print(f"devices: {jax.devices()}")
    mesh = None
    if args.data_parallel * args.model_parallel > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(args.data_parallel * args.model_parallel,
                         model_parallel=args.model_parallel)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    trainer = AVITrainer(env, cfg, seed=args.seed,
                         model=build_model(nnet_config), mesh=mesh)

    # resume (reference avi.py:162-173)
    ckpt = load_checkpoint(curr_dir)
    if ckpt is not None:
        trainer.state = trainer._shard_state(trainer.state._replace(
            params=jax.tree_util.tree_map(jnp.asarray, ckpt["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, ckpt["batch_stats"]),
            itr=jnp.asarray(ckpt["meta"].get("itr", 0), jnp.int32)))
        trainer.update_num = ckpt["meta"].get("update_num", 0)
        print(f"resumed from {curr_dir}: itr {trainer.itr}, "
              f"update {trainer.update_num}")
        nh = trainer.load_deep_band_history(
            os.path.join(model_dir, "metrics.jsonl"))
        if nh:
            print(f"deep-band history rebuilt from metrics.jsonl: "
                  f"{nh} evals")
        tgt = load_checkpoint(targ_dir)
        if tgt is not None:
            trainer.target_params = jax.tree_util.tree_map(
                jnp.asarray, tgt["params"])
            trainer.target_stats = jax.tree_util.tree_map(
                jnp.asarray, tgt["batch_stats"])

    if args.update_num is not None:
        trainer.update_num = args.update_num

    def on_update_end(t: AVITrainer):
        meta = dict(itr=t.itr, update_num=t.update_num,
                    config=dataclasses.asdict(cfg), env=args.env,
                    nnet_config=nnet_config)
        save_checkpoint(curr_dir, t.state.params, t.state.batch_stats, meta)
        if getattr(t, "last_swapped", False):
            # current -> target only when the swap fired (avi.py:250-255)
            promote_to_target(curr_dir, targ_dir)
        # structured learning-curve record
        rec = dict(itr=t.itr, update_num=t.update_num, loss=t.last_loss,
                   eval=getattr(t, "last_eval", None))
        with open(os.path.join(model_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    if args.profile_dir:
        # trace one update phase (the steady-state workload), then continue
        from ..utils.profiling import trace
        with trace(args.profile_dir):
            trainer.run_update()
        trainer.last_eval = trainer.evaluate()
        trainer.maybe_swap_target()
        on_update_end(trainer)
        print(f"profile written to {args.profile_dir}")

    trainer.train(max_itrs=args.max_itrs, on_update_end=on_update_end)
    print(f"TRAINING COMPLETE: itr {trainer.itr}, update {trainer.update_num}")


def _load_sokoban_boards(env, path):
    import pickle

    import numpy as np

    from ..envs.sokoban import load_boards_from_grid

    candidates = [path] if path else [
        "data/sokoban/train/data_0.pkl", "data/sokoban/data_0.pkl",
        "/root/reference/data/sokoban/data_0.pkl",
    ]
    for p in candidates:
        if p and os.path.exists(p):
            with open(p, "rb") as f:
                grid = np.asarray(pickle.load(f))
            env.set_boards(load_boards_from_grid(grid))
            return
    raise SystemExit("sokoban: no seed boards found; pass --sokoban_boards")


if __name__ == "__main__":
    main()
