"""Training CLI — the basicsr/train.py equivalent.

    python -m turtlevsr_tpu.cli.train -opt options/Turtle_Deblur_Gopro.yml

Differences from the reference (train.py:33-293), by design:
  * one PROCESS per host, one Mesh over all local chips (vs one process per
    GPU + DDP/NCCL); gradients all-reduce via XLA collectives,
  * bf16 mixed precision instead of AMP+GradScaler,
  * the per-clip frame loop is a jitted lax.scan (train/step.py),
  * checkpoints via Orbax (io/checkpoint.py) with the same auto-resume
    behaviour (newest training_states entry wins, train.py:147-167),
  * "debug" in the experiment name shrinks val/log/save freqs to 8/1/8
    (options.py:84-89).
"""

from __future__ import annotations

import argparse
import os
import time
from os import path as osp

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True,
                        help="Path to option YAML file.")
    parser.add_argument("--launcher", choices=["none", "pytorch", "slurm"],
                        default="none", help="accepted for reference-CLI "
                        "compatibility; ignored (JAX discovers the topology)")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--kernels", choices=["xla", "pallas"], default=None)
    parser.add_argument("--max_iters", type=int, default=None,
                        help="override total_iter (smoke tests)")
    parser.add_argument("--export_pth", type=str, default=None,
                        help="export the newest checkpoint's params as a "
                        "reference-format {'params': state_dict} .pth and "
                        "exit (inverse of pretrain .pth loading)")
    parser.add_argument("--trace_dir", type=str, default=None,
                        help="write a jax.profiler trace of training iters "
                        "%(metavar)s (view in TensorBoard/Perfetto); traces "
                        "--trace_iters steps after the first post-compile "
                        "one", metavar="DIR")
    parser.add_argument("--trace_iters", type=int, default=5,
                        help="how many iters the --trace_dir trace spans")
    return parser.parse_args()


def build_validation(cfg, val_opt, opt):
    """Validation over the FULL val set, sharded round-robin over processes
    (idx % world_size, video_restoration_model.py:162-164), with per-frame
    PSNR/SSIM via the val-loop metric family and optional res/gt/lq image
    dumps into path.visualization (:175-191). Per-process sums are combined
    so every rank logs the same global average."""
    import jax
    import jax.numpy as jnp

    from turtlevsr_tpu.metrics import calculate_psnr, calculate_ssim
    from turtlevsr_tpu.models.turtle import forward, init_cache
    from turtlevsr_tpu.utils.img import img_from_float, imwrite

    vopt = opt.get("val") or {}
    metrics_opt = vopt.get("metrics") or {}
    save_img = bool(vopt.get("save_img"))
    vis_root = (opt.get("path") or {}).get("visualization", "visualization")

    def validate(params, dataset, max_clips=None, current_iter=0):
        fwd = jax.jit(lambda p, x, c: forward(p, cfg, x, c))
        # validation runs at the eval dtype end to end: cast the (fp32
        # train) params once so the forward isn't accidentally
        # mixed-precision (bf16 inputs against fp32 weights)
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        sums = {name: 0.0 for name in metrics_opt}
        cnt = 0
        n = len(dataset) if max_clips is None else min(len(dataset),
                                                       max_clips)
        for idx in range(n):
            if idx % jax.process_count() != jax.process_index():
                continue
            item = dataset[idx]
            lq, gt = item["lq"], item["gt"]
            clip_key = str(item.get("key", idx)).replace("/", "_")
            t, h, w, _ = lq.shape
            cache = init_cache(cfg, 1, h, w, dtype=jnp.bfloat16)
            prev = lq[0]
            for j in range(t):
                x = jnp.asarray(np.stack([prev, lq[j]])[None],
                                jnp.bfloat16)
                out, cache = fwd(params, x, cache)
                pred = np.clip(np.asarray(out[0], np.float32), 0, 1)
                if save_img:
                    base = osp.join(vis_root, clip_key)
                    imwrite(img_from_float(pred),
                            osp.join(base, f"{clip_key}_frame{j}_res.png"))
                    imwrite(img_from_float(gt[j]),
                            osp.join(base, f"{clip_key}_frame{j}_gt.png"))
                    imwrite(img_from_float(lq[j]),
                            osp.join(base, f"{clip_key}_frame{j}_lq.png"))
                for name, mopt in metrics_opt.items():
                    mt = mopt.get("type", "calculate_psnr")
                    kw = {k: v for k, v in mopt.items() if k != "type"}
                    if mt == "calculate_psnr":
                        sums[name] += calculate_psnr(pred, gt[j], **kw)
                    elif mt == "calculate_ssim":
                        sums[name] += calculate_ssim(pred, gt[j], **kw)
                cnt += 1
                prev = lq[j]
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            packed = np.array([cnt] + [sums[k] for k in metrics_opt],
                              np.float64)
            total = np.asarray(
                multihost_utils.process_allgather(packed)).sum(axis=0)
            cnt = total[0]
            sums = {k: total[1 + i] for i, k in enumerate(metrics_opt)}
        return {k: float(v / max(cnt, 1)) for k, v in sums.items()}

    return validate


def main():
    from turtlevsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from turtlevsr_tpu.config.options import load_options, model_config_from_options
    from turtlevsr_tpu.data import EnlargedSampler, PrefetchLoader, create_dataset
    from turtlevsr_tpu.io.checkpoint import (
        latest_checkpoint_step, restore_checkpoint, save_checkpoint)
    from turtlevsr_tpu.models.turtle import init_params
    from turtlevsr_tpu.parallel.mesh import (
        make_mesh, maybe_init_distributed, process_is_primary, replicate,
        shard_batch)
    from turtlevsr_tpu.train.lr_schedule import build_schedule
    from turtlevsr_tpu.train.step import TrainState, make_optimizer, make_train_step
    from turtlevsr_tpu.utils.logger import (
        MessageLogger, get_env_info, get_root_logger, init_tb_logger)
    from turtlevsr_tpu.utils.misc import make_exp_dirs, set_random_seed

    maybe_init_distributed()

    opt = load_options(args.opt, is_train=True)
    if args.kernels:
        opt["kernels"] = args.kernels
    if args.max_iters:
        opt["train"]["total_iter"] = args.max_iters

    # debug mode (options.py:84-89)
    if "debug" in opt["name"]:
        opt.setdefault("val", {})["val_freq"] = 8
        opt.setdefault("logger", {})["print_freq"] = 1
        opt["logger"]["save_checkpoint_freq"] = 8

    exp_root = osp.join("experiments", opt["name"])
    opt.setdefault("path", {})
    opt["path"].update({
        "experiments_root": exp_root,
        "models": osp.join(exp_root, "models"),
        "training_states": osp.join(exp_root, "training_states"),
        "log": exp_root,
        "visualization": osp.join(exp_root, "visualization"),
    })

    resume_step = latest_checkpoint_step(exp_root)

    if args.export_pth:
        from turtlevsr_tpu.io.checkpoint import restore_params
        from turtlevsr_tpu.io.torch_convert import save_torch_checkpoint

        cfg = model_config_from_options(opt)
        params = init_params(jax.random.PRNGKey(0), cfg)
        if resume_step is not None:
            state = TrainState.create(params,
                                      make_optimizer(opt["train"],
                                                     build_schedule(opt["train"])))
            state = restore_checkpoint(exp_root, resume_step, state)
            params = state.params
            print(f"exporting iter {resume_step} params -> {args.export_pth}")
        else:
            pre = (opt.get("path") or {}).get("pretrain_network_g")
            if not pre or str(pre) in ("~", "None"):
                raise SystemExit("no checkpoint found under "
                                 f"{exp_root}/training_states and no "
                                 "pretrain_network_g to export")
            params = restore_params(str(pre), target=params)
            print(f"exporting {pre} params -> {args.export_pth}")
        save_torch_checkpoint(args.export_pth, jax.device_get(params))
        return

    if resume_step is None and process_is_primary():
        make_exp_dirs(opt)
    os.makedirs(exp_root, exist_ok=True)

    logger = get_root_logger(
        log_file=osp.join(exp_root, f"train_{opt['name']}.log"))
    logger.info(get_env_info())

    seed = int(opt.get("manual_seed", 0))
    set_random_seed(seed)

    cfg = model_config_from_options(opt)
    train_opt = opt["train"]
    schedule = build_schedule(train_opt)
    tx = make_optimizer(train_opt, schedule)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    params = init_params(jax.random.PRNGKey(seed), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"Model [{cfg.variant}] params: {n_params / 1e6:.2f} M; "
                f"mesh: {n_dev} device(s)")

    # warm-start from a pretrained network (path.pretrain_network_g, used by
    # the reference for fine-tuning; accepts .pth or orbax params dirs)
    pretrain = (opt.get("path") or {}).get("pretrain_network_g")
    if pretrain and str(pretrain) not in ("~", "None") and resume_step is None:
        from turtlevsr_tpu.io.checkpoint import restore_params

        params = restore_params(str(pretrain), target=params)
        logger.info(f"load_model {pretrain}")

    state = TrainState.create(params, tx)
    start_iter = 0
    if resume_step is not None:
        state = restore_checkpoint(exp_root, resume_step, state)
        start_iter = resume_step
        logger.info(f"Resuming training from iter {resume_step}")
    state = replicate(mesh, state)

    step_fn = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16,
                              remat=True, mesh=mesh)

    train_ds = create_dataset(opt, "train")
    dataset_opt = (opt.get("datasets") or {}).get("train") or {}
    batch_per_dev = int(dataset_opt.get("batch_size_per_gpu", 2))
    # each process loads only its ADDRESSABLE devices' share; shard_batch
    # assembles the global array (multi-host: local_device_count < n_dev)
    from turtlevsr_tpu.parallel.mesh import per_process_batch_size

    batch = per_process_batch_size(batch_per_dev)
    enlarge = int(dataset_opt.get("dataset_enlarge_ratio", 1))
    # rank-strided sharding across hosts (EnlargedSampler semantics)
    sampler = EnlargedSampler(len(train_ds), jax.process_count(),
                              jax.process_index(), ratio=enlarge)
    workers = int(dataset_opt.get("num_worker_per_gpu", 2))
    loader = PrefetchLoader(train_ds, sampler, batch, num_workers=workers)
    logger.info(f"Training clips: {len(train_ds)}; global batch: "
                f"{batch_per_dev * n_dev} ({batch_per_dev}/device, "
                f"{batch}/process)")

    val_ds = None
    if (opt.get("datasets") or {}).get("val") or (opt.get("val") or {}):
        try:
            val_ds = create_dataset(opt, "val")
        except (FileNotFoundError, AssertionError, KeyError) as e:
            logger.warning(f"validation dataset unavailable: {e}")
    validate = build_validation(cfg, (opt.get("datasets") or {}).get("val"),
                                opt)

    logger_opt = opt.get("logger") or {}
    tb = None
    if logger_opt.get("use_tb_logger") and process_is_primary():
        from turtlevsr_tpu.utils.logger import init_wandb_logger

        init_wandb_logger(opt)  # wandb (if installed+configured) syncs TB
        tb = init_tb_logger(osp.join("tb_logger", opt["name"]))
    msg_logger = MessageLogger(opt, start_iter + 1, tb)

    total_iters = int(train_opt["total_iter"])
    print_freq = int(logger_opt.get("print_freq", 200))
    save_freq = int(float(logger_opt.get("save_checkpoint_freq", 10000)))
    val_freq = int(float((opt.get("val") or {}).get("val_freq", 0) or 0))

    current_iter = start_iter
    epoch = 0
    data_time = iter_time = 0.0
    t_start = time.time()
    logger.info(f"Start training from iter {current_iter}")

    # --trace_dir: jax.profiler trace of a few steady-state iters
    # (SURVEY §5 tracing; starts after the compile iter so the trace shows
    # execution, not compilation)
    trace_start = (min(start_iter + 2, max(total_iters - 1, start_iter))
                   if args.trace_dir else -1)
    trace_stop = trace_start + max(1, args.trace_iters)
    tracing = False

    while current_iter < total_iters:
        sampler.set_epoch(epoch)
        for batch_np in loader:
            if current_iter >= total_iters:
                break
            t_data = time.time()
            lq, gt = shard_batch(mesh, (batch_np["lq"], batch_np["gt"]))
            data_time = time.time() - t_data

            if current_iter == trace_start and not tracing:
                # honest sync: block_until_ready returns early through the
                # axon tunnel — force a device->host fetch instead
                np.asarray(jax.tree_util.tree_leaves(state.params)[0]
                           ).ravel()[:1]
                jax.profiler.start_trace(args.trace_dir)
                tracing = True

            t_it = time.time()
            state, logs = step_fn(state, lq, gt)
            current_iter += 1

            if tracing and current_iter >= trace_stop:
                float(logs["l_pix"])  # device->host sync (see above)
                jax.profiler.stop_trace()
                tracing = False
                logger.info(f"Profiler trace written to {args.trace_dir}")

            if current_iter % print_freq == 0:
                loss = float(logs["l_pix"])  # device sync
                iter_time = time.time() - t_it
                msg_logger({"iter": current_iter, "epoch": epoch,
                            "lrs": [float(schedule(current_iter - 1))],
                            "time": iter_time, "data_time": data_time,
                            "l_pix": loss})

            if save_freq and current_iter % save_freq == 0 \
                    and process_is_primary():
                logger.info("Saving models and training states.")
                save_checkpoint(exp_root, current_iter, state)

            if val_freq and val_ds is not None \
                    and current_iter % val_freq == 0:
                metrics = validate(jax.device_get(state.params), val_ds)
                line = "Validation," + "".join(
                    f"\t # {k}: {v:.4f}" for k, v in metrics.items())
                logger.info(line)
                if tb is not None:
                    for k, v in metrics.items():
                        tb.add_scalar(f"metrics/{k}", v, current_iter)
        epoch += 1

    if tracing:
        # honest sync: block_until_ready returns early through the axon
        # tunnel (CLAUDE.md) — fetch a leaf to host like the in-loop hook
        from turtlevsr_tpu.utils.profiling import device_sync
        device_sync(state.params)
        jax.profiler.stop_trace()
        logger.info(f"Profiler trace written to {args.trace_dir}")

    if process_is_primary():
        logger.info("End of training. Saving the latest model.")
        save_checkpoint(exp_root, current_iter, state)
    logger.info(f"Training done in {time.time() - t_start:.1f}s "
                f"({current_iter} iters)")


if __name__ == "__main__":
    main()
