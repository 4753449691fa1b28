"""Logging: rank0-gated console/file logger, iteration message formatter,
TensorBoard — mirroring basicsr/utils/logger.py (MessageLogger :14-82,
get_root_logger :119-155, get_env_info :158-183)."""

from __future__ import annotations

import datetime
import logging
import time
from typing import Optional

_initialized = {}


def get_root_logger(logger_name: str = "turtlevsr", log_level=logging.INFO,
                    log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized:
        return logger
    fmt = "%(asctime)s %(levelname)s: %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(fmt, datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(sh)
    logger.propagate = False

    import jax

    if jax.process_index() != 0:
        logger.setLevel(logging.ERROR)  # silence non-primary hosts
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            fh = logging.FileHandler(log_file, "w")
            fh.setFormatter(logging.Formatter(fmt, datefmt="%Y-%m-%d %H:%M:%S"))
            logger.addHandler(fh)
    _initialized[logger_name] = True
    return logger


class MessageLogger:
    """Formatted training-iteration logging with lr/ETA/iter-time and
    TensorBoard scalar push (logger.py:14-82)."""

    def __init__(self, opt: dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt["name"]
        logger_opt = opt.get("logger") or {}
        self.interval = int(logger_opt.get("print_freq", 100))
        self.start_iter = start_iter
        self.max_iters = int(opt["train"]["total_iter"])
        self.use_tb_logger = bool(logger_opt.get("use_tb_logger", False))
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def __call__(self, log_vars: dict):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch", 0)
        lrs = log_vars.pop("lrs", [])

        # reference line format exactly (logger.py:55-59): 5-char exp name,
        # trailing comma inside the lr tuple
        message = (f"[{self.exp_name[:5]}..][epoch:{epoch:3d}, "
                   f"iter:{current_iter:8,d}, lr:(")
        for v in lrs:
            message += f"{v:.3e},"
        message += ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time", 0.0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1,
                                            1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += (f"[eta: {eta_str}, time (data): "
                        f"{iter_time:.3f} ({data_time:.3f})] ")

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            # 'debug' experiments skip TB like the reference (logger.py:77)
            if (self.use_tb_logger and self.tb_logger is not None
                    and "debug" not in self.exp_name):
                key = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(key, v, current_iter)
        self.logger.info(message)


def init_tb_logger(log_dir: str):
    from torch.utils.tensorboard import SummaryWriter

    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt: dict):
    """W&B in TensorBoard-sync mode (logger.py:92-116); optional dep."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning("wandb is not installed; skipping "
                                  "(TensorBoard logging is unaffected)")
        return None
    logger_opt = (opt.get("logger") or {}).get("wandb") or {}
    project = logger_opt.get("project")
    if not project:
        return None
    resume_id = logger_opt.get("resume_id")
    kwargs = dict(id=resume_id, resume="allow") if resume_id else {}
    wandb.init(project=project, name=opt["name"], config=opt,
               sync_tensorboard=True, **kwargs)
    return wandb


def get_env_info() -> str:
    import jax
    import turtlevsr_tpu

    msg = ("\nVersion Information:"
           f"\n\tturtlevsr_tpu: {turtlevsr_tpu.__version__}"
           f"\n\tJAX: {jax.__version__}"
           f"\n\tBackend: {jax.default_backend()}"
           f"\n\tDevices: {[str(d) for d in jax.devices()]}")
    return msg
