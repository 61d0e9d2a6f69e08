"""Run-directory + logger setup.

Equivalent surface to the reference's prepare_logger / print_info
(/root/reference/common/misc.py:17-80): timestamped log dir, console + file
handlers, git SHA + working-diff capture, full config dump. No third-party
logging deps (coloredlogs/gitpython in the reference) — plain logging +
subprocess git.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import shutil
import subprocess
import sys
from datetime import datetime
from typing import Optional, Tuple


def _git_info(log_dir: Optional[str]) -> Optional[str]:
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                             text=True, check=True).stdout.strip()
        if log_dir is not None:
            diff = subprocess.run(["git", "diff"], capture_output=True,
                                  text=True).stdout
            with open(os.path.join(log_dir, "compareHead.diff"), "w") as fid:
                fid.write(diff)
        return sha
    except Exception:
        return None


def prepare_logger(cfg, log_path: Optional[str] = None
                   ) -> Tuple[logging.Logger, str]:
    """Create the logging directory and install console + file handlers.

    cfg: a Config dataclass (or any object with logdir/dev/name attrs).
    Returns (logger, log_path).
    """
    if log_path is None:
        if getattr(cfg, "dev", False):
            # fixed, wiped-on-start dev run dir (reference train.py uses a
            # literal '../logdev'; we keep it under --logdir so a dev run
            # never writes outside the requested tree)
            log_path = os.path.join(getattr(cfg, "logdir", "./logs"),
                                    "logdev")
            shutil.rmtree(log_path, ignore_errors=True)
        else:
            stamp = datetime.now().strftime("%y%m%d_%H%M%S")
            name = getattr(cfg, "name", None)
            log_path = os.path.join(cfg.logdir, f"{stamp}_{name}" if name else stamp)
    os.makedirs(log_path, exist_ok=True)

    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        "%(asctime)s [%(levelname)s] %(name)s: %(message)s")
    if not any(isinstance(h, logging.StreamHandler) and h.stream is sys.stdout
               for h in logger.handlers):
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(fmt)
        logger.addHandler(console)
    file_handler = logging.FileHandler(os.path.join(log_path, "log.txt"), mode="a")
    file_handler.setFormatter(fmt)
    logger.addHandler(file_handler)

    logger.info("Command: %s", " ".join(sys.argv))
    sha = _git_info(log_path)
    if sha:
        logger.info("Source commit: %s", sha[:12])
    if dataclasses.is_dataclass(cfg):
        cfg_json = json.dumps(dataclasses.asdict(cfg), indent=2, default=str)
        with open(os.path.join(log_path, "config.json"), "w") as fid:
            fid.write(cfg_json)
        logger.info("Config:\n%s", cfg_json)
    logger.info("Output and logs will be saved to: %s", log_path)
    return logger, log_path


def snapshot_source(log_path: str, package_root: Optional[str] = None) -> None:
    """Copy the framework source into the run dir for exact reproducibility
    (reference train.py:494-498 copies its code into the log dir)."""
    if package_root is None:
        package_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(log_path, "code", os.path.basename(package_root))
    if os.path.exists(dst):
        return
    shutil.copytree(package_root, dst,
                    ignore=shutil.ignore_patterns("__pycache__", "*.so"))
