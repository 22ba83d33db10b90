"""glog-role logging layer (the reference links glog/abseil-log and
sprinkles LOG(INFO/WARNING/ERROR) + DLOG + VLOG(n) through every block;
see e.g. control_thread.cc, gnss_block_factory.cc).

Design: a thin veneer over the stdlib logging module so the framework
logs with the same call shapes the reference uses —

    from gnss_sim_receiver_tpu.utils import glog
    log = glog.logger("tracking")
    log.info("channel %d locked", ch)
    glog.vlog(2, "detail only at verbosity >= 2: %s", x)

- `init(log_dir=..., verbosity=...)` mirrors the reference CLI flags
  (--log_dir, GNSS-SDR.log_verbosity / commandline_flags); files rotate
  per process start as glog does (one file per severity is collapsed to
  a single file — separate-severity files add nothing here).
- VLOG levels map to DEBUG records gated by a module-independent
  verbosity integer, as glog's --v flag does.
- Default (uninitialized) behavior: WARNING+ to stderr, so library use
  stays quiet exactly like the reference's default glog setup.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from pathlib import Path

_ROOT = "gnss_sim_receiver_tpu"
_verbosity = 0
_initialized = False


def logger(module: str) -> logging.Logger:
    """Module logger under the framework's namespace."""
    return logging.getLogger(f"{_ROOT}.{module}")


def verbosity() -> int:
    return _verbosity


def vlog(level: int, msg: str, *args, module: str = "v") -> None:
    """glog VLOG(level): emitted (as DEBUG) only when init() verbosity
    is >= level."""
    if _verbosity >= level:
        logger(module).debug(msg, *args)


def init(log_dir: str | None = None, verbosity: int = 0,
         also_stderr: bool | None = None) -> Path | None:
    """Initialize framework logging (glog InitGoogleLogging role).

    log_dir: write a timestamped log file there (created if missing);
             None logs to stderr only.
    verbosity: VLOG gate; >0 also lowers the threshold to DEBUG.
    Returns the log-file path (or None)."""
    global _verbosity, _initialized
    _verbosity = int(verbosity)
    root = logging.getLogger(_ROOT)
    root.setLevel(logging.DEBUG if _verbosity > 0 else logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter(
        "%(levelname).1s%(asctime)s.%(msecs)03d %(name)s] %(message)s",
        datefmt="%m%d %H:%M:%S")
    path = None
    if log_dir:
        d = Path(log_dir)
        d.mkdir(parents=True, exist_ok=True)
        path = d / time.strftime("gnss_sim_receiver_tpu.%Y%m%d-%H%M%S."
                                 + str(os.getpid()) + ".log")
        fh = logging.FileHandler(path)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    if also_stderr or (also_stderr is None and not log_dir):
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        root.addHandler(sh)
    root.propagate = False
    _initialized = True
    return path
