"""Kernel-shape autotune cache (the volk_gnsssdr_profile role,
/root/reference/src/algorithms/libs/volk_gnsssdr_module/volk_gnsssdr/apps/
volk_gnsssdr_profile.cc: measure kernel variants once on the target
machine, persist the winners, load them at run time).

The TPU analogue tunes SHAPES instead of SIMD dispatch: epochs-per-block
of the block-FFT tracking kernel (and any future chunk/NFFT knobs),
measured honestly on the attached device by tools.profile_kernels and
cached as JSON.  TrackingEngine consults the cache transparently; absent
entries fall back to the hand-picked defaults.

Cache location: $GNSS_TPU_PROFILE, else
~/.cache/gnss_sim_receiver_tpu/profile.json.
"""

from __future__ import annotations

import json
import os
import pathlib

_ENV = "GNSS_TPU_PROFILE"
_cache = None
_cache_src = None


def cache_path() -> pathlib.Path:
    p = os.environ.get(_ENV)
    if p:
        return pathlib.Path(p)
    return (pathlib.Path(os.path.expanduser("~"))
            / ".cache" / "gnss_sim_receiver_tpu" / "profile.json")


def _load() -> dict:
    global _cache, _cache_src
    path = cache_path()
    if _cache is not None and _cache_src == str(path):
        return _cache
    try:
        with open(path) as fh:
            _cache = json.load(fh)
    except (OSError, ValueError):
        _cache = {}
    _cache_src = str(path)
    return _cache


def key_e_block(fs: float, code_length_chips: float,
                t_epoch_s: float) -> str:
    return (f"e_block:fs={int(round(fs))}:cl={int(code_length_chips)}"
            f":te={t_epoch_s * 1e3:.3f}ms")


def lookup(key: str):
    """Tuned value for `key` (None when the machine was never profiled
    for this operating point)."""
    return _load().get(key)


def store(key: str, value, extra: dict | None = None) -> None:
    path = cache_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    data = _load()
    data[key] = value
    if extra:
        data.setdefault("_meta", {})[key] = extra
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    global _cache, _cache_src
    _cache = data
    _cache_src = str(path)


def invalidate() -> None:
    """Drop the in-process memo (tests switch $GNSS_TPU_PROFILE)."""
    global _cache, _cache_src
    _cache = None
    _cache_src = None
