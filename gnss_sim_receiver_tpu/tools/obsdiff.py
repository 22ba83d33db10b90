"""obsdiff: compare two RINEX observation files (reference
src/utils/rinex-tools/obsdiff.cc role).

Matches epochs (by time) and satellites (by system+PRN) between a test
and a reference file, forms single differences of pseudorange, carrier
phase and Doppler per satellite, optionally double differences against
the highest-CN0 satellite, and reports mean/std/RMS per satellite plus
aggregates.  Exit code 1 if any requested threshold is exceeded.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from gnss_sim_receiver_tpu.models.outputs import read_rinex_obs


def diff_obs(path_test, path_ref, tol_ms: float = 1.0):
    """-> dict[(system, prn)] -> {"pr": [...], "ph": [...], "dop": [...]}
    of single differences (test - ref) over matched epochs."""
    et, pt, st = read_rinex_obs(path_test)
    er, pr_, sr = read_rinex_obs(path_ref)
    ref_by_ms = {int(round(e.rx_time_s * 1000.0)): e for e in er}
    keys_t = list(zip(st, pt))
    keys_r = list(zip(sr, pr_))
    idx_r = {k: i for i, k in enumerate(keys_r)}
    out: dict = {}
    for e in et:
        r = ref_by_ms.get(int(round(e.rx_time_s * 1000.0)))
        if r is None:
            continue
        for i, k in enumerate(keys_t):
            j = idx_r.get(k)
            if j is None or not e.valid[i] or not r.valid[j]:
                continue
            d = out.setdefault(k, {"pr": [], "ph": [], "dop": [], "t": []})
            d["pr"].append(e.pseudorange_m[i] - r.pseudorange_m[j])
            d["ph"].append(e.carrier_phase_cycles[i]
                           - r.carrier_phase_cycles[j])
            d["dop"].append(e.carrier_doppler_hz[i]
                            - r.carrier_doppler_hz[j])
            d["t"].append(e.rx_time_s)
    return out


def stats(diffs: dict) -> dict:
    """Per-satellite and aggregate mean/std/RMS of the single
    differences; double differences remove the common receiver
    clock/time offset (obsdiff.cc's RMS reports)."""
    rep: dict = {"per_sat": {}, "n_sats": len(diffs)}
    all_pr, all_ph = [], []
    for k, d in sorted(diffs.items()):
        pr = np.asarray(d["pr"])
        ph = np.asarray(d["ph"])
        rep["per_sat"]["%s%02d" % (k[0][0], k[1])] = {
            "n": int(pr.size),
            "pr_mean": float(pr.mean()), "pr_std": float(pr.std()),
            "pr_rms": float(np.sqrt((pr ** 2).mean())),
            "ph_mean": float(ph.mean()), "ph_std": float(ph.std()),
        }
        all_pr.append(pr)
        all_ph.append(ph)
    if all_pr:
        # double differences vs the first satellite: cancels the common
        # (receiver-clock) single-difference component
        base_pr = all_pr[0]
        dd = []
        for pr in all_pr[1:]:
            n = min(len(pr), len(base_pr))
            dd.append(pr[:n] - base_pr[:n])
        if dd:
            ddv = np.concatenate(dd)
            rep["dd_pr_rms"] = float(np.sqrt((ddv ** 2).mean()))
            rep["dd_pr_std"] = float(ddv.std())
        a = np.concatenate(all_pr)
        rep["pr_rms"] = float(np.sqrt((a ** 2).mean()))
    return rep


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("test_obs")
    ap.add_argument("ref_obs")
    ap.add_argument("--dd-pr-rms-max", type=float, default=None,
                    help="fail if DD pseudorange RMS exceeds this [m]")
    args = ap.parse_args(argv)
    rep = stats(diff_obs(args.test_obs, args.ref_obs))
    print(json.dumps(rep, indent=1))
    if (args.dd_pr_rms_max is not None
            and rep.get("dd_pr_rms", 0.0) > args.dd_pr_rms_max):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
