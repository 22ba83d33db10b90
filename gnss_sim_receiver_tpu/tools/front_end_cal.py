"""front_end_cal: estimate the front-end LO/IF frequency offset from a
raw capture plus assistance data (reference src/utils/front-end-cal/
front_end_cal.cc role).

Acquires every requested GPS PRN over the capture, predicts each
detected satellite's Doppler from the assisted ephemerides and the
approximate receiver position/time, and least-squares fits the common
measured-minus-predicted frequency offset — the front end's clock error
in Hz at L1 (and ppm).  The reference does exactly this with SUPL-
assisted ephemerides (front_end_cal.cc:379 estimate_doppler /
main.cc IF calibration loop).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from gnss_sim_receiver_tpu import constants

C = constants.SPEED_OF_LIGHT_M_S
F_L1 = constants.GPS_L1_FREQ_HZ


def predicted_doppler_hz(eph, rx_ecef, t_gps_s: float,
                         dt: float = 0.5) -> float:
    """Geometric Doppler at L1 from the broadcast orbit: finite-difference
    range rate (satellite clock drift excluded — the reference's
    expected-Doppler uses geometry only)."""
    t = np.asarray([t_gps_s - dt, t_gps_s + dt])
    pos, _ = eph.sat_pos_clock(t)
    r0 = np.linalg.norm(pos[0] - rx_ecef)
    r1 = np.linalg.norm(pos[1] - rx_ecef)
    return -(r1 - r0) / (2 * dt) / C * F_L1


def estimate_if_offset(x, fs: float, ephemerides: dict, rx_ecef,
                       t_gps_s: float, prns=None,
                       doppler_max: float = 10000.0,
                       doppler_step: float = 250.0):
    """-> (offset_hz, report): common LO offset at L1 over all detected
    satellites with assisted ephemerides."""
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)

    prns = list(prns or range(1, 33))
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, doppler_max=doppler_max,
                doppler_step=doppler_step, max_dwells=2,
                make_two_steps=True), prns=prns)
    res = acq.acquire(np.asarray(x))
    rx_ecef = np.asarray(rx_ecef, np.float64)
    rows = []
    for i, prn in enumerate(prns):
        if not bool(res.detected[i]) or prn not in ephemerides:
            continue
        pred = predicted_doppler_hz(ephemerides[prn], rx_ecef, t_gps_s)
        meas = float(res.doppler_hz[i])
        rows.append({"prn": prn, "measured_hz": meas,
                     "predicted_hz": round(pred, 1),
                     "residual_hz": round(meas - pred, 1)})
    if not rows:
        return None, {"detected_with_eph": 0, "sats": []}
    resid = np.asarray([r["residual_hz"] for r in rows])
    # robust common offset: median, then mean of inliers within 2 bins
    med = np.median(resid)
    inl = resid[np.abs(resid - med) < 2 * doppler_step]
    offset = float(inl.mean()) if inl.size else float(med)
    report = {"detected_with_eph": len(rows), "sats": rows,
              "offset_hz": round(offset, 1),
              "offset_ppm": round(offset / F_L1 * 1e6, 4),
              "spread_hz": round(float(resid.std()), 1)}
    return offset, report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("capture")
    ap.add_argument("--item-type", default="ishort")
    ap.add_argument("--fs", type=float, required=True)
    ap.add_argument("--assist", required=True,
                    help="assistance JSON (rinex2assist output)")
    ap.add_argument("--lat", type=float, required=True)
    ap.add_argument("--lon", type=float, required=True)
    ap.add_argument("--height", type=float, default=0.0)
    ap.add_argument("--time", type=float, required=True,
                    help="approximate GPS time of week [s]")
    ap.add_argument("--duration", type=float, default=0.1,
                    help="capture seconds to use")
    args = ap.parse_args(argv)

    from gnss_sim_receiver_tpu.nav.ephemeris import load_assistance
    from gnss_sim_receiver_tpu.utils import geodesy, sample_io
    x = sample_io.read_samples(args.capture, args.item_type)
    x = x[: int(args.fs * args.duration)]
    ephs = load_assistance(args.assist)
    if isinstance(ephs, tuple):
        ephs = ephs[0]
    rx = geodesy.llh_to_ecef(np.radians(args.lat), np.radians(args.lon),
                             args.height)
    offset, rep = estimate_if_offset(x, args.fs, ephs, rx, args.time)
    print(json.dumps(rep, indent=1))
    return 0 if offset is not None else 1


if __name__ == "__main__":
    sys.exit(main())
