"""PVT output writers: NMEA-0183, KML, GPX, GeoJSON, geohash, RINEX.

Host-side equivalents of the reference PVT printer stack
(src/algorithms/PVT/libs/: nmea_printer.cc, kml_printer.cc,
gpx_printer.cc, geojson_printer.cc, rinex_printer.cc) — compact functional
writers over PvtSolution/ObservationEpoch streams instead of 13.8 kLoC of
stateful printer classes.
"""

from __future__ import annotations

import datetime
from pathlib import Path

import numpy as np

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.utils import geodesy

# GPS epoch (1980-01-06) for week/TOW -> UTC conversion (ignoring leap
# seconds unless provided, like the reference before UTC params arrive)
GPS_EPOCH = datetime.datetime(1980, 1, 6, tzinfo=datetime.timezone.utc)


def gps_time_to_utc(week: int, tow_s: float,
                    leap_s: float = 18.0) -> datetime.datetime:
    return GPS_EPOCH + datetime.timedelta(weeks=week,
                                          seconds=tow_s - leap_s)


# ---------------------------------------------------------------------------
# NMEA-0183 (nmea_printer.cc)
# ---------------------------------------------------------------------------

def _nmea_checksum(body: str) -> str:
    cs = 0
    for ch in body:
        cs ^= ord(ch)
    return f"{cs:02X}"


def _nmea_latlon(lat_deg: float, lon_deg: float):
    lat_h = "N" if lat_deg >= 0 else "S"
    lon_h = "E" if lon_deg >= 0 else "W"
    alat, alon = abs(lat_deg), abs(lon_deg)
    lat_s = f"{int(alat):02d}{(alat - int(alat)) * 60:010.7f}"
    lon_s = f"{int(alon):03d}{(alon - int(alon)) * 60:010.7f}"
    return lat_s, lat_h, lon_s, lon_h


def nmea_gga(sol, week: int = 0, leap_s: float = 18.0) -> str:
    lat, lon, h = geodesy.ecef_to_llh(sol.rx_ecef_m)
    t = gps_time_to_utc(week, sol.rx_time_corrected_s, leap_s)
    lat_s, lat_h, lon_s, lon_h = _nmea_latlon(np.degrees(lat),
                                              np.degrees(lon))
    body = (f"GPGGA,{t:%H%M%S}.{t.microsecond // 10000:02d},"
            f"{lat_s},{lat_h},{lon_s},{lon_h},1,{sol.n_sats:02d},"
            f"{sol.hdop:.1f},{h:.1f},M,0.0,M,,")
    return f"${body}*{_nmea_checksum(body)}"


def nmea_rmc(sol, week: int = 0, leap_s: float = 18.0) -> str:
    lat, lon, _ = geodesy.ecef_to_llh(sol.rx_ecef_m)
    t = gps_time_to_utc(week, sol.rx_time_corrected_s, leap_s)
    lat_s, lat_h, lon_s, lon_h = _nmea_latlon(np.degrees(lat),
                                              np.degrees(lon))
    v = np.asarray(sol.rx_vel_ecef_ms)
    speed_kt = float(np.linalg.norm(v[:2])) * 1.9438445
    body = (f"GPRMC,{t:%H%M%S}.{t.microsecond // 10000:02d},A,"
            f"{lat_s},{lat_h},{lon_s},{lon_h},{speed_kt:.2f},0.0,"
            f"{t:%d%m%y},,,A")
    return f"${body}*{_nmea_checksum(body)}"


def write_nmea(path, solutions, week: int = 0) -> None:
    with open(path, "w") as fh:
        for s in solutions:
            fh.write(nmea_gga(s, week) + "\r\n")
            fh.write(nmea_rmc(s, week) + "\r\n")


# ---------------------------------------------------------------------------
# KML / GPX / GeoJSON (kml_printer.cc, gpx_printer.cc, geojson_printer.cc)
# ---------------------------------------------------------------------------

def write_kml(path, solutions, name: str = "gnss_sim_receiver_tpu") -> None:
    coords = []
    for s in solutions:
        lat, lon, h = geodesy.ecef_to_llh(s.rx_ecef_m)
        coords.append(f"{np.degrees(lon):.9f},{np.degrees(lat):.9f},{h:.2f}")
    Path(path).write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<kml xmlns="http://www.opengis.net/kml/2.2">\n'
        f"<Document><name>{name}</name><Placemark><LineString>\n"
        "<coordinates>\n" + "\n".join(coords) + "\n</coordinates>\n"
        "</LineString></Placemark></Document></kml>\n")


def write_gpx(path, solutions, week: int = 0) -> None:
    pts = []
    for s in solutions:
        lat, lon, h = geodesy.ecef_to_llh(s.rx_ecef_m)
        t = gps_time_to_utc(week, s.rx_time_corrected_s)
        pts.append(f'<trkpt lat="{np.degrees(lat):.9f}" '
                   f'lon="{np.degrees(lon):.9f}"><ele>{h:.2f}</ele>'
                   f"<time>{t:%Y-%m-%dT%H:%M:%S}Z</time></trkpt>")
    Path(path).write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<gpx version="1.1" xmlns="http://www.topografix.com/GPX/1/1">\n'
        "<trk><trkseg>\n" + "\n".join(pts) + "\n</trkseg></trk></gpx>\n")


def write_geojson(path, solutions) -> None:
    import json
    coords = []
    for s in solutions:
        lat, lon, h = geodesy.ecef_to_llh(s.rx_ecef_m)
        coords.append([round(float(np.degrees(lon)), 9),
                       round(float(np.degrees(lat)), 9), round(h, 2)])
    Path(path).write_text(json.dumps({
        "type": "Feature",
        "geometry": {"type": "LineString", "coordinates": coords},
        "properties": {"name": "gnss_sim_receiver_tpu track"},
    }))


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash(lat_deg: float, lon_deg: float, precision: int = 12) -> str:
    """Geohash encoder (reference geohash.cc)."""
    lat_rng = [-90.0, 90.0]
    lon_rng = [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < precision * 5:
        rng, val = (lon_rng, lon_deg) if even else (lat_rng, lat_deg)
        mid = (rng[0] + rng[1]) / 2
        if val >= mid:
            bits.append(1)
            rng[0] = mid
        else:
            bits.append(0)
            rng[1] = mid
        even = not even
    out = []
    for i in range(precision):
        idx = 0
        for b in bits[5 * i:5 * i + 5]:
            idx = (idx << 1) | b
        out.append(_GEOHASH32[idx])
    return "".join(out)


# ---------------------------------------------------------------------------
# RINEX 3.02 (rinex_printer.cc — compact functional subset: GPS L1 obs +
# GPS nav)
# ---------------------------------------------------------------------------

def write_rinex_obs(path, epochs, prns, week: int, *,
                    marker: str = "TPU0") -> None:
    """RINEX 3.02 observation file: C1C (pseudorange), L1C (carrier phase,
    cycles), D1C (Doppler), S1C (C/N0) per epoch."""
    lam = constants.SPEED_OF_LIGHT_M_S / constants.GPS_L1_FREQ_HZ
    lines = []
    lines.append(f"{'3.02':>9}{'':11}{'OBSERVATION DATA':<20}"
                 f"{'G: GPS':<20}{'RINEX VERSION / TYPE'}")
    lines.append(f"{'gnss_sim_receiver_tpu':<20}{'':40}{'PGM / RUN BY / DATE'}")
    lines.append(f"{marker:<60}{'MARKER NAME'}")
    lines.append(f"{'G':<1}{'':2}{4:3d} C1C L1C D1C S1C{'':31}"
                 f"{'SYS / # / OBS TYPES'}")
    first = gps_time_to_utc(week, epochs[0].rx_time_s, 0.0)
    lines.append(f"{first.year:6d}{first.month:6d}{first.day:6d}"
                 f"{first.hour:6d}{first.minute:6d}{first.second:13.7f}"
                 f"{'GPS':>8}{'':9}{'TIME OF FIRST OBS'}")
    lines.append(f"{'':60}{'END OF HEADER'}")
    for ep in epochs:
        t = gps_time_to_utc(week, ep.rx_time_s, 0.0)
        n_valid = int(np.sum(ep.valid))
        lines.append(f"> {t.year:4d} {t.month:02d} {t.day:02d} {t.hour:02d} "
                     f"{t.minute:02d}{t.second + t.microsecond / 1e6:11.7f}"
                     f"  0{n_valid:3d}")
        for c in range(len(prns)):
            if not ep.valid[c]:
                continue
            phase_cyc = -ep.carrier_phase_cycles[c]  # RINEX sign convention
            lines.append(
                f"G{prns[c]:02d}{ep.pseudorange_m[c]:14.3f}  "
                f"{phase_cyc:14.3f}  {ep.carrier_doppler_hz[c]:14.3f}  "
                f"{ep.cn0_db_hz[c]:14.3f}  ")
    Path(path).write_text("\n".join(lines) + "\n")


def write_rinex_nav(path, ephemerides: dict, week: int) -> None:
    """RINEX 3.02 GPS navigation file from decoded ephemerides."""
    def f(x):
        s = f"{x: .12E}"
        return s.replace("E+", "E+").replace("E-", "E-").rjust(19)
    lines = []
    lines.append(f"{'3.02':>9}{'':11}{'N: GNSS NAV DATA':<20}"
                 f"{'G: GPS':<20}{'RINEX VERSION / TYPE'}")
    lines.append(f"{'':60}{'END OF HEADER'}")
    for prn in sorted(ephemerides):
        e = ephemerides[prn]
        toc = gps_time_to_utc(week, e.toc, 0.0)
        lines.append(f"G{prn:02d} {toc.year:4d} {toc.month:02d} "
                     f"{toc.day:02d} {toc.hour:02d} {toc.minute:02d} "
                     f"{toc.second:02d}{f(e.af0)}{f(e.af1)}{f(e.af2)}")
        lines.append(f"    {f(e.iode)}{f(e.crs)}{f(e.delta_n_sc * np.pi)}"
                     f"{f(e.m0_sc * np.pi)}")
        lines.append(f"    {f(e.cuc)}{f(e.ecc)}{f(e.cus)}{f(e.sqrt_a)}")
        lines.append(f"    {f(e.toe)}{f(e.cic)}{f(e.omega0_sc * np.pi)}"
                     f"{f(e.cis)}")
        lines.append(f"    {f(e.i0_sc * np.pi)}{f(e.crc)}"
                     f"{f(e.omega_sc * np.pi)}{f(e.omega_dot_sc * np.pi)}")
        lines.append(f"    {f(e.idot_sc * np.pi)}{f(0.0)}{f(float(week))}"
                     f"{f(0.0)}")
        lines.append(f"    {f(2.0)}{f(0.0)}{f(e.tgd)}{f(float(e.iodc))}")
        lines.append(f"    {f(0.0)}{f(4.0)}")
    Path(path).write_text("\n".join(lines) + "\n")
