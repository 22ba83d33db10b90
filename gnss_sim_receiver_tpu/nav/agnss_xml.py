"""Reference-compatible A-GNSS assistance XML (boost-serialization
format).

The reference saves/loads its assistance maps as boost XML archives
(control_thread.cc:500-560 read_assistance_from_XML;
gnss_sdr_supl_client.cc:377-398 `GNSS-SDR_ephemeris_map` nvp over
std::map<int, Gps_Ephemeris>; field names from the Gps_Ephemeris /
Gnss_Ephemeris serialize() methods, angles in RADIANS).  This module
reads and writes that exact layout so assistance files produced by the
reference tooling (or rinex2assist) warm-start this receiver, and files
written here load in the reference.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from gnss_sim_receiver_tpu.nav.ephemeris import GpsEphemeris

# (xml field name, GpsEphemeris attr, scale xml_value = attr * scale)
_PI = float(np.pi)
_FIELDS = [
    ("PRN", "prn", 1.0),
    ("M_0", "m0_sc", _PI),
    ("delta_n", "delta_n_sc", _PI),
    ("ecc", "ecc", 1.0),
    ("sqrtA", "sqrt_a", 1.0),
    ("OMEGA_0", "omega0_sc", _PI),
    ("i_0", "i0_sc", _PI),
    ("omega", "omega_sc", _PI),
    ("OMEGAdot", "omega_dot_sc", _PI),
    ("idot", "idot_sc", _PI),
    ("Cuc", "cuc", 1.0),
    ("Cus", "cus", 1.0),
    ("Crc", "crc", 1.0),
    ("Crs", "crs", 1.0),
    ("Cic", "cic", 1.0),
    ("Cis", "cis", 1.0),
    ("toe", "toe", 1.0),
    ("toc", "toc", 1.0),
    ("af0", "af0", 1.0),
    ("af1", "af1", 1.0),
    ("af2", "af2", 1.0),
    ("WN", "week", 1.0),
    ("TGD", "tgd", 1.0),
    ("IODC", "iodc", 1.0),
]
_INT_FIELDS = {"PRN", "WN", "IODC", "IODE_SF2", "IODE_SF3"}
# fields the reference serializes that we emit as zeros (not modeled)
_ZERO_FIELDS = ["tow", "satClkDrift", "dtr", "code_on_L2",
                "L2_P_data_flag", "SV_accuracy", "SV_health", "AODO",
                "fit_interval_flag", "spare1", "spare2",
                "integrity_status_flag", "alert_flag",
                "antispoofing_flag"]


def write_gps_ephemeris_xml(path, ephemerides: dict) -> None:
    """{prn: GpsEphemeris} -> reference-layout boost XML archive."""
    gps = {int(k): e for k, e in ephemerides.items()
           if isinstance(k, int) or getattr(e, "system", "GPS") == "GPS"}
    lines = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes" ?>',
        "<!DOCTYPE boost_serialization>",
        '<boost_serialization signature="serialization::archive" '
        'version="19">',
        '<GNSS-SDR_ephemeris_map class_id="0" tracking_level="0" '
        'version="0">',
        f"\t<count>{len(gps)}</count>",
        "\t<item_version>0</item_version>",
    ]
    first = True
    for prn in sorted(gps):
        e = gps[prn]
        if first:
            lines.append('\t<item class_id="1" tracking_level="0" '
                         'version="0">')
            first = False
        else:
            lines.append("\t<item>")
        lines.append(f"\t\t<first>{prn}</first>")
        lines.append('\t\t<second class_id="2" tracking_level="0" '
                     'version="0">')
        for name, attr, scale in _FIELDS:
            v = float(getattr(e, attr)) * scale
            if name in _INT_FIELDS:
                lines.append(f"\t\t\t<{name}>{int(round(v))}</{name}>")
            else:
                lines.append(f"\t\t\t<{name}>{v:.17g}</{name}>")
        lines.append("\t\t\t<IODE_SF2>%d</IODE_SF2>" % int(e.iode))
        lines.append("\t\t\t<IODE_SF3>%d</IODE_SF3>" % int(e.iode))
        for name in _ZERO_FIELDS:
            lines.append(f"\t\t\t<{name}>0</{name}>")
        lines.append("\t\t</second>")
        lines.append("\t</item>")
    lines.append("</GNSS-SDR_ephemeris_map>")
    lines.append("</boost_serialization>")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def read_gps_ephemeris_xml(path) -> dict:
    """Reference boost-XML ephemeris map -> {prn: GpsEphemeris}.

    Tolerant of the archive attributes boost adds (class_id etc.) and of
    extra fields we do not model."""
    root = ET.parse(path).getroot()
    emap = root.find("GNSS-SDR_ephemeris_map")
    if emap is None:
        raise ValueError("no GNSS-SDR_ephemeris_map element")
    out = {}
    by_name = {name: (attr, scale) for name, attr, scale in _FIELDS}
    for item in emap.findall("item"):
        second = item.find("second")
        if second is None:
            continue
        e = GpsEphemeris(system="GPS")
        for child in second:
            hit = by_name.get(child.tag)
            if hit is None:
                if child.tag == "IODE_SF2":
                    e.iode = int(float(child.text))
                continue
            attr, scale = hit
            v = float(child.text) / scale
            if child.tag in _INT_FIELDS:
                setattr(e, attr, int(round(v)))
            else:
                setattr(e, attr, v)
        out[e.prn] = e
    return out
