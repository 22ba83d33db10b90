"""Reference-compatible A-GNSS XML assistance
(control_thread.cc:500-560 / gnss_sdr_supl_client.cc boost archives)."""

import numpy as np

from gnss_sim_receiver_tpu.nav import agnss_xml
from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation

# a literal snippet in the reference's boost-XML layout (field names /
# nesting exactly as gnss_sdr_supl_client.cc writes them) — proves the
# READER accepts reference-produced files, not just its own output
_REFERENCE_STYLE = """<?xml version="1.0" encoding="UTF-8" standalone="yes" ?>
<!DOCTYPE boost_serialization>
<boost_serialization signature="serialization::archive" version="19">
<GNSS-SDR_ephemeris_map class_id="0" tracking_level="0" version="0">
\t<count>1</count>
\t<item_version>0</item_version>
\t<item class_id="1" tracking_level="0" version="0">
\t\t<first>7</first>
\t\t<second class_id="2" tracking_level="0" version="0">
\t\t\t<PRN>7</PRN>
\t\t\t<M_0>1.2423423000000001e+00</M_0>
\t\t\t<delta_n>4.8081428849917e-09</delta_n>
\t\t\t<ecc>1.1316679790616e-02</ecc>
\t\t\t<sqrtA>5.1536968887329e+03</sqrtA>
\t\t\t<OMEGA_0>-2.241041433718e-01</OMEGA_0>
\t\t\t<i_0>9.7180864669693e-01</i_0>
\t\t\t<omega>6.2814208294976e-01</omega>
\t\t\t<OMEGAdot>-8.1746262309599e-09</OMEGAdot>
\t\t\t<idot>-4.8930324312905e-10</idot>
\t\t\t<Cuc>2.0042061805725e-06</Cuc>
\t\t\t<Cus>1.0913237929344e-05</Cus>
\t\t\t<Crc>177.28125</Crc>
\t\t\t<Crs>37.125</Crs>
\t\t\t<Cic>-1.0803341865540e-07</Cic>
\t\t\t<Cis>1.0617077350616e-07</Cis>
\t\t\t<toe>352800</toe>
\t\t\t<toc>352800</toc>
\t\t\t<af0>-1.3502333313227e-04</af0>
\t\t\t<af1>-6.0254023992270e-12</af1>
\t\t\t<af2>0</af2>
\t\t\t<WN>2148</WN>
\t\t\t<tow>345600</tow>
\t\t\t<satClkDrift>0</satClkDrift>
\t\t\t<dtr>0</dtr>
\t\t\t<IODE_SF2>83</IODE_SF2>
\t\t\t<IODE_SF3>83</IODE_SF3>
\t\t\t<code_on_L2>1</code_on_L2>
\t\t\t<L2_P_data_flag>0</L2_P_data_flag>
\t\t\t<SV_accuracy>0</SV_accuracy>
\t\t\t<SV_health>0</SV_health>
\t\t\t<TGD>-1.1175870895386e-08</TGD>
\t\t\t<IODC>83</IODC>
\t\t\t<AODO>0</AODO>
\t\t\t<fit_interval_flag>0</fit_interval_flag>
\t\t\t<spare1>0</spare1>
\t\t\t<spare2>0</spare2>
\t\t\t<integrity_status_flag>0</integrity_status_flag>
\t\t\t<alert_flag>0</alert_flag>
\t\t\t<antispoofing_flag>0</antispoofing_flag>
\t\t</second>
\t</item>
</GNSS-SDR_ephemeris_map>
</boost_serialization>
"""


def test_reads_reference_style_file(tmp_path):
    p = tmp_path / "gps_ephemeris.xml"
    p.write_text(_REFERENCE_STYLE)
    ephs = agnss_xml.read_gps_ephemeris_xml(p)
    assert set(ephs) == {7}
    e = ephs[7]
    assert e.week == 2148 and e.iodc == 83 and e.iode == 83
    assert abs(e.sqrt_a - 5153.6968887329) < 1e-6
    # radians -> semicircles conversion
    assert abs(e.m0_sc - 1.2423423 / np.pi) < 1e-12
    assert abs(e.tgd + 1.1175870895386e-08) < 1e-20
    # the orbit propagates sanely
    pos, clk = e.sat_pos_clock(np.array([352800.0]))
    r = np.linalg.norm(pos[0])
    assert 2.5e7 < r < 2.8e7


def test_roundtrip_and_warm_start(tmp_path):
    ephs = {}
    for e in make_sky_constellation(40.0, -75.0, toe=346560.0)[:5]:
        e.week, e.toc = 2200, e.toe
        e.iode, e.iodc = 44, 44
        ephs[e.prn] = e
    p = tmp_path / "eph.xml"
    agnss_xml.write_gps_ephemeris_xml(p, ephs)
    back = agnss_xml.read_gps_ephemeris_xml(p)
    assert set(back) == set(ephs)
    for prn, e in ephs.items():
        p0, c0 = e.sat_pos_clock(np.array([346860.0]))
        p1, c1 = back[prn].sat_pos_clock(np.array([346860.0]))
        assert np.abs(p0 - p1).max() < 1e-3
        assert abs(c0[0] - c1[0]) < 1e-12


def test_network_assistance_client(tmp_path):
    """nav.supl_client: the SUPL-role network assistance flow — serve an
    ephemeris set, fetch it over TCP, warm-start-ready dict comes back
    (control_thread.cc assist_GNSS / gnss_sdr_supl_client role; framed
    XML transport, not wire ASN.1 — see module docstring)."""
    from gnss_sim_receiver_tpu.nav import supl_client

    ephs = {}
    for e in make_sky_constellation(40.0, -75.0, toe=346560.0)[:4]:
        e.week, e.toc = 2200, e.toe
        ephs[e.prn] = e
    port, srv = supl_client.serve_assistance(ephs)
    try:
        got = supl_client.fetch_assistance("127.0.0.1", port)
    finally:
        srv.close()
    assert set(got) == set(ephs)
    p0, _ = ephs[list(ephs)[0]].sat_pos_clock(np.array([346900.0]))
    p1, _ = got[list(ephs)[0]].sat_pos_clock(np.array([346900.0]))
    assert np.abs(p0 - p1).max() < 1e-3
