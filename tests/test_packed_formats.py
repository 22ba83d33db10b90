"""Packed capture formats (SURVEY §2.3): NSR 2-bit real, SPIR 1-bit
int32, 2-bit complex nibbles, and the LabSat 2/3 container
(reference signal_source/gnuradio_blocks/unpack_*_samples.cc +
labsat23_source.cc), plus CLI wiring of the source implementations."""

import numpy as np

from gnss_sim_receiver_tpu.utils import sample_io as sio


def test_unpack_2bit_real_reference_semantics():
    """unpack_byte_2bit_samples.cc:40-66: LSB pair first, raw signed
    2-bit value per sample."""
    # byte 0b_11_10_01_00 -> samples [00, 01, 10, 11] = [0, 1, -2, -1]
    raw = np.array([0b11100100], np.uint8).astype(np.int8)
    out = sio.unpack_2bit_real(raw)
    assert out.tolist() == [0.0, 1.0, -2.0, -1.0]


def test_unpack_2bit_cpx_reference_semantics():
    """unpack_byte_2bit_cpx_samples.cc I/Q-swap order, value 2x+1."""
    # byte: Q0=0b11(x=-1,v=-1) I0=0b01(x=1,v=3) Q1=0b00(v=1) I1=0b10(x=-2,v=-3)
    raw = np.array([0b11010010], np.uint8).astype(np.int8)
    out = sio.unpack_2bit_cpx(raw)
    assert out[0] == complex(3.0, -1.0)
    assert out[1] == complex(-3.0, 1.0)


def test_spir_reader(tmp_path):
    """unpack_intspir_1bit_samples.cc: channel-1 I at bit 0, Q at bit 1,
    levels +-32767."""
    words = np.array([0b00, 0b01, 0b10, 0b11], "<i4")
    p = tmp_path / "cap.spir"
    words.tofile(p)
    x = sio.read_samples_spir(p)
    lv = 32767.0
    assert x.tolist() == [complex(-lv, -lv), complex(lv, -lv),
                          complex(-lv, lv), complex(lv, lv)]


def test_labsat23_roundtrip_2bit(tmp_path):
    rng = np.random.default_rng(3)
    x = (np.sign(rng.standard_normal(160))
         + 1j * np.sign(rng.standard_normal(160))).astype(np.complex64)
    p = tmp_path / "cap.ls3"
    sio.write_labsat23(p, x, bits=2)
    info = sio.read_labsat23_header(p)
    assert info["version"] == 3 and info["bits_per_sample"] == 2
    back = sio.read_samples_labsat23(p)
    assert np.array_equal(back, x)


def test_labsat23_roundtrip_4bit(tmp_path):
    rng = np.random.default_rng(4)
    vals = np.array([1.0, 2.0, -2.0, -1.0])
    x = (rng.choice(vals, 80) + 1j * rng.choice(vals, 80)).astype(
        np.complex64)
    p = tmp_path / "cap4.ls3"
    sio.write_labsat23(p, x, bits=4)
    assert sio.read_labsat23_header(p)["bits_per_sample"] == 4
    back = sio.read_samples_labsat23(p)
    assert np.array_equal(back, x)


def test_nsr_cli_source(tmp_path):
    """An NSR capture drives the CLI end-to-end far enough to list
    acquired channels (source wiring, not a position test)."""
    import textwrap

    from gnss_sim_receiver_tpu.__main__ import main
    from tests.fixtures import static_scenario_capture

    x, _ = static_scenario_capture()
    x = x[: int(2e6 * 3)]
    # quantize REAL component to 2-bit {-2,-1,0,1} around sigma
    sig = np.std(x.real)
    q = np.clip(np.rint(x.real / sig), -2, 1).astype(np.int8)
    packed = ((q[0::4] & 3) | ((q[1::4] & 3) << 2) | ((q[2::4] & 3) << 4)
              | ((q[3::4] & 3) << 6)).astype(np.uint8)
    cap = tmp_path / "cap.nsr"
    packed.tofile(cap)
    conf = tmp_path / "rx.conf"
    conf.write_text(textwrap.dedent(f"""\
        GNSS-SDR.internal_fs_sps=2000000
        SignalSource.implementation=Nsr_File_Signal_Source
        SignalSource.filename={cap}
        SignalSource.item_type=byte
        SignalSource.sampling_frequency=2000000
        Channels_1C.count=4
        Channel.signal=1C
        Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
        Acquisition_1C.doppler_max=5000
        Acquisition_1C.doppler_step=250
        Tracking_1C.implementation=GPS_L1_CA_DLL_PLL_Tracking
        TelemetryDecoder_1C.implementation=GPS_L1_CA_Telemetry_Decoder
        Observables.implementation=Hybrid_Observables
        PVT.implementation=RTKLIB_PVT
        """))
    rc = main([f"--config_file={conf}"])
    assert rc in (0, 1)   # no ephemeris in 3 s -> rc 1 is fine


def test_rinex2_nav_roundtrip(tmp_path):
    """RINEX 2.11 nav write/read round-trip: orbits propagate to the
    same positions (rinex_printer.cc version-2 nav overload)."""
    from gnss_sim_receiver_tpu.models import outputs as out
    from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation

    week = 2200
    ephs = {}
    for e in make_sky_constellation(40.0, -75.0, toe=346560.0)[:5]:
        e.week, e.toc = week, e.toe
        e.iode, e.iodc = 91, 91
        ephs[e.prn] = e
    p = tmp_path / "nav.11n"
    out.write_rinex2_nav(p, ephs, week)
    txt = p.read_text()
    assert "2.11" in txt.splitlines()[0] and "D" in txt.splitlines()[2]
    back = out.read_rinex2_nav(p)
    assert set(back) == set(ephs)
    for prn, e in ephs.items():
        p0, c0 = e.sat_pos_clock(np.array([346860.0]))
        p1, c1 = back[prn].sat_pos_clock(np.array([346860.0]))
        assert np.abs(p0 - p1).max() < 1e-2, prn
        assert abs(c0[0] - c1[0]) < 1e-12
        assert back[prn].week == week and back[prn].iode == 91


def test_rinex2_obs_format(tmp_path):
    """RINEX 2.11 obs: header types line, epoch satellite list inline,
    4 observables per satellite row."""
    from types import SimpleNamespace

    from gnss_sim_receiver_tpu.models import outputs as out

    eps = []
    for k in range(3):
        eps.append(SimpleNamespace(
            rx_time_s=345600.0 + 0.5 * k,
            valid=np.array([True, True, False]),
            pseudorange_m=np.array([2.1e7, 2.3e7, 0.0]),
            carrier_phase_cycles=np.array([-1.2e5, 3.4e5, 0.0]),
            carrier_doppler_hz=np.array([1500.0, -2300.0, 0.0]),
            cn0_db_hz=np.array([45.0, 44.0, 0.0])))
    p = tmp_path / "obs.11o"
    out.write_rinex2_obs(p, eps, [7, 12, 21], 2200)
    txt = p.read_text().splitlines()
    assert txt[0].lstrip().startswith("2.11")
    types = [ln for ln in txt if "TYPES OF OBSERV" in ln][0]
    assert "C1" in types and "L1" in types and "D1" in types
    # first epoch line carries both sat ids inline
    ep_line = [ln for ln in txt if "G07G12" in ln]
    assert ep_line, txt
    # 2 obs rows after each epoch line
    i = txt.index(ep_line[0])
    assert "21000000.000" in txt[i + 1]
    assert "120000.000" in txt[i + 1]      # phase sign negated
