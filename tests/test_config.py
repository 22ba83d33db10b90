import textwrap

from gnss_sim_receiver_tpu.utils.config import (FileConfiguration,
                                                InMemoryConfiguration)


def test_in_memory_configuration_typed_access():
    c = InMemoryConfiguration()
    c.set_property("GNSS-SDR.internal_fs_sps", "2000000")
    c.set_property("Acquisition_1C.doppler_max", "5000")
    c.set_property("Acquisition_1C.pfa", "0.01")
    c.set_property("Tracking_1C.track_pilot", "true")
    c.set_property("Channel.signal", "1C")
    assert c.property("GNSS-SDR.internal_fs_sps", 0) == 2_000_000
    assert c.property("Acquisition_1C.doppler_max", 0) == 5000
    assert c.property("Acquisition_1C.pfa", 0.0) == 0.01
    assert c.property("Tracking_1C.track_pilot", False) is True
    assert c.property("Channel.signal", "1B") == "1C"
    assert c.property("missing.key", 42) == 42


def test_file_configuration_parses_reference_style(tmp_path):
    conf = tmp_path / "rx.conf"
    conf.write_text(textwrap.dedent("""\
        ; GNSS-SDR configuration
        [GNSS-SDR]
        GNSS-SDR.internal_fs_sps=2000000
        SignalSource.implementation=File_Signal_Source  ; trailing comment
        SignalSource.item_type=ishort
        Channels_1C.count=8
        PVT.threshold_reject_GDOP=1500 ; for Cislunar
        """))
    c = FileConfiguration(conf)
    assert c.property("GNSS-SDR.internal_fs_sps", 0) == 2_000_000
    assert c.property("SignalSource.implementation", "") == "File_Signal_Source"
    assert c.property("Channels_1C.count", 0) == 8
    assert c.property("PVT.threshold_reject_GDOP", 0) == 1500
