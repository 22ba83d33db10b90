"""rinex2assist: convert a RINEX navigation file into the framework's
assistance file for warm starts (reference src/utils/rinex2assist/
main.cc role — theirs emits boost-serialization XML; ours emits the
assistance JSON consumed by Receiver(ephemerides=) /
nav.ephemeris.load_assistance)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("rinex_nav")
    ap.add_argument("-o", "--output", default=None,
                    help="assistance JSON path (default <input>.json)")
    args = ap.parse_args(argv)

    from gnss_sim_receiver_tpu.models.outputs import read_rinex_nav
    from gnss_sim_receiver_tpu.nav.ephemeris import save_assistance
    ephs = read_rinex_nav(args.rinex_nav)
    out = args.output or (args.rinex_nav + ".json")
    save_assistance(out, ephs)
    print(f"{len(ephs)} ephemerides -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
