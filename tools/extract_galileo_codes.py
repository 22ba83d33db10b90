"""Extract the Galileo ICD spreading-code tables from the reference headers
into a compact binary asset (gnss_sim_receiver_tpu/data/galileo_codes.npz).

The tables are public ICD constants (Galileo OS SIS ICD Annex C): E1-B/E1-C
4092-chip memory codes (reference: src/core/system_parameters/Galileo_E1.h),
E5a-I/Q and E5b-I/Q 10230-chip primary codes (Galileo_E5a.h, Galileo_E5b.h)
and the CS20/CS25/CS100 secondary codes.  Bits are stored packed
(np.packbits); chip values follow the reference convention bit 0 -> +1,
bit 1 -> -1 (gnss_signal_replica.cc hex_to_binary_converter).

E5 primary codes are 10230 chips = 2557 full hex chars + the top 2 bits of
the last char (galileo_e5_signal_replica.cc:53-72).

Run once (requires /root/reference):
    python tools/extract_galileo_codes.py
"""

import re
import sys

import numpy as np

REF = "/root/reference/src/core/system_parameters"


def parse_table(path, name, n_entries, entry_len):
    text = open(path).read()
    m = re.search(re.escape(name) + r"\[[^\]]*\]\[\d+\] = \{", text)
    if not m:
        raise KeyError(f"{name} not in {path}")
    block = text[m.end():]
    end = block.index("};")
    # one entry per comma-separated element; C adjacent-string-literal
    # concatenation splits each code over many lines
    strings = []
    for seg in block[:end].split(","):
        frags = re.findall(r'"([0-9A-Fa-f]*)"', seg)
        if frags:
            strings.append("".join(frags))
    assert len(strings) == n_entries, (name, len(strings))
    assert all(len(s) == entry_len for s in strings), name
    return strings


def hex_to_bits(s, n_chips):
    """MSB-first bits of a hex string, truncated to n_chips."""
    vals = np.array([int(c, 16) for c in s], np.uint8)
    bits = np.unpackbits(vals[:, None], axis=1, count=None)[:, 4:]
    return bits.reshape(-1)[:n_chips]


def bin_to_bits(s):
    return np.array([int(c) for c in s], np.uint8)


def main():
    out = {}
    for key, hdr, name, n_chips, slen in [
        ("e1b", "Galileo_E1.h", "GALILEO_E1_B_PRIMARY_CODE", 4092, 1023),
        ("e1c", "Galileo_E1.h", "GALILEO_E1_C_PRIMARY_CODE", 4092, 1023),
        ("e5ai", "Galileo_E5a.h", "GALILEO_E5A_I_PRIMARY_CODE", 10230, 2558),
        ("e5aq", "Galileo_E5a.h", "GALILEO_E5A_Q_PRIMARY_CODE", 10230, 2558),
        ("e5bi", "Galileo_E5b.h", "GALILEO_E5B_I_PRIMARY_CODE", 10230, 2558),
        ("e5bq", "Galileo_E5b.h", "GALILEO_E5B_Q_PRIMARY_CODE", 10230, 2558),
        # E6-B/C Codes Technical Note Issue 1 (Jan 2019): 5115-chip memory
        # codes = 1278 full hex chars + top 3 bits of the last
        ("e6b", "Galileo_E6.h", "GALILEO_E6_B_PRIMARY_CODE", 5115, 1279),
        ("e6c", "Galileo_E6.h", "GALILEO_E6_C_PRIMARY_CODE", 5115, 1279),
    ]:
        strings = parse_table(f"{REF}/{hdr}", name, 50, slen)
        bits = np.stack([hex_to_bits(s, n_chips) for s in strings])
        out[key] = np.packbits(bits, axis=1)
        out[key + "_len"] = np.array(n_chips)

    # per-PRN 100-chip secondary codes (binary strings)
    for key, hdr, name in [
        ("e5aq_sec", "Galileo_E5a.h", "GALILEO_E5A_Q_SECONDARY_CODE"),
        ("e5bq_sec", "Galileo_E5b.h", "GALILEO_E5B_Q_SECONDARY_CODE"),
    ]:
        text = open(f"{REF}/{hdr}").read()
        m = re.search(re.escape(name) + r"\[[^\]]*\]\[\d+\] = \{", text)
        block = text[m.end():]
        strings = re.findall(r'"([01]+)"', block[:block.index("};")])
        # the reference ships 47 (E5a-Q) / 49 (E5b-Q) rows, not 50
        assert len(strings) >= 47 and all(len(s) == 100 for s in strings)
        bits = np.stack([bin_to_bits(s) for s in strings])
        out[key] = np.packbits(bits, axis=1)
        out[key + "_len"] = np.array(100)

    # E6-C per-PRN 100-chip secondary (25 hex chars per PRN)
    strings = parse_table(f"{REF}/Galileo_E6.h", "GALILEO_E6_C_SECONDARY_CODE",
                          50, 25)
    bits = np.stack([hex_to_bits(s, 100) for s in strings])
    out["e6c_sec"] = np.packbits(bits, axis=1)
    out["e6c_sec_len"] = np.array(100)

    # constellation-wide secondaries
    for key, hdr, name, n in [
        ("e1c_sec", "Galileo_E1.h", "GALILEO_E1_C_SECONDARY_CODE", 25),
        ("e5ai_sec", "Galileo_E5a.h", "GALILEO_E5A_I_SECONDARY_CODE", 20),
        ("e5bi_sec", "Galileo_E5b.h", "GALILEO_E5B_I_SECONDARY_CODE", 4),
    ]:
        text = open(f"{REF}/{hdr}").read()
        m = re.search(re.escape(name) + r'\[\d*\] = "([01]+)"', text)
        s = m.group(1)
        assert len(s) == n, (name, len(s))
        out[key] = bin_to_bits(s)

    path = "gnss_sim_receiver_tpu/data/galileo_codes.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path}")
    import hashlib
    for k in ("e1b", "e1c", "e5ai", "e5aq", "e5bi", "e5bq"):
        print(k, hashlib.sha256(out[k].tobytes()).hexdigest()[:16])


if __name__ == "__main__":
    sys.exit(main())
