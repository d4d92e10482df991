#!/usr/bin/env python3
"""Extract ISO/IEC 14496-3 spec constant tables from the system
libavcodec static archive (FFmpeg, LGPL) by ELF symbol.

Why: the 960-sample-frame scalefactor-band offset tables and the SBR QMF
prototype / envelope codebooks are spec-mandated numeric constants with
no closed form; the reference (aac.js) never implemented these modes so
they cannot be derived from it.  The system libavcodec ships them in
aactab.o / aacsbr.o with symbol names intact, which makes the archive a
machine-checkable source for the spec data (these are interoperability
constants from the standard, not creative expression).

Validation strategy: the same extractor pulls the 1024/128 tables, which
this repo already generates/embeds independently (aacjax/tables.py, in
turn verified against the reference and FFmpeg decode output) — the
extractor is only trusted because that cross-check passes bit-for-bit
(tests/test_tables.py::test_extracted_tables_match).

Outputs:
  aacjax/host/aac_960_tables.npz   — 960/120 SWB offsets + band counts
  aacjax/host/sbr_tables.npz       — SBR QMF prototype + huffman books

Usage: python tools/extract_ffmpeg_tables.py [--archive PATH]
"""
from __future__ import annotations

import argparse
import pathlib
import subprocess
import tempfile

import numpy as np
from elftools.elf.elffile import ELFFile

REPO = pathlib.Path(__file__).resolve().parent.parent
DEFAULT_ARCHIVE = "/usr/lib/x86_64-linux-gnu/libavcodec.a"


class ObjectTables:
    """Symbol-level reader for one ELF object file."""

    def __init__(self, path: pathlib.Path):
        self.f = open(path, "rb")
        self.elf = ELFFile(self.f)
        self.syms = {}
        symtab = self.elf.get_section_by_name(".symtab")
        for sym in symtab.iter_symbols():
            if sym.name and sym["st_shndx"] != "SHN_UNDEF":
                self.syms[sym.name] = sym
        # relocations per target section index
        self.relas = {}
        for sec in self.elf.iter_sections():
            if sec.name.startswith(".rela"):
                self.relas[sec["sh_info"]] = sec

    def raw(self, name: str) -> bytes:
        sym = self.syms[name]
        sec = self.elf.get_section(sym["st_shndx"])
        off = sym["st_value"]
        return sec.data()[off: off + sym["st_size"]]

    def array(self, name: str, dtype) -> np.ndarray:
        return np.frombuffer(self.raw(name), dtype=dtype).copy()

    def pointer_targets(self, name: str) -> list[str]:
        """Resolve a `const T *const arr[]` symbol to the names of the
        symbols each pointer entry references (via relocations)."""
        sym = self.syms[name]
        shndx = sym["st_shndx"]
        rela = self.relas[shndx]
        symtab = self.elf.get_section(rela["sh_link"])
        lo = sym["st_value"]
        hi = lo + sym["st_size"]
        out: dict[int, str] = {}
        for r in rela.iter_relocations():
            if lo <= r["r_offset"] < hi:
                target = symtab.get_symbol(r["r_info_sym"])
                tname = target.name
                if not tname:  # section symbol: find by section+addend
                    tsec = target["st_shndx"]
                    addend = r["r_addend"]
                    for cand in self.syms.values():
                        if (cand["st_shndx"] == tsec
                                and cand["st_value"] == addend
                                and cand["st_size"] > 0):
                            tname = cand.name
                            break
                out[r["r_offset"] - lo] = tname
        n = sym["st_size"] // 8
        return [out.get(i * 8) for i in range(n)]


def extract_member(archive: str, member: str) -> pathlib.Path:
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="fftab_"))
    subprocess.run(["ar", "x", archive, member], cwd=tmp, check=True)
    return tmp / member


def swb_tables(archive: str) -> dict:
    o = ObjectTables(extract_member(archive, "aactab.o"))
    out = {}
    for base, short in (("960", False), ("120", True),
                        ("1024", False), ("128", True),
                        ("512", False), ("480", False)):
        names = o.pointer_targets(f"ff_swb_offset_{base}")
        assert len(names) == 13, (base, names)
        counts = o.array(f"ff_aac_num_swb_{base}", np.uint8)
        # materialize per-sample-rate-index offset tables (count+1 entries,
        # exactly like aacjax.tables.SWB_OFFSET_*: offsets + terminator)
        frame = {"960": 960, "120": 120, "1024": 1024, "128": 128,
                 "512": 512, "480": 480}[base]
        per_index = []
        for i, nm in enumerate(names):
            if nm is None:      # mode undefined at this sampling rate
                assert int(counts[i]) == 0, (base, i, counts[i])
                per_index.append(np.zeros(1, np.int32))
                continue
            tbl = o.array(nm, np.uint16).astype(np.int32)
            n = int(counts[i])
            assert len(tbl) >= n + 1 and int(tbl[n]) == frame, (nm, tbl, n)
            per_index.append(tbl[: n + 1])
        width = max(len(t) for t in per_index)
        packed = np.zeros((13, width), np.int32)
        for i, t in enumerate(per_index):
            packed[i, : len(t)] = t
            packed[i, len(t):] = t[-1]
        out[f"swb_offset_{base}"] = packed
        out[f"num_swb_{base}"] = counts.astype(np.int32)
    # Main-profile backward prediction: highest predicted sfb per
    # sampling index (ISO/IEC 14496-3 Table 4.128)
    out["pred_sfb_max"] = o.array("ff_aac_pred_sfb_max",
                                  np.uint8).astype(np.int32)
    # AAC-LD TNS band limits per sampling index
    out["tns_max_bands_512"] = o.array("ff_tns_max_bands_512",
                                       np.uint8).astype(np.int32)
    out["tns_max_bands_480"] = o.array("ff_tns_max_bands_480",
                                       np.uint8).astype(np.int32)
    # AAC-ELD low-delay synthesis windows (ISO/IEC 14496-3 Table 4.A.15-16
    # class constants, 4N - N/4 taps); verified against libavcodec's ELD
    # decode by impulse response identification (tests/test_eld.py)
    out["eld_window_512"] = o.array("ff_aac_eld_window_512", np.float32)
    out["eld_window_480"] = o.array("ff_aac_eld_window_480", np.float32)
    assert out["eld_window_512"].shape == (1920,)
    assert out["eld_window_480"].shape == (1800,)
    return out


def sbr_tables(archive: str) -> dict:
    o = ObjectTables(extract_member(archive, "aacsbr.o"))
    out = {"qmf_window_us": o.array("sbr_qmf_window_us", np.float32)}
    assert out["qmf_window_us"].shape == (640,)
    noise = o.array("ff_sbr_noise_table", np.float32).reshape(-1, 2)
    out["noise_table"] = noise[:512]  # (re, im) pairs, spec Table 4.A.88
    out["sbr_offset"] = o.array("sbr_offset", np.int8).reshape(6, 16)
    # local symbols carry a .N suffix that varies by compiler version
    for name in o.syms:
        if name.startswith("bands_warped"):
            out["bands_warped"] = o.array(name, np.float32)
        elif name.startswith("limgain"):
            out["limgain"] = o.array(name, np.float32)
    assert "bands_warped" in out and "limgain" in out
    widths = {1: np.uint8, 2: np.uint16, 4: np.uint32}
    for pre in ("t", "f"):
        for book in ("huffman_env_1_5dB", "huffman_env_bal_1_5dB",
                     "huffman_env_3_0dB", "huffman_env_bal_3_0dB",
                     "huffman_noise_3_0dB", "huffman_noise_bal_3_0dB"):
            bits_name = f"{pre}_{book}_bits"
            if bits_name not in o.syms:
                continue  # f_huffman_noise_* do not exist (spec reuses t_)
            bits = o.array(bits_name, np.uint8)
            n = len(bits)
            codes_raw = o.raw(f"{pre}_{book}_codes")
            dtype = widths[len(codes_raw) // n]
            codes = np.frombuffer(codes_raw, dtype=dtype).copy()
            assert len(codes) == n
            out[f"{pre}_{book}_bits"] = bits
            out[f"{pre}_{book}_codes"] = codes.astype(np.uint32)
    return out


def ps_tables(archive: str) -> dict:
    """Parametric Stereo (HE-AAC v2) spec constants from aacps_common.o /
    aacps_float.o: huffman books, QMF->parameter-band maps, hybrid filter
    prototypes, and the IID/ICC dequantization tables."""
    oc = ObjectTables(extract_member(archive, "aacps_common.o"))
    of = ObjectTables(extract_member(archive, "aacps_float.o"))
    out = {}
    for book in ("iid_df0", "iid_dt0", "iid_df1", "iid_dt1",
                 "icc_df", "icc_dt", "ipd_df", "ipd_dt",
                 "opd_df", "opd_dt"):
        bits = oc.array(f"huff_{book}_bits", np.uint8)
        codes_raw = oc.raw(f"huff_{book}_codes")
        width = {1: np.uint8, 2: np.uint16, 4: np.uint32}[
            len(codes_raw) // len(bits)]
        out[f"huff_{book}_bits"] = bits
        out[f"huff_{book}_codes"] = np.frombuffer(
            codes_raw, width).astype(np.uint32)
    out["k_to_i_20"] = oc.array("ff_k_to_i_20", np.int8)
    out["k_to_i_34"] = oc.array("ff_k_to_i_34", np.int8)
    for name, target in (("g0_Q12", "g0_q12"), ("g0_Q8", "g0_q8"),
                         ("g1_Q8", "g1_q8"), ("g2_Q4", "g2_q4")):
        out[target] = of.array(name, np.float32)
    # local symbols carry compiler suffixes
    for name in of.syms:
        if name.startswith("f_center_20"):
            out["f_center_20"] = of.array(name, np.int8)
        elif name.startswith("f_center_34"):
            out["f_center_34"] = of.array(name, np.int8)
        elif name.startswith("fractional_delay_links"):
            out["frac_delay_links"] = of.array(name, np.float32)
        elif name.startswith("iid_par_dequant"):
            out["iid_par_dequant"] = of.array(name, np.float32)
        elif name.startswith("icc_invq"):
            out["icc_invq"] = of.array(name, np.float32)
        elif name.startswith("acos_icc_invq"):
            out["acos_icc_invq"] = of.array(name, np.float32)
        elif name.startswith("ipdopd_cos"):
            out["ipdopd_cos"] = of.array(name, np.float32)
        elif name.startswith("ipdopd_sin"):
            out["ipdopd_sin"] = of.array(name, np.float32)
    for key in ("f_center_20", "f_center_34", "iid_par_dequant",
                "icc_invq", "acos_icc_invq"):
        assert key in out, key
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--archive", default=DEFAULT_ARCHIVE)
    args = ap.parse_args()

    swb = swb_tables(args.archive)
    np.savez(REPO / "aacjax" / "host" / "aac_960_tables.npz", **swb)
    print("aac_960_tables.npz:", {k: v.shape for k, v in swb.items()})

    sbr = sbr_tables(args.archive)
    np.savez(REPO / "aacjax" / "host" / "sbr_tables.npz", **sbr)
    print("sbr_tables.npz:", sorted(sbr))

    ps = ps_tables(args.archive)
    np.savez(REPO / "aacjax" / "host" / "ps_tables.npz", **ps)
    print("ps_tables.npz:", sorted(ps))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
