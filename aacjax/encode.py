"""Production AAC-LC encoder: psychoacoustic model + rate control.

The reference is decode-only; this closes the loop so aacjax can both
produce and consume AAC.  Built on the syntax writers shared with the
test encoder (aacjax.testing.encoder), adding what makes an encoder
*real* rather than a fixture generator:

  - window-sequence switching: PCM-domain transient detection drives the
    LONG_START -> EIGHT_SHORT -> LONG_STOP state machine, with grouping
    derived from the attack position (pre-echo control),
  - a psychoacoustic model (simplified 3GPP TS 26.403 shape): per-SFB
    energies spread across bands with up/down masking slopes, an
    absolute-threshold-of-hearing floor, and a signal-to-mask offset,
    yielding a per-band allowed-distortion threshold,
  - distortion-controlled quantization: per-band scalefactors found by
    vectorized bisection so measured quantization noise sits at the
    threshold,
  - rate control: exact Huffman bit costing (vectorized over the frame
    from the codebook length tables) with a global scalefactor offset
    bisected to meet the per-frame bit budget, smoothed by a bit
    reservoir,
  - per-band M/S stereo decision on common-window frames (the decoder's
    stereo_ms butterfly is l+r / l-r, so M=(L+R)/2, S=(L-R)/2 is sent),
  - per-band codebook selection by exact cost between the two books of
    each magnitude class.

All per-frame analysis (MDCT, band energies, quantization trials, bit
costs) is batched numpy over [frames, channels, bins]; only the final
bitstream write is serial.  The decode pipeline is the correctness
oracle (tests/test_encode.py: roundtrip SNR, libavcodec cross-check,
bitrate accuracy).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from aacjax import tables
from aacjax.host import huffman
from aacjax.host.asc import StreamConfig, make_asc, parse_asc
from aacjax.host.bitio import BitWriter
from aacjax.testing.encoder import (ChannelSpec, CPESpec, adts_frame,
                                    analysis_matrix, end_frame,
                                    quantize_band, write_cpe, write_sce)

ONLY_LONG, LONG_START, EIGHT_SHORT, LONG_STOP = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# Vectorized Huffman bit costing (exact codeword lengths from the books)
# ---------------------------------------------------------------------------
def _build_cost_luts():
    """Dense length LUTs per spectral book, indexed by the mixed-radix
    symbol tuple; plus the scalefactor-delta length table."""
    luts = {}
    for b in range(1, 12):
        tbl = huffman.SPECTRAL_BOOKS[b - 1]
        n = 4 if b in huffman.QUAD_BOOKS else 2
        unsigned = huffman.UNSIGNED[b - 1]
        vals = tbl.values[:, :n].astype(np.int64)
        lav = int(np.max(np.abs(vals)))
        radix = lav + 1 if unsigned else 2 * lav + 1
        offs = 0 if unsigned else lav
        arr = np.zeros(radix ** n, np.uint8)
        idx = np.zeros(len(vals), np.int64)
        for j in range(n):
            idx = idx * radix + (vals[:, j] + offs)
        arr[idx] = tbl.lens
        luts[b] = (arr, radix, offs, n, unsigned, lav)
    sf_len = np.zeros(121, np.uint8)
    for i in range(len(huffman.SF_BOOK.values)):
        sf_len[int(huffman.SF_BOOK.values[i, 0])] = huffman.SF_BOOK.lens[i]
    return luts, sf_len


_COST_LUTS, _SF_LEN = _build_cost_luts()


def spectral_bits(q: np.ndarray, book: int) -> int:
    """Exact bit count to Huffman-code quantized values `q` (len % n == 0)
    with `book`, including sign bits and book-11 escape sequences."""
    arr, radix, offs, n, unsigned, lav = _COST_LUTS[book]
    v = q.astype(np.int64).reshape(-1, n)
    if book == huffman.ESC_BOOK:
        a = np.abs(v)
        sym = np.minimum(a, huffman.ESC_FLAG)
        idx = (sym[:, 0] + offs) * radix + (sym[:, 1] + offs)
        bits = int(arr[idx].sum()) + int(np.count_nonzero(sym))
        esc = a[a >= huffman.ESC_FLAG]
        if esc.size:
            nbits = np.maximum(
                np.floor(np.log2(esc)).astype(np.int64), 4)
            bits += int(np.sum(2 * nbits - 3))
        return bits
    if unsigned:
        sym = np.abs(v)
        sign_bits = int(np.count_nonzero(sym))
    else:
        sym = v
        sign_bits = 0
    idx = np.zeros(len(sym), np.int64)
    for j in range(n):
        idx = idx * radix + (sym[:, j] + offs)
    return int(arr[idx].sum()) + sign_bits


# magnitude-class candidate books: (threshold LAV, [books to cost])
_BOOK_CLASSES = [(1, (1, 2)), (2, (3, 4)), (4, (5, 6)), (7, (7, 8)),
                 (12, (9, 10)), (8191, (11,))]


def choose_book(q: np.ndarray) -> tuple[int, int]:
    """Cheapest legal codebook for a band: (book, bits).  q all-zero
    bands use book 0 at 0 bits."""
    m = int(np.max(np.abs(q))) if q.size else 0
    if m == 0:
        return 0, 0
    for lav, books in _BOOK_CLASSES:
        if m <= lav:
            costs = [(spectral_bits(q, b), b) for b in books]
            bits, book = min(costs)
            return book, bits
    raise ValueError(f"quantized magnitude {m} exceeds the escape limit")


# ---------------------------------------------------------------------------
# Psychoacoustic model
# ---------------------------------------------------------------------------
def _ath_energy(offsets: np.ndarray, sample_rate: int, frame: int,
                n_bins: int) -> np.ndarray:
    """Absolute threshold of hearing as per-band allowed energy in the
    coefficient domain (input convention: full-scale sine ~ 32768 amp
    mapped to ~96 dB SPL)."""
    centers = 0.5 * (offsets[:-1] + offsets[1:])
    f_khz = np.maximum(centers * sample_rate / (2.0 * n_bins), 40.0) / 1000.0
    ath_spl = (3.64 * f_khz ** -0.8
               - 6.5 * np.exp(-0.6 * (f_khz - 3.3) ** 2)
               + 1e-3 * f_khz ** 4)
    widths = (offsets[1:] - offsets[:-1]).astype(np.float64)
    # 0 dBFS sine: amplitude 32768 -> coefficient energy scales with the
    # MDCT normalization; fold the calibration into one constant
    full_scale = (32768.0 ** 2) * frame / 4.0
    return widths * full_scale * 10.0 ** ((ath_spl - 96.0) / 10.0)


@dataclass
class PsyParams:
    smr_db: float = 23.0          # signal-to-mask offset
    spread_up_db: float = 1.2     # masking rolloff per band, upward
    spread_down_db: float = 2.6   # downward


def psy_thresholds(band_energy: np.ndarray, ath: np.ndarray,
                   p: PsyParams) -> np.ndarray:
    """Allowed noise energy per band.  band_energy [..., n_bands]."""
    up = 10.0 ** (-p.spread_up_db / 10.0)
    down = 10.0 ** (-p.spread_down_db / 10.0)
    spread = band_energy.copy()
    for b in range(1, spread.shape[-1]):          # masker below -> above
        spread[..., b] = np.maximum(spread[..., b], spread[..., b - 1] * up)
    for b in range(spread.shape[-1] - 2, -1, -1):  # masker above -> below
        spread[..., b] = np.maximum(spread[..., b], spread[..., b + 1] * down)
    thr = spread * 10.0 ** (-p.smr_db / 10.0)
    return np.maximum(thr, ath)


# ---------------------------------------------------------------------------
# Quantization: distortion-controlled scalefactors
# ---------------------------------------------------------------------------
def _band_distortion(coefs: np.ndarray, sf: int) -> float:
    q = quantize_band(coefs, sf)
    gain = tables.scalefactor_gain(sf - 100 + tables.SF_OFFSET)
    rec = np.sign(q) * np.abs(q).astype(np.float64) ** (4.0 / 3.0) * gain
    d = coefs - rec
    return float(d @ d)


def sf_for_threshold(coefs: np.ndarray, thr: float, hi: int = 230) -> int:
    """Largest scalefactor whose measured quantization distortion stays
    at or below thr.  The lower bound is the smallest sf whose quantized
    magnitudes fit the 8191 escape limit (below it quantize_band clips
    and distortion stops being monotone in sf)."""
    m = float(np.max(np.abs(coefs)))
    # need (m / 2^((sf-100)/4))^0.75 <= 8191  =>  sf >= 100 + 4*log2(m/8191^(4/3))
    lo = int(np.ceil(100.0 + 4.0 * (np.log2(max(m, 1e-30))
                                    - (4.0 / 3.0) * np.log2(8191.0))))
    lo = max(lo, 0)
    if _band_distortion(coefs, lo) > thr:
        return lo
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if _band_distortion(coefs, mid) <= thr:
            lo = mid
        else:
            hi = mid
    return lo


# ---------------------------------------------------------------------------
# Window decision
# ---------------------------------------------------------------------------
def detect_transients(pcm: np.ndarray, frame: int) -> np.ndarray:
    """Per-frame attack flags + attack sub-block index.

    A frame is transient when one of its 8 sub-blocks jumps well above
    the running loudness of the preceding blocks (pre-echo risk for a
    2048-sample window).  Returns [n_frames, 2] (flag, attack_window)."""
    mono = pcm.mean(axis=1) if pcm.ndim == 2 else pcm
    n_frames = len(mono) // frame
    sub = frame // 8
    e = (mono[: n_frames * frame] ** 2).reshape(n_frames * 8, sub).sum(axis=1)
    e = np.maximum(e, 1e-9)
    out = np.zeros((n_frames, 2), np.int64)
    hist = float(np.mean(e[:8]))
    for f in range(n_frames):
        blocks = e[f * 8:(f + 1) * 8]
        attack = -1
        for w in range(8):
            if blocks[w] > 10.0 * hist and blocks[w] > 1e4 * sub:
                attack = w
                break
            hist = 0.7 * hist + 0.3 * float(blocks[w])
        if attack >= 0:
            out[f] = (1, attack)
            hist = float(np.mean(blocks))
    return out


def window_sequence_plan(transient: np.ndarray) -> np.ndarray:
    """Map per-frame transient flags to a legal window-sequence chain.

    Transition rules (a frame's left half must mirror its predecessor's
    right half): ONLY_LONG/LONG_STOP -> {ONLY_LONG, LONG_START};
    LONG_START/EIGHT_SHORT -> {EIGHT_SHORT, LONG_STOP}.  An attack frame
    becomes EIGHT_SHORT; its predecessor LONG_START (or EIGHT_SHORT when
    it was already short-entered); its successor LONG_STOP."""
    n = len(transient)
    seq = np.full(n, ONLY_LONG, np.int64)
    for f in range(n):
        if transient[f, 0]:
            seq[f] = EIGHT_SHORT
    for f in range(n):
        if seq[f] != EIGHT_SHORT or f == 0:
            continue
        if seq[f - 1] == ONLY_LONG:
            seq[f - 1] = LONG_START
    for f in range(1, n):
        if seq[f - 1] in (LONG_START, EIGHT_SHORT):
            if seq[f] == ONLY_LONG:
                seq[f] = LONG_STOP
            elif seq[f] == LONG_START:
                # a START for the NEXT attack but entered from a short
                # exit: only EIGHT_SHORT has the short-rise left half
                seq[f] = EIGHT_SHORT
    return seq


def grouping_for_attack(attack_w: int) -> list[int]:
    """Short-window grouping around the attack: long pre-group (smears
    nothing), fine groups at and after the attack."""
    w = int(np.clip(attack_w, 0, 7))
    if w == 0:
        return [1, 1, 6]
    if w >= 6:
        return [w, 8 - w]
    return [w, 1, 7 - w]


# ---------------------------------------------------------------------------
# The encoder
# ---------------------------------------------------------------------------
class AACEncoder:
    """AAC-LC encoder producing ADTS (encode) or raw payloads
    (encode_frames, for LATM/MP4 muxing).

    pcm convention matches the decoder output: float, full scale 32768
    (int16 range).  `bitrate` is the total target across channels."""

    def __init__(self, sample_rate: int = 44100, channels: int = 2,
                 bitrate: int = 128_000, psy: PsyParams | None = None):
        if channels not in (1, 2):
            raise ValueError("AACEncoder supports mono and stereo")
        try:
            sample_index = list(tables.SAMPLE_RATES).index(sample_rate)
        except ValueError:
            raise ValueError(f"unsupported sample rate {sample_rate}")
        self.config: StreamConfig = parse_asc(
            make_asc(2, sample_index, channels))
        self.sample_rate = sample_rate
        self.channels = channels
        self.bitrate = bitrate
        self.psy = psy or PsyParams()
        self._frame = self.config.frame_length
        self._amat_long = analysis_matrix(2 * self._frame)
        self._amat_short = analysis_matrix(2 * self._frame // 8)
        self._win_long = None  # built lazily per shape need
        # bandwidth cutoff from per-channel rate (classic encoder rule of
        # thumb; keeps bits where masking can use them)
        per_ch = bitrate / channels
        cutoff_hz = min(0.45 * sample_rate,
                        4000.0 + per_ch * 0.12, 20000.0)
        self._cutoff_bin = int(cutoff_hz / (sample_rate / 2.0) * self._frame)
        self._reservoir = 0.0
        self._reservoir_cap = 6.0 * bitrate * self._frame / sample_rate

    # -- analysis -------------------------------------------------------------
    def _window_long(self, seq: int) -> np.ndarray:
        F = self._frame
        S = F // 8
        MID = (F - S) // 2
        rise = tables.long_window(0, F)
        srise = tables.short_window(0, S)
        w = np.zeros(2 * F)
        if seq == ONLY_LONG:
            w[:F] = rise
            w[F:] = rise[::-1]
        elif seq == LONG_START:
            w[:F] = rise
            w[F:F + MID] = 1.0
            w[F + MID:F + MID + S] = srise[::-1]
        elif seq == LONG_STOP:
            w[MID:MID + S] = srise
            w[MID + S:F] = 1.0
            w[F:] = rise[::-1]
        return w

    def _mdct_long(self, seg: np.ndarray, seq: int) -> np.ndarray:
        return (seg * self._window_long(seq)) @ self._amat_long

    def _mdct_short(self, seg: np.ndarray) -> np.ndarray:
        """8 short MDCTs over the frame's span: window w covers
        [MID + w*S, MID + w*S + 2S) of the 2F span (decoder places its
        short IMDCTs at the same offsets, kernels/windows.py MID)."""
        F = self._frame
        S = F // 8
        MID = (F - S) // 2
        srise = tables.short_window(0, S)
        wfull = np.concatenate([srise, srise[::-1]])
        segs = np.stack([seg[MID + w * S: MID + w * S + 2 * S]
                         for w in range(8)])
        return (segs * wfull) @ self._amat_short  # [8, S]

    # -- per-frame coding -----------------------------------------------------
    def _analyze_channel(self, coefs, seq: int, grouping,
                         offsets: np.ndarray, max_sfb: int,
                         thr: np.ndarray) -> list:
        """Per-band analysis for one channel: for every band above its
        psy threshold, the band coefficients, the base scalefactor (the
        coarsest whose distortion meets the threshold) and the finest
        legal scalefactor (escape-limit fit).  Returns a list of
        (band_idx, a, b, band, base_sf, fit_sf) plus the layout tuple."""
        n_groups = len(grouping) if grouping else 1
        S = self._frame // 8 if seq == EIGHT_SHORT else self._frame
        glens = list(grouping) if grouping else [1]
        bands = []
        idx = 0
        for g, glen in enumerate(glens):
            for sfb in range(max_sfb):
                a, b = int(offsets[sfb]), int(offsets[sfb + 1])
                band = np.concatenate([
                    coefs[g][w * S + a: w * S + b] for w in range(glen)]) \
                    if seq == EIGHT_SHORT else coefs[g][a:b]
                t = float(thr[g, sfb])
                # every band with real content is a candidate: bands at or
                # below their mask get a base_sf that quantizes them to
                # zero, but a surplus-budget (negative) rate offset can
                # re-admit them — that's where extra bits go at high rates
                if band.size and float(band @ band) > 1e-6 * band.size:
                    m = float(np.max(np.abs(band)))
                    lg = np.log2(max(m, 1e-30))
                    # finest legal sf: quantized magnitudes fit the 8191
                    # escape limit;  zero sf: the whole band rounds to 0
                    # ((m/gain)^0.75 + 0.4054 < 1)
                    fit_sf = max(int(np.ceil(
                        100.0 + 4.0 * (lg - (4.0 / 3.0)
                                       * np.log2(8191.0)))), 0)
                    zero_sf = int(np.ceil(
                        100.0 + 4.0 * (lg - (4.0 / 3.0)
                                       * np.log2(0.5946))))
                    # base = coarsest sf meeting the psy threshold, but
                    # never past the band's own zeroing point — that keeps
                    # the rate offset meaningful for masked bands (louder
                    # tails re-admitted first as the offset goes negative)
                    base_sf = min(sf_for_threshold(band, t, hi=zero_sf + 1),
                                  zero_sf)
                    bands.append((idx, g, sfb, band, base_sf, fit_sf))
                idx += 1
        return [bands, glens, S, n_groups]

    def _emit_channel(self, analysis, seq: int, offsets: np.ndarray,
                      max_sfb: int, sf_offset: int) -> ChannelSpec:
        """Quantize the analyzed bands at base_sf + sf_offset (clipped to
        the escape-fit floor) and build the ChannelSpec."""
        bands, glens, S, n_groups = analysis
        books = np.zeros(n_groups * max_sfb, np.int64)
        sfs = np.zeros(n_groups * max_sfb, np.int64)
        quant = np.zeros(self._frame, np.int64)
        group_starts = np.cumsum([0] + [glen * S for glen in glens])
        for idx, g, sfb, band, base_sf, fit_sf in bands:
            sf = int(np.clip(base_sf + sf_offset, fit_sf, 255))
            q = quantize_band(band, sf)
            if not np.any(q):
                continue
            book, _ = choose_book(q)
            books[idx] = book
            sfs[idx] = sf
            a, b = int(offsets[sfb]), int(offsets[sfb + 1])
            group_off = int(group_starts[g])
            glen = glens[g]
            pos = 0
            width = b - a
            for w in range(glen):
                quant[group_off + w * S + a: group_off + w * S + b] = \
                    q[pos:pos + width]
                pos += width
        coded = np.nonzero(books)[0]
        gg = int(np.clip(sfs[coded[0]], 0, 255)) if coded.size else 120
        return ChannelSpec(
            window_sequence=seq, window_shape=0, max_sfb=max_sfb,
            grouping=list(glens) if seq == EIGHT_SHORT else None,
            global_gain=gg, band_books=books, band_sf=sfs, quant=quant)

    def _frame_bits(self, specs: list[ChannelSpec], offsets) -> int:
        """Exact payload bits for the frame's channel specs (spectral +
        scalefactor + section data + fixed side info)."""
        total = 0
        for spec in specs:
            bits = 0
            sect_bits = 3 if spec.window_sequence == EIGHT_SHORT else 5
            esc = (1 << sect_bits) - 1
            books = spec.band_books
            n_groups = spec.group_count
            # section runs
            idx = 0
            for _g in range(n_groups):
                sfb = 0
                while sfb < spec.max_sfb:
                    book = int(books[idx])
                    run = 1
                    while sfb + run < spec.max_sfb and \
                            int(books[idx + run]) == book:
                        run += 1
                    bits += 4 + sect_bits * (run // esc + 1)
                    sfb += run
                    idx += run
            # scalefactor deltas
            prev = spec.global_gain
            for i in range(n_groups * spec.max_sfb):
                if int(books[i]) == 0:
                    continue
                d = int(spec.band_sf[i]) - prev
                bits += int(_SF_LEN[np.clip(d + 60, 0, 120)])
                prev = int(spec.band_sf[i])
            # spectral data
            S = (self._frame // 8 if spec.window_sequence == EIGHT_SHORT
                 else self._frame)
            glens = spec.group_lengths()
            group_off = 0
            idx = 0
            for glen in glens:
                for sfb in range(spec.max_sfb):
                    book = int(books[idx])
                    if book:
                        a, b = int(offsets[sfb]), int(offsets[sfb + 1])
                        q = np.concatenate([
                            spec.quant[group_off + w * S + a:
                                       group_off + w * S + b]
                            for w in range(glen)])
                        bits += spectral_bits(q, book)
                    idx += 1
                group_off += glen * S
            # ics_info + global_gain + pulse/tns/gain flags
            bits += 8 + (15 if spec.window_sequence == EIGHT_SHORT else 11) + 3
            total += bits
        # element headers: id(3)+instance(4), common_window(1)+ms(2+bands)
        if len(specs) == 2:
            total += 7 + 1 + 2 + specs[0].group_count * specs[0].max_sfb
        else:
            total += 7
        return total + 3 + 7  # END + align slack

    # -- public ---------------------------------------------------------------
    def encode_frames(self, pcm: np.ndarray) -> list[bytes]:
        """Encode PCM [n, channels] to raw_data_block payloads.  Output
        has the standard 1-frame encoder delay plus a final flush frame."""
        F = self._frame
        nch = self.channels
        pcm = np.asarray(pcm, np.float64).reshape(-1, nch)
        n_frames = pcm.shape[0] // F
        if pcm.shape[0] % F:
            pad = F - pcm.shape[0] % F
            pcm = np.concatenate([pcm, np.zeros((pad, nch))])
            n_frames += 1
        padded = np.concatenate(
            [np.zeros((F, nch)), pcm, np.zeros((2 * F, nch))], axis=0)
        trans = detect_transients(
            np.concatenate([np.zeros((F, nch)), pcm]), F)
        seq = window_sequence_plan(trans)
        off_l = self.config.swb_offsets_long
        off_s = self.config.swb_offsets_short
        # bandwidth cutoff -> coded band counts
        max_sfb_l = int(np.searchsorted(off_l, self._cutoff_bin, "left"))
        max_sfb_l = min(max(max_sfb_l, 1), self.config.swb_count_long)
        cutoff_s = self._cutoff_bin // 8
        max_sfb_s = int(np.searchsorted(off_s, cutoff_s, "left"))
        max_sfb_s = min(max(max_sfb_s, 1), self.config.swb_count_short)
        ath_l = _ath_energy(off_l[:max_sfb_l + 1], self.sample_rate, F, F)
        ath_s = _ath_energy(off_s[:max_sfb_s + 1], self.sample_rate, F,
                            F // 8)
        bits_per_frame = self.bitrate * F / self.sample_rate

        payloads: list[bytes] = []
        for f in range(n_frames + 1):
            fseq = int(seq[f]) if f < len(seq) else (
                LONG_STOP if int(seq[-1]) in (LONG_START, EIGHT_SHORT)
                else ONLY_LONG)
            # attack sub-block -> short-window index: short window k of
            # frame f starts at sample MID + 128k = 448 + 128k, i.e. ~3.5
            # sub-blocks into the frame
            grouping = (grouping_for_attack(int(trans[f, 1]) - 3
                                            if trans[f, 0] else 4)
                        if fseq == EIGHT_SHORT and f < len(trans) else
                        ([8] if fseq == EIGHT_SHORT else None))
            offsets = off_s if fseq == EIGHT_SHORT else off_l
            max_sfb = max_sfb_s if fseq == EIGHT_SHORT else max_sfb_l
            ath = ath_s if fseq == EIGHT_SHORT else ath_l
            seg = padded[f * F:(f + 2) * F]

            # channel coefficients in grouped layout [n_groups, ...]
            ch_coefs = []
            for ch in range(nch):
                if fseq == EIGHT_SHORT:
                    c8 = self._mdct_short(seg[:, ch])  # [8, S]
                    glens = grouping
                    rows, pos = [], 0
                    for glen in glens:
                        rows.append(c8[pos:pos + glen].reshape(-1))
                        pos += glen
                    ch_coefs.append(rows)
                else:
                    ch_coefs.append([self._mdct_long(seg[:, ch], fseq)])

            glens = grouping or [1]
            n_groups = len(glens)
            S = F // 8 if fseq == EIGHT_SHORT else F

            def band_energy(rows):
                e = np.zeros((n_groups, max_sfb))
                for g, glen in enumerate(glens):
                    for sfb in range(max_sfb):
                        a, b = int(offsets[sfb]), int(offsets[sfb + 1])
                        x = (np.concatenate([rows[g][w * S + a: w * S + b]
                                             for w in range(glen)])
                             if fseq == EIGHT_SHORT else rows[g][a:b])
                        e[g, sfb] = float(x @ x)
                return e

            # M/S decision (stereo, same window everywhere by design)
            ms_used = None
            if nch == 2:
                e_l = band_energy(ch_coefs[0])
                e_r = band_energy(ch_coefs[1])
                mid = [(l + r) * 0.5 for l, r in
                       zip(ch_coefs[0], ch_coefs[1])]
                side = [(l - r) * 0.5 for l, r in
                        zip(ch_coefs[0], ch_coefs[1])]
                e_m = band_energy(mid)
                e_s = band_energy(side)
                ms_used = (e_m + e_s) < 0.8 * (e_l + e_r) + 1e-12
                for g in range(n_groups):
                    for sfb in range(max_sfb):
                        if ms_used[g, sfb]:
                            a, b = int(offsets[sfb]), int(offsets[sfb + 1])
                            sl = (slice(a, b) if fseq != EIGHT_SHORT else
                                  None)
                            for w in range(glens[g] if fseq == EIGHT_SHORT
                                           else 1):
                                s2 = (slice(w * S + a, w * S + b)
                                      if fseq == EIGHT_SHORT else sl)
                                ch_coefs[0][g][s2] = mid[g][s2]
                                ch_coefs[1][g][s2] = side[g][s2]
                thr_l = psy_thresholds(e_l, ath, self.psy)
                thr_r = psy_thresholds(e_r, ath, self.psy)
                thr = np.minimum(thr_l, thr_r)
                thrs = [thr, thr]
            else:
                thrs = [psy_thresholds(band_energy(ch_coefs[0]), ath,
                                       self.psy)]

            # rate control — the classic two-loop: per-band base
            # scalefactors from the psy threshold (inner), then a global
            # offset bisected on exact Huffman bits to meet the budget
            # (outer).  Negative offsets spend surplus budget on finer
            # quantization; positive offsets coarsen to fit.
            analyses = [self._analyze_channel(
                ch_coefs[ch], fseq, grouping, offsets, max_sfb, thrs[ch])
                for ch in range(nch)]

            def emit(off: int) -> tuple[list[ChannelSpec], int]:
                specs = [self._emit_channel(a, fseq, offsets, max_sfb, off)
                         for a in analyses]
                return specs, self._frame_bits(specs, offsets)

            budget = bits_per_frame + min(self._reservoir, bits_per_frame)
            lo, hi = -60, 90            # bits(off) is nonincreasing in off
            specs, used = emit(lo)
            if used > budget:
                _, bits_hi = emit(hi)
                if bits_hi > budget:
                    lo = hi             # pathological frame: emit coarsest
                while lo < hi:
                    mid = (lo + hi) // 2
                    s, u = emit(mid)
                    if u <= budget:
                        hi = mid
                        specs, used = s, u
                    else:
                        lo = mid + 1
                if used > budget:       # loop ended on an unfit lo==hi
                    specs, used = emit(lo)
            self._reservoir = float(np.clip(
                self._reservoir + bits_per_frame - used,
                0.0, self._reservoir_cap))

            # finalize: global_gain = first coded band's sf (or a default),
            # clamp inter-band deltas to the +-60 the syntax can express
            for spec in specs:
                coded = np.nonzero(spec.band_books)[0]
                gg = int(spec.band_sf[coded[0]]) if coded.size else 120
                spec.global_gain = int(np.clip(gg, 0, 255))
                prev = spec.global_gain
                for i in coded:
                    d = int(np.clip(int(spec.band_sf[i]) - prev, -60, 60))
                    spec.band_sf[i] = prev + d
                    prev = prev + d

            w = BitWriter()
            if nch == 2:
                write_cpe(w, CPESpec(
                    left=specs[0], right=specs[1], common_window=True,
                    ms_type=1, ms_used=ms_used.reshape(-1).astype(np.int64)),
                    self.config)
            else:
                write_sce(w, specs[0], self.config)
            payloads.append(end_frame(w))
        return payloads

    def encode(self, pcm: np.ndarray) -> bytes:
        """Encode PCM to an ADTS byte stream."""
        return b"".join(adts_frame(p, self.config)
                        for p in self.encode_frames(pcm))


def encode_adts(pcm: np.ndarray, sample_rate: int = 44100,
                bitrate: int = 128_000) -> bytes:
    """One-call PCM -> ADTS.  pcm [n] or [n, channels], 32768 scale."""
    pcm = np.asarray(pcm)
    ch = 1 if pcm.ndim == 1 else pcm.shape[1]
    return AACEncoder(sample_rate, ch, bitrate).encode(pcm.reshape(-1, ch))


def encode_m4a(pcm: np.ndarray, sample_rate: int = 44100,
               bitrate: int = 128_000) -> bytes:
    """One-call PCM -> gapless .m4a: raw payloads muxed with elst
    priming metadata (1-frame encoder delay) and exact valid duration,
    so decode_m4a returns PCM aligned with the input."""
    from aacjax.testing.mp4mux import mux_m4a
    pcm = np.asarray(pcm)
    ch = 1 if pcm.ndim == 1 else pcm.shape[1]
    pcm = pcm.reshape(-1, ch)
    enc = AACEncoder(sample_rate, ch, bitrate)
    payloads = enc.encode_frames(pcm)
    asc = make_asc(2, enc.config.sample_index, ch)
    return mux_m4a(payloads, asc, sample_rate, ch,
                   frame_length=enc.config.frame_length,
                   priming=enc.config.frame_length,
                   valid_samples=pcm.shape[0],
                   movie_ts=sample_rate)
