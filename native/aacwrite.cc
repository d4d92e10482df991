// Native AAC-LC raw_data_block writer for the TPU-batched encoder.
//
// The device (encode_batch.py) produces quantized spectra q[S,ch,nF,F]
// and per-band scalefactors sf[S,ch,nF,nb]; this writer performs the
// remaining serial host work — per-band codebook selection, section
// RLE, scalefactor DPCM and spectral Huffman coding — for every frame
// of the chunk in one call, multi-threaded across streams.  Output is
// byte-identical to the Python path (BatchEncoder._write_stream ->
// aacjax/testing/encoder.py write_cpe/write_sce/end_frame), which
// remains as the fallback and the equality oracle
// (tests/test_native_write.py).
//
// Syntax framing follows ISO/IEC 14496-3 §4.4 as realized in the
// reference decoder's parse path (decoder.js:138-198 element loop,
// ics.js:83-173 section/scalefactor syntax, huffman.js codebooks) —
// written here in reverse.  Quality scope matches encode_batch.py:
// sine windows, [8]-grouped EIGHT_SHORT, no pulse/TNS/M-S.
#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include "gen/aac_tables.h"  // kBooks: HCB1..HCB11 rows + HCB_SF

namespace {

constexpr int kEscBook = 11;
constexpr int kEscFlag = 16;

struct EncBook {
  // dense symbol-index -> (len, code); index = sum((v+off) * radix^k)
  std::vector<uint8_t> len;
  std::vector<uint32_t> code;
  int dim;       // 2 or 4 values per codeword
  int radix;
  int off;       // value offset into the dense index
  bool is_unsigned;
};

EncBook g_books[11];          // spectral HCB1..HCB11
std::vector<uint8_t> g_sf_len;    // HCB_SF delta+60 -> len
std::vector<uint32_t> g_sf_code;

struct BookParams { int dim, radix, off; bool uns; };
constexpr BookParams kParams[11] = {
    {4, 3, 1, false}, {4, 3, 1, false},   // HCB1, HCB2
    {4, 3, 0, true},  {4, 3, 0, true},    // HCB3, HCB4
    {2, 9, 4, false}, {2, 9, 4, false},   // HCB5, HCB6
    {2, 8, 0, true},  {2, 8, 0, true},    // HCB7, HCB8
    {2, 13, 0, true}, {2, 13, 0, true},   // HCB9, HCB10
    {2, 17, 0, true},                     // HCB11 (escape)
};

void init_books() {
  for (int b = 0; b < 11; ++b) {
    const BookDef& def = kBooks[b];
    const BookParams& p = kParams[b];
    int size = 1;
    for (int k = 0; k < p.dim; ++k) size *= p.radix;
    EncBook& eb = g_books[b];
    eb.dim = p.dim;
    eb.radix = p.radix;
    eb.off = p.off;
    eb.is_unsigned = p.uns;
    eb.len.assign(size, 0);
    eb.code.assign(size, 0);
    for (int i = 0; i < def.n; ++i) {
      const int32_t* row = def.rows + i * def.width;
      int idx = 0;
      for (int k = 0; k < p.dim; ++k)
        idx = idx * p.radix + (row[2 + k] + p.off);
      eb.len[idx] = static_cast<uint8_t>(row[0]);
      eb.code[idx] = static_cast<uint32_t>(row[1]);
    }
  }
  const BookDef& sf = kBooks[11];
  g_sf_len.assign(121, 0);
  g_sf_code.assign(121, 0);
  for (int i = 0; i < sf.n; ++i) {
    const int32_t* row = sf.rows + i * sf.width;
    g_sf_len[row[2]] = static_cast<uint8_t>(row[0]);
    g_sf_code[row[2]] = static_cast<uint32_t>(row[1]);
  }
}

std::atomic<bool> g_init_done{false};
void ensure_init() {
  static std::once_flag once;
  std::call_once(once, [] { init_books(); g_init_done = true; });
}

struct BitWriter {
  uint8_t* buf;
  int64_t cap;       // bytes
  int64_t pos = 0;   // bytes flushed
  uint64_t cache = 0;
  int ncached = 0;
  bool overflow = false;

  void write(uint32_t value, int n) {
    cache = (cache << n) | value;
    ncached += n;
    while (ncached >= 8) {
      ncached -= 8;
      if (pos >= cap) { overflow = true; return; }
      buf[pos++] = static_cast<uint8_t>((cache >> ncached) & 0xFF);
    }
    cache &= (1ull << ncached) - 1;
  }
  int64_t finish() {  // byte-align with zeros, return total bytes
    if (ncached) {
      int pad = 8 - ncached;
      if (pos >= cap) { overflow = true; return 0; }
      buf[pos++] = static_cast<uint8_t>((cache << pad) & 0xFF);
      cache = 0;
      ncached = 0;
    }
    return pos;
  }
};

int escape_bits(int a) {  // a >= kEscFlag
  int nbits = 31 - __builtin_clz(static_cast<unsigned>(a));  // floor(log2 a)
  if (nbits < 4) nbits = 4;
  return 2 * nbits - 3;
}

// Exact Huffman cost of one band's values with one book (values given
// as a gathered contiguous run; width % dim == 0).  Mirrors
// encode.spectral_bits / _book_tuple_bits.
int64_t band_cost(const int32_t* v, int width, int book) {
  const EncBook& eb = g_books[book - 1];
  int64_t bits = 0;
  if (book == kEscBook) {
    for (int k = 0; k < width; k += 2) {
      int a0 = v[k] < 0 ? -v[k] : v[k];
      int a1 = v[k + 1] < 0 ? -v[k + 1] : v[k + 1];
      int s0 = a0 < kEscFlag ? a0 : kEscFlag;
      int s1 = a1 < kEscFlag ? a1 : kEscFlag;
      bits += eb.len[s0 * 17 + s1] + (s0 != 0) + (s1 != 0);
      if (a0 >= kEscFlag) bits += escape_bits(a0);
      if (a1 >= kEscFlag) bits += escape_bits(a1);
    }
    return bits;
  }
  const int dim = eb.dim, radix = eb.radix, off = eb.off;
  for (int k = 0; k < width; k += dim) {
    int idx = 0;
    int signs = 0;
    for (int j = 0; j < dim; ++j) {
      int val = v[k + j];
      int sym = eb.is_unsigned ? (val < 0 ? -val : val) : val;
      if (eb.is_unsigned && sym != 0) ++signs;
      idx = idx * radix + (sym + off);
    }
    bits += eb.len[idx];
    if (eb.is_unsigned) bits += signs;
  }
  return bits;
}

// Cheapest legal codebook for a band (mirrors encode.bands_books_and_bits:
// candidates within the magnitude class, first-wins ties).
int choose_book(const int32_t* v, int width, int band_max) {
  if (band_max == 0 || width == 0) return 0;
  static const int kLav[6] = {1, 2, 4, 7, 12, 8191};
  static const int kCands[6][2] = {{1, 2}, {3, 4}, {5, 6},
                                   {7, 8}, {9, 10}, {11, 0}};
  for (int c = 0; c < 6; ++c) {
    if (band_max > kLav[c]) continue;
    int best_book = kCands[c][0];
    int64_t best = band_cost(v, width, best_book);
    if (kCands[c][1]) {
      int64_t alt = band_cost(v, width, kCands[c][1]);
      if (alt < best) { best_book = kCands[c][1]; best = alt; }
    }
    return best_book;
  }
  return -1;  // magnitude above escape limit — caller reports error
}

void write_codeword(BitWriter& w, int book, const int32_t* v) {
  const EncBook& eb = g_books[book - 1];
  const int dim = eb.dim, radix = eb.radix, off = eb.off;
  int idx = 0;
  int syms[4];
  for (int j = 0; j < dim; ++j) {
    int val = v[j];
    int sym;
    if (book == kEscBook) {
      int a = val < 0 ? -val : val;
      sym = a < kEscFlag ? a : kEscFlag;
    } else if (eb.is_unsigned) {
      sym = val < 0 ? -val : val;
    } else {
      sym = val;
    }
    syms[j] = sym;
    idx = idx * radix + (sym + off);
  }
  w.write(eb.code[idx], eb.len[idx]);
  if (eb.is_unsigned || book == kEscBook) {
    for (int j = 0; j < dim; ++j)
      if (syms[j]) w.write(v[j] < 0 ? 1u : 0u, 1);
  }
  if (book == kEscBook) {
    for (int j = 0; j < dim; ++j) {
      int a = v[j] < 0 ? -v[j] : v[j];
      if (a >= kEscFlag) {
        int nbits = 31 - __builtin_clz(static_cast<unsigned>(a));
        if (nbits < 4) nbits = 4;
        // unary prefix: (nbits-4) ones then a terminating zero
        w.write(((1u << (nbits - 4)) - 1) << 1, nbits - 4 + 1);
        w.write(static_cast<uint32_t>(a - (1 << nbits)), nbits);
      }
    }
  }
}

struct FrameLayout {
  int F, short_len;
  int max_sfb_l, max_sfb_s;
  const int32_t* ptr_l;   // [max_sfb_l + 1] long band bin offsets
  const int32_t* off_s;   // [max_sfb_s + 1] per-window short swb offsets
};

// One individual_channel_stream (LC, no pulse/TNS/gain, sine shape).
// q16 is the channel's [F] natural (window-interleaved) spectrum.
// Returns false on bitstream assembly error (sf delta overflow).
bool write_ics(BitWriter& w, const FrameLayout& L, int seq,
               const int16_t* q16, const int16_t* sf,
               bool common_window) {
  const bool short_win = seq == 2;
  const int max_sfb = short_win ? L.max_sfb_s : L.max_sfb_l;
  // gathered per-band runs: short bands span the 8 windows
  // (w*short_len + [a, b)), each window run a multiple of 4 so
  // pairs/quads never straddle windows (matches write_spectral_data)
  int32_t gathered[8192];
  int ptr[64];
  ptr[0] = 0;
  if (short_win) {
    int n = 0;
    for (int b = 0; b < max_sfb; ++b) {
      int a = L.off_s[b], e = L.off_s[b + 1];
      for (int win = 0; win < 8; ++win)
        for (int k = a; k < e; ++k)
          gathered[n++] = q16[win * L.short_len + k];
      ptr[b + 1] = n;
    }
  } else {
    int n = 0;
    for (int b = 0; b < max_sfb; ++b) {
      int a = L.ptr_l[b], e = L.ptr_l[b + 1];
      for (int k = a; k < e; ++k) gathered[n++] = q16[k];
      ptr[b + 1] = n;
    }
  }

  int books[64];
  for (int b = 0; b < max_sfb; ++b) {
    int width = ptr[b + 1] - ptr[b];
    int m = 0;
    for (int k = ptr[b]; k < ptr[b + 1]; ++k) {
      int a = gathered[k] < 0 ? -gathered[k] : gathered[k];
      if (a > m) m = a;
    }
    books[b] = choose_book(gathered + ptr[b], width, m);
    if (books[b] < 0) return false;
  }

  // scalefactor DPCM clamp chain (mirrors _write_stream): start at the
  // first coded band's sf, clamp each delta to +-60 cumulatively
  int sfs[64];
  int gg = 121;
  {
    bool first = true;
    int prev = 0;
    for (int b = 0; b < max_sfb; ++b) {
      sfs[b] = books[b] > 0 ? sf[b] : 0;
      if (books[b] > 0) {
        if (first) { gg = sfs[b]; prev = gg; first = false; }
        int d = sfs[b] - prev;
        if (d > 60) d = 60;
        if (d < -60) d = -60;
        sfs[b] = prev + d;
        prev = sfs[b];
      }
    }
  }
  int gg_field = gg < 0 ? 0 : (gg > 255 ? 255 : gg);

  w.write(static_cast<uint32_t>(gg_field), 8);
  if (!common_window) {
    // ics_info: reserved(1), sequence(2), shape(1)
    w.write(0, 1);
    w.write(static_cast<uint32_t>(seq & 3), 2);
    w.write(0, 1);
    if (short_win) {
      w.write(static_cast<uint32_t>(max_sfb), 4);
      w.write(0x7F, 7);  // grouping [8]: seven continuation bits
    } else {
      w.write(static_cast<uint32_t>(max_sfb), 6);
      w.write(0, 1);  // predictor_data_present
    }
  }

  // section_data: RLE runs, 3-bit (short) / 5-bit (long) escapes
  {
    int bits = short_win ? 3 : 5;
    uint32_t esc = (1u << bits) - 1;
    int sfb = 0;
    while (sfb < max_sfb) {
      int book = books[sfb];
      int run = 1;
      while (sfb + run < max_sfb && books[sfb + run] == book) ++run;
      w.write(static_cast<uint32_t>(book), 4);
      int r = run;
      while (r >= static_cast<int>(esc)) { w.write(esc, bits); r -= esc; }
      w.write(static_cast<uint32_t>(r), bits);
      sfb += run;
    }
  }

  // scale_factor_data: DPCM vs the running offset (starts at the
  // 8-bit global_gain field value)
  {
    int offset = gg_field;
    for (int b = 0; b < max_sfb; ++b) {
      if (books[b] == 0) continue;
      int delta = sfs[b] - offset;
      if (delta < -60 || delta > 60) return false;
      w.write(g_sf_code[delta + 60], g_sf_len[delta + 60]);
      offset += delta;
      if (offset < 0 || offset > 255) return false;
    }
  }

  w.write(0, 1);  // pulse_data_present
  w.write(0, 1);  // tns_data_present
  w.write(0, 1);  // gain_control_data_present

  // spectral_data over the gathered runs
  for (int b = 0; b < max_sfb; ++b) {
    int book = books[b];
    if (book == 0) continue;
    int dim = g_books[book - 1].dim;
    for (int k = ptr[b]; k < ptr[b + 1]; k += dim)
      write_codeword(w, book, gathered + k);
  }
  return true;
}

}  // namespace

extern "C" {

int aacwrite_version() { return 1; }

// Write raw_data_block payloads for every frame of an [S, ch, nF]
// batch.  q int16 [S, ch, nF, F]; sf int16 [S, ch, nF, nb];
// seqs int32 [S, nF] (window sequence; 2 = EIGHT_SHORT).
// out uint8 [S*nF, stride]; sizes int32 [S*nF] <- payload bytes.
// Returns 0, or -(frame_index+1) on overflow / assembly error.
int aacwrite_lc_batch(int S, int ch, int nF, int F, int nb,
                      int max_sfb_l, int max_sfb_s,
                      const int32_t* seqs, const int16_t* q,
                      const int16_t* sf, const int32_t* ptr_l,
                      const int32_t* off_s, uint8_t* out,
                      int64_t stride, int32_t* sizes, int n_threads) {
  ensure_init();
  FrameLayout L{F, F / 8, max_sfb_l, max_sfb_s, ptr_l, off_s};
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > S) n_threads = S;

  std::atomic<int> err{0};
  auto worker = [&](int s_begin, int s_end) {
    for (int s = s_begin; s < s_end; ++s) {
      for (int f = 0; f < nF; ++f) {
        int seq = seqs[s * nF + f];
        bool short_win = seq == 2;
        int64_t row = static_cast<int64_t>(s) * nF + f;
        BitWriter w{out + row * stride, stride};
        bool ok = true;
        if (ch == 2) {
          w.write(1, 3);   // CPE
          w.write(0, 4);   // instance
          w.write(1, 1);   // common_window
          // shared ics_info (sine shape, [8] grouping)
          w.write(0, 1);
          w.write(static_cast<uint32_t>(seq & 3), 2);
          w.write(0, 1);
          if (short_win) {
            w.write(static_cast<uint32_t>(max_sfb_s), 4);
            w.write(0x7F, 7);
          } else {
            w.write(static_cast<uint32_t>(max_sfb_l), 6);
            w.write(0, 1);
          }
          w.write(0, 2);   // ms_mask_present = 0
          for (int c = 0; c < 2 && ok; ++c) {
            const int16_t* qc =
                q + ((static_cast<int64_t>(s) * ch + c) * nF + f) * F;
            const int16_t* sc =
                sf + ((static_cast<int64_t>(s) * ch + c) * nF + f) * nb;
            ok = write_ics(w, L, seq, qc, sc, true);
          }
        } else {
          w.write(0, 3);   // SCE
          w.write(0, 4);
          const int16_t* qc =
              q + (static_cast<int64_t>(s) * ch * nF + f) * F;
          const int16_t* sc =
              sf + (static_cast<int64_t>(s) * ch * nF + f) * nb;
          ok = write_ics(w, L, seq, qc, sc, false);
        }
        if (!ok || w.overflow) {
          err.store(-static_cast<int>(row) - 1);
          return;
        }
        w.write(7, 3);  // END
        int64_t n = w.finish();
        if (w.overflow) {
          err.store(-static_cast<int>(row) - 1);
          return;
        }
        sizes[row] = static_cast<int32_t>(n);
      }
    }
  };

  if (n_threads == 1) {
    worker(0, S);
  } else {
    std::vector<std::thread> threads;
    int per = (S + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int b = t * per, e = b + per < S ? b + per : S;
      if (b >= e) break;
      threads.emplace_back(worker, b, e);
    }
    for (auto& t : threads) t.join();
  }
  return err.load();
}

}  // extern "C"
