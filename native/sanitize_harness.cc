// Standalone ASan/UBSan harness for the native parser: replays a corpus
// of valid streams (dumped by tools/gen_sanitize_corpus, see
// tools/diff_fuzz.py docs) plus deterministic bit-flip mutants through
// aacparse_batch_spec, with no Python/JAX in the process (ASan's
// __cxa_throw interceptor clashes with jaxlib).  Build + run:
//
//   g++ -O1 -g -std=c++17 -fsanitize=address,undefined -pthread \
//       -o /tmp/sanitize_harness native/sanitize_harness.cc
//   /tmp/sanitize_harness /tmp/corpus
//
// Exit 0 = every file parsed (possibly with per-stream error statuses)
// with no sanitizer findings.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "aacparse.cc"  // single-TU build of the parser itself

namespace {

struct Case {
  int profile, frame_len, sample_index, chan_config;
  std::vector<std::vector<uint8_t>> frames;
  std::vector<int32_t> swb_long, swb_long_count;
  std::vector<int32_t> swb_short, swb_short_count, tns_max;
};

bool load_case(const char* path, Case* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint32_t hdr[5];
  if (fread(hdr, 4, 5, f) != 5) { fclose(f); return false; }
  c->profile = hdr[0];
  c->frame_len = hdr[1];
  c->sample_index = hdr[2];
  c->chan_config = hdr[3];
  c->frames.resize(hdr[4]);
  for (auto& fr : c->frames) {
    uint32_t n;
    if (fread(&n, 4, 1, f) != 1 || n > (1u << 20)) { fclose(f); return false; }
    fr.resize(n);
    if (fread(fr.data(), 1, n, f) != n) { fclose(f); return false; }
  }
  auto rd = [&](std::vector<int32_t>* v, size_t n) {
    v->resize(n);
    return fread(v->data(), 4, n, f) == n;
  };
  bool ok = rd(&c->swb_long, 64) && rd(&c->swb_long_count, 1) &&
            rd(&c->swb_short, 20) && rd(&c->swb_short_count, 1) &&
            rd(&c->tns_max, 2);
  fclose(f);
  return ok;
}

int run_case(const Case& c) {
  const int n_streams = 1;
  const int slots = 4;                 // headroom beyond the channel count
  const int T = static_cast<int>(c.frames.size());
  std::vector<uint8_t> blob;
  std::vector<int64_t> offsets{0};
  for (auto& fr : c.frames) {
    blob.insert(blob.end(), fr.begin(), fr.end());
    offsets.push_back(static_cast<int64_t>(blob.size()));
  }
  int32_t frame_start[2] = {0, T};
  int32_t si = c.sample_index, cc = c.chan_config, base = 0, ns = slots;
  int32_t profile = c.profile;
  std::vector<int32_t> prev_shapes(slots, 0);
  std::vector<float> spec(static_cast<size_t>(slots) * T * c.frame_len);
  std::vector<int32_t> meta(static_cast<size_t>(slots) * T * 6);
  std::vector<float> tns_lpc(static_cast<size_t>(slots) * T * 2 * 8 * 20);
  std::vector<int32_t> tns_range(static_cast<size_t>(slots) * T * 2 * 8 * 2);
  std::vector<int32_t> post_idx(64 * 3);
  std::vector<float> post_gain(static_cast<size_t>(64) * c.frame_len);
  std::vector<int32_t> time_idx(static_cast<size_t>(slots) * T * 3);
  std::vector<float> time_gain(static_cast<size_t>(slots) * T);
  int32_t counts[2] = {0, 0};
  std::vector<int64_t> consumed(T);
  std::vector<int64_t> fil(static_cast<size_t>(T) * 12);
  std::vector<int64_t> fil_drc(T);
  int32_t status[1] = {0};
  int32_t has_tns[1] = {0};
  // exact-i16 q/sf planes + predictor/LTP side-info planes: always
  // requested so mutants exercise every emit path
  std::vector<int16_t> spec_q(static_cast<size_t>(slots) * T * c.frame_len);
  std::vector<uint8_t> spec_sf(static_cast<size_t>(slots) * T
                               * (c.frame_len / 4));
  int32_t qsf_ok[1] = {0};
  int32_t pred_sfb = 40;
  std::vector<int32_t> pred_meta(static_cast<size_t>(slots) * T * 3);
  std::vector<uint8_t> pred_used(static_cast<size_t>(slots) * T * 672);
  std::vector<int32_t> ltp_meta(static_cast<size_t>(slots) * T * 3);
  std::vector<uint8_t> ltp_used(static_cast<size_t>(slots) * T * 40);
  char err[256];
  return aacparse_batch_spec(
      blob.empty() ? reinterpret_cast<const uint8_t*>("") : blob.data(),
      offsets.data(), frame_start, &si, &cc, &base, &ns,
      &profile, c.frame_len,
      c.swb_long.data(), c.swb_long_count.data(),
      c.swb_short.data(), c.swb_short_count.data(), c.tns_max.data(),
      &pred_sfb,
      n_streams, slots, T, prev_shapes.data(), spec.data(), meta.data(),
      tns_lpc.data(), tns_range.data(), post_idx.data(), post_gain.data(),
      64, time_idx.data(), time_gain.data(),
      static_cast<int32_t>(slots * T), counts, consumed.data(), fil.data(),
      fil_drc.data(), status, has_tns, spec_q.data(), spec_sf.data(),
      qsf_ok, pred_meta.data(), pred_used.data(), ltp_meta.data(),
      ltp_used.data(), err, sizeof(err));
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <corpus-dir> [mutants-per-file]\n", argv[0]);
    return 2;
  }
  const int n_mut = argc > 2 ? atoi(argv[2]) : 32;
  int files = 0, runs = 0;
  for (int i = 0; i < 10000; ++i) {
    char path[512];
    snprintf(path, sizeof(path), "%s/%03d.bin", argv[1], i);
    Case c;
    if (!load_case(path, &c)) break;
    ++files;
    run_case(c);
    ++runs;
    // deterministic mutants: single bit flips walking through the frames
    uint64_t rng = 0x9E3779B97F4A7C15ull * (i + 1);
    for (int m = 0; m < n_mut; ++m) {
      Case mc = c;
      rng = rng * 6364136223846793005ull + 1442695040888963407ull;
      size_t fidx = (rng >> 33) % mc.frames.size();
      if (mc.frames[fidx].empty()) continue;
      rng = rng * 6364136223846793005ull + 1442695040888963407ull;
      size_t byte = (rng >> 33) % mc.frames[fidx].size();
      mc.frames[fidx][byte] ^= 1 << ((rng >> 29) & 7);
      run_case(mc);
      ++runs;
    }
    // pure-garbage frames under the same config
    for (int g = 0; g < 8; ++g) {
      Case gc = c;
      for (auto& fr : gc.frames) {
        for (auto& b : fr) {
          rng = rng * 6364136223846793005ull + 1442695040888963407ull;
          b = static_cast<uint8_t>(rng >> 56);
        }
      }
      run_case(gc);
      ++runs;
    }
  }
  printf("sanitize_harness: %d corpus files, %d parses, clean\n",
         files, runs);
  return files > 0 ? 0 : 1;
}
