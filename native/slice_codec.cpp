// slice_codec.cpp — native host runtime for the serial ETC1S entropy layer.
//
// The TPU device kernels hand dense index arrays to this module; it performs
// the irreducibly-serial work (selector MTF history simulation, predictor
// RLE state machines, canonical-Huffman bit packing/unpacking) at native
// speed. Python (codecs/etc1s/{backend,stream}.py) keeps bit-identical
// reference implementations used as fallback and for differential testing.
//
// Stream contract: see basis_universal_tpu/codecs/etc1s/stream.py (decode
// side) — the format matches transcode_slice in the reference transcoder.
//
// Build: g++ -O2 -shared -fPIC (driven by basis_universal_tpu/native.py).

#include <algorithm>
#include <cstdint>
#if defined(__SSE2__)
#include <emmintrin.h>
#endif
#if defined(__AVX2__)
#include <immintrin.h>
#endif
#include <cstring>
#include <queue>
#include <vector>

namespace {

constexpr uint32_t ENDPOINT_PRED_TOTAL_SYMBOLS = 4 * 4 * 4 * 4 + 1;
constexpr uint32_t ENDPOINT_PRED_REPEAT_LAST_SYMBOL = ENDPOINT_PRED_TOTAL_SYMBOLS - 1;
constexpr uint32_t ENDPOINT_PRED_MIN_REPEAT_COUNT = 3;
constexpr uint32_t ENDPOINT_PRED_COUNT_VLC_BITS = 4;
constexpr uint32_t MAX_SELECTOR_HISTORY_BUF_SIZE = 64;
constexpr uint32_t SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH = 3;
constexpr uint32_t SELECTOR_HISTORY_BUF_RLE_COUNT_BITS = 6;
constexpr uint32_t SELECTOR_HISTORY_BUF_RLE_COUNT_TOTAL = 1u << SELECTOR_HISTORY_BUF_RLE_COUNT_BITS;

// op kinds shared with the Python layer
enum OpKind : int32_t {
  kPred = 0,
  kDelta = 1,
  kSel = 2,
  kSelRle = 3,
  kPredRleVlc = 4,
  kSelRleVlc = 5,
};

struct Mtf {
  int32_t values[MAX_SELECTOR_HISTORY_BUF_SIZE];
  uint32_t rover;
  Mtf() {
    memset(values, 0, sizeof(values));
    rover = MAX_SELECTOR_HISTORY_BUF_SIZE / 2;
  }
  int find(int32_t v) const {
#if defined(__AVX2__)
    const __m256i vv = _mm256_set1_epi32(v);
    for (uint32_t i = 0; i < MAX_SELECTOR_HISTORY_BUF_SIZE; i += 8) {
      __m256i eq = _mm256_cmpeq_epi32(
          _mm256_loadu_si256((const __m256i*)&values[i]), vv);
      uint32_t m = (uint32_t)_mm256_movemask_ps(_mm256_castsi256_ps(eq));
      if (m) return (int)(i + (uint32_t)__builtin_ctz(m));
    }
    return -1;
#else
    // branchless descending scan (first match = smallest index) so the
    // compiler vectorizes the 64-entry compare instead of branching per slot
    int r = -1;
    for (int i = (int)MAX_SELECTOR_HISTORY_BUF_SIZE - 1; i >= 0; i--)
      r = (values[i] == v) ? i : r;
    return r;
#endif
  }
  void add(int32_t v) {
    values[rover++] = v;
    if (rover == MAX_SELECTOR_HISTORY_BUF_SIZE)
      rover = MAX_SELECTOR_HISTORY_BUF_SIZE / 2;
  }
  void use(uint32_t index) {
    if (index) {
      uint32_t half = index / 2;
      int32_t t = values[half];
      values[half] = values[index];
      values[index] = t;
    }
  }
};

struct BitWriter {
  std::vector<uint8_t>* buf;
  uint64_t acc = 0;
  uint32_t nbits = 0;
  void put(uint32_t v, uint32_t n) {
    acc |= (uint64_t)v << nbits;
    nbits += n;
    while (nbits >= 8) {
      buf->push_back((uint8_t)acc);
      acc >>= 8;
      nbits -= 8;
    }
  }
  void put_vlc(uint32_t v, uint32_t chunk_bits) {
    uint32_t mask = (1u << chunk_bits) - 1;
    for (;;) {
      uint32_t c = v & mask;
      v >>= chunk_bits;
      if (v)
        put(c | (1u << chunk_bits), chunk_bits + 1);
      else {
        put(c, chunk_bits + 1);
        break;
      }
    }
  }
  void flush() {
    if (nbits) {
      buf->push_back((uint8_t)acc);
      acc = 0;
      nbits = 0;
    }
  }
};

struct BitReader {
  const uint8_t* p;
  size_t size;
  size_t bitpos = 0;
  uint32_t get(uint32_t n) {
    uint64_t w = 0;
    size_t byte0 = bitpos >> 3;
    for (int i = 0; i < 8 && byte0 + i < size; i++)
      w |= (uint64_t)p[byte0 + i] << (8 * i);
    uint32_t v = (uint32_t)((w >> (bitpos & 7)) & ((1ull << n) - 1));
    bitpos += n;
    return v;
  }
  uint32_t decode_vlc(uint32_t chunk_bits) {
    uint32_t mask = (1u << chunk_bits) - 1, v = 0, ofs = 0;
    for (;;) {
      uint32_t s = get(chunk_bits + 1);
      v |= (s & mask) << ofs;
      ofs += chunk_bits;
      if (!(s & (1u << chunk_bits))) break;
      if (ofs >= 32) break;
    }
    return v;
  }
};

// flat-table huffman decode: table of (sym, len) for every max_len-bit peek
struct HuffTable {
  const int32_t* sym;
  const uint8_t* len;
  uint32_t max_len;
  int decode(BitReader& r) const {
    uint64_t w = 0;
    size_t byte0 = r.bitpos >> 3;
    for (int i = 0; i < 8 && byte0 + i < r.size; i++)
      w |= (uint64_t)r.p[byte0 + i] << (8 * i);
    uint32_t peek = (uint32_t)((w >> (r.bitpos & 7)) & ((1ull << max_len) - 1));
    int s = sym[peek];
    r.bitpos += len[peek];
    return s;
  }
};

}  // namespace

extern "C" {

// Pass 1: symbol collection for one slice.
// Outputs op arrays (kind, value) in decoder read order plus freq tables.
// Returns number of ops. Buffers must be sized >= 4 * by * bx + 16.
int64_t etc1s_collect_slice_symbols(
    const int32_t* e_idx, const int32_t* s_idx, int32_t by, int32_t bx,
    int32_t num_endpoints, int32_t num_selectors,
    int32_t* op_kind, int32_t* op_val,
    int64_t* pred_freq,   // ENDPOINT_PRED_TOTAL_SYMBOLS
    int64_t* delta_freq,  // num_endpoints
    int64_t* sel_freq,    // num_selectors + 64 + 1
    int64_t* rle_freq) {  // 64
  const int32_t SEL_RLE_SYM = num_selectors + MAX_SELECTOR_HISTORY_BUF_SIZE;
  const int gx = (bx + 1) / 2, gy = (by + 1) / 2;

  // group pred symbols
  std::vector<uint8_t> pred(by * bx);
  std::vector<int32_t> delta(by * bx);
  {
    int32_t prev = 0;
    for (int y = 0; y < by; y++) {
      for (int x = 0; x < bx; x++) {
        int32_t e = e_idx[y * bx + x];
        uint8_t pr = 3;
        if (x > 0 && y > 0 && e == e_idx[(y - 1) * bx + (x - 1)]) pr = 2;
        if (y > 0 && e == e_idx[(y - 1) * bx + x]) pr = 1;
        if (x > 0 && e == e_idx[y * bx + (x - 1)]) pr = 0;
        pred[y * bx + x] = pr;
        int32_t d = e - prev;
        if (d < 0) d += num_endpoints;
        delta[y * bx + x] = d;
        prev = e;
      }
    }
  }
  std::vector<int32_t> groups(gy * gx);
  for (int g_y = 0; g_y < gy; g_y++) {
    for (int g_x = 0; g_x < gx; g_x++) {
      auto pr = [&](int yy, int xx) -> int32_t {
        if (yy >= by || xx >= bx) return 0;
        return pred[yy * bx + xx];
      };
      int y0 = g_y * 2, x0 = g_x * 2;
      groups[g_y * gx + g_x] = pr(y0, x0) | (pr(y0, x0 + 1) << 2) |
                               (pr(y0 + 1, x0) << 4) | (pr(y0 + 1, x0 + 1) << 6);
    }
  }
  std::vector<int32_t> run_end(gy * gx);
  run_end[gy * gx - 1] = 1;
  for (int k = gy * gx - 2; k >= 0; k--)
    run_end[k] = (groups[k] == groups[k + 1]) ? run_end[k + 1] + 1 : 1;

  // per-block op lists are emulated by remembering, per block, an insertion
  // slot: we buffer ops in a flat array but a selector run's symbols must be
  // attached to the run's first block. Achieve this with a deferred-ops
  // scheme: ops for block i are appended when block i is *closed* — a block
  // closes when we know whether its selector starts/continues a run.
  struct Op { int32_t kind, val; };
  std::vector<std::vector<Op>> block_ops(by * bx);

  Mtf hist;
  int32_t prev_group_sym = -1;
  int32_t group_repeat_left = 0;
  int64_t pending_sel_run = 0;
  int64_t run_start_block = 0;

  auto flush_sel_run = [&]() {
    int64_t n = pending_sel_run;
    pending_sel_run = 0;
    if (!n) return;
    if (n < (int64_t)SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH) {
      for (int64_t k = 0; k < n; k++) {
        block_ops[run_start_block + k].push_back({kSel, num_selectors});
        sel_freq[num_selectors]++;
      }
    } else {
      auto& tgt = block_ops[run_start_block];
      tgt.push_back({kSel, SEL_RLE_SYM});
      sel_freq[SEL_RLE_SYM]++;
      if (n >= (int64_t)(SELECTOR_HISTORY_BUF_RLE_COUNT_TOTAL - 1 +
                         SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH)) {
        int32_t run_sym = SELECTOR_HISTORY_BUF_RLE_COUNT_TOTAL - 1;
        tgt.push_back({kSelRle, run_sym});
        rle_freq[run_sym]++;
        tgt.push_back({kSelRleVlc,
                       (int32_t)(n - SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH)});
      } else {
        int32_t run_sym = (int32_t)(n - SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH);
        tgt.push_back({kSelRle, run_sym});
        rle_freq[run_sym]++;
      }
    }
  };

  for (int y = 0; y < by; y++) {
    for (int x = 0; x < bx; x++) {
      int64_t bi = (int64_t)y * bx + x;
      auto& ops = block_ops[bi];
      if (!(x & 1) && !(y & 1)) {
        int gi = (y >> 1) * gx + (x >> 1);
        if (group_repeat_left) {
          group_repeat_left--;
        } else {
          int32_t sym = groups[gi];
          int32_t run = run_end[gi];
          if (sym == prev_group_sym &&
              run >= (int32_t)ENDPOINT_PRED_MIN_REPEAT_COUNT) {
            ops.push_back({kPred, (int32_t)ENDPOINT_PRED_REPEAT_LAST_SYMBOL});
            pred_freq[ENDPOINT_PRED_REPEAT_LAST_SYMBOL]++;
            ops.push_back({kPredRleVlc,
                           run - (int32_t)ENDPOINT_PRED_MIN_REPEAT_COUNT});
            group_repeat_left = run - 1;
          } else {
            ops.push_back({kPred, sym});
            pred_freq[sym]++;
            prev_group_sym = sym;
          }
        }
      }
      if (pred[bi] == 3) {
        ops.push_back({kDelta, delta[bi]});
        delta_freq[delta[bi]]++;
      }
      int32_t s = s_idx[bi];
      int hidx = hist.find(s);
      if (hidx == 0) {
        if (!pending_sel_run) run_start_block = bi;
        pending_sel_run++;
        continue;
      }
      flush_sel_run();
      if (hidx > 0) {
        ops.push_back({kSel, num_selectors + hidx});
        sel_freq[num_selectors + hidx]++;
        hist.use(hidx);
      } else {
        ops.push_back({kSel, s});
        sel_freq[s]++;
        hist.add(s);
      }
    }
  }
  flush_sel_run();

  int64_t n = 0;
  for (auto& ops : block_ops)
    for (auto& op : ops) {
      op_kind[n] = op.kind;
      op_val[n] = op.val;
      n++;
    }
  return n;
}

// ---------------------------------------------------------------------------
// RDO backend passes (parity with basisu_backend.cpp encode_image RDO,
// reference lines 460-1160): trade small per-block error increases for a
// cheaper symbol stream.
//
// Pass A (pred pass): per-block endpoint-predictor selection with endpoint
// SUBSTITUTION — when no neighbor's endpoint matches exactly, copy the
// lowest-error neighbor endpoint whose full-block error stays within
// e_thresh x current error (ref :501-585). Outputs pred[], the modified
// endpoint indices, the referenced-blocks map, and the raster sequence of
// explicit (pred==3) endpoint indices that drives the palette sort.
//
// Pass B (emit pass) extends the plain collector with:
//  - endpoint delta REMAP (ref :835-998): for explicit blocks, search the
//    sorted palette ring around prev_endpoint_index for a nearby entry
//    within threshold, shrinking the delta symbol;
//  - selector HISTORY RDO (ref :1015-1145): when the selector misses the
//    MTF history, scan all 64 entries for the lowest-error acceptable
//    pattern and emit the (cheap) history symbol instead of a raw index.
// ---------------------------------------------------------------------------

namespace {

// squared RGB distance of one pixel to a palette color
static inline uint64_t px_dist(const uint8_t* px, const int32_t* c) {
  int dr = (int)px[0] - c[0], dg = (int)px[1] - c[1], db = (int)px[2] - c[2];
  return (uint64_t)(dr * dr + dg * dg + db * db);
}

// Perceptual (luma-weighted) distance, the reference's exact integer
// color_distance(perceptual=true,...) (encoder/basisu_enc.h:1141). Max value
// per pixel ~1.3e7 — fits uint32 (same guarantee the reference relies on).
static inline uint32_t perc_dist(int dr, int dg, int db) {
  int dl = dr * 14 + dg * 45 + db * 5;
  int dcr = dr * 64 - dl;
  int dcb = db * 64 - dl;
  return ((uint32_t)(dl * dl) >> 5) + ((((uint32_t)(dcr * dcr) >> 5) * 26u) >> 7) +
         ((((uint32_t)(dcb * dcb) >> 5) * 3u) >> 7);
}

// Exact PSD form of the same metric without the >>5 truncations:
// d^T K d with K = A^T diag(128,26,3) A (4096x the perc_dist scale — every
// use compares values of the SAME form, so scale cancels). Used by the
// moments-factorized block errors, whose linearity needs an exact form.
static const int64_t kPercK[3][3] = {{90676, 24030, -18},
                                     {24030, 317925, 26685},
                                     {-18, 26685, 14293}};

// x^T K x for an RGB triple (any integer source)
static inline int64_t perc_qform(int64_t r, int64_t g, int64_t b) {
  return kPercK[0][0] * r * r + kPercK[1][1] * g * g + kPercK[2][2] * b * b +
         2 * (kPercK[0][1] * r * g + kPercK[0][2] * r * b +
              kPercK[1][2] * g * b);
}

#if defined(__SSE2__)
// sum of absolute differences of two 16-byte selector patterns (one psadbw)
static inline int pat_sad(const uint8_t* a, const uint8_t* b) {
  __m128i va = _mm_loadu_si128((const __m128i*)a);
  __m128i vb = _mm_loadu_si128((const __m128i*)b);
  __m128i sd = _mm_sad_epu8(va, vb);
  return _mm_cvtsi128_si32(sd) + _mm_extract_epi16(sd, 4);
}
#else
static inline int pat_sad(const uint8_t* a, const uint8_t* b) {
  int sd = 0;
  for (int p = 0; p < 16; p++) {
    int dd = (int)a[p] - (int)b[p];
    sd += dd < 0 ? -dd : dd;
  }
  return sd;
}
#endif

// full-block error: pixels (16x3 u8) vs pal colors (4x3 i32) via pattern
static inline uint64_t block_err(const uint8_t* px, const int32_t* pal,
                                 const uint8_t* pat, uint64_t early_out) {
  uint64_t e = 0;
  for (int i = 0; i < 16; i++) {
    e += px_dist(px + i * 3, pal + (int)pat[i] * 3);
    if (e > early_out) return e;
  }
  return e;
}

// Selector-class moments of one block: err(pal) = s2 + Σ_k n_k (c_kᵀM c_k) −
// 2 Σ_k s1_k·(M c_k) — exact integer identity for ANY PSD metric M (uniform
// I or the perceptual K), so scanning many candidate palettes costs ~16
// multiplies each instead of a 16-pixel pass. Callers precompute, per
// (endpoint, k): pal_norm = c_kᵀM c_k and pal_mc = M·c_k (which is just c_k
// for the uniform metric).
struct BlockMoments {
  int32_t n[4];
  int32_t s1[4][3];
  int64_t s2;
};

static inline void calc_block_moments(const uint8_t* px, const uint8_t* pat,
                                      BlockMoments& m, int perceptual) {
  memset(&m, 0, sizeof(m));
  int64_t s2 = 0;
  for (int i = 0; i < 16; i++) {
    const int k = pat[i];
    const int r = px[i * 3], g = px[i * 3 + 1], b = px[i * 3 + 2];
    m.n[k]++;
    m.s1[k][0] += r;
    m.s1[k][1] += g;
    m.s1[k][2] += b;
    s2 += perceptual ? perc_qform(r, g, b)
                     : (int64_t)(r * r + g * g + b * b);
  }
  m.s2 = s2;
}

static inline uint64_t block_err_m(const BlockMoments& m, const int64_t* mc,
                                   const int64_t* pal_norm4) {
  int64_t e = m.s2;
  for (int k = 0; k < 4; k++) {
    const int64_t* c = mc + k * 3;
    e += (int64_t)m.n[k] * pal_norm4[k] -
         2 * ((int64_t)m.s1[k][0] * c[0] + (int64_t)m.s1[k][1] * c[1] +
              (int64_t)m.s1[k][2] * c[2]);
  }
  return (uint64_t)e;
}

// Fill pal_norm (num_e*4) and pal_mc (num_e*4*3) for block_err_m under the
// selected metric.
static void calc_pal_metric(const int32_t* pal_colors, int64_t num_e,
                            int perceptual, std::vector<int64_t>& pal_norm,
                            std::vector<int64_t>& pal_mc) {
  pal_norm.resize((size_t)num_e * 4);
  pal_mc.resize((size_t)num_e * 12);
  for (int64_t t = 0; t < num_e; t++)
    for (int k = 0; k < 4; k++) {
      const int32_t* c = pal_colors + t * 12 + k * 3;
      int64_t* mc = &pal_mc[(size_t)(t * 4 + k) * 3];
      if (perceptual) {
        for (int a = 0; a < 3; a++)
          mc[a] = kPercK[a][0] * c[0] + kPercK[a][1] * c[1] +
                  kPercK[a][2] * c[2];
        pal_norm[t * 4 + k] = mc[0] * c[0] + mc[1] * c[1] + mc[2] * c[2];
      } else {
        mc[0] = c[0];
        mc[1] = c[1];
        mc[2] = c[2];
        pal_norm[t * 4 + k] =
            (int64_t)c[0] * c[0] + (int64_t)c[1] * c[1] + (int64_t)c[2] * c[2];
      }
    }
}

}  // namespace

// Pass A. e_idx modified in place (old/unsorted index space).
// sel_pat: per-block 16 selector values (caller gathers patterns[s_idx]).
// pal_colors: num_e x 4 x 3 int32 clipped block colors.
// Returns the number of explicit (pred==3) blocks written to explicit_seq.
int64_t etc1s_rdo_pred_pass(
    int32_t* e_idx, int32_t by, int32_t bx,
    const uint8_t* pixels,       // by*bx*48
    const uint8_t* sel_pat,      // by*bx*16
    const int32_t* pal_colors,   // num_e*12
    int32_t num_e, float e_thresh,
    uint8_t* pred_out, uint8_t* referenced_out, int32_t* explicit_seq,
    int32_t perceptual) {
  const int64_t nb = (int64_t)by * bx;
  memset(referenced_out, 0, (size_t)nb);
  // dx,dy per pred index: 0=left, 1=up, 2=upper-left
  const int pdx[3] = {-1, 0, -1}, pdy[3] = {0, -1, -1};

  // per-endpoint palette metric data (see block_err_m)
  std::vector<int64_t> pal_norm, pal_mc;
  calc_pal_metric(pal_colors, num_e, perceptual, pal_norm, pal_mc);

  for (int y = 0; y < by; y++) {
    for (int x = 0; x < bx; x++) {
      const int64_t bi = (int64_t)y * bx + x;
      const int32_t e = e_idx[bi];
      int best_pred = 4;
      // exact neighbor match (lowest pred index wins)
      for (int p = 0; p < 3; p++) {
        int nx = x + pdx[p], ny = y + pdy[p];
        if (nx < 0 || ny < 0) continue;
        if (e_idx[(int64_t)ny * bx + nx] == e) { best_pred = p; break; }
      }
      if (best_pred == 4 && e_thresh > 0.0f) {
        const uint8_t* px = pixels + bi * 48;
        const uint8_t* pat = sel_pat + bi * 16;
        BlockMoments mom;
        calc_block_moments(px, pat, mom, perceptual);
        uint64_t cur_err =
            block_err_m(mom, &pal_mc[(size_t)e * 12], &pal_norm[e * 4]);
        if (cur_err) {
          const uint64_t thresh_err =
              (uint64_t)((double)cur_err * (e_thresh > 1.0f ? e_thresh : 1.0f));
          uint64_t best_err = UINT64_MAX;
          int32_t best_e = 0;
          for (int p = 0; p < 3; p++) {
            int nx = x + pdx[p], ny = y + pdy[p];
            if (nx < 0 || ny < 0) continue;
            int32_t ne = e_idx[(int64_t)ny * bx + nx];
            uint64_t te = block_err_m(mom, &pal_mc[(size_t)ne * 12],
                                      &pal_norm[(int64_t)ne * 4]);
            if (te <= thresh_err && te < best_err) {
              best_err = te;
              best_pred = p;
              best_e = ne;
            }
          }
          if (best_pred != 4) e_idx[bi] = best_e;
        }
      }
      pred_out[bi] = (uint8_t)(best_pred == 4 ? 3 : best_pred);
    }
  }
  // referenced map + explicit sequence
  int64_t nexp = 0;
  for (int y = 0; y < by; y++) {
    for (int x = 0; x < bx; x++) {
      const int64_t bi = (int64_t)y * bx + x;
      switch (pred_out[bi]) {
        case 0: referenced_out[bi - 1] = 1; break;
        case 1: referenced_out[bi - bx] = 1; break;
        case 2: referenced_out[bi - bx - 1] = 1; break;
        default: explicit_seq[nexp++] = e_idx[bi]; break;
      }
    }
  }
  return nexp;
}

// Pass B: symbol collection with delta-remap + selector-history RDO.
// e_idx/s_idx are in the NEW (sorted) index spaces and are modified in
// place so the caller can pack the physical blocks afterwards.
int64_t etc1s_rdo_collect_slice_symbols(
    int32_t* e_idx, int32_t* s_idx, const uint8_t* pred,
    const uint8_t* referenced, int32_t by, int32_t bx,
    const uint8_t* pixels,        // by*bx*48
    const int32_t* pal_colors,    // num_e*12 (new order)
    const uint8_t* color5,        // num_e*3  (new order)
    const uint8_t* inten5,        // num_e    (new order)
    const uint8_t* patterns,      // num_s*16 (new order)
    int32_t num_e, int32_t num_s,
    float e_thresh, float s_thresh, int32_t comp_level,
    int32_t* op_kind, int32_t* op_val,
    int64_t* pred_freq, int64_t* delta_freq,
    int64_t* sel_freq, int64_t* rle_freq,
    int32_t perceptual) {
  const int32_t SEL_RLE_SYM = num_s + (int32_t)MAX_SELECTOR_HISTORY_BUF_SIZE;
  const int gx = (bx + 1) / 2;
  const int gy = (by + 1) / 2;
  // per-endpoint palette metric data for the factorized candidate errors
  std::vector<int64_t> pal_norm, pal_mc;
  calc_pal_metric(pal_colors, num_e, perceptual, pal_norm, pal_mc);
  const int COLOR_DELTA_THRESH = 8;   // ref basisu_backend.cpp:719
  const int SEL_DIFF_THRESHOLD = 11;  // ref :720
  const int MAX_ENDPOINT_SEARCH_DIST = (comp_level >= 2) ? 64 : 16;  // ref :851

  // group pred symbols + RLE runs (pred[] is final from pass A)
  std::vector<int32_t> groups((size_t)gy * gx);
  for (int g_y = 0; g_y < gy; g_y++) {
    for (int g_x = 0; g_x < gx; g_x++) {
      auto pr = [&](int yy, int xx) -> int32_t {
        if (yy >= by || xx >= bx) return 0;
        return pred[(int64_t)yy * bx + xx];
      };
      int y0 = g_y * 2, x0 = g_x * 2;
      groups[(size_t)g_y * gx + g_x] =
          pr(y0, x0) | (pr(y0, x0 + 1) << 2) | (pr(y0 + 1, x0) << 4) |
          (pr(y0 + 1, x0 + 1) << 6);
    }
  }
  std::vector<int32_t> run_end((size_t)gy * gx);
  run_end[(size_t)gy * gx - 1] = 1;
  for (int64_t k = (int64_t)gy * gx - 2; k >= 0; k--)
    run_end[k] = (groups[k] == groups[k + 1]) ? run_end[k + 1] + 1 : 1;

  // per-block op slots, fixed stride (max 6 ops per block: pred +
  // pred_rle_vlc + delta + sel + sel_rle + sel_rle_vlc) — avoids 24K
  // vector allocations per slice
  const int64_t nb = (int64_t)by * bx;
  constexpr int kMaxOps = 6;
  std::vector<int32_t> ops_buf((size_t)nb * kMaxOps * 2);
  std::vector<uint8_t> ops_cnt((size_t)nb, 0);
  auto push_op = [&](int64_t b, int32_t kind, int32_t val) {
    int32_t* slot = &ops_buf[(size_t)(b * kMaxOps + ops_cnt[b]) * 2];
    slot[0] = kind;
    slot[1] = val;
    ops_cnt[b]++;
  };

  Mtf hist;
  // contiguous mirror of the history entries' selector patterns: the RDO
  // pre-scan sweeps 64 x 16 bytes linearly instead of gathering 64 random
  // rows from the full pattern table per block (the single hottest loop of
  // the backend at ~24K blocks/slice)
  alignas(16) uint8_t hist_pats[MAX_SELECTOR_HISTORY_BUF_SIZE * 16];
  for (uint32_t j = 0; j < MAX_SELECTOR_HISTORY_BUF_SIZE; j++)
    memcpy(hist_pats + j * 16, patterns, 16);  // values[] start as 0
  int32_t prev_group_sym = -1;
  int32_t group_repeat_left = 0;
  int64_t pending_sel_run = 0;
  int64_t run_start_block = 0;
  int32_t prev_endpoint_index = 0;

  auto flush_sel_run = [&]() {
    int64_t n = pending_sel_run;
    pending_sel_run = 0;
    if (!n) return;
    if (n < (int64_t)SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH) {
      for (int64_t k = 0; k < n; k++) {
        push_op(run_start_block + k, kSel, num_s);
        sel_freq[num_s]++;
      }
    } else {
      push_op(run_start_block, kSel, SEL_RLE_SYM);
      sel_freq[SEL_RLE_SYM]++;
      if (n >= (int64_t)(SELECTOR_HISTORY_BUF_RLE_COUNT_TOTAL - 1 +
                         SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH)) {
        int32_t run_sym = SELECTOR_HISTORY_BUF_RLE_COUNT_TOTAL - 1;
        push_op(run_start_block, kSelRle, run_sym);
        rle_freq[run_sym]++;
        push_op(run_start_block, kSelRleVlc,
                (int32_t)(n - SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH));
      } else {
        int32_t run_sym = (int32_t)(n - SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH);
        push_op(run_start_block, kSelRle, run_sym);
        rle_freq[run_sym]++;
      }
    }
  };

  // pending selector runs track history-index-0 repeats; substituted
  // selectors participate exactly like naturally matching ones.
  for (int y = 0; y < by; y++) {
    for (int x = 0; x < bx; x++) {
      const int64_t bi = (int64_t)y * bx + x;
      if (!(x & 1) && !(y & 1)) {
        int gi = (y >> 1) * gx + (x >> 1);
        if (group_repeat_left) {
          group_repeat_left--;
        } else {
          int32_t sym = groups[(size_t)gi];
          int32_t run = run_end[(size_t)gi];
          if (sym == prev_group_sym &&
              run >= (int32_t)ENDPOINT_PRED_MIN_REPEAT_COUNT) {
            push_op(bi, kPred, (int32_t)ENDPOINT_PRED_REPEAT_LAST_SYMBOL);
            pred_freq[ENDPOINT_PRED_REPEAT_LAST_SYMBOL]++;
            push_op(bi, kPredRleVlc,
                    run - (int32_t)ENDPOINT_PRED_MIN_REPEAT_COUNT);
            group_repeat_left = run - 1;
          } else {
            push_op(bi, kPred, sym);
            pred_freq[sym]++;
            prev_group_sym = sym;
          }
        }
      }

      const uint8_t* px = pixels + bi * 48;

      if (pred[bi] == 3) {
        // endpoint delta remap (ref :835): move this block's endpoint to a
        // palette entry near prev_endpoint_index when error allows
        int32_t e = e_idx[bi];
        int32_t dlt = e - prev_endpoint_index;
        int adlt = dlt < 0 ? -dlt : dlt;
        if (e_thresh > 1.0f && adlt > 1 && !referenced[bi]) {
          const uint8_t* pat = patterns + (int64_t)s_idx[bi] * 16;
          BlockMoments mom;
          calc_block_moments(px, pat, mom, perceptual);
          uint64_t cur_err =
              block_err_m(mom, &pal_mc[(size_t)e * 12], &pal_norm[e * 4]);
          if (cur_err) {
            const uint64_t thresh_err = (uint64_t)((double)cur_err * e_thresh);
            const int search_dist =
                adlt - 1 < MAX_ENDPOINT_SEARCH_DIST ? adlt - 1
                                                    : MAX_ENDPOINT_SEARCH_DIST;
            uint64_t best_err = UINT64_MAX;
            int32_t best_idx = e;
            const int cur_inten = inten5[e];
            const uint8_t* cur_c5 = color5 + (int64_t)e * 3;
            for (int d = -search_dist; d < search_dist; d++) {
              int32_t t = prev_endpoint_index + d;
              if (t < 0) t += num_e;
              else if (t >= num_e) t -= num_e;
              if (t == e) continue;
              if (comp_level <= 1) {
                if (inten5[t] > cur_inten) continue;
                const uint8_t* tc5 = color5 + (int64_t)t * 3;
                int cd = 0;
                for (int c = 0; c < 3; c++) {
                  int dd = (int)cur_c5[c] - (int)tc5[c];
                  cd += dd < 0 ? -dd : dd;
                }
                if (cd > COLOR_DELTA_THRESH) continue;
              }
              uint64_t te = block_err_m(mom, &pal_mc[(size_t)t * 12],
                                        &pal_norm[(int64_t)t * 4]);
              if (te < best_err && te <= thresh_err) {
                best_err = te;
                best_idx = t;
              }
            }
            if (best_idx != e) {
              e = best_idx;
              e_idx[bi] = e;
            }
          }
        }
        int32_t d = e - prev_endpoint_index;
        if (d < 0) d += num_e;
        push_op(bi, kDelta, d);
        delta_freq[d]++;
      }
      prev_endpoint_index = e_idx[bi];

      // selector symbol with history RDO
      int32_t s = s_idx[bi];
      int hidx = hist.find(s);
      if (hidx < 0 && s_thresh > 0.0f) {
        // no exact hit: scan the whole history for an acceptable pattern.
        // Per-block error table errtab[i*4+k] = dist(pixel i, pal color k)
        // makes each trial a 16-entry sum; the SAD guard rejects most
        // entries with one psadbw.
        const int32_t* pal = pal_colors + (int64_t)e_idx[bi] * 12;
        const uint8_t* cur_pat = patterns + (int64_t)s * 16;
        // SAD pre-scan first: most blocks have no history entry within the
        // selector-difference guard, so the error table is usually skipped
        int cand[MAX_SELECTOR_HISTORY_BUF_SIZE];
        int ncand = 0;
#if defined(__AVX2__)
        if (comp_level <= 1) {
          // all 64 history SADs in one vectorized sweep (2 patterns per
          // 256-bit op) — the single hottest per-block loop of the backend
          alignas(32) uint16_t sads[MAX_SELECTOR_HISTORY_BUF_SIZE];
#if defined(__AVX512BW__)
          const __m512i vcur5 = _mm512_broadcast_i32x4(
              _mm_loadu_si128((const __m128i*)cur_pat));
          for (uint32_t j = 0; j < MAX_SELECTOR_HISTORY_BUF_SIZE; j += 4) {
            __m512i vp = _mm512_loadu_si512(hist_pats + (int64_t)j * 16);
            alignas(64) uint64_t t8[8];
            _mm512_store_si512(t8, _mm512_sad_epu8(vp, vcur5));
            sads[j] = (uint16_t)(t8[0] + t8[1]);
            sads[j + 1] = (uint16_t)(t8[2] + t8[3]);
            sads[j + 2] = (uint16_t)(t8[4] + t8[5]);
            sads[j + 3] = (uint16_t)(t8[6] + t8[7]);
          }
#else
          const __m256i vcur = _mm256_broadcastsi128_si256(
              _mm_loadu_si128((const __m128i*)cur_pat));
          for (uint32_t j = 0; j < MAX_SELECTOR_HISTORY_BUF_SIZE; j += 2) {
            __m256i vp = _mm256_loadu_si256(
                (const __m256i*)(hist_pats + (int64_t)j * 16));
            alignas(32) uint64_t t4[4];
            _mm256_store_si256((__m256i*)t4, _mm256_sad_epu8(vp, vcur));
            sads[j] = (uint16_t)(t4[0] + t4[1]);
            sads[j + 1] = (uint16_t)(t4[2] + t4[3]);
          }
#endif
          for (uint32_t j = 0; j < MAX_SELECTOR_HISTORY_BUF_SIZE; j++) {
            const int32_t t = hist.values[j];
            if (t < 0 || t >= num_s) continue;
            if ((int)sads[j] >= SEL_DIFF_THRESHOLD) continue;
            cand[ncand++] = (int)j;
          }
        } else
#endif
        {
          for (uint32_t j = 0; j < MAX_SELECTOR_HISTORY_BUF_SIZE; j++) {
            const int32_t t = hist.values[j];
            if (t < 0 || t >= num_s) continue;
            if (comp_level <= 1 &&
                pat_sad(cur_pat, hist_pats + (int64_t)j * 16) >= SEL_DIFF_THRESHOLD)
              continue;
            cand[ncand++] = (int)j;
          }
        }
        uint64_t best_err = UINT64_MAX;
        int best_j = -1;
        int32_t best_s = 0;
        if (ncand) {
          alignas(32) uint32_t errtab[64];
#if defined(__AVX2__)
          // vectorize over the 16 pixels: one (sub,mul,add) chain per
          // palette color instead of 64 scalar px_dist calls
          alignas(32) int32_t rr[16], gg[16], bb[16];
          for (int i = 0; i < 16; i++) {
            rr[i] = px[i * 3];
            gg[i] = px[i * 3 + 1];
            bb[i] = px[i * 3 + 2];
          }
          alignas(32) uint32_t ek[4][16];
          for (int k = 0; k < 4; k++) {
            const __m256i cr = _mm256_set1_epi32(pal[k * 3]);
            const __m256i cg = _mm256_set1_epi32(pal[k * 3 + 1]);
            const __m256i cb = _mm256_set1_epi32(pal[k * 3 + 2]);
            for (int h = 0; h < 2; h++) {
              __m256i dr = _mm256_sub_epi32(
                  _mm256_load_si256((const __m256i*)&rr[h * 8]), cr);
              __m256i dg = _mm256_sub_epi32(
                  _mm256_load_si256((const __m256i*)&gg[h * 8]), cg);
              __m256i db = _mm256_sub_epi32(
                  _mm256_load_si256((const __m256i*)&bb[h * 8]), cb);
              __m256i e;
              if (perceptual) {
                // vector form of perc_dist (all intermediates < 2^31)
                __m256i dl = _mm256_add_epi32(
                    _mm256_add_epi32(
                        _mm256_mullo_epi32(dr, _mm256_set1_epi32(14)),
                        _mm256_mullo_epi32(dg, _mm256_set1_epi32(45))),
                    _mm256_mullo_epi32(db, _mm256_set1_epi32(5)));
                __m256i dcr = _mm256_sub_epi32(
                    _mm256_slli_epi32(dr, 6), dl);
                __m256i dcb = _mm256_sub_epi32(
                    _mm256_slli_epi32(db, 6), dl);
                __m256i tl = _mm256_srli_epi32(_mm256_mullo_epi32(dl, dl), 5);
                __m256i tcr = _mm256_srli_epi32(
                    _mm256_mullo_epi32(
                        _mm256_srli_epi32(_mm256_mullo_epi32(dcr, dcr), 5),
                        _mm256_set1_epi32(26)), 7);
                __m256i tcb = _mm256_srli_epi32(
                    _mm256_mullo_epi32(
                        _mm256_srli_epi32(_mm256_mullo_epi32(dcb, dcb), 5),
                        _mm256_set1_epi32(3)), 7);
                e = _mm256_add_epi32(_mm256_add_epi32(tl, tcr), tcb);
              } else {
                e = _mm256_add_epi32(
                    _mm256_add_epi32(_mm256_mullo_epi32(dr, dr),
                                     _mm256_mullo_epi32(dg, dg)),
                    _mm256_mullo_epi32(db, db));
              }
              _mm256_store_si256((__m256i*)&ek[k][h * 8], e);
            }
          }
          for (int i = 0; i < 16; i++)
            for (int k = 0; k < 4; k++) errtab[i * 4 + k] = ek[k][i];
#else
          for (int i = 0; i < 16; i++)
            for (int k = 0; k < 4; k++)
              errtab[i * 4 + k] = perceptual
                  ? perc_dist((int)px[i * 3] - pal[k * 3],
                              (int)px[i * 3 + 1] - pal[k * 3 + 1],
                              (int)px[i * 3 + 2] - pal[k * 3 + 2])
                  : (uint32_t)px_dist(px + i * 3, pal + k * 3);
#endif
          uint64_t cur_err = 0;
          for (int i = 0; i < 16; i++) cur_err += errtab[i * 4 + cur_pat[i]];
          const uint64_t limit_err = (uint64_t)((double)cur_err *
                                                (s_thresh > 1.0f ? s_thresh : 1.0f) + 0.999999);
#if defined(__AVX2__)
          const __m256i viota4 = _mm256_setr_epi32(0, 4, 8, 12, 16, 20, 24, 28);
          const __m256i viota4b =
              _mm256_setr_epi32(32, 36, 40, 44, 48, 52, 56, 60);
#endif
          for (int c = 0; c < ncand; c++) {
            const int j = cand[c];
            const int32_t t = hist.values[j];
            const uint8_t* tp = hist_pats + (int64_t)j * 16;
            const uint64_t cutoff = limit_err < best_err ? limit_err : best_err;
            uint64_t te = 0;
#if defined(__AVX2__)
            // errtab[i*4 + tp_i] for all 16 i as two 8-lane gathers
            __m128i tpb = _mm_loadu_si128((const __m128i*)tp);
            __m256i t0 = _mm256_cvtepu8_epi32(tpb);
            __m256i t1 = _mm256_cvtepu8_epi32(_mm_srli_si128(tpb, 8));
            __m256i g0 = _mm256_i32gather_epi32(
                (const int*)errtab, _mm256_add_epi32(t0, viota4), 4);
            __m256i g1 = _mm256_i32gather_epi32(
                (const int*)errtab, _mm256_add_epi32(t1, viota4b), 4);
            __m256i s8 = _mm256_add_epi32(g0, g1);
            __m128i s4 = _mm_add_epi32(_mm256_castsi256_si128(s8),
                                       _mm256_extracti128_si256(s8, 1));
            s4 = _mm_add_epi32(s4, _mm_srli_si128(s4, 8));
            s4 = _mm_add_epi32(s4, _mm_srli_si128(s4, 4));
            te = (uint64_t)(uint32_t)_mm_cvtsi128_si32(s4);
#else
            for (int i = 0; i < 16; i++) te += errtab[i * 4 + tp[i]];
#endif
            if (te < best_err && te <= cutoff) {
              best_err = te;
              best_j = j;
              best_s = t;
            }
          }
        }
        if (best_j >= 0) {
          s = best_s;
          s_idx[bi] = s;
          hidx = best_j;
        }
      }
      if (hidx == 0) {
        if (!pending_sel_run) run_start_block = bi;
        pending_sel_run++;
        continue;
      }
      flush_sel_run();
      if (hidx > 0) {
        push_op(bi, kSel, num_s + hidx);
        sel_freq[num_s + hidx]++;
        if (hidx) {  // mirror Mtf::use's half-swap in the pattern cache
          uint32_t half = (uint32_t)hidx / 2;
          alignas(16) uint8_t tmp[16];
          memcpy(tmp, hist_pats + half * 16, 16);
          memcpy(hist_pats + half * 16, hist_pats + (int64_t)hidx * 16, 16);
          memcpy(hist_pats + (int64_t)hidx * 16, tmp, 16);
        }
        hist.use(hidx);
      } else {
        push_op(bi, kSel, s);
        sel_freq[s]++;
        memcpy(hist_pats + (int64_t)hist.rover * 16,
               patterns + (int64_t)s * 16, 16);  // mirror Mtf::add
        hist.add(s);
      }
    }
  }
  flush_sel_run();

  int64_t n = 0;
  for (int64_t b = 0; b < nb; b++) {
    const int32_t* slot = &ops_buf[(size_t)b * kMaxOps * 2];
    for (int c = 0; c < ops_cnt[b]; c++) {
      op_kind[n] = slot[c * 2];
      op_val[n] = slot[c * 2 + 1];
      n++;
    }
  }
  return n;
}

// Physical ETC1S block pack (differential mode, flip=0, delta=0, selector
// bit layout per decoder_etc_block::set_selector — parity with the numpy
// pack in ops/etc1.py pack_etc1_blocks).
void etc1s_pack_physical(const int32_t* e_idx, const int32_t* s_idx,
                         int64_t nb, const uint8_t* color5,
                         const uint8_t* inten5, const uint8_t* patterns,
                         uint8_t* out) {
  static const uint8_t SEL2ETC[4] = {3, 2, 0, 1};
  for (int64_t b = 0; b < nb; b++) {
    const int32_t e = e_idx[b];
    const uint8_t* c5 = color5 + (int64_t)e * 3;
    const uint8_t it = inten5[e];
    uint8_t* o = out + b * 8;
    o[0] = (uint8_t)(c5[0] << 3);
    o[1] = (uint8_t)(c5[1] << 3);
    o[2] = (uint8_t)(c5[2] << 3);
    o[3] = (uint8_t)((it << 5) | (it << 2) | 2);
    const uint8_t* pat = patterns + (int64_t)s_idx[b] * 16;
    uint32_t lsb = 0, msb = 0;
    for (int y = 0; y < 4; y++) {
      for (int x = 0; x < 4; x++) {
        uint8_t v = SEL2ETC[pat[y * 4 + x]];
        int bit = x * 4 + y;
        lsb |= (uint32_t)(v & 1) << bit;
        msb |= (uint32_t)(v >> 1) << bit;
      }
    }
    o[4] = (uint8_t)(msb >> 8);
    o[5] = (uint8_t)msb;
    o[6] = (uint8_t)(lsb >> 8);
    o[7] = (uint8_t)lsb;
  }
}

// Pass 2: emit bits for the collected ops given 4 canonical-code tables.
// codes/lens arrays indexed by symbol per model. Returns byte count written
// into out (caller allocates generously: 4*nops + 16 bytes is safe).
int64_t etc1s_emit_slice_bits(
    const int32_t* op_kind, const int32_t* op_val, int64_t nops,
    const uint32_t* pred_codes, const uint8_t* pred_lens,
    const uint32_t* delta_codes, const uint8_t* delta_lens,
    const uint32_t* sel_codes, const uint8_t* sel_lens,
    const uint32_t* rle_codes, const uint8_t* rle_lens,
    uint8_t* out, int64_t out_capacity) {
  std::vector<uint8_t> buf;
  buf.reserve((size_t)(nops * 2 + 16));
  BitWriter w;
  w.buf = &buf;
  for (int64_t i = 0; i < nops; i++) {
    int32_t k = op_kind[i], v = op_val[i];
    switch (k) {
      case kPred: w.put(pred_codes[v], pred_lens[v]); break;
      case kDelta: w.put(delta_codes[v], delta_lens[v]); break;
      case kSel: w.put(sel_codes[v], sel_lens[v]); break;
      case kSelRle: w.put(rle_codes[v], rle_lens[v]); break;
      case kPredRleVlc: w.put_vlc(v, ENDPOINT_PRED_COUNT_VLC_BITS); break;
      case kSelRleVlc: w.put_vlc(v, 7); break;
    }
  }
  w.flush();
  if ((int64_t)buf.size() > out_capacity) return -1;
  memcpy(out, buf.data(), buf.size());
  return (int64_t)buf.size();
}

// Decode one slice's symbol stream into index grids.
// Huffman tables are flat (sym, len) lookup arrays of size 1<<max_len.
// Returns 0 on success, negative error code otherwise.
int32_t etc1s_decode_slice(
    const uint8_t* data, int64_t data_size, int32_t bx, int32_t by,
    int32_t num_endpoints, int32_t num_selectors,
    int32_t hist_size,
    const int32_t* pred_sym, const uint8_t* pred_len, int32_t pred_maxlen,
    const int32_t* delta_sym, const uint8_t* delta_len, int32_t delta_maxlen,
    const int32_t* sel_sym, const uint8_t* sel_len, int32_t sel_maxlen,
    const int32_t* rle_sym, const uint8_t* rle_len, int32_t rle_maxlen,
    int32_t is_video, const int32_t* prev_e, const int32_t* prev_s,
    int32_t* out_e, int32_t* out_s) {
  BitReader r{data, (size_t)data_size};
  HuffTable pred_t{pred_sym, pred_len, (uint32_t)pred_maxlen};
  HuffTable delta_t{delta_sym, delta_len, (uint32_t)delta_maxlen};
  HuffTable sel_t{sel_sym, sel_len, (uint32_t)sel_maxlen};
  HuffTable rle_t{rle_sym, rle_len, (uint32_t)rle_maxlen};

  std::vector<int32_t> hist_buf(hist_size, 0);
  uint32_t rover = hist_size / 2;
  auto hist_add = [&](int32_t v) {
    hist_buf[rover++] = v;
    if (rover == (uint32_t)hist_size) rover = hist_size / 2;
  };
  auto hist_use = [&](uint32_t idx) {
    if (idx) {
      uint32_t half = idx / 2;
      int32_t t = hist_buf[half];
      hist_buf[half] = hist_buf[idx];
      hist_buf[idx] = t;
    }
  };

  const int64_t total_blocks = (int64_t)bx * by;
  const int32_t SEL_HIST_FIRST = num_selectors;
  const int32_t SEL_RLE_SYM = hist_size + SEL_HIST_FIRST;

  std::vector<int32_t> pred_bits_row(bx, 0);
  std::vector<int32_t> up_e(2 * bx, 0);

  int64_t cur_selector_rle_count = 0;
  uint32_t cur_pred_bits = 0;
  int32_t prev_endpoint_pred_sym = 0;
  int64_t endpoint_pred_repeat_count = 0;
  int32_t prev_endpoint_index = 0;

  for (int yy = 0; yy < by; yy++) {
    int cur_row = yy & 1;
    for (int xx = 0; xx < bx; xx++) {
      if (!(xx & 1)) {
        if (!(yy & 1)) {
          if (endpoint_pred_repeat_count) {
            endpoint_pred_repeat_count--;
            cur_pred_bits = prev_endpoint_pred_sym;
          } else {
            int sym = pred_t.decode(r);
            if (sym < 0) return -1;
            if (sym == (int)ENDPOINT_PRED_REPEAT_LAST_SYMBOL) {
              endpoint_pred_repeat_count =
                  (int64_t)r.decode_vlc(ENDPOINT_PRED_COUNT_VLC_BITS) +
                  ENDPOINT_PRED_MIN_REPEAT_COUNT - 1;
              cur_pred_bits = prev_endpoint_pred_sym;
            } else {
              cur_pred_bits = sym;
              prev_endpoint_pred_sym = sym;
            }
          }
          pred_bits_row[xx] = cur_pred_bits >> 4;
        } else {
          cur_pred_bits = pred_bits_row[xx];
        }
      }
      uint32_t pr = cur_pred_bits & 3;
      cur_pred_bits >>= 2;

      int32_t e, s = 0;
      bool sel_from_cr = false;
      if (pr == 0) {
        if (!xx) return -2;
        e = prev_endpoint_index;
      } else if (pr == 1) {
        if (!yy) return -3;
        e = up_e[(cur_row ^ 1) * bx + xx];
      } else if (pr == 2) {
        if (is_video) {
          e = prev_e[(int64_t)yy * bx + xx];
          s = prev_s[(int64_t)yy * bx + xx];
          sel_from_cr = true;
        } else {
          if (!xx || !yy) return -4;
          e = up_e[(cur_row ^ 1) * bx + xx - 1];
        }
      } else {
        int d = delta_t.decode(r);
        if (d < 0) return -5;
        e = d + prev_endpoint_index;
        if (e >= num_endpoints) e -= num_endpoints;
      }
      up_e[cur_row * bx + xx] = e;
      prev_endpoint_index = e;

      if (!sel_from_cr) {
        int sel_sym_v;
        if (cur_selector_rle_count > 0) {
          cur_selector_rle_count--;
          sel_sym_v = num_selectors;
        } else {
          sel_sym_v = sel_t.decode(r);
          if (sel_sym_v < 0) return -6;
          if (sel_sym_v == SEL_RLE_SYM) {
            int run_sym = rle_t.decode(r);
            if (run_sym < 0) return -7;
            if (run_sym == (int)(SELECTOR_HISTORY_BUF_RLE_COUNT_TOTAL - 1))
              cur_selector_rle_count =
                  (int64_t)r.decode_vlc(7) + SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH;
            else
              cur_selector_rle_count = run_sym + SELECTOR_HISTORY_BUF_RLE_COUNT_THRESH;
            if (cur_selector_rle_count > total_blocks) return -8;
            sel_sym_v = num_selectors;
            cur_selector_rle_count--;
          }
        }
        if (sel_sym_v >= num_selectors) {
          int hidx = sel_sym_v - num_selectors;
          if (hidx >= hist_size) return -9;
          s = hist_buf[hidx];
          if (hidx) hist_use(hidx);
        } else {
          s = sel_sym_v;
          hist_add(s);
        }
      }
      if (e >= num_endpoints || s >= num_selectors) return -10;
      out_e[(int64_t)yy * bx + xx] = e;
      out_s[(int64_t)yy * bx + xx] = s;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Canonical Huffman build + table serialization (see entropy/huffman.py for
// the commented reference implementation and format citations).

namespace {

// Moffat in-place code length computation over ascending-sorted freqs.
void moffat_depths(std::vector<int64_t>& a) {
  int n = (int)a.size();
  int leaf = 0, root = 0;
  for (int nxt = 0; nxt < n - 1; nxt++) {
    for (int child = 0; child < 2; child++) {
      int64_t val;
      if (leaf >= n || (root < nxt && a[root] < a[leaf])) {
        val = a[root];
        a[root] = nxt;
        root++;
      } else {
        val = a[leaf];
        leaf++;
      }
      if (child == 0) a[nxt] = val; else a[nxt] += val;
    }
  }
  a[n - 2] = 0;
  for (int nxt = n - 3; nxt >= 0; nxt--) a[nxt] = a[(int)a[nxt]] + 1;
  int avail = 1, used = 0, depth = 0;
  int nxt = n - 1, root2 = n - 2;
  while (avail > 0) {
    while (root2 >= 0 && a[root2] == depth) { used++; root2--; }
    while (avail > used) { a[nxt] = depth; nxt--; avail--; }
    avail = 2 * used;
    depth++;
    used = 0;
  }
}

// code lengths for an arbitrary frequency array (0 = unused), depth-limited.
void compute_code_lengths(const int64_t* freqs, int n, int max_len,
                          uint8_t* lengths) {
  memset(lengths, 0, n);
  std::vector<int> used;
  for (int i = 0; i < n; i++)
    if (freqs[i] > 0) used.push_back(i);
  if (used.empty()) return;
  if (used.size() == 1) { lengths[used[0]] = 1; return; }
  std::vector<int> order(used.size());
  for (size_t i = 0; i < used.size(); i++) order[i] = (int)i;
  std::stable_sort(order.begin(), order.end(), [&](int x, int y) {
    return freqs[used[x]] < freqs[used[y]];
  });
  int shift = 0;
  std::vector<int64_t> depths;
  for (;;) {
    depths.assign(used.size(), 0);
    for (size_t i = 0; i < used.size(); i++) {
      int64_t f = freqs[used[order[i]]] >> shift;
      depths[i] = f < 1 ? 1 : f;
    }
    moffat_depths(depths);
    if (depths[0] <= max_len) break;
    shift += 2;
  }
  for (size_t i = 0; i < used.size(); i++)
    lengths[used[order[i]]] = (uint8_t)depths[i];
}

void assign_canonical_codes(const uint8_t* lengths, int n, uint32_t* codes) {
  int max_l = 0;
  for (int i = 0; i < n; i++) max_l = std::max(max_l, (int)lengths[i]);
  std::vector<uint32_t> counts(max_l + 2, 0), next_code(max_l + 2, 0);
  for (int i = 0; i < n; i++) counts[lengths[i]]++;
  uint32_t total = 0;
  for (int i = 1; i <= max_l; i++) {
    total = (total + counts[i]) << 1;
    next_code[i + 1] = total;
  }
  std::vector<uint32_t> nc(next_code);
  for (int sym = 0; sym < n; sym++) {
    int l = lengths[sym];
    codes[sym] = 0;
    if (!l) continue;
    uint32_t c = nc[l]++;
    uint32_t rc = 0;
    for (int k = 0; k < l; k++) { rc = (rc << 1) | (c & 1); c >>= 1; }
    codes[sym] = rc;
  }
}

constexpr int kSortedCLC[21] = {17, 18, 19, 20, 0, 8, 7, 9, 6, 10,
                                5, 11, 4, 12, 3, 13, 2, 14, 1, 15, 16};

}  // namespace

extern "C" {

// Build code lengths + canonical codes + the serialized table bitstream.
// Returns the number of BITS written into out_table (capacity in bytes), or
// -1 on overflow. Out lengths/codes sized n.
int64_t huffman_build(const int64_t* freqs, int32_t n, int32_t max_len,
                      uint8_t* out_lengths, uint32_t* out_codes,
                      uint8_t* out_table, int64_t out_capacity_bytes) {
  compute_code_lengths(freqs, n, max_len, out_lengths);
  assign_canonical_codes(out_lengths, n, out_codes);

  std::vector<uint8_t> buf;
  BitWriter w;
  w.buf = &buf;
  int64_t bits_written = 0;
  auto put = [&](uint32_t v, uint32_t nb) { w.put(v, nb); bits_written += nb; };

  int total_used = 0;
  for (int i = 0; i < n; i++)
    if (out_lengths[i]) total_used = i + 1;
  put(total_used, 14);
  if (total_used) {
    // RLE the code sizes
    struct Op { int code, extra, extra_bits; };
    std::vector<Op> rle;
    int i = 0;
    while (i < total_used) {
      int v = out_lengths[i];
      int run = 1;
      while (i + run < total_used && out_lengths[i + run] == v) run++;
      if (v == 0) {
        int r = run;
        while (r >= 3) {
          if (r >= 11) { int take = std::min(r, 138); rle.push_back({18, take - 11, 7}); r -= take; }
          else { int take = std::min(r, 10); rle.push_back({17, take - 3, 3}); r -= take; }
        }
        for (int k = 0; k < r; k++) rle.push_back({0, 0, 0});
      } else {
        rle.push_back({v, 0, 0});
        int r = run - 1;
        while (r >= 3) {
          if (r >= 7) { int take = std::min(r, 134); rle.push_back({20, take - 7, 7}); r -= take; }
          else { int take = std::min(r, 6); rle.push_back({19, take - 3, 2}); r -= take; }
        }
        for (int k = 0; k < r; k++) rle.push_back({v, 0, 0});
      }
      i += run;
    }
    int64_t clc_freq[21] = {0};
    for (auto& op : rle) clc_freq[op.code]++;
    uint8_t clc_len[21];
    uint32_t clc_code[21];
    compute_code_lengths(clc_freq, 21, 7, clc_len);
    assign_canonical_codes(clc_len, 21, clc_code);
    int num_clc = 21;
    while (num_clc > 1 && clc_len[kSortedCLC[num_clc - 1]] == 0) num_clc--;
    put(num_clc, 5);
    for (int k = 0; k < num_clc; k++) put(clc_len[kSortedCLC[k]], 3);
    for (auto& op : rle) {
      put(clc_code[op.code], clc_len[op.code]);
      if (op.extra_bits) put(op.extra, op.extra_bits);
    }
  }
  w.flush();
  if ((int64_t)buf.size() > out_capacity_bytes) return -1;
  memcpy(out_table, buf.data(), buf.size());
  return bits_written;
}

}  // extern "C"

// Greedy nearest-neighbor chain over a dense (n x n) uint8 distance matrix.
// Writes the visit order into out (starting from node 0).
void greedy_chain_order(const uint8_t* dist, int32_t n, int32_t* out) {
  std::vector<uint8_t> placed(n, 0);
  int cur = 0;
  placed[0] = 1;
  out[0] = 0;
  for (int k = 1; k < n; k++) {
    const uint8_t* row = dist + (size_t)cur * n;
    int best = -1, best_d = 256;
    for (int j = 0; j < n; j++) {
      if (!placed[j] && row[j] < best_d) {
        best_d = row[j];
        best = j;
      }
    }
    placed[best] = 1;
    out[k] = best;
    cur = best;
  }
}

// Greedy chain where node distance = number of differing bytes between the
// packed uint32 keys (computed on the fly; avoids the n x n matrix).
// The unplaced set is kept compacted (swap-remove) so each step scans only
// the remaining entries, branchlessly; d<=1 accepts immediately (the chain
// is a compression heuristic — a 1-byte-diff neighbor is already optimal or
// within one byte of it, and the early-out halves the scan on real images).
void selector_chain_order(const uint32_t* keys, int32_t n, int32_t* out) {
  std::vector<uint32_t> rem_key(keys, keys + n);
  std::vector<int32_t> rem_idx(n);
  for (int j = 0; j < n; j++) rem_idx[j] = j;
  // start at entry 0
  int m = n;
  uint32_t a = rem_key[0];
  out[0] = 0;
  rem_key[0] = rem_key[m - 1];
  rem_idx[0] = rem_idx[m - 1];
  m--;
  rem_key.resize((size_t)n + 8, 0xFFFFFFFFu);  // vector-tail padding
  for (int k = 1; k < n; k++) {
    int best = 0, best_d = 256;
#if defined(__AVX2__)
    const __m256i va = _mm256_set1_epi32((int)a);
    const __m256i vz = _mm256_setzero_si256();
    for (int j = 0; j < m; j += 8) {
      __m256i vk = _mm256_loadu_si256((const __m256i*)&rem_key[j]);
      __m256i vx = _mm256_xor_si256(vk, va);
      // 32-bit lane nibble of the byte-equality mask → byte-mismatch count
      uint32_t mz = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(vx, vz));
      int lim = m - j < 8 ? m - j : 8;
      // scalar unpack preserves the original first-d<=1 early-exit order
      // (byte-identical chain output to the non-SIMD path)
      for (int c = 0; c < lim; c++) {
        int d = 4 - __builtin_popcount((mz >> (4 * c)) & 0xF);
        if (d < best_d) {
          best_d = d;
          best = j + c;
          if (d <= 1) break;
        }
      }
      if (best_d <= 1) break;
    }
#else
    for (int j = 0; j < m; j++) {
      uint32_t x = a ^ rem_key[j];
      int d = ((x & 0xFFu) != 0) + ((x & 0xFF00u) != 0) +
              ((x & 0xFF0000u) != 0) + ((x >> 24) != 0);
      if (d < best_d) {
        best_d = d;
        best = j;
        if (d <= 1) break;
      }
    }
#endif
    out[k] = rem_idx[best];
    a = rem_key[best];
    rem_key[best] = rem_key[m - 1];
    rem_idx[best] = rem_idx[m - 1];
    rem_key[m - 1] = 0xFFFFFFFFu;
    m--;
  }
}

// Greedy usage-locality ordering for the endpoint palette
// (palette_index_reorderer analog): repeatedly pick the unplaced entry with
// the highest co-occurrence affinity to the chain tail.
// pairs: (m x 3) int64 rows [i, j, count]; usage: per-entry block counts.
void cooccurrence_order(const int64_t* pairs, int64_t num_pairs,
                        const int64_t* usage, int32_t n, int32_t* out) {
  // adjacency in CSR form
  std::vector<int32_t> deg(n + 1, 0);
  for (int64_t p = 0; p < num_pairs; p++) {
    deg[(int32_t)pairs[p * 3 + 0] + 1]++;
    deg[(int32_t)pairs[p * 3 + 1] + 1]++;
  }
  for (int i = 0; i < n; i++) deg[i + 1] += deg[i];
  std::vector<int32_t> nbr(deg[n]);
  std::vector<int64_t> wgt(deg[n]);
  std::vector<int32_t> fill(deg.begin(), deg.end() - 1);
  for (int64_t p = 0; p < num_pairs; p++) {
    int32_t i = (int32_t)pairs[p * 3 + 0];
    int32_t j = (int32_t)pairs[p * 3 + 1];
    int64_t c = pairs[p * 3 + 2];
    nbr[fill[i]] = j; wgt[fill[i]++] = c;
    nbr[fill[j]] = i; wgt[fill[j]++] = c;
  }
  std::vector<uint8_t> placed(n, 0);
  std::vector<int64_t> affinity(n, 0);
  // lazy max-heap of (affinity, node): stale entries are skipped on pop —
  // O(E log E) total instead of the O(n^2) per-step argmax scan
  std::priority_queue<std::pair<int64_t, int32_t>> heap;
  // usage fallback order, descending
  std::vector<int32_t> by_usage(n);
  for (int i = 0; i < n; i++) by_usage[i] = i;
  std::sort(by_usage.begin(), by_usage.end(),
            [&](int a, int b) { return usage[a] > usage[b]; });
  size_t usage_pos = 0;

  int cur = by_usage[0];
  placed[cur] = 1;
  out[0] = cur;
  for (int k = 1; k < n; k++) {
    for (int32_t e = deg[cur]; e < deg[cur + 1]; e++) {
      int32_t j = nbr[e];
      if (!placed[j]) {
        affinity[j] += wgt[e];
        heap.push({affinity[j], j});
      }
    }
    int best = -1;
    while (!heap.empty()) {
      auto [a, j] = heap.top();
      if (placed[j] || affinity[j] != a) { heap.pop(); continue; }
      best = j;
      heap.pop();
      break;
    }
    if (best < 0) {
      while (placed[by_usage[usage_pos]]) usage_pos++;
      best = by_usage[usage_pos];
    }
    placed[best] = 1;
    affinity[best] = 0;
    out[k] = best;
    cur = best;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// OpenEXR PIZ 16-bit Huffman decode (parity: tinyexr.h hufUncompress:3110,
// hufUnpackEncTable:2603, hufCanonicalCodeTable:2490, hufDecode:2935).
// The Python fallback lives in utils/image_io.py (_huf_uncompress).
// ---------------------------------------------------------------------------

namespace {

constexpr int kHufEncSize = 65537;
constexpr int kHufDecBits = 14;
constexpr int kHufDecMask = (1 << kHufDecBits) - 1;

struct HufDecEntry {
    int32_t len = 0;
    int32_t lit = 0;
    std::vector<int32_t> longs;
};

}  // namespace

extern "C" int32_t exr_huf_decode(const uint8_t* data, int64_t n_in,
                                  uint16_t* out, int64_t n_out) {
    if (n_in < 20) return -1;
    auto rd32 = [&](int64_t o) {
        return (uint32_t)data[o] | ((uint32_t)data[o + 1] << 8) |
               ((uint32_t)data[o + 2] << 16) | ((uint32_t)data[o + 3] << 24);
    };
    const int im0 = (int)rd32(0);
    const int iM = (int)rd32(4);
    const int64_t nbits = (int64_t)rd32(12);
    if (im0 < 0 || im0 >= kHufEncSize || iM < 0 || iM >= kHufEncSize)
        return -2;
    int64_t pos = 20;

    std::vector<int32_t> lengths(kHufEncSize, 0);
    {
        uint64_t c = 0;
        int lc = 0;
        int i = im0;
        while (i <= iM) {
            if (pos >= n_in) return -3;
            while (lc < 6) { c = (c << 8) | data[pos++]; lc += 8; }
            lc -= 6;
            int l = (int)((c >> lc) & 63);
            if (l == 63) {
                while (lc < 8) {
                    if (pos >= n_in) return -3;
                    c = (c << 8) | data[pos++];
                    lc += 8;
                }
                lc -= 8;
                i += (int)((c >> lc) & 255) + 6;
            } else if (l >= 59) {
                i += l - 59 + 2;
            } else {
                lengths[i++] = l;
            }
        }
    }

    // canonical codes
    int64_t n[59] = {0};
    for (int i = 0; i < kHufEncSize; i++) n[lengths[i]]++;
    int64_t base[59] = {0};
    {
        int64_t c = 0;
        for (int l = 58; l > 0; l--) {
            int64_t nc = (c + n[l]) >> 1;
            base[l] = c;
            c = nc;
        }
    }
    std::vector<int64_t> codes(kHufEncSize, 0);
    {
        int64_t next_code[59];
        std::copy(base, base + 59, next_code);
        for (int i = 0; i < kHufEncSize; i++)
            if (lengths[i] > 0) codes[i] = next_code[lengths[i]]++;
    }

    // decode tables
    std::vector<HufDecEntry> tbl(1 << kHufDecBits);
    for (int s = 0; s < kHufEncSize; s++) {
        int l = lengths[s];
        if (!l) continue;
        if (l <= kHufDecBits) {
            int64_t start = codes[s] << (kHufDecBits - l);
            int64_t cnt = (int64_t)1 << (kHufDecBits - l);
            for (int64_t k = 0; k < cnt; k++) {
                tbl[start + k].len = l;
                tbl[start + k].lit = s;
            }
        } else {
            tbl[codes[s] >> (l - kHufDecBits)].longs.push_back(s);
        }
    }

    const int rlc = iM;
    int64_t oi = 0;
    uint64_t c = 0;
    int lc = 0;
    const int64_t ie = pos + (nbits + 7) / 8;
    if (ie > n_in) return -4;

    auto emit = [&](int sym) -> bool {
        if (sym == rlc) {
            if (lc < 8) {
                if (pos >= ie) return false;
                c = (c << 8) | data[pos++];
                lc += 8;
            }
            lc -= 8;
            int cs = (int)((c >> lc) & 255);
            if (oi == 0 || oi + cs > n_out) return false;
            uint16_t prev = out[oi - 1];
            while (cs-- > 0) out[oi++] = prev;
        } else {
            if (oi >= n_out) return false;
            out[oi++] = (uint16_t)sym;
        }
        return true;
    };

    while (pos < ie) {
        c = (c << 8) | data[pos++];
        lc += 8;
        while (lc >= kHufDecBits) {
            const HufDecEntry& pl = tbl[(c >> (lc - kHufDecBits)) & kHufDecMask];
            if (pl.len) {
                lc -= pl.len;
                if (!emit(pl.lit)) return -5;
            } else {
                bool found = false;
                for (int32_t s : pl.longs) {
                    int l = lengths[s];
                    while (lc < l && pos < ie) {
                        c = (c << 8) | data[pos++];
                        lc += 8;
                    }
                    if (lc >= l &&
                        codes[s] == (int64_t)((c >> (lc - l)) &
                                              (((uint64_t)1 << l) - 1))) {
                        lc -= l;
                        if (!emit(s)) return -5;
                        found = true;
                        break;
                    }
                }
                if (!found) return -6;
            }
        }
    }

    int i = (int)((8 - nbits) & 7);
    c >>= i;
    lc -= i;
    while (lc > 0) {
        const HufDecEntry& pl = tbl[(c << (kHufDecBits - lc)) & kHufDecMask];
        if (pl.len && pl.len <= lc) {
            lc -= pl.len;
            if (!emit(pl.lit)) return -5;
        } else {
            break;
        }
    }
    return (int32_t)(oi == n_out ? 0 : 1);
}
