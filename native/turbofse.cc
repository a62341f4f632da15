// TurboRANS native host codec — C++ implementation of the TPU-native
// lane-interleaved rANS group format (see finitestateentropy_tpu/turbo/rans.py
// for the format spec and the bit-exact numpy twin this mirrors).
//
// This is the framework's fast host path: same wire bytes as the Pallas
// kernels and the numpy twin, at native speed, used by the CLI when no TPU
// is attached and by the frame assembler.  Normalization follows the
// reference algorithm (fse_compress.c:316-494 semantics) so tables — and
// hence ratios — match the TPU path exactly.
//
// Exported C ABI (ctypes):
//   int64 tfse_rans_compress_group(src, n, dst, cap)        -> blob size | -1
//   int64 tfse_rans_decompress_group(blob, len, dst, cap, *consumed) -> n | -err
//   int64 tfse_rans_compress(src, n, group, dst, cap, nthreads)  -> size | -err
//   int64 tfse_rans_decompress(blob, len, dst, cap, nthreads)    -> n | -err
//   int64 tfse_version()

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

constexpr int kLanes = 1024;
constexpr int kStepSyms = 4096;      // 4 bytes per lane slot per supercycle
constexpr int kTableLog = 11;      // the native ENCODER's tableLog
constexpr int kMaxTableLog = 13;   // decoder accepts any wire tableLog
constexpr uint32_t kMagic = 0x183EF002u;
constexpr uint32_t kL = 1u << 16;    // rANS lower bound
constexpr int kMinTableLog = 5;
constexpr int kFlagRaw = 1;
constexpr int kFlagRle = 2;
constexpr int kFlagStepTots = 4;  // v2: shipped per-step per-row counts
constexpr int kFlagTotals = 8;    // v3: shipped per-step totals (1 u16)
constexpr int kFlagRows4 = 16;    // r3: nibble-packed rows + escape table
                                  // (u32 n_exc | 4B/exc | steps*4 nibbles)

inline int highbit32(uint32_t v) {
  return 31 - __builtin_clz(v);
}

// A preceding RAW group of odd length leaves the next group at an odd
// offset, so payload halfwords may be misaligned; memcpy-based loads keep
// this well-defined on strict-alignment targets (compiles to a plain load
// where unaligned access is legal).
inline uint32_t load_le32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (build.sh targets x86-64)
}

inline uint16_t load_le16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

// 4 interleaved count tables break the store-to-load dependence (the
// reference's HIST_count_parallel_wksp trick, hist.c:58-133)
void histogram(const uint8_t* src, uint64_t n, uint32_t* count) {
  uint32_t c0[256] = {0}, c1[256] = {0}, c2[256] = {0}, c3[256] = {0};
  uint64_t i = 0;
  for (; i + 4 <= n; i += 4) {
    ++c0[src[i]];
    ++c1[src[i + 1]];
    ++c2[src[i + 2]];
    ++c3[src[i + 3]];
  }
  for (; i < n; ++i) ++c0[src[i]];
  for (int s = 0; s < 256; ++s) count[s] = c0[s] + c1[s] + c2[s] + c3[s];
}

// ---------------------------------------------------------------------------
// Normalization (reference-exact; see refimpl/norm.py)
// ---------------------------------------------------------------------------

const uint64_t kRtb[8] = {0, 473195, 504333, 520860, 550000, 700000, 750000, 830000};

bool normalize_m2(int16_t* norm, int table_log, const uint32_t* count,
                  uint64_t total, int max_sv) {
  const int16_t kNotYet = -2;
  int distributed = 0;
  uint64_t low_threshold = total >> table_log;
  uint64_t low_one = (total * 3) >> (table_log + 1);

  for (int s = 0; s <= max_sv; ++s) {
    uint64_t c = count[s];
    if (c == 0) { norm[s] = 0; continue; }
    if (c <= low_threshold) { norm[s] = -1; ++distributed; total -= c; continue; }
    if (c <= low_one) { norm[s] = 1; ++distributed; total -= c; continue; }
    norm[s] = kNotYet;
  }
  int64_t to_distribute = (int64_t(1) << table_log) - distributed;
  if (to_distribute == 0) return true;

  if (to_distribute && (total / to_distribute) > low_one) {
    low_one = (total * 3) / (uint64_t(to_distribute) * 2);
    for (int s = 0; s <= max_sv; ++s) {
      if (norm[s] == kNotYet && count[s] <= low_one) {
        norm[s] = 1; ++distributed; total -= count[s];
      }
    }
    to_distribute = (int64_t(1) << table_log) - distributed;
  }

  if (distributed == max_sv + 1) {
    int max_v = 0; uint32_t max_c = 0;
    for (int s = 0; s <= max_sv; ++s)
      if (count[s] > max_c) { max_v = s; max_c = count[s]; }
    norm[max_v] = int16_t(norm[max_v] + to_distribute);
    return true;
  }

  if (total == 0) {
    for (int s = 0; to_distribute > 0; s = (s + 1) % (max_sv + 1))
      if (norm[s] > 0) { --to_distribute; ++norm[s]; }
    return true;
  }

  int v_step_log = 62 - table_log;
  uint64_t mid = (uint64_t(1) << (v_step_log - 1)) - 1;
  uint64_t r_step = ((uint64_t(1) << v_step_log) * uint64_t(to_distribute) + mid) / total;
  uint64_t tmp_total = mid;
  for (int s = 0; s <= max_sv; ++s) {
    if (norm[s] == kNotYet) {
      uint64_t end = tmp_total + count[s] * r_step;
      int64_t weight = int64_t(end >> v_step_log) - int64_t(tmp_total >> v_step_log);
      if (weight < 1) return false;
      norm[s] = int16_t(weight);
      tmp_total = end;
    }
  }
  return true;
}

int fse_min_table_log(uint64_t src_size, int max_sv) {
  int min_bits_src = highbit32(uint32_t(src_size)) + 1;
  int min_bits_symbols = highbit32(uint32_t(max_sv)) + 2;
  return min_bits_src < min_bits_symbols ? min_bits_src : min_bits_symbols;
}

// returns table_log actually used, or -1 on failure / RLE
int normalize_count(int16_t* norm, int table_log, const uint32_t* count,
                    uint64_t total, int max_sv) {
  if (table_log < fse_min_table_log(total, max_sv))
    return -1;  // caller lowers expectations (never hit for group inputs)
  int scale = 62 - table_log;
  uint64_t step = (uint64_t(1) << 62) / total;
  uint64_t v_step = uint64_t(1) << (scale - 20);
  int64_t still = int64_t(1) << table_log;
  int largest = 0;
  int16_t largest_p = 0;
  uint64_t low_threshold = total >> table_log;

  for (int s = 0; s <= max_sv; ++s) {
    uint64_t c = count[s];
    if (c == total) return -2;  // RLE
    if (c == 0) { norm[s] = 0; continue; }
    if (c <= low_threshold) { norm[s] = -1; --still; continue; }
    int16_t proba = int16_t((c * step) >> scale);
    if (proba < 8) {
      uint64_t rest_to_beat = v_step * kRtb[proba];
      if (c * step - (uint64_t(proba) << scale) > rest_to_beat) ++proba;
    }
    if (proba > largest_p) { largest_p = proba; largest = s; }
    norm[s] = proba;
    still -= proba;
  }
  if (-still >= (norm[largest] >> 1)) {
    if (!normalize_m2(norm, table_log, count, total, max_sv)) return -1;
  } else {
    norm[largest] = int16_t(norm[largest] + still);
  }
  return table_log;
}

// ---------------------------------------------------------------------------
// NCount serialization (see refimpl/ncount.py)
// ---------------------------------------------------------------------------

int write_ncount(uint8_t* out, int cap, const int16_t* norm, int max_sv,
                 int table_log) {
  int pos = 0;
  uint32_t bit_stream = 0;
  int bit_count = 0;
  int symbol = 0;
  const int alphabet = max_sv + 1;
  bool previous_is0 = false;
  const int table_size = 1 << table_log;

  bit_stream += uint32_t(table_log - kMinTableLog) << bit_count;
  bit_count += 4;
  int remaining = table_size + 1;
  int threshold = table_size;
  int nb_bits = table_log + 1;

  auto flush16 = [&]() {
    if (pos + 2 > cap) return false;
    out[pos++] = uint8_t(bit_stream);
    out[pos++] = uint8_t(bit_stream >> 8);
    bit_stream >>= 16;
    return true;
  };

  while (symbol < alphabet && remaining > 1) {
    if (previous_is0) {
      int start = symbol;
      while (symbol < alphabet && !norm[symbol]) ++symbol;
      if (symbol == alphabet) break;
      while (symbol >= start + 24) {
        start += 24;
        bit_stream += 0xFFFFu << bit_count;
        if (!flush16()) return -1;
      }
      while (symbol >= start + 3) {
        start += 3;
        bit_stream += 3u << bit_count;
        bit_count += 2;
      }
      bit_stream += uint32_t(symbol - start) << bit_count;
      bit_count += 2;
      if (bit_count > 16) {
        if (!flush16()) return -1;
        bit_count -= 16;
      }
    }
    int count = norm[symbol++];
    int maxv = (2 * threshold - 1) - remaining;
    remaining -= count < 0 ? -count : count;
    ++count;  // -1 becomes 0
    if (count >= threshold) count += maxv;
    bit_stream += uint32_t(count) << bit_count;
    bit_count += nb_bits;
    if (count < maxv) --bit_count;
    previous_is0 = (count == 1);
    if (remaining < 1) return -1;
    while (remaining < threshold) { --nb_bits; threshold >>= 1; }
    if (bit_count > 16) {
      if (!flush16()) return -1;
      bit_count -= 16;
    }
  }
  if (remaining != 1) return -1;
  if (pos + 2 > cap) return -1;
  out[pos++] = uint8_t(bit_stream);
  out[pos++] = uint8_t(bit_stream >> 8);
  return pos - 2 + (bit_count + 7) / 8;
}

// reader (see refimpl/ncount.py / entropy_common.c semantics; needs
// look-ahead slack behind the ncount bytes, which the group layout provides)
int read_ncount(int16_t* norm, int* max_sv_out, int* table_log_out,
                const uint8_t* data, int hb_size, int max_sv_limit) {
  if (hb_size < 4) return -1;
  auto le32 = [&](int p) {
    uint32_t v = 0;
    for (int i = 0; i < 4 && p + i < hb_size; ++i) v |= uint32_t(data[p + i]) << (8 * i);
    return v;
  };
  int ip = 0;
  const int iend = hb_size;
  uint32_t bit_stream = le32(0);
  int nb_bits = int(bit_stream & 0xF) + kMinTableLog;
  if (nb_bits > 15) return -1;
  bit_stream >>= 4;
  int bit_count = 4;
  *table_log_out = nb_bits;
  int remaining = (1 << nb_bits) + 1;
  int threshold = 1 << nb_bits;
  ++nb_bits;
  int charnum = 0;
  bool previous0 = false;

  while (remaining > 1 && charnum <= max_sv_limit) {
    if (previous0) {
      int n0 = charnum;
      while ((bit_stream & 0xFFFF) == 0xFFFF) {
        n0 += 24;
        if (ip < iend - 5) { ip += 2; bit_stream = le32(ip) >> bit_count; }
        else { bit_stream >>= 16; bit_count += 16; }
      }
      while ((bit_stream & 3) == 3) { n0 += 3; bit_stream >>= 2; bit_count += 2; }
      n0 += bit_stream & 3;
      bit_count += 2;
      if (n0 > max_sv_limit) return -1;
      while (charnum < n0) norm[charnum++] = 0;
      if (ip <= iend - 7 || ip + (bit_count >> 3) <= iend - 4) {
        ip += bit_count >> 3;
        bit_count &= 7;
        bit_stream = le32(ip) >> bit_count;
      } else {
        bit_stream >>= 2;
      }
    }
    int maxv = (2 * threshold - 1) - remaining;
    int count;
    if (int(bit_stream & (threshold - 1)) < maxv) {
      count = int(bit_stream & (threshold - 1));
      bit_count += nb_bits - 1;
    } else {
      count = int(bit_stream & (2 * threshold - 1));
      if (count >= threshold) count -= maxv;
      bit_count += nb_bits;
    }
    --count;
    remaining -= count < 0 ? -count : count;
    norm[charnum++] = int16_t(count);
    previous0 = (count == 0);
    while (remaining < threshold) { --nb_bits; threshold >>= 1; }
    if (ip <= iend - 7 || ip + (bit_count >> 3) <= iend - 4) {
      ip += bit_count >> 3;
      bit_count &= 7;
    } else {
      bit_count -= 8 * (iend - 4 - ip);
      ip = iend - 4;
    }
    bit_stream = le32(ip) >> (bit_count & 31);
  }
  if (remaining != 1 || bit_count > 32) return -1;
  *max_sv_out = charnum - 1;
  return ip + ((bit_count + 7) >> 3);
}

// ---------------------------------------------------------------------------
// AVX2 lane kernels.  The 1024-lane interleaved format was designed for
// vector machines; on the host the same structure maps onto 8-lane ymm
// blocks: the state advance/table lookup is data-parallel across lanes and
// only the halfword cursor is serial, which collapses to a per-step rank
// (prefix popcount of the renorm flags) exactly like the Pallas kernels'
// matmul prefix (rans_kernels.py).  Same wire bytes as the scalar path.
// ---------------------------------------------------------------------------

#if defined(__AVX2__)

// inclusive prefix popcount per lane of an 8-bit mask
struct PrefixLut {
  alignas(64) uint8_t t[256][8];
  PrefixLut() {
    for (int m = 0; m < 256; ++m) {
      int r = 0;
      for (int j = 0; j < 8; ++j) {
        r += (m >> j) & 1;
        t[m][j] = uint8_t(r);
      }
    }
  }
};
const PrefixLut g_prefix;

// pshufb control compacting the flagged lanes' u16s to the front in
// DESCENDING lane order (the wire's within-step emission order)
struct CompactLut {
  alignas(64) uint8_t t[256][16];
  CompactLut() {
    for (int m = 0; m < 256; ++m) {
      int o = 0;
      for (int j = 7; j >= 0; --j)
        if ((m >> j) & 1) {
          t[m][o++] = uint8_t(2 * j);
          t[m][o++] = uint8_t(2 * j + 1);
        }
      for (; o < 16; ++o) t[m][o] = 0x80;
    }
  }
};
const CompactLut g_compact;

inline __m256i mulhi_epu32(__m256i a, __m256i b) {
  __m256i lo = _mm256_srli_epi64(_mm256_mul_epu32(a, b), 32);
  __m256i hi = _mm256_mul_epu32(_mm256_srli_epi64(a, 32),
                                _mm256_srli_epi64(b, 32));
  hi = _mm256_and_si256(hi, _mm256_set1_epi64x(int64_t(0xFFFFFFFF00000000ull)));
  return _mm256_or_si256(lo, hi);
}

inline __m256i cmpge_epu32(__m256i a, __m256i b) {  // (a >= b) ? -1 : 0
  const __m256i s = _mm256_set1_epi32(int32_t(0x80000000u));
  __m256i lt = _mm256_cmpgt_epi32(_mm256_xor_si256(b, s),
                                  _mm256_xor_si256(a, s));
  return _mm256_xor_si256(lt, _mm256_set1_epi32(-1));
}

// One decode step over all 1024 lanes.  syms: 1024 decoded bytes out.
// Returns the new cursor.  hw_s points at a scratch copy of the payload
// with >= 2 bytes of tail slack (gathers read 32 bits at 2*pos).
inline int64_t decode_step_avx2(uint32_t* x, const uint32_t* tbl, int tl,
                                const uint8_t* hw_s, int64_t csize,
                                int64_t cursor, uint8_t* syms) {
  const __m256i slot_mask = _mm256_set1_epi32((1 << tl) - 1);
  const __m256i ff = _mm256_set1_epi32(0xFFF);
  const __m256i czero = _mm256_setzero_si256();
  const __m256i csz = _mm256_set1_epi32(int32_t(csize));
  const __m256i pack_b0 = _mm256_setr_epi8(
      0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
      0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1);
  // pass 1: advance all lanes (pure ILP, no loop-carried scalar); the
  // renorm gathers run in pass 2 off precomputed cursor bases so their
  // addresses never wait on the previous block's popcount
  alignas(32) static thread_local uint8_t masks[kLanes / 8];
  int base[kLanes / 8 + 1];
  base[0] = 0;
  for (int b = 0; b < kLanes / 8; ++b) {
    __m256i xv = _mm256_load_si256((const __m256i*)(x + 8 * b));
    __m256i slot = _mm256_and_si256(xv, slot_mask);
    __m256i e = _mm256_i32gather_epi32((const int*)tbl, slot, 4);
    // pack e's low bytes (the symbols) into 8 contiguous bytes
    __m256i pb = _mm256_shuffle_epi8(e, pack_b0);
    *(uint32_t*)(syms + 8 * b) =
        uint32_t(_mm_cvtsi128_si32(_mm256_castsi256_si128(pb)));
    *(uint32_t*)(syms + 8 * b + 4) =
        uint32_t(_mm_cvtsi128_si32(_mm256_extracti128_si256(pb, 1)));
    __m256i f = _mm256_and_si256(_mm256_srli_epi32(e, 8), ff);
    __m256i xn = _mm256_add_epi32(
        _mm256_mullo_epi32(f, _mm256_srli_epi32(xv, tl)),
        _mm256_srli_epi32(e, 20));
    __m256i flag = _mm256_cmpeq_epi32(_mm256_srli_epi32(xn, 16), czero);
    uint8_t m = uint8_t(_mm256_movemask_ps(_mm256_castsi256_ps(flag)));
    masks[b] = m;
    base[b + 1] = base[b] + __builtin_popcount(m);
    _mm256_store_si256((__m256i*)(x + 8 * b), xn);
  }
  // pass 2: renorm only the blocks that need it
  for (int b = 0; b < kLanes / 8; ++b) {
    uint8_t m = masks[b];
    if (!m) continue;
    __m256i xn = _mm256_load_si256((const __m256i*)(x + 8 * b));
    __m256i flag = _mm256_cmpeq_epi32(_mm256_srli_epi32(xn, 16), czero);
    __m256i rank = _mm256_cvtepu8_epi32(
        _mm_loadl_epi64((const __m128i*)g_prefix.t[m]));
    __m256i pos = _mm256_sub_epi32(
        _mm256_set1_epi32(int32_t(cursor - base[b])), rank);
    __m256i oob = _mm256_or_si256(
        _mm256_cmpgt_epi32(czero, pos),
        _mm256_xor_si256(_mm256_cmpgt_epi32(csz, pos),
                         _mm256_set1_epi32(-1)));
    __m256i posc = _mm256_max_epi32(
        _mm256_min_epi32(pos, _mm256_sub_epi32(csz, _mm256_set1_epi32(1))),
        czero);
    __m256i v = _mm256_i32gather_epi32((const int*)hw_s, posc, 2);
    v = _mm256_andnot_si256(oob, _mm256_and_si256(v, _mm256_set1_epi32(0xFFFF)));
    _mm256_store_si256(
        (__m256i*)(x + 8 * b),
        _mm256_blendv_epi8(
            xn, _mm256_or_si256(_mm256_slli_epi32(xn, 16), v), flag));
  }
  return cursor - base[kLanes / 8];
}

// u16 decode step: split gathers (fe = (f<<16)|j advance word, sym32 =
// symbol plane) — the rest mirrors decode_step_avx2's two-pass shape
inline int64_t decode_step16_avx2(uint32_t* x, const uint32_t* fe_tbl,
                                  const uint32_t* sym_tbl, int tl,
                                  const uint8_t* hw_s, int64_t csize,
                                  int64_t cursor, uint16_t* syms) {
  const __m256i slot_mask = _mm256_set1_epi32((1 << tl) - 1);
  const __m256i low16 = _mm256_set1_epi32(0xFFFF);
  const __m256i czero = _mm256_setzero_si256();
  const __m256i csz = _mm256_set1_epi32(int32_t(csize));
  alignas(32) static thread_local uint8_t masks[kLanes / 8];
  int base[kLanes / 8 + 1];
  base[0] = 0;
  for (int b = 0; b < kLanes / 8; ++b) {
    __m256i xv = _mm256_load_si256((const __m256i*)(x + 8 * b));
    __m256i slot = _mm256_and_si256(xv, slot_mask);
    __m256i sym = _mm256_i32gather_epi32((const int*)sym_tbl, slot, 4);
    __m128i s16 = _mm_packus_epi32(_mm256_castsi256_si128(sym),
                                   _mm256_extracti128_si256(sym, 1));
    _mm_storeu_si128((__m128i*)(syms + 8 * b), s16);
    __m256i fe = _mm256_i32gather_epi32((const int*)fe_tbl, slot, 4);
    __m256i f = _mm256_srli_epi32(fe, 16);
    __m256i j = _mm256_and_si256(fe, low16);
    __m256i xn = _mm256_add_epi32(
        _mm256_mullo_epi32(f, _mm256_srli_epi32(xv, tl)), j);
    __m256i flag = _mm256_cmpeq_epi32(_mm256_srli_epi32(xn, 16), czero);
    uint8_t m = uint8_t(_mm256_movemask_ps(_mm256_castsi256_ps(flag)));
    masks[b] = m;
    base[b + 1] = base[b] + __builtin_popcount(m);
    _mm256_store_si256((__m256i*)(x + 8 * b), xn);
  }
  for (int b = 0; b < kLanes / 8; ++b) {
    uint8_t m = masks[b];
    if (!m) continue;
    __m256i xn = _mm256_load_si256((const __m256i*)(x + 8 * b));
    __m256i flag = _mm256_cmpeq_epi32(_mm256_srli_epi32(xn, 16), czero);
    __m256i rank = _mm256_cvtepu8_epi32(
        _mm_loadl_epi64((const __m128i*)g_prefix.t[m]));
    __m256i pos = _mm256_sub_epi32(
        _mm256_set1_epi32(int32_t(cursor - base[b])), rank);
    __m256i oob = _mm256_or_si256(
        _mm256_cmpgt_epi32(czero, pos),
        _mm256_xor_si256(_mm256_cmpgt_epi32(csz, pos),
                         _mm256_set1_epi32(-1)));
    __m256i posc = _mm256_max_epi32(
        _mm256_min_epi32(pos, _mm256_sub_epi32(csz, _mm256_set1_epi32(1))),
        czero);
    __m256i v = _mm256_i32gather_epi32((const int*)hw_s, posc, 2);
    v = _mm256_andnot_si256(oob, _mm256_and_si256(v, low16));
    _mm256_store_si256(
        (__m256i*)(x + 8 * b),
        _mm256_blendv_epi8(
            xn, _mm256_or_si256(_mm256_slli_epi32(xn, 16), v), flag));
  }
  return cursor - base[kLanes / 8];
}

// One encode step over all 1024 lanes.  words: the supercycle's 1024 src
// u32 words; p: byte position within the word.  Emits flagged lanes'
// halfwords in DESCENDING lane order at hw[pos...]; returns new pos.
inline uint64_t encode_step_avx2(uint32_t* x, const uint32_t* fc_tbl,
                                 const uint32_t* magic_tbl, int tl,
                                 const uint32_t* words, int p,
                                 uint16_t* hw, uint64_t pos, uint64_t hw_cap,
                                 bool* overflow,
                                 uint8_t* rowtots = nullptr) {
  // per-block emissions pre-compacted (descending lane order) in pass 1;
  // pass 2 stitches blocks high->low with unconditional 16-byte stores
  alignas(32) static thread_local uint16_t stage[kLanes];
  static thread_local uint8_t cnt[kLanes / 8];
  const __m256i bytemask = _mm256_set1_epi32(0xFF);
  const __m256i fmask = _mm256_set1_epi32(0xFFF);
  int shift = 8 * p;
  uint64_t total = 0;
  for (int b = 0; b < kLanes / 8; ++b) {
    __m256i wv = _mm256_loadu_si256((const __m256i*)(words + 8 * b));
    __m256i sym = _mm256_and_si256(_mm256_srli_epi32(wv, shift), bytemask);
    __m256i fce = _mm256_i32gather_epi32((const int*)fc_tbl, sym, 4);
    __m256i mg = _mm256_i32gather_epi32((const int*)magic_tbl, sym, 4);
    __m256i f = _mm256_and_si256(fce, fmask);
    __m256i c = _mm256_srli_epi32(fce, 12);
    __m256i xv = _mm256_load_si256((const __m256i*)(x + 8 * b));
    __m256i flag = cmpge_epu32(xv, _mm256_slli_epi32(f, 32 - tl));
    uint8_t m = uint8_t(_mm256_movemask_ps(_mm256_castsi256_ps(flag)));
    // compact this block's flagged low halves, descending lane order
    __m128i e16 = _mm_packus_epi32(
        _mm_and_si128(_mm256_castsi256_si128(xv), _mm_set1_epi32(0xFFFF)),
        _mm_and_si128(_mm256_extracti128_si256(xv, 1),
                      _mm_set1_epi32(0xFFFF)));
    _mm_storeu_si128(
        (__m128i*)(stage + 8 * b),
        _mm_shuffle_epi8(e16, _mm_load_si128((const __m128i*)g_compact.t[m])));
    cnt[b] = uint8_t(__builtin_popcount(m));
    total += cnt[b];
    if (rowtots) rowtots[b >> 4] = uint8_t(rowtots[b >> 4] + cnt[b]);
    xv = _mm256_blendv_epi8(xv, _mm256_srli_epi32(xv, 16), flag);
    __m256i q = mulhi_epu32(xv, mg);
    __m256i r = _mm256_sub_epi32(xv, _mm256_mullo_epi32(q, f));
    __m256i big = cmpge_epu32(r, f);
    q = _mm256_sub_epi32(q, big);                        // big is -1: ++q
    r = _mm256_sub_epi32(r, _mm256_and_si256(big, f));   // r -= f
    big = cmpge_epu32(r, f);
    q = _mm256_sub_epi32(q, big);
    r = _mm256_sub_epi32(r, _mm256_and_si256(big, f));
    _mm256_store_si256(
        (__m256i*)(x + 8 * b),
        _mm256_add_epi32(_mm256_add_epi32(_mm256_slli_epi32(q, tl), c), r));
  }
  if (pos + total + 8 > hw_cap) {  // +8: stitch stores write 16B blocks
    *overflow = true;
    return pos;
  }
  for (int b = kLanes / 8 - 1; b >= 0; --b) {
    _mm_storeu_si128((__m128i*)(hw + pos),
                     _mm_load_si128((const __m128i*)(stage + 8 * b)));
    pos += cnt[b];
  }
  return pos;
}

#endif  // __AVX2__

// ---------------------------------------------------------------------------
// Group codec
// ---------------------------------------------------------------------------

struct Header {
  uint32_t magic, n_sym, csize_hw;
  uint8_t table_log, flags;
  uint16_t ncount_len;
};

inline void put_header(uint8_t* p, const Header& h) {
  std::memcpy(p, &h.magic, 4);
  std::memcpy(p + 4, &h.n_sym, 4);
  std::memcpy(p + 8, &h.csize_hw, 4);
  p[12] = h.table_log;
  p[13] = h.flags;
  std::memcpy(p + 14, &h.ncount_len, 2);
}

inline Header get_header(const uint8_t* p) {
  Header h;
  std::memcpy(&h.magic, p, 4);
  std::memcpy(&h.n_sym, p + 4, 4);
  std::memcpy(&h.csize_hw, p + 8, 4);
  h.table_log = p[12];
  h.flags = p[13];
  std::memcpy(&h.ncount_len, p + 14, 2);
  return h;
}

// symbol of position i in (step, lane) order: i = 4*(t4*1024 + k) + p,
// handled by lane k at step 4*t4 + p; see format.py _lane_view
inline int sym_index(int t, int k) {
  int t4 = t >> 2, p = t & 3;
  return 4 * (t4 * kLanes + k) + p;
}

}  // namespace

extern "C" {

int64_t tfse_version() { return 4; }  // 4: +pair/quad decoder

// Group stats only (histogram + normalization + NCount) — the host-side
// prep for the TPU encode path.  meta = [max_sv, mfs, nc_len] out.
// Returns 1 ok, 0 RLE, -1 fallback (caller uses the python twin).
int64_t tfse_prep_group(const uint8_t* src, uint64_t n, int32_t tlog,
                        int16_t* norm_out, uint8_t* ncount_out,
                        int64_t* meta) {
  // encode-side prep caps at 12: the byte-path table packings use 12-bit
  // freq fields ((cumul<<12)|freq), so tableLog 13 would silently corrupt
  // frames; 13 stays legal for the u16 DECODER only (kMaxTableLog)
  if (n == 0 || tlog < kMinTableLog || tlog > 12) return -1;
  uint32_t count[256];
  histogram(src, n, count);
  int max_sv = 255;
  while (max_sv > 0 && count[max_sv] == 0) --max_sv;
  uint32_t max_count = 0;
  int mfs = 0;
  for (int s = 0; s <= max_sv; ++s)
    if (count[s] > max_count) { max_count = count[s]; mfs = s; }
  if (max_count == n) return 0;        // RLE
  if (max_count <= (n >> 7)) return 0;  // near-uniform -> raw
  int16_t norm[256];
  if (normalize_count(norm, tlog, count, n, max_sv) != tlog)
    return -1;
  int nc_len = write_ncount(ncount_out, 512, norm, max_sv, tlog);
  if (nc_len < 0) return -1;
  std::memcpy(norm_out, norm, sizeof(int16_t) * (max_sv + 1));
  meta[0] = max_sv;
  meta[1] = mfs;
  meta[2] = nc_len;
  return 1;
}

static int64_t rans_compress_group_impl(const uint8_t* src, uint64_t n,
                                        uint8_t* dst, uint64_t cap,
                                        int req_tlog, bool steptots) {
  if (cap < 16) return -1;
  if (n == 0) {
    Header h{kMagic, 0, 0, 0, kFlagRaw, 0};
    put_header(dst, h);
    return 16;
  }
  // histogram
  uint32_t count[256];
  histogram(src, n, count);
  int max_sv = 255;
  while (max_sv > 0 && count[max_sv] == 0) --max_sv;
  uint32_t max_count = 0;
  int mfs = 0;
  for (int s = 0; s <= max_sv; ++s)
    if (count[s] > max_count) { max_count = count[s]; mfs = s; }
  if (max_count == n) {  // RLE
    if (cap < 20) return -1;
    Header h{kMagic, uint32_t(n), 0, 0, kFlagRle, 0};
    put_header(dst, h);
    dst[16] = src[0];
    dst[17] = dst[18] = dst[19] = 0;
    return 20;
  }
  if (max_count <= (n >> 7)) {  // reference's incompressibility heuristic
    if (cap < 16 + n) return -1;  // (fse_compress.c:653-655): straight raw
    Header h{kMagic, uint32_t(n), 0, 0, kFlagRaw, 0};
    put_header(dst, h);
    std::memcpy(dst + 16, src, n);
    return int64_t(16 + n);
  }

  int16_t norm[256];
  // twin parity: table_log = min(req, FSE_optimalTableLog(req, n, max_sv))
  // (refimpl/norm.py fse_optimal_table_log, minus=2, max 12)
  int opt;
  {
    int max_bits_src = highbit32(uint32_t(n - 1)) - 2;
    opt = req_tlog;
    int min_bits = fse_min_table_log(n, max_sv);
    if (max_bits_src < opt) opt = max_bits_src;
    if (min_bits > opt) opt = min_bits;
    if (opt < kMinTableLog) opt = kMinTableLog;
    if (opt > 12) opt = 12;
  }
  const int etl = req_tlog < opt ? req_tlog : opt;
  int tl = normalize_count(norm, etl, count, n, max_sv);
  if (tl != etl) {
    goto raw;
  }
  {
    uint8_t ncount[512];
    int nc_len = write_ncount(ncount, sizeof(ncount), norm, max_sv, etl);
    if (nc_len < 0) goto raw;
    int nc_pad = (nc_len + 3) & ~3;

    // encode tables; magic multipliers replace the hardware divide
    // (q = mulhi(x, floor(2^32/f)) with <= 2 corrections, as in the kernel)
    uint32_t freq[256], cumul[256], magic[256];
    uint32_t acc = 0;
    for (int s = 0; s <= max_sv; ++s) {
      uint32_t f = norm[s] == -1 ? 1u : uint32_t(norm[s]);
      freq[s] = f;
      cumul[s] = acc;
      uint64_t m = (uint64_t(1) << 32) / (f ? f : 1);  // absent symbols unused
      magic[s] = uint32_t(m > 0xFFFFFFFFull ? 0xFFFFFFFFull : m);
      acc += f;
    }

    uint64_t n_pad = (n + kStepSyms - 1) / kStepSyms * kStepSyms;
    int T = int(n_pad / kLanes);
    uint64_t header_bytes = 16 + nc_pad + 4 * kLanes;  // u32 state per lane
    if (cap <= header_bytes) goto raw;
    uint64_t hw_cap = (cap - header_bytes) / 2;
    uint16_t* hw = reinterpret_cast<uint16_t*>(dst + header_bytes);
    uint64_t hw_pos = 0;

    alignas(32) static thread_local uint32_t x[kLanes];
    for (int k = 0; k < kLanes; ++k) x[k] = kL;

#if defined(__AVX2__)
    // packed fc = (cumul << 12) | freq, the kernels' table layout
    static thread_local uint32_t fc_tbl[256];
    for (int s = 0; s <= max_sv; ++s) fc_tbl[s] = (cumul[s] << 12) | freq[s];
#endif
    // speed-mode section: per-step per-row renorm counts (decode order)
    static thread_local std::vector<uint8_t> tots;
    if (steptots) {
      tots.assign(size_t(T) * 8, 0);
    }

    // steps t = T-1 .. 0; within a step lanes descend (reverse of the
    // decoder's ascending-lane reads); emissions append forward
    for (int t = T - 1; t >= 0; --t) {
#if defined(__AVX2__)
      if (uint64_t(t >> 2) * kStepSyms + kStepSyms <= n) {
        // full supercycle region: the step's 1024 src words are direct
        // contiguous loads (sym_index(t,k) = word (t>>2)*1024+k, byte t&3)
        const uint8_t* wbase = src + uint64_t(t >> 2) * kStepSyms;
        bool overflow = false;
        hw_pos = encode_step_avx2(x, fc_tbl, magic, etl,
                                  (const uint32_t*)wbase, t & 3, hw, hw_pos,
                                  hw_cap, &overflow,
                                  steptots ? tots.data() + size_t(t) * 8
                                           : nullptr);
        if (overflow) goto raw;
        continue;
      }
#endif
      for (int k = kLanes - 1; k >= 0; --k) {
        int64_t i = sym_index(t, k);
        uint32_t s = (uint64_t(i) < n) ? src[i] : uint32_t(mfs);
        uint32_t f = freq[s];
        uint32_t xv = x[k];
        if (xv >= (f << (32 - etl))) {
          if (hw_pos >= hw_cap) goto raw;
          hw[hw_pos++] = uint16_t(xv);
          xv >>= 16;
          if (steptots) ++tots[size_t(t) * 8 + (k >> 7)];
        }
        uint32_t q = uint32_t((uint64_t(xv) * magic[s]) >> 32);
        uint32_t r = xv - q * f;
        if (r >= f) { ++q; r -= f; }
        if (r >= f) { ++q; r -= f; }
        x[k] = (q << etl) + cumul[s] + r;
      }
    }

    // section serialization (twin parity incl. FLAG_ROWS4 nibble+escape
    // packing whenever it is smaller, turbo/rans.py _pack_rows4)
    static thread_local std::vector<uint8_t> sect;
    uint8_t fl = 0;
    if (steptots) {
      fl = kFlagStepTots;
      uint32_t n_exc = 0;
      for (size_t i = 0; i < tots.size(); ++i) n_exc += tots[i] >= 15;
      if (4 + 4ull * n_exc < 4ull * T) {
        fl |= kFlagRows4;
        sect.assign(4 + 4ull * n_exc + 4ull * T, 0);
        sect[0] = uint8_t(n_exc);
        sect[1] = uint8_t(n_exc >> 8);
        sect[2] = uint8_t(n_exc >> 16);
        sect[3] = uint8_t(n_exc >> 24);
        size_t e = 4;
        for (int t = 0; t < T; ++t)
          for (int rr = 0; rr < 8; ++rr) {
            uint8_t v = tots[size_t(t) * 8 + rr];
            if (v >= 15) {
              sect[e] = uint8_t(t);
              sect[e + 1] = uint8_t(t >> 8);
              sect[e + 2] = uint8_t(rr);
              sect[e + 3] = v;
              e += 4;
            }
          }
        uint8_t* nib = sect.data() + e;
        for (int t = 0; t < T; t += 2)
          for (int rr = 0; rr < 8; ++rr) {
            uint8_t lo = tots[size_t(t) * 8 + rr];
            uint8_t hi = tots[size_t(t + 1) * 8 + rr];
            nib[size_t(t / 2) * 8 + rr] =
                uint8_t((lo < 15 ? lo : 15) | ((hi < 15 ? hi : 15) << 4));
          }
      } else {
        sect.assign(tots.begin(), tots.end());
      }
    } else {
      sect.clear();
    }
    uint64_t out_len = header_bytes + sect.size() + 2 * hw_pos;
    if (out_len >= n + 16 || out_len > cap) goto raw;
    if (!sect.empty())  // stream bytes move up by the section size
      std::memmove(dst + header_bytes + sect.size(), dst + header_bytes,
                   2 * hw_pos);
    Header h{kMagic, uint32_t(n), uint32_t(hw_pos), uint8_t(etl), fl,
             uint16_t(nc_len)};
    put_header(dst, h);
    std::memcpy(dst + 16, ncount, nc_len);
    std::memset(dst + 16 + nc_len, 0, nc_pad - nc_len);
    // init states = final encoder states (u32 each, flat lane order)
    std::memcpy(dst + 16 + nc_pad, x, 4 * kLanes);
    if (!sect.empty())
      std::memcpy(dst + header_bytes, sect.data(), sect.size());
    return int64_t(out_len);
  }
raw:
  if (cap < 16 + n) return -1;
  {
    Header h{kMagic, uint32_t(n), 0, 0, kFlagRaw, 0};
    put_header(dst, h);
    std::memcpy(dst + 16, src, n);
  }
  return int64_t(16 + n);
}

// Multi-group compress with a thread pool: groups are independent, so each
// worker claims the next group off an atomic counter, compresses into its
// own scratch (worst case: raw group + header), and the blobs concatenate
// in group order.  nthreads <= 0 picks hardware_concurrency.
int64_t tfse_rans_compress_group(const uint8_t* src, uint64_t n,
                                 uint8_t* dst, uint64_t cap) {
  return rans_compress_group_impl(src, n, dst, cap, kTableLog, false);
}

// speed-mode group encode: FLAG_STEPTOTS (+ROWS4 when smaller) frames
// byte-identical to rans_compress(data, table_log=tlog, steptots=True)
int64_t tfse_rans_compress2_group(const uint8_t* src, uint64_t n,
                                  uint8_t* dst, uint64_t cap,
                                  int32_t tlog) {
  if (tlog < kMinTableLog || tlog > 12) return -6;
  return rans_compress_group_impl(src, n, dst, cap, int(tlog), true);
}

int64_t tfse_rans_compress(const uint8_t* src, uint64_t n, uint64_t group,
                           uint8_t* dst, uint64_t cap, int32_t nthreads) {
  if (group == 0) return -1;
  if (n == 0) return tfse_rans_compress_group(src, 0, dst, cap);
  uint64_t ngroups = (n + group - 1) / group;
  std::vector<std::vector<uint8_t>> outs(ngroups);
  std::vector<int64_t> sizes(ngroups, -1);
  unsigned want = nthreads > 0 ? unsigned(nthreads)
                               : std::thread::hardware_concurrency();
  if (want == 0) want = 1;
  if (want > ngroups) want = unsigned(ngroups);
  std::atomic<uint64_t> next{0};
  auto worker = [&]() {
    for (uint64_t g; (g = next.fetch_add(1)) < ngroups;) {
      uint64_t off = g * group;
      uint64_t gn = off + group <= n ? group : n - off;
      outs[g].resize(gn + 16 + 8192);
      sizes[g] = tfse_rans_compress_group(src + off, gn, outs[g].data(),
                                          outs[g].size());
    }
  };
  if (want <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (unsigned i = 0; i < want; ++i) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  uint64_t total = 0;
  for (uint64_t g = 0; g < ngroups; ++g) {
    if (sizes[g] < 0) return -1;
    total += uint64_t(sizes[g]);
  }
  if (total > cap) return -3;
  uint64_t pos = 0;
  for (uint64_t g = 0; g < ngroups; ++g) {
    std::memcpy(dst + pos, outs[g].data(), size_t(sizes[g]));
    pos += uint64_t(sizes[g]);
  }
  return int64_t(total);
}

// speed-mode multi-group compress: FLAG_STEPTOTS(+ROWS4) frames
int64_t tfse_rans_compress2(const uint8_t* src, uint64_t n, uint64_t group,
                            int32_t tlog, uint8_t* dst, uint64_t cap,
                            int32_t nthreads) {
  if (group == 0) return -1;
  if (tlog < kMinTableLog || tlog > 12) return -6;
  if (n == 0) return tfse_rans_compress_group(src, 0, dst, cap);
  uint64_t ngroups = (n + group - 1) / group;
  std::vector<std::vector<uint8_t>> outs(ngroups);
  std::vector<int64_t> sizes(ngroups, -1);
  unsigned want = nthreads > 0 ? unsigned(nthreads)
                               : std::thread::hardware_concurrency();
  if (want == 0) want = 1;
  if (want > ngroups) want = unsigned(ngroups);
  std::atomic<uint64_t> next{0};
  auto worker = [&]() {
    for (uint64_t g; (g = next.fetch_add(1)) < ngroups;) {
      uint64_t off = g * group;
      uint64_t gn = off + group <= n ? group : n - off;
      outs[g].resize(gn + gn / 64 + 16 + 16384);  // + section headroom
      sizes[g] = tfse_rans_compress2_group(src + off, gn, outs[g].data(),
                                           outs[g].size(), tlog);
    }
  };
  if (want <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (unsigned i = 0; i < want; ++i) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  uint64_t total = 0;
  for (uint64_t g = 0; g < ngroups; ++g) {
    if (sizes[g] < 0) return -1;
    total += uint64_t(sizes[g]);
  }
  if (total > cap) return -3;
  uint64_t pos = 0;
  for (uint64_t g = 0; g < ngroups; ++g) {
    std::memcpy(dst + pos, outs[g].data(), size_t(sizes[g]));
    pos += uint64_t(sizes[g]);
  }
  return int64_t(total);
}

int64_t tfse_rans_decompress_group(const uint8_t* blob, uint64_t len,
                                   uint8_t* dst, uint64_t cap,
                                   uint64_t* consumed) {
  if (len < 16) return -1;
  Header h = get_header(blob);
  if (h.magic != kMagic) return -2;
  uint64_t pos = 16;
  if (h.flags & kFlagRaw) {
    if (pos + h.n_sym > len || h.n_sym > cap) return -3;
    std::memcpy(dst, blob + pos, h.n_sym);
    *consumed = pos + h.n_sym;
    return h.n_sym;
  }
  if (h.flags & kFlagRle) {
    if (pos + 4 > len || h.n_sym > cap) return -3;
    std::memset(dst, blob[pos], h.n_sym);
    *consumed = pos + 4;
    return h.n_sym;
  }
  int16_t norm[256];
  int max_sv = 0, tl = 0;
  int avail = int(len - pos < 520 ? len - pos : 520);
  int used = read_ncount(norm, &max_sv, &tl, blob + pos, avail, 255);
  if (used < 0 || tl != h.table_log) return -4;
  if (tl < kMinTableLog || tl > kMaxTableLog) return -4;
  int nc_pad = (int(h.ncount_len) + 3) & ~3;
  pos += nc_pad;
  if (pos + 4 * kLanes + 2 * h.csize_hw > len || h.n_sym > cap) return -3;
  const uint8_t* init = blob + pos;  // may be misaligned; memcpy'd below
  pos += 4 * kLanes;
  if (h.flags & (kFlagStepTots | kFlagTotals)) {
    // speed-mode sections are redundant for this decoder (ranks are
    // recomputed); skip them
    uint64_t n_pad2 = (uint64_t(h.n_sym) + kStepSyms - 1) / kStepSyms * kStepSyms;
    uint64_t steps = n_pad2 / kLanes;
    uint64_t sect;
    if ((h.flags & kFlagStepTots) && (h.flags & kFlagRows4)) {
      if (pos + 4 > len) return -3;
      sect = 4 + 4ull * load_le32(blob + pos) + steps * 4;
    } else {
      sect = (h.flags & kFlagStepTots) ? steps * 8 : steps * 2;
    }
    if (pos + sect > len) return -3;
    pos += sect;
  }
  if (pos + 2 * h.csize_hw > len) return -3;
  const uint8_t* hw = blob + pos;  // byte base; load_le16 at 2*cursor
  pos += 2 * h.csize_hw;

  // decode table packed as in the kernel: (slot-cumul) << 20 | freq << 8 | sym
  static thread_local uint32_t tbl[1 << kMaxTableLog];
  {
    int slot = 0;
    for (int s = 0; s <= max_sv; ++s) {
      int f = norm[s] == -1 ? 1 : norm[s];
      for (int j = 0; j < f; ++j, ++slot)
        tbl[slot] = (uint32_t(j) << 20) | (uint32_t(f) << 8) | uint32_t(s);
    }
    if (slot != (1 << tl)) return -4;
  }

  uint64_t n_pad = (uint64_t(h.n_sym) + kStepSyms - 1) / kStepSyms * kStepSyms;
  int T = int(n_pad / kLanes);
  alignas(32) static thread_local uint32_t x[kLanes];
  static thread_local uint8_t syms[kLanes];
  static thread_local uint8_t flags[kLanes];
  std::memcpy(x, init, 4 * kLanes);
  int64_t cursor = h.csize_hw;
  uint64_t full_t = h.n_sym / kStepSyms * 4;  // steps with no dst guard

#if defined(__AVX2__)
  // scratch copy of the payload with gather tail slack (the vector renorm
  // reads 32 bits at hw + 2*pos for pos <= csize-1)
  static thread_local std::vector<uint8_t> hw_scratch;
  hw_scratch.resize(size_t(2 * h.csize_hw + 32));
  std::memcpy(hw_scratch.data(), hw, size_t(2 * h.csize_hw));
  alignas(32) static thread_local uint8_t symbuf[4][kLanes];

  for (int t4 = 0; t4 < T / 4; ++t4) {
    for (int p = 0; p < 4; ++p)
      cursor = decode_step_avx2(x, tbl, tl, hw_scratch.data(),
                                int64_t(h.csize_hw), cursor, symbuf[p]);
    uint8_t* base = dst + uint64_t(t4) * kStepSyms;
    if (uint64_t(t4 + 1) * kStepSyms <= h.n_sym) {
      // interleave 4 step rows into contiguous bytes: out word k =
      // p0[k] | p1[k]<<8 | p2[k]<<16 | p3[k]<<24  (auto-vectorizes)
      uint32_t* ob = reinterpret_cast<uint32_t*>(base);
      const uint8_t *s0 = symbuf[0], *s1 = symbuf[1], *s2 = symbuf[2],
                    *s3 = symbuf[3];
      for (int k = 0; k < kLanes; ++k) {
        uint32_t wv = uint32_t(s0[k]) | (uint32_t(s1[k]) << 8) |
                      (uint32_t(s2[k]) << 16) | (uint32_t(s3[k]) << 24);
        std::memcpy(ob + k, &wv, 4);
      }
    } else {
      for (int p = 0; p < 4; ++p)
        for (int k = 0; k < kLanes; ++k) {
          int64_t i = sym_index(4 * t4 + p, k);
          if (uint64_t(i) < h.n_sym) dst[i] = symbuf[p][k];
        }
    }
  }
#else
  for (int t = 0; t < T; ++t) {
    // pass 1: advance all lanes (vectorizable — no cross-lane dependence)
    for (int k = 0; k < kLanes; ++k) {
      uint32_t xv = x[k];
      uint32_t slot = xv & ((1u << tl) - 1);
      uint32_t e = tbl[slot];
      syms[k] = uint8_t(e);
      xv = ((e >> 8) & 0xFFF) * (xv >> tl) + (e >> 20);
      flags[k] = xv < kL;
      x[k] = xv;
    }
    // pass 2: serial halfword ingestion in lane order
    for (int k = 0; k < kLanes; ++k) {
      if (flags[k]) {
        --cursor;
        uint32_t v = cursor >= 0 && uint64_t(cursor) < h.csize_hw
                         ? load_le16(hw + 2 * cursor) : 0;
        x[k] = (x[k] << 16) | v;
      }
    }
    // pass 3: scatter symbols to their byte positions
    uint8_t* base = dst + (int64_t(t >> 2) * kStepSyms + (t & 3));
    if (uint64_t(t) < full_t) {
      for (int k = 0; k < kLanes; ++k) base[4 * k] = syms[k];
    } else {
      for (int k = 0; k < kLanes; ++k) {
        int64_t i = sym_index(t, k);
        if (uint64_t(i) < h.n_sym) dst[i] = syms[k];
      }
    }
  }
#endif
  if (cursor != 0) return -5;
  for (int k = 0; k < kLanes; ++k)
    if (x[k] != kL) return -5;
  *consumed = pos;
  return h.n_sym;
}

// ---------------------------------------------------------------------
// Multi-byte-wire group decode (r5: FLAG_PAIR=32 order-1 / FLAG_QUAD=128
// order-3, turbo/pair.py + turbo/quad.py).  Group layout after the 16 B
// header: ncount (4B-pad) | id->value LUT (u16/u32) (4B-pad) | escapes
// (pair: only when FLAG_PAIRESC=64, u32 n + n x (u32 pos, u16 val),
// 4B-pad; quad: ALWAYS, u32 n + n x (u32 pos, u32 val)) | 1024 u32 init
// states | steptots (redundant here; skipped) | payload halfwords.
// n_sym counts BYTES; symbols are 2- or 4-byte groups over <= 256 ids.
// Scalar loop (AVX2 variant is backlog); the per-step structure mirrors
// tfse_rans_decompress_group.
int64_t tfse_multibyte_decompress_group(const uint8_t* blob, uint64_t len,
                                        uint8_t* dst, uint64_t cap,
                                        uint64_t* consumed) {
  if (len < 16) return -1;
  Header h = get_header(blob);
  if (h.magic != kMagic) return -2;
  const bool quad = (h.flags & 128) != 0;
  if (!quad && !(h.flags & 32)) return -2;
  const int sym_bytes = quad ? 4 : 2;
  uint64_t pos = 16;

  int16_t norm[256];
  int max_sv = 0, tl = 0;
  int avail = int(len - pos < 520 ? len - pos : 520);
  int used = read_ncount(norm, &max_sv, &tl, blob + pos, avail, 255);
  if (used < 0 || tl != h.table_log) return -4;
  if (tl < kMinTableLog || tl > 12) return -4;
  pos += (uint64_t(h.ncount_len) + 3) & ~3ull;

  uint64_t lut_len = uint64_t(sym_bytes) * (max_sv + 1);
  if (pos + lut_len > len) return -3;
  const uint8_t* lut = blob + pos;
  pos += quad ? lut_len : ((lut_len + 3) & ~3ull);

  uint64_t n_units = (uint64_t(h.n_sym) + sym_bytes - 1) / sym_bytes;
  uint64_t n_esc = 0;
  const uint8_t* esc = nullptr;
  if (quad || (h.flags & 64)) {
    if (pos + 4 > len) return -3;
    n_esc = load_le32(blob + pos);
    uint64_t rec = quad ? 8 : 6;
    uint64_t eb = 4 + rec * n_esc;
    if (n_esc > n_units || pos + eb > len) return -3;
    esc = blob + pos + 4;
    pos += quad ? eb : ((eb + 3) & ~3ull);
  }

  if (pos + 4 * kLanes > len || h.n_sym > cap) return -3;
  const uint8_t* init = blob + pos;
  pos += 4 * kLanes;

  // units padded to whole supercycles: pair pads to 2048 u16 symbols,
  // quad to 1024 ids (= 4096 output bytes either way)
  uint64_t unit_pad = quad ? ((n_units + kLanes - 1) / kLanes * kLanes)
                           : ((n_units + 2047) / 2048 * 2048);
  int T = int(unit_pad / kLanes);
  if (h.flags & kFlagStepTots) {
    uint64_t Tp = uint64_t(T) + (uint64_t(T) & 1);  // odd T: zero-pad row
    uint64_t sect;
    if (h.flags & kFlagRows4) {
      if (pos + 4 > len) return -3;
      sect = 4 + 4ull * load_le32(blob + pos) + Tp * 4;
    } else {
      sect = uint64_t(T) * 8;
    }
    if (pos + sect > len) return -3;
    pos += sect;
  } else if (quad) {
    return -4;  // the quad wire is steptots-only by format
  }
  if (pos + 2 * h.csize_hw > len) return -3;
  const uint8_t* hw = blob + pos;
  pos += 2 * h.csize_hw;

  // slot -> (slot-cumul) << 20 | freq << 8 | id  (ids < 256 fit the
  // byte-wire pack)
  static thread_local uint32_t tbl[1 << kMaxTableLog];
  {
    int slot = 0;
    for (int s = 0; s <= max_sv; ++s) {
      int f = norm[s] == -1 ? 1 : norm[s];
      for (int j = 0; j < f; ++j, ++slot)
        tbl[slot] = (uint32_t(j) << 20) | (uint32_t(f) << 8) | uint32_t(s);
    }
    if (slot != (1 << tl)) return -4;
  }

  alignas(32) static thread_local uint32_t x[kLanes];
  static thread_local uint8_t ids[kLanes];
  static thread_local uint8_t flags[kLanes];
  std::memcpy(x, init, 4 * kLanes);
  int64_t cursor = h.csize_hw;
  // expand the LUT to 256 u32 entries (pair values zero-extended) so the
  // scatter is a single table index either way
  alignas(32) uint32_t lut32[256];
  for (int i = 0; i < 256; ++i) {
    if (i <= max_sv)
      lut32[i] = quad ? load_le32(lut + 4 * i) : load_le16(lut + 2 * i);
    else
      lut32[i] = 0;
  }
  // full supercycles whose 4096 output bytes all fit: vector fast path
  uint64_t full_words = h.n_sym / 4;   // whole u32 words in dst

#if defined(__AVX2__)
  static thread_local std::vector<uint8_t> hw_scratch;
  hw_scratch.resize(size_t(2 * h.csize_hw + 32));
  std::memcpy(hw_scratch.data(), hw, size_t(2 * h.csize_hw));
  alignas(32) static thread_local uint8_t idbuf[2][kLanes];
  alignas(32) static thread_local uint32_t vals[2][kLanes];

  const int t_per_word = quad ? 1 : 2;   // steps per output word row
  for (int tw = 0; tw < T / t_per_word; ++tw) {
    for (int p = 0; p < t_per_word; ++p)
      cursor = decode_step_avx2(x, tbl, tl, hw_scratch.data(),
                                int64_t(h.csize_hw), cursor, idbuf[p]);
    // LUT gather: 8 ids -> 8 u32 values per AVX2 gather
    for (int p = 0; p < t_per_word; ++p)
      for (int k = 0; k < kLanes; k += 8) {
        __m128i idb = _mm_loadl_epi64(
            reinterpret_cast<const __m128i*>(idbuf[p] + k));
        __m256i idx = _mm256_cvtepu8_epi32(idb);
        __m256i v = _mm256_i32gather_epi32(
            reinterpret_cast<const int*>(lut32), idx, 4);
        _mm256_store_si256(reinterpret_cast<__m256i*>(vals[p] + k), v);
      }
    uint64_t word_base = uint64_t(tw) * kLanes;  // output word row
    if (word_base + kLanes <= full_words) {
      uint32_t* ob = reinterpret_cast<uint32_t*>(dst) + word_base;
      if (quad) {
        std::memcpy(ob, vals[0], 4 * kLanes);
      } else {
        for (int k = 0; k < kLanes; ++k)
          ob[k] = vals[0][k] | (vals[1][k] << 16);
      }
    } else {
      // ragged tail: per-unit bounded scatter
      for (int p = 0; p < t_per_word; ++p) {
        int t = tw * t_per_word + p;
        for (int k = 0; k < kLanes; ++k) {
          uint64_t u = quad ? uint64_t(t) * kLanes + k
                            : uint64_t(t >> 1) * 2048 + 2ull * k + (t & 1);
          if (u >= n_units) continue;
          uint64_t off = u * sym_bytes;
          uint64_t nb = h.n_sym - off < uint64_t(sym_bytes)
                            ? h.n_sym - off : uint64_t(sym_bytes);
          uint32_t v = vals[p][k];
          std::memcpy(dst + off, &v, nb);
        }
      }
    }
  }
#else
  (void)full_words;
  for (int t = 0; t < T; ++t) {
    for (int k = 0; k < kLanes; ++k) {
      uint32_t xv = x[k];
      uint32_t slot = xv & ((1u << tl) - 1);
      uint32_t e = tbl[slot];
      ids[k] = uint8_t(e);
      xv = ((e >> 8) & 0xFFF) * (xv >> tl) + (e >> 20);
      flags[k] = xv < kL;
      x[k] = xv;
    }
    for (int k = 0; k < kLanes; ++k) {
      if (flags[k]) {
        --cursor;
        uint32_t v = cursor >= 0 && uint64_t(cursor) < h.csize_hw
                         ? load_le16(hw + 2 * cursor) : 0;
        x[k] = (x[k] << 16) | v;
      }
    }
    // scatter LUT values at each lane's unit position
    for (int k = 0; k < kLanes; ++k) {
      // pair lane order (turbo/rans16._unlane_view16): unit index
      // (t>>1)*2048 + 2k + (t&1); quad: t*1024 + k
      uint64_t u = quad ? uint64_t(t) * kLanes + k
                        : uint64_t(t >> 1) * 2048 + 2ull * k + (t & 1);
      if (u >= n_units) continue;
      uint64_t off = u * sym_bytes;
      uint64_t nb = h.n_sym - off < uint64_t(sym_bytes) ? h.n_sym - off
                                                        : uint64_t(sym_bytes);
      std::memcpy(dst + off, lut + uint64_t(sym_bytes) * ids[k], nb);
    }
  }
#endif
  if (cursor != 0) return -5;
  for (int k = 0; k < kLanes; ++k)
    if (x[k] != kL) return -5;

  // escape patch (unit positions carry raw values)
  for (uint64_t i = 0; i < n_esc; ++i) {
    const uint8_t* r = esc + i * (quad ? 8 : 6);
    uint64_t u = load_le32(r);
    if (u >= n_units) return -4;
    uint64_t off = u * sym_bytes;
    uint64_t nb = h.n_sym - off < uint64_t(sym_bytes) ? h.n_sym - off
                                                      : uint64_t(sym_bytes);
    std::memcpy(dst + off, r + 4, nb);
  }
  *consumed = pos;
  return h.n_sym;
}

// Multi-group decompress: an O(ngroups) header walk sizes every group's
// source span and output offset (no payload touched), then the pool decodes
// groups independently.  Returns total decoded bytes or a negative error.
int64_t tfse_rans_decompress(const uint8_t* blob, uint64_t len, uint8_t* dst,
                             uint64_t cap, int32_t nthreads) {
  struct Span { uint64_t src_off, src_len, dst_off, n_sym; };
  std::vector<Span> spans;
  uint64_t pos = 0, out = 0;
  while (pos < len) {
    if (pos + 16 > len) return -2;
    Header h = get_header(blob + pos);
    if (h.magic != kMagic) return -2;
    uint64_t gl;
    if (h.flags & kFlagRaw) {
      gl = 16 + uint64_t(h.n_sym);
    } else if (h.flags & kFlagRle) {
      gl = 20;
    } else {
      uint64_t n_pad =
          (uint64_t(h.n_sym) + kStepSyms - 1) / kStepSyms * kStepSyms;
      uint64_t steps = n_pad / kLanes;
      uint64_t hdr2 = 16 + uint64_t((h.ncount_len + 3) & ~3) + 4 * kLanes;
      uint64_t sect;
      if ((h.flags & kFlagStepTots) && (h.flags & kFlagRows4)) {
        if (pos + hdr2 + 4 > len) return -3;
        sect = 4 + 4ull * load_le32(blob + pos + hdr2) + steps * 4;
      } else {
        sect = (h.flags & kFlagStepTots) ? steps * 8
               : (h.flags & kFlagTotals) ? steps * 2
                                         : 0;
      }
      gl = hdr2 + sect + 2 * uint64_t(h.csize_hw);
    }
    if (pos + gl > len) return -3;
    spans.push_back({pos, gl, out, h.n_sym});
    pos += gl;
    out += h.n_sym;
  }
  if (out > cap) return -3;
  unsigned want = nthreads > 0 ? unsigned(nthreads)
                               : std::thread::hardware_concurrency();
  if (want == 0) want = 1;
  if (want > spans.size()) want = unsigned(spans.size());
  std::atomic<uint64_t> next{0};
  std::atomic<int64_t> err{0};
  auto worker = [&]() {
    for (uint64_t g; (g = next.fetch_add(1)) < spans.size();) {
      const Span& s = spans[g];
      uint64_t consumed = 0;
      int64_t r = tfse_rans_decompress_group(blob + s.src_off, s.src_len,
                                             dst + s.dst_off, s.n_sym,
                                             &consumed);
      if (r != int64_t(s.n_sym) || consumed != s.src_len) err.store(-5);
    }
  };
  if (want <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (unsigned i = 0; i < want; ++i) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  if (err.load() != 0) return err.load();
  return int64_t(out);
}


// ---------------------------------------------------------------------------
// TurboRANS-U16 decode (fseU16-class frames, magic 0x183EF003): same
// 1024-lane machine with u16 symbols, alphabets to 4095, tableLog to 13
// (turbo/rans16.py is the wire twin).  Scalar 3-pass loop; output is the
// little-endian u16 symbol array (dst sized in symbols).
// ---------------------------------------------------------------------------

#if defined(__AVX2__)
// u16 encode step over all 1024 lanes: u16 half p of the supercycle's
// 1024 src words; fc packing (cumul << 14) | freq covers tableLog <= 13
inline uint64_t encode_step16_avx2(uint32_t* x, const uint32_t* fc_tbl,
                                   const uint32_t* magic_tbl, int tl,
                                   const uint32_t* words, int p,
                                   uint16_t* hw, uint64_t pos,
                                   uint64_t hw_cap, bool* overflow) {
  alignas(32) static thread_local uint16_t stage[kLanes];
  static thread_local uint8_t cnt[kLanes / 8];
  const __m256i symmask = _mm256_set1_epi32(0xFFFF);
  const __m256i fmask = _mm256_set1_epi32(0x3FFF);
  int shift = 16 * p;
  uint64_t total = 0;
  for (int b = 0; b < kLanes / 8; ++b) {
    __m256i wv = _mm256_loadu_si256((const __m256i*)(words + 8 * b));
    __m256i sym = _mm256_and_si256(_mm256_srli_epi32(wv, shift), symmask);
    __m256i fce = _mm256_i32gather_epi32((const int*)fc_tbl, sym, 4);
    __m256i mg = _mm256_i32gather_epi32((const int*)magic_tbl, sym, 4);
    __m256i f = _mm256_and_si256(fce, fmask);
    __m256i c = _mm256_srli_epi32(fce, 14);
    __m256i xv = _mm256_load_si256((const __m256i*)(x + 8 * b));
    __m256i flag = cmpge_epu32(xv, _mm256_slli_epi32(f, 32 - tl));
    uint8_t m = uint8_t(_mm256_movemask_ps(_mm256_castsi256_ps(flag)));
    __m128i e16 = _mm_packus_epi32(
        _mm_and_si128(_mm256_castsi256_si128(xv), _mm_set1_epi32(0xFFFF)),
        _mm_and_si128(_mm256_extracti128_si256(xv, 1),
                      _mm_set1_epi32(0xFFFF)));
    _mm_storeu_si128(
        (__m128i*)(stage + 8 * b),
        _mm_shuffle_epi8(e16, _mm_load_si128((const __m128i*)g_compact.t[m])));
    cnt[b] = uint8_t(__builtin_popcount(m));
    total += cnt[b];
    xv = _mm256_blendv_epi8(xv, _mm256_srli_epi32(xv, 16), flag);
    __m256i q = mulhi_epu32(xv, mg);
    __m256i r = _mm256_sub_epi32(xv, _mm256_mullo_epi32(q, f));
    __m256i big = cmpge_epu32(r, f);
    q = _mm256_sub_epi32(q, big);
    r = _mm256_sub_epi32(r, _mm256_and_si256(big, f));
    big = cmpge_epu32(r, f);
    q = _mm256_sub_epi32(q, big);
    r = _mm256_sub_epi32(r, _mm256_and_si256(big, f));
    _mm256_store_si256(
        (__m256i*)(x + 8 * b),
        _mm256_add_epi32(_mm256_add_epi32(_mm256_slli_epi32(q, tl), c), r));
  }
  if (pos + total + 8 > hw_cap) {
    *overflow = true;
    return pos;
  }
  for (int b = kLanes / 8 - 1; b >= 0; --b) {
    _mm_storeu_si128((__m128i*)(hw + pos),
                     _mm_load_si128((const __m128i*)(stage + 8 * b)));
    pos += cnt[b];
  }
  return pos;
}
#endif  // __AVX2__

// u16 optimal tableLog (refimpl/norm.py fse_optimal_table_log, minus=2,
// max_allowed 13) — picks the twin's exact tlog so frames stay identical
static int optimal_table_log16(int req, uint64_t n, int max_sv) {
  int max_bits_src = highbit32(uint32_t(n - 1)) - 2;
  int tl = req;
  int min_bits = fse_min_table_log(n, max_sv);
  if (max_bits_src < tl) tl = max_bits_src;
  if (min_bits > tl) tl = min_bits;
  if (tl < kMinTableLog) tl = kMinTableLog;
  if (tl > 13) tl = 13;
  return tl;
}

// TurboRANS-U16 encode: ratio-mode (flags 0) frames byte-identical to
// rans16_compress(symbols, steptots=False).  src is the LE u16 symbol
// array; n in SYMBOLS.
int64_t tfse_rans16_compress_group(const uint8_t* src, uint64_t n,
                                   uint8_t* dst, uint64_t cap) {
  constexpr uint32_t kMagic16 = 0x183EF003u;
  constexpr int kStepSyms16 = 2048;
  if (n == 0) {
    if (cap < 16) return -1;
    Header h{kMagic16, 0, 0, 0, kFlagRaw, 0};
    put_header(dst, h);
    return 16;
  }
  const uint16_t* sp = reinterpret_cast<const uint16_t*>(src);
  int max_sv = 0;
  static thread_local uint32_t count[4096];
  std::memset(count, 0, sizeof(count));
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t v = sp[i];
    if (v > 4095) return -6;
    ++count[v];
    if (int(v) > max_sv) max_sv = int(v);
  }
  uint32_t max_count = 0;
  int mfs = 0;
  for (int ssym = 0; ssym <= max_sv; ++ssym)
    if (count[ssym] > max_count) { max_count = count[ssym]; mfs = ssym; }
  if (max_count == n) {  // RLE
    if (cap < 20) return -1;
    Header h{kMagic16, uint32_t(n), 0, 0, kFlagRle, 0};
    put_header(dst, h);
    dst[16] = uint8_t(sp[0]);
    dst[17] = uint8_t(sp[0] >> 8);
    dst[18] = dst[19] = 0;
    return 20;
  }

  int tlog_req = max_sv <= 1023 ? kTableLog : (max_sv <= 2047 ? 12 : 13);
  int tl = optimal_table_log16(tlog_req, n, max_sv);
  static thread_local int16_t norm[4096];
  int tl_used = normalize_count(norm, tl, count, n, max_sv);
  if (tl_used < 0) goto raw16;
  {
    static thread_local uint8_t ncount[8192];
    int nc_len = write_ncount(ncount, sizeof(ncount), norm, max_sv, tl);
    if (nc_len < 0) goto raw16;
    int nc_pad = (nc_len + 3) & ~3;

    static thread_local uint32_t freq[4096], cumul[4096], magic[4096];
    uint32_t acc = 0;
    for (int ssym = 0; ssym <= max_sv; ++ssym) {
      uint32_t f = norm[ssym] == -1 ? 1u : uint32_t(norm[ssym]);
      freq[ssym] = f;
      cumul[ssym] = acc;
      uint64_t m = (uint64_t(1) << 32) / (f ? f : 1);
      magic[ssym] = uint32_t(m > 0xFFFFFFFFull ? 0xFFFFFFFFull : m);
      acc += f;
    }

    uint64_t n_pad = (n + kStepSyms16 - 1) / kStepSyms16 * kStepSyms16;
    int T = int(n_pad / kLanes);
    uint64_t header_bytes = 16 + nc_pad + 4 * kLanes;
    if (cap <= header_bytes) goto raw16;
    uint64_t hw_cap = (cap - header_bytes) / 2;
    uint16_t* hw = reinterpret_cast<uint16_t*>(dst + header_bytes);
    uint64_t hw_pos = 0;

    alignas(32) static thread_local uint32_t x[kLanes];
    for (int k = 0; k < kLanes; ++k) x[k] = kL;

#if defined(__AVX2__)
    // packed fc for the vector path: (cumul << 14) | freq (tlog <= 13)
    static thread_local uint32_t fc16_tbl[4096];
    for (int ssym = 0; ssym <= max_sv; ++ssym)
      fc16_tbl[ssym] = (cumul[ssym] << 14) | freq[ssym];
#endif
    int shift = 32 - tl;
    for (int t = T - 1; t >= 0; --t) {
#if defined(__AVX2__)
      if (uint64_t(t >> 1) * kStepSyms16 + kStepSyms16 <= n) {
        const uint32_t* wbase =
            reinterpret_cast<const uint32_t*>(sp) + uint64_t(t >> 1) * kLanes;
        bool overflow = false;
        hw_pos = encode_step16_avx2(x, fc16_tbl, magic, tl, wbase, t & 1,
                                    hw, hw_pos, hw_cap, &overflow);
        if (overflow) goto raw16;
        continue;
      }
#endif
      for (int k = kLanes - 1; k >= 0; --k) {
        // symbol i = (t>>1)*2048 + 2*k + (t&1)
        int64_t i = int64_t(t >> 1) * kStepSyms16 + 2 * k + (t & 1);
        uint32_t ssym = (uint64_t(i) < n) ? sp[i] : uint32_t(mfs);
        uint32_t f = freq[ssym];
        uint32_t xv = x[k];
        if (xv >= (f << shift)) {
          if (hw_pos >= hw_cap) goto raw16;
          hw[hw_pos++] = uint16_t(xv);
          xv >>= 16;
        }
        uint32_t q = uint32_t((uint64_t(xv) * magic[ssym]) >> 32);
        uint32_t r = xv - q * f;
        if (r >= f) { ++q; r -= f; }
        if (r >= f) { ++q; r -= f; }
        x[k] = (q << tl) + cumul[ssym] + r;
      }
    }

    Header h{kMagic16, uint32_t(n), uint32_t(hw_pos), uint8_t(tl), 0,
             uint16_t(nc_len)};
    put_header(dst, h);
    std::memcpy(dst + 16, ncount, nc_len);
    std::memset(dst + 16 + nc_len, 0, nc_pad - nc_len);
    std::memcpy(dst + 16 + nc_pad, x, 4 * kLanes);
    uint64_t out_len = header_bytes + 2 * hw_pos;
    if (out_len >= 2 * n + 16) goto raw16;
    return int64_t(out_len);
  }
raw16:
  if (cap < 16 + 2 * n) return -1;
  {
    Header h{kMagic16, uint32_t(n), 0, 0, kFlagRaw, 0};
    put_header(dst, h);
    std::memcpy(dst + 16, src, 2 * n);
  }
  return int64_t(16 + 2 * n);
}

// Multi-group u16 compress (group in SYMBOLS); threaded like the byte path
int64_t tfse_rans16_compress(const uint8_t* src, uint64_t n,
                             uint64_t group_syms, uint8_t* dst, uint64_t cap,
                             int32_t nthreads) {
  if (group_syms == 0) group_syms = 1;
  uint64_t ngroups = n ? (n + group_syms - 1) / group_syms : 1;
  std::vector<int64_t> sizes(ngroups, 0);
  std::vector<std::vector<uint8_t>> outs(ngroups);
  std::atomic<uint64_t> next{0};
  auto worker = [&]() {
    for (;;) {
      uint64_t g = next.fetch_add(1);
      if (g >= ngroups) return;
      uint64_t st = g * group_syms;
      uint64_t ln = st < n ? (n - st < group_syms ? n - st : group_syms) : 0;
      uint64_t gcap = 2 * ln + 16 + 16384;
      outs[g].resize(size_t(gcap));
      sizes[g] = tfse_rans16_compress_group(src + 2 * st, ln, outs[g].data(),
                                            gcap);
    }
  };
  unsigned want = nthreads > 0 ? unsigned(nthreads)
                               : std::thread::hardware_concurrency();
  if (want == 0) want = 1;
  if (want > ngroups) want = unsigned(ngroups);
  if (want <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (unsigned i = 0; i < want; ++i) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  uint64_t total = 0;
  for (uint64_t g = 0; g < ngroups; ++g) {
    if (sizes[g] < 0) return sizes[g];
    total += uint64_t(sizes[g]);
  }
  if (total > cap) return -3;
  uint64_t pos = 0;
  for (uint64_t g = 0; g < ngroups; ++g) {
    std::memcpy(dst + pos, outs[g].data(), size_t(sizes[g]));
    pos += uint64_t(sizes[g]);
  }
  return int64_t(total);
}

int64_t tfse_rans16_decompress_group(const uint8_t* blob, uint64_t len,
                                     uint8_t* dst, uint64_t cap_syms,
                                     uint64_t* consumed) {
  constexpr uint32_t kMagic16 = 0x183EF003u;
  constexpr int kStepSyms16 = 2048;  // 2 u16 per lane slot per supercycle
  if (len < 16) return -1;
  Header h = get_header(blob);
  if (h.magic != kMagic16) return -2;
  uint64_t pos = 16;
  if (h.flags & kFlagRaw) {
    if (pos + 2ull * h.n_sym > len || h.n_sym > cap_syms) return -3;
    std::memcpy(dst, blob + pos, 2ull * h.n_sym);
    *consumed = pos + 2ull * h.n_sym;
    return h.n_sym;
  }
  if (h.flags & kFlagRle) {
    if (pos + 4 > len || h.n_sym > cap_syms) return -3;
    uint16_t v = load_le16(blob + pos);
    uint16_t* d16 = reinterpret_cast<uint16_t*>(dst);
    for (uint64_t i = 0; i < h.n_sym; ++i) d16[i] = v;
    *consumed = pos + 4;
    return h.n_sym;
  }
  static thread_local int16_t norm[4096];
  int max_sv = 0, tl = 0;
  int avail = int(len - pos < 8200 ? len - pos : 8200);
  int used = read_ncount(norm, &max_sv, &tl, blob + pos, avail, 4095);
  if (used < 0 || tl != h.table_log) return -4;
  if (tl < kMinTableLog || tl > 13) return -4;
  int nc_pad = (int(h.ncount_len) + 3) & ~3;
  pos += nc_pad;
  if (pos + 4 * kLanes + 2 * h.csize_hw > len || h.n_sym > cap_syms) return -3;
  const uint8_t* init = blob + pos;
  pos += 4 * kLanes;
  uint64_t n_pad = (uint64_t(h.n_sym) + kStepSyms16 - 1) / kStepSyms16 *
                   kStepSyms16;
  int T = int(n_pad / kLanes);
  if (h.flags & kFlagStepTots) {
    uint64_t sect = uint64_t(T) * 8;   // u16 wire has no rows4/totals modes
    if (pos + sect > len) return -3;
    pos += sect;
  }
  if (pos + 2 * h.csize_hw > len) return -3;
  const uint8_t* hw = blob + pos;
  pos += 2 * h.csize_hw;

  // split scalar tables: sym / freq / (slot - cumul), u16 each (tlog<=13)
  static thread_local uint16_t t_sym[1 << 13];
  static thread_local uint16_t t_f[1 << 13];
  static thread_local uint16_t t_j[1 << 13];
  {
    int slot = 0;
    for (int ssym = 0; ssym <= max_sv; ++ssym) {
      int f = norm[ssym] == -1 ? 1 : norm[ssym];
      for (int j = 0; j < f; ++j, ++slot) {
        t_sym[slot] = uint16_t(ssym);
        t_f[slot] = uint16_t(f);
        t_j[slot] = uint16_t(j);
      }
    }
    if (slot != (1 << tl)) return -4;
  }

  alignas(32) static thread_local uint32_t x[kLanes];
  static thread_local uint16_t syms[kLanes];
  static thread_local uint8_t flags[kLanes];
  std::memcpy(x, init, 4 * kLanes);
  int64_t cursor = h.csize_hw;
  uint16_t* d16 = reinterpret_cast<uint16_t*>(dst);
  uint64_t full_t = h.n_sym / kStepSyms16 * 2;  // steps with no dst guard

#if defined(__AVX2__)
  {
    // split AVX2 tables: fe = (f<<16) | (slot-cumul), sym plane as u32
    static thread_local uint32_t fe_tbl[1 << 13];
    static thread_local uint32_t sym32[1 << 13];
    for (int slot = 0; slot < (1 << tl); ++slot) {
      fe_tbl[slot] = (uint32_t(t_f[slot]) << 16) | t_j[slot];
      sym32[slot] = t_sym[slot];
    }
    static thread_local std::vector<uint8_t> hw_scratch;
    hw_scratch.resize(size_t(2 * h.csize_hw + 32));
    std::memcpy(hw_scratch.data(), hw, size_t(2 * h.csize_hw));
    alignas(32) static thread_local uint16_t symbuf[2][kLanes];
    for (int t2 = 0; t2 < T / 2; ++t2) {
      for (int p = 0; p < 2; ++p)
        cursor = decode_step16_avx2(x, fe_tbl, sym32, tl, hw_scratch.data(),
                                    int64_t(h.csize_hw), cursor, symbuf[p]);
      uint16_t* base = d16 + uint64_t(t2) * kStepSyms16;
      if (uint64_t(t2 + 1) * kStepSyms16 <= h.n_sym) {
        uint32_t* ob = reinterpret_cast<uint32_t*>(base);
        const uint16_t *s0 = symbuf[0], *s1 = symbuf[1];
        for (int k = 0; k < kLanes; ++k) {
          uint32_t wv = uint32_t(s0[k]) | (uint32_t(s1[k]) << 16);
          std::memcpy(ob + k, &wv, 4);
        }
      } else {
        for (int p = 0; p < 2; ++p)
          for (int k = 0; k < kLanes; ++k) {
            int64_t i = int64_t(t2) * kStepSyms16 + 2 * k + p;
            if (uint64_t(i) < h.n_sym) d16[i] = symbuf[p][k];
          }
      }
    }
    if (cursor != 0) return -5;
    for (int k = 0; k < kLanes; ++k)
      if (x[k] != kL) return -5;
    *consumed = pos;
    return h.n_sym;
  }
#endif

  for (int t = 0; t < T; ++t) {
    for (int k = 0; k < kLanes; ++k) {
      uint32_t xv = x[k];
      uint32_t slot = xv & ((1u << tl) - 1);
      syms[k] = t_sym[slot];
      xv = uint32_t(t_f[slot]) * (xv >> tl) + t_j[slot];
      flags[k] = xv < kL;
      x[k] = xv;
    }
    for (int k = 0; k < kLanes; ++k) {
      if (flags[k]) {
        --cursor;
        uint32_t v = cursor >= 0 && uint64_t(cursor) < h.csize_hw
                         ? load_le16(hw + 2 * cursor) : 0;
        x[k] = (x[k] << 16) | v;
      }
    }
    // symbol i = (t>>1)*2048 + 2*k + (t&1), lane k at step t
    uint16_t* base = d16 + (int64_t(t >> 1) * kStepSyms16 + (t & 1));
    if (uint64_t(t) < full_t) {
      for (int k = 0; k < kLanes; ++k) base[2 * k] = syms[k];
    } else {
      for (int k = 0; k < kLanes; ++k) {
        int64_t i = int64_t(t >> 1) * kStepSyms16 + 2 * k + (t & 1);
        if (uint64_t(i) < h.n_sym) d16[i] = syms[k];
      }
    }
  }
  if (cursor != 0) return -5;
  for (int k = 0; k < kLanes; ++k)
    if (x[k] != kL) return -5;
  *consumed = pos;
  return h.n_sym;
}

// Multi-group u16 decompress; dst/cap in SYMBOLS.  Threaded like the byte
// path (groups independent; header walk sizes spans first).
int64_t tfse_rans16_decompress(const uint8_t* blob, uint64_t len,
                               uint8_t* dst, uint64_t cap_syms,
                               int32_t nthreads) {
  constexpr uint32_t kMagic16 = 0x183EF003u;
  constexpr int kStepSyms16 = 2048;
  struct Span { uint64_t src_off, src_len, dst_off, n_sym; };
  std::vector<Span> spans;
  uint64_t pos = 0, out = 0;
  while (pos < len) {
    if (pos + 16 > len) return -2;
    Header h = get_header(blob + pos);
    if (h.magic != kMagic16) return -2;
    uint64_t gl;
    if (h.flags & kFlagRaw) {
      gl = 16 + 2ull * h.n_sym;
    } else if (h.flags & kFlagRle) {
      gl = 20;
    } else {
      uint64_t n_pad = (uint64_t(h.n_sym) + kStepSyms16 - 1) / kStepSyms16 *
                       kStepSyms16;
      uint64_t sect = (h.flags & kFlagStepTots) ? (n_pad / kLanes) * 8 : 0;
      gl = 16 + uint64_t((h.ncount_len + 3) & ~3) + 4 * kLanes + sect +
           2 * uint64_t(h.csize_hw);
    }
    if (pos + gl > len) return -3;
    spans.push_back({pos, gl, out, h.n_sym});
    pos += gl;
    out += h.n_sym;
  }
  if (out > cap_syms) return -3;
  unsigned want = nthreads > 0 ? unsigned(nthreads)
                               : std::thread::hardware_concurrency();
  if (want == 0) want = 1;
  if (want > spans.size()) want = unsigned(spans.size());
  std::atomic<uint64_t> next{0};
  std::atomic<int64_t> err{0};
  auto worker = [&]() {
    for (;;) {
      uint64_t g = next.fetch_add(1);
      if (g >= spans.size() || err.load() != 0) return;
      const Span& s = spans[g];
      uint64_t consumed = 0;
      int64_t r = tfse_rans16_decompress_group(
          blob + s.src_off, s.src_len, dst + 2 * s.dst_off, s.n_sym,
          &consumed);
      if (r != int64_t(s.n_sym) || consumed != s.src_len) err.store(-5);
    }
  };
  if (want <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (unsigned i = 0; i < want; ++i) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  if (err.load() != 0) return err.load();
  return int64_t(out);
}

}  // extern "C"
