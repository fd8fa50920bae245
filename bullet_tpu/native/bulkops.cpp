// Native bulk-ingest helpers: single-pass replacements for the numpy
// stages that dominate put_bulk's host time at 1M-op batches (profiled:
// argsort-based grouping ~0.37 s, float64 key transform ~0.53 s).
//
// Both must be BIT-IDENTICAL to their Python twins (tested):
//  * bk_group_positions  <-> models/netsim.py::_group_positions
//  * bk_number_keys      <-> utils/encode.py::number_keys_np +
//                            bulk_encode_numbers' canonical intern bits

#include <cstdint>
#include <cstring>

extern "C" {

// O(n) counting pass: seq[i] = position of op i among its peer's ops in
// batch order (stable); counts[p] = number of ops for peer p. The numpy
// twin gets the same answer via a stable argsort + segment arithmetic.
void bk_group_positions(const int32_t* peers, int64_t k, int32_t num_peers,
                        int64_t* seq, int64_t* counts) {
  for (int32_t p = 0; p < num_peers; ++p) counts[p] = 0;
  for (int64_t i = 0; i < k; ++i) {
    seq[i] = counts[peers[i]]++;
  }
}

// Order-preserving (khi, klo) int32 key pair per float64 (the standard
// flip-negatives / set-sign-bit trick, utils/encode.py::number_key), plus
// the canonical intern bits: -0.0 collapses to 0.0, every NaN keys to
// 0xFFF8... (above +inf) and interns as the canonical qNaN.
void bk_number_keys(const double* vals, int64_t k, int32_t* khi,
                    int32_t* klo, uint64_t* raw) {
  const uint64_t kCanonicalNan = 0xFFF8000000000000ull;
  const uint64_t kRawNan = 0x7FF8000000000000ull;
  for (int64_t i = 0; i < k; ++i) {
    double f = vals[i];
    uint64_t b;
    if (f != f) {
      b = kCanonicalNan;
      raw[i] = kRawNan;
    } else {
      if (f == 0.0) f = 0.0;  // collapse -0.0 (JS === identifies them)
      std::memcpy(&b, &f, 8);
      raw[i] = b;
      if (b >> 63) {
        b = ~b;
      } else {
        b |= (1ull << 63);
      }
    }
    // (u32 - 2^31) as int32 == u32 ^ 0x80000000 reinterpreted
    khi[i] = (int32_t)((uint32_t)(b >> 32) ^ 0x80000000u);
    klo[i] = (int32_t)((uint32_t)b ^ 0x80000000u);
  }
}

}  // extern "C"
