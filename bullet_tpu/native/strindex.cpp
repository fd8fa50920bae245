// Native lexicographic gap-rank index.
//
// Backs bullet_tpu.utils.encode.StringOrderIndex: every interned string gets
// a rank in [0, 2^62) preserving lexicographic order, new strings take the
// midpoint of their neighbors' ranks, and exhausted gaps trigger an even
// respread. The pure-Python implementation pays O(n) per insert for its
// sorted-list bookkeeping; this std::map-based version is O(log n) and is
// the framework's host-side native runtime component (the reference has no
// native code — SURVEY.md §2 — so this is additive, with the Python
// implementation as a always-available fallback).
//
// The gap/respread arithmetic deliberately mirrors the Python implementation
// exactly (tests assert bit-identical ranks), because ranks feed the device
// order keys.

#include <cstdint>
#include <map>
#include <string>

namespace {

constexpr uint64_t kRankSpace = 1ULL << 62;

struct Index {
  std::map<std::string, uint64_t> ranks;
  uint64_t rebalances = 0;

  void respread() {
    const uint64_t n = ranks.size();
    const uint64_t gap = kRankSpace / (n + 1);
    uint64_t r = gap;
    for (auto& kv : ranks) {
      kv.second = r;
      r += gap;
    }
    rebalances++;
  }
};

}  // namespace

extern "C" {

void* six_new() { return new Index(); }

void six_free(void* h) { delete static_cast<Index*>(h); }

uint64_t six_size(void* h) { return static_cast<Index*>(h)->ranks.size(); }

uint64_t six_rebalances(void* h) {
  return static_cast<Index*>(h)->rebalances;
}

// Look up an existing rank. Keys are length-delimited byte strings (the
// Python side passes UTF-16-BE encodings, whose byte order matches JS's
// UTF-16 code-unit comparison; they contain NUL bytes, hence the explicit
// length). Returns 0 on success, -1 if absent.
int six_rank(void* h, const char* s, int64_t len, uint64_t* rank_out) {
  Index& idx = *static_cast<Index*>(h);
  auto it = idx.ranks.find(std::string(s, static_cast<size_t>(len)));
  if (it == idx.ranks.end()) return -1;
  *rank_out = it->second;
  return 0;
}

// Insert (idempotent). Returns 1 if a respread happened, 0 otherwise.
// The assigned rank is written to *rank_out.
int six_insert(void* h, const char* s, int64_t len, uint64_t* rank_out) {
  Index& idx = *static_cast<Index*>(h);
  std::string key(s, static_cast<size_t>(len));
  auto it = idx.ranks.find(key);
  if (it != idx.ranks.end()) {
    *rank_out = it->second;
    return 0;
  }
  auto hi_it = idx.ranks.lower_bound(key);
  const int64_t hi = (hi_it != idx.ranks.end())
                         ? static_cast<int64_t>(hi_it->second)
                         : static_cast<int64_t>(kRankSpace);
  const int64_t lo = (hi_it != idx.ranks.begin())
                         ? static_cast<int64_t>(std::prev(hi_it)->second)
                         : -1;
  if (hi - lo < 2) {
    idx.ranks.emplace(key, 0);
    idx.respread();
    *rank_out = idx.ranks[key];
    return 1;
  }
  // lo >= -1 and hi >= lo + 2 ⇒ lo + hi >= 1, so truncating division
  // equals Python's floor division here.
  const uint64_t rank = static_cast<uint64_t>((lo + hi) / 2);
  idx.ranks.emplace(std::move(key), rank);
  *rank_out = rank;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Numeric value interner: canonical float64 bit pattern -> dense vid.
//
// The bulk-ingestion data loader (models/netsim.py put_bulk) interns every
// distinct numeric value; doing that per value in Python costs ~8 µs each.
// This map batch-assigns contiguous vids at C++ speed; the Python side
// extends its vid-indexed tables with single vectorized appends.

#include <unordered_map>
#include <vector>

namespace {

struct NumInterner {
  std::unordered_map<uint64_t, int32_t> map;
};

}  // namespace

extern "C" {

void* nvi_new() { return new NumInterner(); }

void nvi_free(void* h) { delete static_cast<NumInterner*>(h); }

uint64_t nvi_size(void* h) { return static_cast<NumInterner*>(h)->map.size(); }

// Single lookup: returns vid or -1.
int32_t nvi_lookup(void* h, uint64_t bits) {
  auto& m = static_cast<NumInterner*>(h)->map;
  auto it = m.find(bits);
  return it == m.end() ? -1 : it->second;
}

void nvi_insert(void* h, uint64_t bits, int32_t vid) {
  static_cast<NumInterner*>(h)->map.emplace(bits, vid);
}

// Batch intern: for each bits[i], write its vid to vids[i]; unseen values
// get sequential vids starting at next_vid (first-occurrence order) and
// their indices are recorded in new_idx (caller-allocated, size n).
// Returns the number of new values.
int64_t nvi_intern_batch(void* h, const uint64_t* bits, int64_t n,
                         int32_t next_vid, int32_t* vids, int64_t* new_idx) {
  auto& m = static_cast<NumInterner*>(h)->map;
  int64_t n_new = 0;
  for (int64_t i = 0; i < n; ++i) {
    auto it = m.find(bits[i]);
    if (it != m.end()) {
      vids[i] = it->second;
    } else {
      const int32_t vid = next_vid + static_cast<int32_t>(n_new);
      m.emplace(bits[i], vid);
      vids[i] = vid;
      new_idx[n_new++] = i;
    }
  }
  return n_new;
}

}  // extern "C"
