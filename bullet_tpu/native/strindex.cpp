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

// Look up an existing rank. Returns 0 on success, -1 if absent.
int six_rank(void* h, const char* s, uint64_t* rank_out) {
  Index& idx = *static_cast<Index*>(h);
  auto it = idx.ranks.find(s);
  if (it == idx.ranks.end()) return -1;
  *rank_out = it->second;
  return 0;
}

// Insert (idempotent). Returns 1 if a respread happened, 0 otherwise.
// The assigned rank is written to *rank_out.
int six_insert(void* h, const char* s, uint64_t* rank_out) {
  Index& idx = *static_cast<Index*>(h);
  std::string key(s);
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
    idx.ranks.emplace(std::move(key), 0);
    idx.respread();
    *rank_out = idx.ranks[s];
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
