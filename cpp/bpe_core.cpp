// Native BPE merge kernel for the ERGM-TPU tokenizer host path.
//
// The byte-level BPE merge loop (greedy lowest-rank adjacent pair,
// ergm_tpu/tokenizer/bpe.py:_bpe) is the CPU hot spot when tokenizing
// whole corpora (the load_data / text2ids stage). This kernel runs the
// merge entirely over int32 vocab ids: Python maps a pre-token's bytes
// to base symbol ids, C++ folds merges, and the output ids are final
// vocab ids (every merged symbol is itself a vocab entry).
//
// C ABI (ctypes-friendly):
//   bpe_new(n_merges, left[], right[], merged[]) -> handle
//   bpe_apply(handle, syms[], n, out[], cap)     -> produced count
//   bpe_apply_batch(...)                         -> flattened encode
//   bpe_free(handle)

#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

using std::size_t;

namespace {

struct MergeInfo {
  int32_t rank;
  int32_t merged_id;
};

struct BpeTable {
  std::unordered_map<uint64_t, MergeInfo> merges;
  int32_t byte_to_base[256];
  bool has_byte_table = false;
};

inline uint64_t pair_key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

int32_t apply_merges(const BpeTable& t, const int32_t* syms, int32_t n,
                     int32_t* out, int32_t cap) {
  if (n <= 0) return 0;
  std::vector<int32_t> word(syms, syms + n);
  // Greedy: repeatedly merge the lowest-rank adjacent pair until none
  // remains. Word lengths are tiny (pre-tokens), so the quadratic scan
  // beats heap bookkeeping in practice.
  while (word.size() > 1) {
    int32_t best_rank = INT32_MAX;
    size_t best_pos = 0;
    int32_t best_id = -1;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto it = t.merges.find(pair_key(word[i], word[i + 1]));
      if (it != t.merges.end() && it->second.rank < best_rank) {
        best_rank = it->second.rank;
        best_pos = i;
        best_id = it->second.merged_id;
      }
    }
    if (best_id < 0) break;
    // fold every occurrence of the winning pair (left-to-right), matching
    // the Python reference loop
    std::vector<int32_t> next;
    next.reserve(word.size());
    int32_t a = word[best_pos], b = word[best_pos + 1];
    for (size_t i = 0; i < word.size();) {
      if (i + 1 < word.size() && word[i] == a && word[i + 1] == b) {
        next.push_back(best_id);
        i += 2;
      } else {
        next.push_back(word[i]);
        i += 1;
      }
    }
    word.swap(next);
  }
  int32_t m = static_cast<int32_t>(word.size());
  if (m > cap) return -m;  // caller retries with a bigger buffer
  for (int32_t i = 0; i < m; ++i) out[i] = word[i];
  return m;
}

}  // namespace

extern "C" {

void* bpe_new(int32_t n_merges, const int32_t* left, const int32_t* right,
              const int32_t* merged) {
  auto* t = new BpeTable();
  t->merges.reserve(static_cast<size_t>(n_merges) * 2);
  for (int32_t i = 0; i < n_merges; ++i) {
    t->merges.emplace(pair_key(left[i], right[i]), MergeInfo{i, merged[i]});
  }
  return t;
}

// Register the byte -> base-symbol-id table (vocab ids of the GPT-2
// byte-to-unicode alphabet) enabling the raw-bytes batch entry point.
void bpe_set_byte_table(void* handle, const int32_t* byte_to_base) {
  auto* t = static_cast<BpeTable*>(handle);
  for (int i = 0; i < 256; ++i) t->byte_to_base[i] = byte_to_base[i];
  t->has_byte_table = true;
}

// Encode pre-tokenized words given as raw UTF-8 bytes: `data` holds all
// words concatenated, `offsets` (n_words+1) delimits them. Byte->base-id
// mapping and the merge loop both run natively.
int32_t bpe_encode_bytes_batch(void* handle, const uint8_t* data,
                               const int32_t* offsets, int32_t n_words,
                               int32_t* out, int32_t out_cap,
                               int32_t* counts) {
  auto* t = static_cast<BpeTable*>(handle);
  if (!t->has_byte_table) return -2;
  std::vector<int32_t> syms;
  int32_t total = 0;
  for (int32_t w = 0; w < n_words; ++w) {
    int32_t n = offsets[w + 1] - offsets[w];
    syms.clear();
    syms.reserve(n);
    for (int32_t i = 0; i < n; ++i) {
      syms.push_back(t->byte_to_base[data[offsets[w] + i]]);
    }
    int32_t got = apply_merges(*t, syms.data(), static_cast<int32_t>(syms.size()),
                               out + total, out_cap - total);
    if (got < 0) return -1;
    counts[w] = got;
    total += got;
  }
  return total;
}

int32_t bpe_apply(void* handle, const int32_t* syms, int32_t n, int32_t* out,
                  int32_t cap) {
  return apply_merges(*static_cast<BpeTable*>(handle), syms, n, out, cap);
}

// Batch entry: words flattened into `syms` with `offsets` (n_words+1
// entries). Output ids flatten into `out`; per-word counts into
// `counts`. Returns total produced, or -1 on overflow.
int32_t bpe_apply_batch(void* handle, const int32_t* syms,
                        const int32_t* offsets, int32_t n_words, int32_t* out,
                        int32_t out_cap, int32_t* counts) {
  auto* t = static_cast<BpeTable*>(handle);
  int32_t total = 0;
  for (int32_t w = 0; w < n_words; ++w) {
    int32_t n = offsets[w + 1] - offsets[w];
    int32_t got =
        apply_merges(*t, syms + offsets[w], n, out + total, out_cap - total);
    if (got < 0) return -1;
    counts[w] = got;
    total += got;
  }
  return total;
}

void bpe_free(void* handle) { delete static_cast<BpeTable*>(handle); }

}  // extern "C"
