// Cuckoo hash directory builder: substring value -> (start, count) rows.
//
// The device-side bucket directory for s_bits too wide for a dense table.
// Probing on TPU is gather-latency-bound, so the directory is laid out as
// 16-byte rows [key, start, count, pad] — one XLA gather fetches a whole
// row — and uses 2-way cuckoo hashing with multiply-shift hashes the VPU
// can evaluate inline: every lookup costs exactly two independent row
// gathers (vs ~10 dependent gathers for a bisection chain).
//
// Host-side build (cuckoo insertion is inherently sequential); consumed by
// index/directory.py::HashDirectory.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// multiply-shift hash constants (odd, high-entropy); the TPU lookup code
// must use the same values — see index/directory.py::HASH_MULTS.
constexpr uint32_t kMul1 = 0x9E3779B1u;  // golden-ratio odd constant
constexpr uint32_t kMul2 = 0x85EBCA77u;  // (murmur3 c2 constant, odd)

inline uint32_t Slot(uint32_t v, uint32_t mul, int shift) {
  return (v * mul) >> shift;
}

}  // namespace

extern "C" {

// Input: the sorted substring column (with duplicates). Emits the cuckoo
// row table as 4 x uint32 per slot: [key, start, count, 0]. `table` must
// hold 4 * n_slots uint32s, n_slots a power of two chosen by the caller;
// returns 0 on success, -1 if the table could not be built at this size
// (caller doubles and retries), -2 on bad args.
int vt_build_hashdir(const uint32_t* sorted_keys, uint64_t n,
                     uint64_t n_slots, uint32_t* table) {
  if (n_slots == 0 || (n_slots & (n_slots - 1)) != 0) return -2;
  const int shift = 32 - __builtin_ctzll(n_slots);
  std::memset(table, 0, n_slots * 4 * sizeof(uint32_t));
  // empty slot: count == 0 (a real row always has count >= 1, and a key
  // match with count 0 reads as a miss, so key=0 in empty slots is safe)

  const int kMaxKicks = 256;
  uint64_t i = 0;
  while (i < n) {
    // unique run [i, j)
    uint64_t j = i + 1;
    while (j < n && sorted_keys[j] == sorted_keys[i]) ++j;
    uint32_t key = sorted_keys[i];
    uint32_t start = static_cast<uint32_t>(i);
    uint32_t count = static_cast<uint32_t>(j - i);
    // cuckoo insert with displacement
    int which = 0;
    int kicks = 0;
    for (;;) {
      uint32_t s1 = Slot(key, kMul1, shift);
      uint32_t s2 = Slot(key, kMul2, shift);
      uint32_t* r1 = table + 4ull * s1;
      uint32_t* r2 = table + 4ull * s2;
      if (r1[2] == 0) {
        r1[0] = key; r1[1] = start; r1[2] = count;
        break;
      }
      if (r2[2] == 0) {
        r2[0] = key; r2[1] = start; r2[2] = count;
        break;
      }
      if (++kicks > kMaxKicks) return -1;
      // evict from alternating choices
      uint32_t* victim = (which ^= 1) ? r1 : r2;
      uint32_t vk = victim[0], vs = victim[1], vc = victim[2];
      victim[0] = key; victim[1] = start; victim[2] = count;
      key = vk; start = vs; count = vc;
    }
    i = j;
  }
  return 0;
}

}  // extern "C"
